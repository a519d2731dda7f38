"""Generic transformer stack.

Capability parity with
``/root/reference/architectures/transformers/transformer_arch.py``
(`TransformerLayer:272`, `TransformerBlock:540`, `TransformerEncoder/
Decoder:857,861`, full `Transformer:865`, mask builders :154,187) —
pure-functional over pytree params; decoder layers carry KV caches for
jittable autoregressive generation.
"""

import jax
import jax.numpy as jnp

from ...hparams import HParams
from ...nn import layers as nn
from ...nn.activations import get_activation
from .attention import (
    init_mha, mha, init_kv_cache, build_padding_mask, build_look_ahead_mask,
    combine_masks,
)

HParamsTransformer = HParams(
    vocab_size = 32000,
    dim = 512,
    n_layers = 6,
    n_heads = 8,
    n_kv_heads = None,
    ffn_dim = 2048,
    ffn_activation = 'gelu',
    gated_ffn = False,                 # SwiGLU-style (mistral/llama)
    norm = 'layer',                    # 'layer' | 'rms'
    norm_first = True,                 # pre-norm (GPT-2 style) vs post-norm (BERT)
    epsilon = 1e-5,
    max_position = 2048,
    positional = 'learned',            # 'learned' | 'sinusoidal' | 'rope' | 'none'
    rope_theta = 10000.0,
    pad_token = 0,
    use_bias = True,
    scale_embedding = False,
    use_final_norm = True,
    tie_embeddings = True,
    use_cross_attention = False,
    use_token_type = False,
    n_experts = 0,                     # >0: Mixtral-style sparse MoE FFN
    n_experts_per_token = 2,
    attention_scale = None,            # None = 1/sqrt(head_dim); T5 uses 1.0
    use_relative_bias = False,         # T5-style bucketed relative positions
    rel_buckets = 32,
    rel_max_distance = 128,
    position_offset = 0,               # BART stores positions shifted by 2
    audio_stem = False,                # Whisper conv1/conv2 mel front-end
    n_mels = 80,
)


def t5_relative_buckets(relative_position, *, bidirectional, num_buckets = 32,
                        max_distance = 128):
    """T5's standard log-bucketed relative-position function."""
    import numpy as _np
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / _np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def moe_load_balancing_loss(router_logits, n_experts, k):
    """Switch/Mixtral auxiliary load-balancing loss over a list of per-layer
    router logits (collected via ``decode(..., aux=[])``): E * sum_e
    (fraction of tokens routed to e) * (mean router prob of e), averaged
    over layers.  1.0 == perfectly balanced."""
    total = 0.
    for logits in router_logits:
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis = -1)
        _, top_i = jax.lax.top_k(probs, k)
        frac = jnp.mean(jax.nn.one_hot(top_i, n_experts), axis = (0, 1, 2))
        total = total + n_experts * jnp.sum(frac * jnp.mean(probs, axis = (0, 1)))
    return total / max(len(router_logits), 1)


def sinusoidal_embedding(max_position, dim):
    pos = jnp.arange(max_position)[:, None].astype(jnp.float32)
    i = jnp.arange(dim // 2)[None, :].astype(jnp.float32)
    angle = pos / jnp.power(10000., 2. * i / dim)
    emb = jnp.zeros((max_position, dim))
    emb = emb.at[:, 0::2].set(jnp.sin(angle))
    emb = emb.at[:, 1::2].set(jnp.cos(angle))
    return emb


class Transformer:
    """Encoder-only / decoder-only / encoder-decoder depending on hparams and
    which apply methods are used."""

    def __init__(self, ** kwargs):
        self.hp = HParamsTransformer.extract(kwargs)

    # -- init ------------------------------------------------------------------

    def _init_norm(self, dim):
        return nn.init_rms_norm(dim) if self.hp.norm == 'rms' else nn.init_layer_norm(dim)

    def _norm(self, params, x):
        if self.hp.norm == 'rms':
            return nn.rms_norm(params, x, self.hp.epsilon)
        return nn.layer_norm(params, x, self.hp.epsilon)

    def _init_block(self, key, cross = False):
        hp = self.hp
        keys = nn.split_keys(key, 8)
        block = {
            'attention': init_mha(next(keys), hp.dim, hp.n_heads,
                                  n_kv_heads = hp.n_kv_heads, use_bias = hp.use_bias),
            'attention_norm': self._init_norm(hp.dim),
            'ffn_norm': self._init_norm(hp.dim),
        }
        if hp.n_experts:
            # experts stacked on a leading axis — the ep-shardable layout
            # (parallel.moe_param_specs shards it; the expert einsums then
            # compute locally per shard and the combine psum-reduces)
            ekeys = nn.split_keys(next(keys), 3 * hp.n_experts)
            stack = lambda d_in, d_out: {'kernel': jnp.stack([
                nn.init_dense(next(ekeys), d_in, d_out, use_bias = False)['kernel']
                for _ in range(hp.n_experts)])}
            block['ffn'] = {
                'router': nn.init_dense(next(keys), hp.dim, hp.n_experts,
                                        use_bias = False),
                'experts': {
                    'gate': stack(hp.dim, hp.ffn_dim),
                    'up': stack(hp.dim, hp.ffn_dim),
                    'down': stack(hp.ffn_dim, hp.dim),
                },
            }
        elif hp.gated_ffn:
            block['ffn'] = {
                'gate': nn.init_dense(next(keys), hp.dim, hp.ffn_dim, use_bias = False),
                'up': nn.init_dense(next(keys), hp.dim, hp.ffn_dim, use_bias = False),
                'down': nn.init_dense(next(keys), hp.ffn_dim, hp.dim, use_bias = False),
            }
        else:
            block['ffn'] = {
                'up': nn.init_dense(next(keys), hp.dim, hp.ffn_dim, use_bias = hp.use_bias),
                'down': nn.init_dense(next(keys), hp.ffn_dim, hp.dim, use_bias = hp.use_bias),
            }
        if cross:
            block['cross_attention'] = init_mha(
                next(keys), hp.dim, hp.n_heads, use_bias = hp.use_bias)
            block['cross_norm'] = self._init_norm(hp.dim)
        return block

    def init(self, key, *, decoder = None):
        """Params for one stack.  `decoder=True` adds cross-attention blocks
        (when `use_cross_attention`)."""
        hp = self.hp
        keys = nn.split_keys(key, hp.n_layers + 6)
        params = {'embedding': nn.init_embedding(next(keys), hp.vocab_size, hp.dim)}
        if hp.positional == 'learned':
            params['position_embedding'] = nn.init_embedding(
                next(keys), hp.max_position, hp.dim)
        if hp.use_token_type:
            params['token_type_embedding'] = nn.init_embedding(next(keys), 2, hp.dim)
        cross = hp.use_cross_attention if decoder is None else decoder
        if hp.audio_stem:
            params['stem'] = {
                'conv1': nn.init_conv1d(next(keys), 3, hp.n_mels, hp.dim),
                'conv2': nn.init_conv1d(next(keys), 3, hp.dim, hp.dim),
            }
        if hp.use_relative_bias:
            params['relative_bias'] = nn.init_embedding(
                next(keys), hp.rel_buckets, hp.n_heads)
        for i in range(hp.n_layers):
            params['layer_{}'.format(i)] = self._init_block(next(keys), cross = cross)
        if hp.use_final_norm:
            params['final_norm'] = self._init_norm(hp.dim)
        if not hp.tie_embeddings:
            params['lm_head'] = nn.init_dense(next(keys), hp.dim, hp.vocab_size,
                                              use_bias = False)
        return params

    # -- blocks ----------------------------------------------------------------

    def _ffn(self, params, x, aux = None):
        act = get_activation(self.hp.ffn_activation)
        if self.hp.n_experts:
            return self._moe_ffn(params, x, aux = aux)
        if self.hp.gated_ffn:
            return nn.dense(params['down'],
                            act(nn.dense(params['gate'], x)) * nn.dense(params['up'], x))
        return nn.dense(params['down'], act(nn.dense(params['up'], x)))

    def _moe_ffn(self, params, x, aux = None):
        """Mixtral-style sparse MoE: softmax router, top-k experts per token,
        weights renormalized over the selected k.

        Evaluation is DENSE over experts (every expert runs on every token,
        the router weights zero out the unselected ones): with the expert
        axis sharded over an ``ep`` mesh axis (`parallel.moe_param_specs`)
        each device computes only its local experts and the final combine
        contracts the expert axis — XLA inserts the psum, which is exactly
        the expert-parallel all-reduce.  At E/k = 4 the extra FLOPs are the
        price of static shapes (no capacity overflow, no sorting); a
        token-dropping all_to_all dispatch only pays off at much larger E.

        ``aux``: optional list collecting per-layer router logits for the
        load-balancing loss (`moe_load_balancing_loss`)."""
        hp = self.hp
        k = hp.n_experts_per_token
        act = get_activation(hp.ffn_activation)

        logits = nn.dense(params['router'], x)                 # (B, T, E)
        if aux is not None:
            aux.append(logits)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis = -1)
        top_w, top_i = jax.lax.top_k(probs, k)                 # (B, T, k)
        top_w = top_w / jnp.sum(top_w, axis = -1, keepdims = True)
        # scatter the renormalized top-k weights back to a dense (B, T, E)
        one_hot = jax.nn.one_hot(top_i, hp.n_experts, dtype = top_w.dtype)
        w_full = jnp.einsum('btk,btke->bte', top_w, one_hot).astype(x.dtype)

        we = params['experts']
        g = jnp.einsum('btd,edf->ebtf', x, we['gate']['kernel'])
        u = jnp.einsum('btd,edf->ebtf', x, we['up']['kernel'])
        y = jnp.einsum('ebtf,efd->ebtd', act(g) * u, we['down']['kernel'])
        return jnp.einsum('ebtd,bte->btd', y, w_full)

    def _relative_bias(self, params, q_len, k_len, *, bidirectional, offset = 0):
        """(1, H, Tq, Tk) additive attention bias (T5)."""
        hp = self.hp
        q_pos = offset + jnp.arange(q_len)[:, None]
        k_pos = jnp.arange(k_len)[None, :]
        buckets = t5_relative_buckets(
            k_pos - q_pos, bidirectional = bidirectional,
            num_buckets = hp.rel_buckets, max_distance = hp.rel_max_distance,
        )
        bias = nn.embedding(params['relative_bias'], buckets)   # (Tq, Tk, H)
        return jnp.transpose(bias, (2, 0, 1))[None]

    def block(self, params, x, *, mask = None, cache = None,
              encoder_output = None, encoder_mask = None, positions = None,
              rel_bias = None, aux = None):
        hp = self.hp
        use_rope = hp.positional == 'rope'

        def attn(x_in):
            return mha(params['attention'], x_in, n_heads = hp.n_heads,
                       mask = mask, cache = cache, positions = positions,
                       use_rope = use_rope, rope_base = hp.rope_theta,
                       rel_bias = rel_bias, scale = hp.attention_scale)

        if hp.norm_first:
            h, new_cache = attn(self._norm(params['attention_norm'], x))
            x = x + h
        else:
            h, new_cache = attn(x)
            x = self._norm(params['attention_norm'], x + h)

        if encoder_output is not None and 'cross_attention' in params:
            def cross(x_in):
                return mha(params['cross_attention'], x_in, encoder_output,
                           n_heads = hp.n_heads, mask = encoder_mask,
                           scale = hp.attention_scale)[0]
            if hp.norm_first:
                x = x + cross(self._norm(params['cross_norm'], x))
            else:
                x = self._norm(params['cross_norm'], x + cross(x))

        if hp.norm_first:
            x = x + self._ffn(params['ffn'], self._norm(params['ffn_norm'], x),
                              aux = aux)
        else:
            x = self._norm(params['ffn_norm'],
                           x + self._ffn(params['ffn'], x, aux = aux))
        return x, new_cache

    # -- embeddings ------------------------------------------------------------

    def embed(self, params, tokens, *, offset = 0, token_type = None):
        hp = self.hp
        x = nn.embedding(params['embedding'], tokens)
        if hp.scale_embedding:
            x = x * (hp.dim ** 0.5)
        T = tokens.shape[1]
        if hp.positional == 'learned':
            pos = hp.position_offset + offset + jnp.arange(T)
            x = x + nn.embedding(params['position_embedding'], pos)[None]
        elif hp.positional == 'sinusoidal':
            table = sinusoidal_embedding(hp.max_position, hp.dim)
            x = x + jax.lax.dynamic_slice_in_dim(table, offset, T, 0)[None]
        if 'token_type_embedding' in params:
            if token_type is None:
                token_type = jnp.zeros_like(tokens)
            x = x + nn.embedding(params['token_type_embedding'], token_type)
        if 'embedding_norm' in params:
            x = self._norm(params['embedding_norm'], x)
        return x

    def logits(self, params, x):
        if 'lm_head' in params:
            return nn.dense(params['lm_head'], x)
        return x @ params['embedding']['embeddings'].T

    # -- full passes -----------------------------------------------------------

    def encode(self, params, tokens, *, lengths = None, token_type = None):
        """Non-causal encoder pass → (hidden (B, T, D), padding mask)."""
        mask = build_padding_mask(lengths = lengths, tokens = tokens,
                                 pad_token = self.hp.pad_token,
                                 max_length = tokens.shape[1])
        x = self.embed(params, tokens, token_type = token_type)
        rel_bias = None
        if self.hp.use_relative_bias:
            T = tokens.shape[1]
            rel_bias = self._relative_bias(params, T, T, bidirectional = True)
        for i in range(self.hp.n_layers):
            x, _ = self.block(params['layer_{}'.format(i)], x, mask = mask,
                              rel_bias = rel_bias)
        if self.hp.use_final_norm:
            x = self._norm(params['final_norm'], x)
        return x, mask

    def encode_audio(self, params, mel):
        """Whisper-style audio encoder: conv stem (stride-2 downsample) +
        sinusoidal positions + non-causal layers.  mel (B, T, n_mels) →
        (hidden (B, T//2, D), mask=None)."""
        hp = self.hp
        x = jax.nn.gelu(nn.conv1d(params['stem']['conv1'], mel, padding = 'SAME'))
        # explicit symmetric padding: torch's stride-2 "padding=1" windows are
        # shifted one step vs XLA's SAME
        x = jax.nn.gelu(nn.conv1d(params['stem']['conv2'], x, stride = 2,
                                  padding = [(1, 1)]))
        T = x.shape[1]
        if 'position_embedding' in params:
            x = x + params['position_embedding']['embeddings'][None, :T]
        else:
            x = x + sinusoidal_embedding(hp.max_position, hp.dim)[None, :T]
        for i in range(hp.n_layers):
            x, _ = self.block(params['layer_{}'.format(i)], x)
        if hp.use_final_norm:
            x = self._norm(params['final_norm'], x)
        return x, None

    def decode(self, params, tokens, *, caches = None, offset = None,
               encoder_output = None, encoder_mask = None, positions = None,
               valid_length = None, aux = None):
        """Causal decoder pass.  With `caches` (per-layer KV caches) the pass
        processes `tokens` (usually one step) against the full cache.
        Returns (logits, new_caches)."""
        hp = self.hp
        B, T = tokens.shape

        if caches is not None:
            total = caches[0]['k'].shape[1]
            idx = caches[0]['index']
            key_pos = jnp.arange(total)[None, None, None, :]
            mask = key_pos <= (idx + jnp.arange(T))[None, None, :, None]
            if offset is None:
                offset = idx            # positions continue past the cache
        else:
            mask = build_look_ahead_mask(T)
            mask = combine_masks(mask, build_padding_mask(
                tokens = tokens, pad_token = hp.pad_token))

        x = self.embed(params, tokens, offset = offset if offset is not None else 0)
        rel_bias = None
        if hp.use_relative_bias:
            k_len = caches[0]['k'].shape[1] if caches is not None else T
            rel_bias = self._relative_bias(
                params, T, k_len, bidirectional = False,
                offset = caches[0]['index'] if caches is not None else 0,
            )
        new_caches = []
        for i in range(hp.n_layers):
            cache_i = caches[i] if caches is not None else None
            x, new_cache = self.block(
                params['layer_{}'.format(i)], x, mask = mask, cache = cache_i,
                encoder_output = encoder_output, encoder_mask = encoder_mask,
                positions = positions, rel_bias = rel_bias, aux = aux,
            )
            new_caches.append(new_cache)
        if hp.use_final_norm:
            x = self._norm(params['final_norm'], x)
        return self.logits(params, x), (new_caches if caches is not None else None)

    def init_caches(self, batch, max_length, dtype = jnp.float32):
        hp = self.hp
        head_dim = hp.dim // hp.n_heads
        n_kv = hp.n_kv_heads or hp.n_heads
        return [init_kv_cache(batch, max_length, n_kv, head_dim, dtype)
                for _ in range(hp.n_layers)]

    def get_config(self):
        return self.hp.get_config()
