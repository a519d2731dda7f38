import numpy as np
import jax
import jax.numpy as jnp
import pytest

from text_to_speech_tpu.models.transformers import (
    Transformer, generate, from_hf_pretrained, gpt2_config, bert_config,
    build_padding_mask, build_look_ahead_mask,
)

KEY = jax.random.PRNGKey(0)

TINY = dict(vocab_size = 50, dim = 32, n_layers = 2, n_heads = 2,
            ffn_dim = 64, max_position = 64)


@pytest.fixture(scope = 'module')
def decoder():
    model = Transformer(** TINY, norm_first = True, positional = 'learned')
    params = model.init(jax.random.PRNGKey(1))
    return model, params


class TestTransformerStack:
    def test_encode_shapes(self):
        model = Transformer(** TINY, norm_first = False, use_token_type = True)
        params = model.init(KEY)
        tokens = jnp.ones((2, 7), jnp.int32)
        hidden, mask = model.encode(params, tokens)
        assert hidden.shape == (2, 7, 32)
        assert mask.shape == (2, 1, 1, 7)

    def test_decode_causal(self, decoder):
        """Causality: token t's logits must not depend on tokens > t."""
        model, params = decoder
        tokens = jnp.asarray([[1, 2, 3, 4]])
        logits1, _ = model.decode(params, tokens)
        tokens2 = tokens.at[0, 3].set(9)
        logits2, _ = model.decode(params, tokens2)
        np.testing.assert_allclose(np.asarray(logits1[0, :3]),
                                   np.asarray(logits2[0, :3]), atol = 1e-5)
        assert np.abs(np.asarray(logits1[0, 3] - logits2[0, 3])).max() > 1e-4

    def test_kv_cache_matches_full(self, decoder):
        """Incremental decode with cache == full forward."""
        model, params = decoder
        tokens = jnp.asarray([[1, 2, 3, 4, 5]])
        full_logits, _ = model.decode(params, tokens)

        caches = model.init_caches(1, 8)
        logits, caches = model.decode(params, tokens[:, :2], caches = caches)
        step_logits = [logits[:, -1]]
        for t in range(2, 5):
            logits, caches = model.decode(params, tokens[:, t: t + 1],
                                          caches = caches)
            step_logits.append(logits[:, -1])
        np.testing.assert_allclose(
            np.asarray(jnp.stack(step_logits, axis = 1)),
            np.asarray(full_logits[:, 1:]), atol = 1e-4,
        )

    def test_rope_variant(self):
        model = Transformer(** TINY, positional = 'rope', norm = 'rms',
                            gated_ffn = True, use_bias = False)
        params = model.init(KEY)
        logits, _ = model.decode(params, jnp.ones((1, 5), jnp.int32))
        assert logits.shape == (1, 5, 50)

    def test_masks(self):
        m = build_look_ahead_mask(4)
        assert not bool(m[0, 0, 0, 3])
        assert bool(m[0, 0, 3, 0])
        pm = build_padding_mask(lengths = jnp.asarray([2]), max_length = 4)
        assert pm[0, 0, 0].tolist() == [True, True, False, False]


class TestGeneration:
    def test_greedy_deterministic(self, decoder):
        model, params = decoder
        prompt = jnp.asarray([[1, 2]])
        out1 = generate(model, params, prompt, max_new_tokens = 6)
        out2 = generate(model, params, prompt, max_new_tokens = 6)
        np.testing.assert_array_equal(np.asarray(out1.tokens), np.asarray(out2.tokens))
        assert out1.tokens.shape == (1, 8)

    def test_greedy_matches_stepwise_argmax(self, decoder):
        model, params = decoder
        prompt = jnp.asarray([[1, 2, 3]])
        out = generate(model, params, prompt, max_new_tokens = 3)
        # manual: feed growing context without cache
        ctx = prompt
        for _ in range(3):
            logits, _ = model.decode(params, ctx)
            nxt = jnp.argmax(logits[:, -1], axis = -1)
            ctx = jnp.concatenate([ctx, nxt[:, None]], axis = 1)
        np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ctx))

    def test_sampling_with_rng(self, decoder):
        model, params = decoder
        prompt = jnp.asarray([[1, 2]])
        out1 = generate(model, params, prompt, max_new_tokens = 6,
                        method = 'sample', temperature = 2.0,
                        rng = jax.random.PRNGKey(1))
        out2 = generate(model, params, prompt, max_new_tokens = 6,
                        method = 'sample', temperature = 2.0,
                        rng = jax.random.PRNGKey(2))
        assert not np.array_equal(np.asarray(out1.tokens), np.asarray(out2.tokens))

    def test_eos_stops(self, decoder):
        model, params = decoder
        prompt = jnp.asarray([[1]])
        greedy = generate(model, params, prompt, max_new_tokens = 8)
        first = int(greedy.tokens[0, 1])
        out = generate(model, params, prompt, max_new_tokens = 8, eos_token = first)
        assert int(out.lengths[0]) <= 2 + 1

    def test_beam_search_runs(self, decoder):
        model, params = decoder
        prompt = jnp.asarray([[1, 2], [3, 4]])
        out = generate(model, params, prompt, max_new_tokens = 4,
                       method = 'beam', num_beams = 3)
        assert out.tokens.shape == (2, 6)
        assert np.isfinite(np.asarray(out.scores)).all()

    def test_beam_score_not_worse_than_greedy(self, decoder):
        model, params = decoder
        prompt = jnp.asarray([[1, 2]])
        greedy = generate(model, params, prompt, max_new_tokens = 4)
        beam = generate(model, params, prompt, max_new_tokens = 4,
                        method = 'beam', num_beams = 4)
        assert float(beam.scores[0]) >= float(greedy.scores[0]) - 1e-4


class TestHFParity:
    """Numeric parity of the weight importers against transformers models
    (random-init from config — no network needed)."""

    def test_gpt2_logits_parity(self):
        import torch
        from transformers import GPT2Config, GPT2LMHeadModel

        cfg = GPT2Config(vocab_size = 64, n_positions = 32, n_embd = 32,
                         n_layer = 2, n_head = 2)
        hf = GPT2LMHeadModel(cfg).eval()
        model, params = from_hf_pretrained(hf, family = 'gpt2')

        tokens = np.array([[5, 9, 13, 2, 7]], dtype = np.int64)
        with torch.no_grad():
            ref = hf(torch.tensor(tokens)).logits.numpy()
        mine, _ = model.decode(params, jnp.asarray(tokens, jnp.int32))
        np.testing.assert_allclose(np.asarray(mine), ref, atol = 2e-4)

    def test_bert_hidden_parity(self):
        import torch
        from transformers import BertConfig, BertModel

        cfg = BertConfig(vocab_size = 64, hidden_size = 32, num_hidden_layers = 2,
                         num_attention_heads = 2, intermediate_size = 64,
                         max_position_embeddings = 32)
        hf = BertModel(cfg).eval()
        model = Transformer(** bert_config(cfg))
        from text_to_speech_tpu.models.transformers import convert_bert_state_dict
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params = jax.tree_util.tree_map(jnp.asarray, convert_bert_state_dict(sd))

        tokens = np.array([[5, 9, 13, 2]], dtype = np.int64)
        with torch.no_grad():
            ref = hf(torch.tensor(tokens)).last_hidden_state.numpy()
        mine, _ = model.encode(params, jnp.asarray(tokens, jnp.int32))
        np.testing.assert_allclose(np.asarray(mine), ref, atol = 2e-4)


class TestMixtralMoE:
    """Sparse-MoE FFN (Mixtral family): HF numeric parity, expert-parallel
    sharding parity, generation, load-balancing loss."""

    MOE = dict(vocab_size = 50, dim = 32, n_layers = 2, n_heads = 2,
               ffn_dim = 64, max_position = 64, n_experts = 4,
               n_experts_per_token = 2, gated_ffn = True, norm = 'rms',
               positional = 'rope', use_bias = False, tie_embeddings = False,
               ffn_activation = 'silu')

    def test_mixtral_hf_parity(self):
        import torch
        from transformers import MixtralConfig, MixtralForCausalLM

        cfg = MixtralConfig(
            vocab_size = 64, hidden_size = 32, intermediate_size = 64,
            num_hidden_layers = 2, num_attention_heads = 2,
            num_key_value_heads = 2, num_local_experts = 4,
            num_experts_per_tok = 2, max_position_embeddings = 64,
        )
        hf = MixtralForCausalLM(cfg).eval()
        model, params = from_hf_pretrained(hf, family = 'mixtral')
        assert model.hp.n_experts == 4

        tokens = np.array([[5, 9, 13, 2, 7]], dtype = np.int64)
        with torch.no_grad():
            ref = hf(torch.tensor(tokens)).logits.numpy()
        mine, _ = model.decode(params, jnp.asarray(tokens, jnp.int32))
        np.testing.assert_allclose(np.asarray(mine), ref, atol = 3e-4)

    def test_ep_sharding_parity(self):
        """Expert tensors sharded over an ep mesh axis: XLA computes local
        experts + psum; logits must match single-device."""
        from text_to_speech_tpu.parallel import (
            create_mesh, get_devices, shard_params, moe_param_specs)

        model = Transformer(** self.MOE)
        params = model.init(jax.random.PRNGKey(3))
        tokens = jnp.asarray([[5, 9, 13, 2], [3, 1, 4, 1]], jnp.int32)

        run = jax.jit(lambda p, t: model.decode(p, t)[0])
        ref = run(params, tokens)

        devices = get_devices('cpu')
        mesh = create_mesh({'dp': 2, 'ep': 4}, devices = devices[:8])
        specs = moe_param_specs(params, axis = 'ep')
        flat = jax.tree_util.tree_flatten_with_path(specs)[0]
        n_sharded = sum(1 for _, s in flat if s != jax.sharding.PartitionSpec())
        assert n_sharded == 2 * 3        # 2 layers x gate/up/down
        out = run(shard_params(params, mesh, specs),
                  jax.device_put(tokens, jax.sharding.NamedSharding(
                      mesh, jax.sharding.PartitionSpec('dp'))))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol = 1e-5)

    def test_generation_with_moe(self):
        model = Transformer(** self.MOE)
        params = model.init(jax.random.PRNGKey(4))
        out = generate(model, params, jnp.asarray([[5, 9]], jnp.int32),
                       max_new_tokens = 4)
        assert out.tokens.shape[1] == 6

    def test_load_balancing_loss(self):
        from text_to_speech_tpu.models.transformers import moe_load_balancing_loss
        model = Transformer(** self.MOE)
        params = model.init(jax.random.PRNGKey(5))
        aux = []
        model.decode(params, jnp.asarray([[5, 9, 13, 2]], jnp.int32), aux = aux)
        assert len(aux) == 2
        loss = float(moe_load_balancing_loss(aux, 4, 2))
        assert np.isfinite(loss) and loss >= 1.0 - 1e-4

    def test_top1_routing_selects_single_expert(self):
        """k=1: output must equal the argmax expert's FFN exactly."""
        model = Transformer(** {** self.MOE, 'n_layers': 1,
                                'n_experts_per_token': 1})
        params = model.init(jax.random.PRNGKey(6))
        x = jax.random.normal(jax.random.PRNGKey(7), (1, 3, 32))
        ffn = params['layer_0']['ffn']
        out = model._moe_ffn(ffn, x)

        logits = x @ ffn['router']['kernel']
        idx = np.asarray(jnp.argmax(logits, -1))[0]
        we = ffn['experts']
        for t in range(3):
            e = idx[t]
            g = jax.nn.silu(x[0, t] @ we['gate']['kernel'][e])
            u = x[0, t] @ we['up']['kernel'][e]
            y = (g * u) @ we['down']['kernel'][e]
            np.testing.assert_allclose(np.asarray(out[0, t]), np.asarray(y),
                                       atol = 1e-5)

    def test_mistral_hf_parity(self):
        """Mistral (GQA + rotate_half RoPE): converter layout verified
        numerically — including the per-head RoPE column interleave."""
        import torch
        from transformers import MistralConfig, MistralForCausalLM

        cfg = MistralConfig(
            vocab_size = 64, hidden_size = 32, intermediate_size = 64,
            num_hidden_layers = 2, num_attention_heads = 4,
            num_key_value_heads = 2, max_position_embeddings = 64,
        )
        hf = MistralForCausalLM(cfg).eval()
        model, params = from_hf_pretrained(hf, family = 'mistral')

        tokens = np.array([[5, 9, 13, 2, 7, 11]], dtype = np.int64)
        with torch.no_grad():
            ref = hf(torch.tensor(tokens)).logits.numpy()
        mine, _ = model.decode(params, jnp.asarray(tokens, jnp.int32))
        np.testing.assert_allclose(np.asarray(mine), ref, atol = 3e-4)

    def test_llama_hf_parity(self):
        """Llama rides the mistral layout (family alias); verified at the
        logits level including tied embeddings."""
        import torch
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig(
            vocab_size = 64, hidden_size = 32, intermediate_size = 64,
            num_hidden_layers = 2, num_attention_heads = 4,
            num_key_value_heads = 4, max_position_embeddings = 64,
            rope_theta = 500000.0,
        )
        hf = LlamaForCausalLM(cfg).eval()
        model, params = from_hf_pretrained(hf, family = 'llama')
        assert model.hp.rope_theta == 500000.0

        tokens = np.array([[5, 9, 13, 2, 7]], dtype = np.int64)
        with torch.no_grad():
            ref = hf(torch.tensor(tokens)).logits.numpy()
        mine, _ = model.decode(params, jnp.asarray(tokens, jnp.int32))
        np.testing.assert_allclose(np.asarray(mine), ref, atol = 3e-4)


class TestProcessLogits:
    def test_length_temperature_and_filter(self):
        import jax.numpy as jnp
        from text_to_speech_tpu.models.transformers.generation_utils import process_logits

        logits = jnp.array([[1., 2., 3.], [3., 2., 1.]])
        # positive length temperature scales rows by (len+1)**t
        out = process_logits(logits, lengths = jnp.array([1, 3]),
                             length_temperature = 1.0)
        assert jnp.allclose(out[0], logits[0] * 2.)
        assert jnp.allclose(out[1], logits[1] * 4.)

        # list filter masks token ids
        out = process_logits(logits, logits_filter = [0])
        assert bool(jnp.isneginf(out[:, 0]).all()) and bool(jnp.isfinite(out[:, 1:]).all())

        # callable filter applies verbatim
        out = process_logits(logits, logits_filter = lambda l: l * 0.)
        assert float(out.sum()) == 0.


class TestBertHeads:
    """BERT task heads (MLM/Classifier/NSP/QA/DPR — the reference's
    bert_arch.py:43-199 surface): HF numeric parity with offline
    random-weight torch models."""

    CFG = dict(vocab_size = 64, hidden_size = 32, num_hidden_layers = 2,
               num_attention_heads = 2, intermediate_size = 64,
               max_position_embeddings = 32)
    TOKENS = np.array([[5, 9, 13, 2], [7, 3, 1, 8]], dtype = np.int64)

    def _encode(self, model, params):
        return model.encode(params, jnp.asarray(self.TOKENS, jnp.int32))

    def test_mlm_parity(self):
        import torch
        from transformers import BertConfig, BertForMaskedLM
        from text_to_speech_tpu.models.transformers import (
            bert_config, convert_bert_mlm_state_dict, mlm_logits)

        hf = BertForMaskedLM(BertConfig(** self.CFG)).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params, head = convert_bert_mlm_state_dict(sd)
        params, head = jax.tree_util.tree_map(jnp.asarray, (params, head))
        model = Transformer(** bert_config(hf.config))

        hidden, _ = self._encode(model, params)
        mine = mlm_logits(params, head, hidden)
        with torch.no_grad():
            ref = hf(torch.tensor(self.TOKENS)).logits.numpy()
        np.testing.assert_allclose(np.asarray(mine), ref, atol = 3e-4)

    def test_classifier_parity(self):
        import torch
        from transformers import BertConfig, BertForSequenceClassification
        from text_to_speech_tpu.models.transformers import (
            bert_config, convert_bert_classifier_state_dict, classify)

        hf = BertForSequenceClassification(
            BertConfig(num_labels = 3, ** self.CFG)).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params, head = convert_bert_classifier_state_dict(sd)
        params, head = jax.tree_util.tree_map(jnp.asarray, (params, head))
        model = Transformer(** bert_config(hf.config))

        hidden, _ = self._encode(model, params)
        mine = classify(head, hidden)
        with torch.no_grad():
            ref = hf(torch.tensor(self.TOKENS)).logits.numpy()
        np.testing.assert_allclose(np.asarray(mine), ref, atol = 2e-4)

    def test_nsp_parity(self):
        import torch
        from transformers import BertConfig, BertForNextSentencePrediction
        from text_to_speech_tpu.models.transformers import (
            bert_config, convert_bert_classifier_state_dict, classify)

        hf = BertForNextSentencePrediction(BertConfig(** self.CFG)).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params, head = convert_bert_classifier_state_dict(sd)
        params, head = jax.tree_util.tree_map(jnp.asarray, (params, head))
        model = Transformer(** bert_config(hf.config))

        hidden, _ = self._encode(model, params)
        mine = classify(head, hidden)
        assert mine.shape == (2, 2)
        with torch.no_grad():
            ref = hf(torch.tensor(self.TOKENS)).logits.numpy()
        np.testing.assert_allclose(np.asarray(mine), ref, atol = 2e-4)

    def test_qa_parity(self):
        import torch
        from transformers import BertConfig, BertForQuestionAnswering
        from text_to_speech_tpu.models.transformers import (
            bert_config, convert_bert_qa_state_dict, qa_spans)

        hf = BertForQuestionAnswering(BertConfig(num_labels = 2, ** self.CFG)).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params, head = convert_bert_qa_state_dict(sd)
        params, head = jax.tree_util.tree_map(jnp.asarray, (params, head))
        model = Transformer(** bert_config(hf.config))

        hidden, mask = self._encode(model, params)
        start, end = qa_spans(head, hidden, mask)
        with torch.no_grad():
            out = hf(torch.tensor(self.TOKENS))
            ref_start = torch.softmax(out.start_logits, dim = 1).numpy()
            ref_end = torch.softmax(out.end_logits, dim = 1).numpy()
        np.testing.assert_allclose(np.asarray(start), ref_start, atol = 2e-4)
        np.testing.assert_allclose(np.asarray(end), ref_end, atol = 2e-4)
        # probabilities over the sequence axis
        np.testing.assert_allclose(np.asarray(start).sum(-1), 1., atol = 1e-5)

    def test_dpr_parity(self):
        import torch
        from transformers import DPRConfig, DPRQuestionEncoder
        from text_to_speech_tpu.models.transformers import (
            bert_config, convert_dpr_state_dict, embed_sentences)

        cfg = DPRConfig(projection_dim = 0, ** self.CFG)
        hf = DPRQuestionEncoder(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params, head = convert_dpr_state_dict(sd)
        params, head = jax.tree_util.tree_map(jnp.asarray, (params, head))
        model = Transformer(** bert_config(vocab_size = cfg.vocab_size,
                                           dim = cfg.hidden_size,
                                           n_layers = cfg.num_hidden_layers,
                                           n_heads = cfg.num_attention_heads,
                                           ffn_dim = cfg.intermediate_size,
                                           max_position = cfg.max_position_embeddings))

        hidden, mask = self._encode(model, params)
        mine = embed_sentences(head, hidden, mask, mode = 'first',
                               normalize = False)
        with torch.no_grad():
            ref = hf(torch.tensor(self.TOKENS)).pooler_output.numpy()
        np.testing.assert_allclose(np.asarray(mine), ref, atol = 2e-4)

    def test_mean_pooled_embeddings_masked(self):
        from text_to_speech_tpu.models.transformers import (
            init_embedding_head, embed_sentences)
        key = jax.random.PRNGKey(0)
        hidden = jax.random.normal(key, (2, 4, 8))
        mask = jnp.array([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.float32)
        head = init_embedding_head(key, 8, 5)
        out = embed_sentences(head, hidden, mask, mode = 'mean')
        assert out.shape == (2, 5)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis = -1),
                                   1., atol = 1e-5)
        # masked positions do not contribute
        hidden2 = hidden.at[0, 2:].set(99.)
        out2 = embed_sentences(head, hidden2, mask, mode = 'mean')
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]),
                                   atol = 1e-6)

    def test_init_shapes(self):
        from text_to_speech_tpu.models.transformers import (
            init_mlm_head, init_classifier_head, init_qa_head, mlm_logits,
            classify, qa_spans)
        key = jax.random.PRNGKey(1)
        dim, vocab = 16, 32
        params = {'embedding': {'embeddings': jax.random.normal(key, (vocab, dim))}}
        hidden = jax.random.normal(key, (3, 5, dim))
        assert mlm_logits(params, init_mlm_head(key, dim, vocab), hidden).shape \
            == (3, 5, vocab)
        assert classify(init_classifier_head(key, dim, 7), hidden).shape == (3, 7)
        s, e = qa_spans(init_qa_head(key, dim), hidden)
        assert s.shape == (3, 5) and e.shape == (3, 5)
