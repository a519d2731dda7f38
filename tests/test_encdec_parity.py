"""Encoder-decoder family parity vs HuggingFace torch (local random-init
models — no network): T5 (relative bias, rms norms), BART (post-norm,
position offset), Whisper (conv stem + sinusoidal positions)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from text_to_speech_tpu.models.transformers import from_hf_pretrained


def _np(t):
    return t.detach().numpy()


class TestT5Parity:
    def test_hidden_states(self):
        from transformers import T5Config, T5Model
        cfg = T5Config(vocab_size = 64, d_model = 32, d_kv = 8, d_ff = 64,
                       num_layers = 2, num_heads = 4,
                       relative_attention_num_buckets = 8)
        hf = T5Model(cfg).eval()
        model, params = from_hf_pretrained(hf, family = 't5')

        enc_tokens = np.array([[5, 9, 13, 2]], np.int64)
        dec_tokens = np.array([[1, 7, 3]], np.int64)
        with torch.no_grad():
            ref = hf(input_ids = torch.tensor(enc_tokens),
                     decoder_input_ids = torch.tensor(dec_tokens))
        enc_out, enc_mask = model.encode(params, jnp.asarray(enc_tokens, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(enc_out), _np(ref.encoder_last_hidden_state), atol = 5e-4)

        # decoder hidden states: compare through tied-embedding logits space
        logits, _ = model.decode(params, jnp.asarray(dec_tokens, jnp.int32),
                                 encoder_output = enc_out,
                                 encoder_mask = enc_mask)
        # hf T5Model returns last_hidden_state; project ours back
        hidden = np.asarray(logits) @ np.linalg.pinv(
            np.asarray(params['decoder']['embedding']['embeddings']).T)
        np.testing.assert_allclose(
            hidden, _np(ref.last_hidden_state), atol = 5e-3)


class TestBartParity:
    def test_hidden_states(self):
        from transformers import BartConfig, BartModel
        cfg = BartConfig(vocab_size = 64, d_model = 32, encoder_layers = 2,
                         decoder_layers = 2, encoder_attention_heads = 4,
                         decoder_attention_heads = 4, encoder_ffn_dim = 64,
                         decoder_ffn_dim = 64, max_position_embeddings = 64)
        hf = BartModel(cfg).eval()
        model, params = from_hf_pretrained(hf, family = 'bart')

        enc_tokens = np.array([[5, 9, 13, 2]], np.int64)
        dec_tokens = np.array([[2, 7, 3]], np.int64)
        with torch.no_grad():
            ref = hf(input_ids = torch.tensor(enc_tokens),
                     decoder_input_ids = torch.tensor(dec_tokens))
        enc_out, enc_mask = model.encode(params, jnp.asarray(enc_tokens, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(enc_out), _np(ref.encoder_last_hidden_state), atol = 5e-4)

        logits, _ = model.decode(params, jnp.asarray(dec_tokens, jnp.int32),
                                 encoder_output = enc_out, encoder_mask = enc_mask)
        hidden = np.asarray(logits) @ np.linalg.pinv(
            np.asarray(params['decoder']['embedding']['embeddings']).T)
        np.testing.assert_allclose(hidden, _np(ref.last_hidden_state), atol = 5e-3)


class TestWhisperParity:
    def test_encoder_and_decoder(self):
        from transformers import WhisperConfig, WhisperModel
        cfg = WhisperConfig(vocab_size = 64, d_model = 32, encoder_layers = 2,
                            decoder_layers = 2, encoder_attention_heads = 4,
                            decoder_attention_heads = 4, encoder_ffn_dim = 64,
                            decoder_ffn_dim = 64, num_mel_bins = 20,
                            max_source_positions = 50,
                            max_target_positions = 40,
                            pad_token_id = 0, bos_token_id = 1,
                            eos_token_id = 2, decoder_start_token_id = 1,
                            suppress_tokens = None,
                            begin_suppress_tokens = None)
        hf = WhisperModel(cfg).eval()
        model, params = from_hf_pretrained(hf, family = 'whisper')

        mel = np.random.RandomState(0).randn(1, 20, 100).astype(np.float32)
        dec_tokens = np.array([[1, 7, 3]], np.int64)
        with torch.no_grad():
            ref = hf(input_features = torch.tensor(mel),
                     decoder_input_ids = torch.tensor(dec_tokens))
        enc_out, _ = model.encode(params, jnp.asarray(mel.transpose(0, 2, 1)))
        np.testing.assert_allclose(
            np.asarray(enc_out), _np(ref.encoder_last_hidden_state), atol = 5e-4)

        logits, _ = model.decode(params, jnp.asarray(dec_tokens, jnp.int32),
                                 encoder_output = enc_out)
        hidden = np.asarray(logits) @ np.linalg.pinv(
            np.asarray(params['decoder']['embedding']['embeddings']).T)
        np.testing.assert_allclose(hidden, _np(ref.last_hidden_state), atol = 5e-3)


class TestEncDecGeneration:
    def test_beam_generation_runs(self):
        from transformers import T5Config, T5Model
        from text_to_speech_tpu.models.transformers import generate
        cfg = T5Config(vocab_size = 32, d_model = 16, d_kv = 4, d_ff = 32,
                       num_layers = 1, num_heads = 4,
                       relative_attention_num_buckets = 8)
        hf = T5Model(cfg).eval()
        model, params = from_hf_pretrained(hf, family = 't5')
        enc_out, enc_mask = model.encode(params, jnp.ones((1, 4), jnp.int32))
        out = generate(model, params, jnp.zeros((1, 1), jnp.int32),
                       max_new_tokens = 4, encoder_output = enc_out,
                       encoder_mask = enc_mask)
        assert out.tokens.shape == (1, 5)
