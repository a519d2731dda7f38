"""Fused Tacotron-2 decoder-step Pallas kernel (ops/decoder_kernel.py):
interpret-mode parity vs the XLA decoder_cell chain, and the chunked
`infer_fused` loop vs `infer`."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
from text_to_speech_tpu.ops.decoder_kernel import (
    pack_decoder_weights, decoder_steps, init_decoder_state)


def _has_tpu():
    # Opt-in only: under pytest the axon TPU plugin still registers a 'tpu'
    # platform even with JAX_PLATFORMS=cpu, and the tunnel allows ONE client
    # process — running TPU tests by default makes the suite contend with any
    # concurrent bench/serving process and blows the bounded CPU profile.
    import os
    if os.environ.get('TTS_TEST_TPU') != '1':
        return False
    try:
        return len(jax.devices('tpu')) > 0
    except RuntimeError:
        return False


def _setup(B = 2, S = 64, vocab = 40, seed = 0, **hp):
    arch = Tacotron2(vocab_size = vocab, ** hp)
    params, state = arch.init(jax.random.PRNGKey(seed))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, S), 1, vocab)
    return arch, params, state, tokens


def _kernel_inputs(arch, params, state, tokens):
    B, S = tokens.shape
    enc_out, mask, _ = arch.encode(params, state, tokens, train = False)
    memory, pm = arch.process_memory(params['decoder'], enc_out, mask)
    pad8 = lambda x: jnp.concatenate(
        [x, jnp.zeros((8 - B,) + x.shape[1:], x.dtype)], axis = 0)
    A = arch.hp.lsa_attention_dim
    mem_t = jnp.transpose(pad8(memory), (1, 0, 2)).astype(jnp.float32)
    pm_t = jnp.transpose(pad8(pm), (1, 0, 2)).reshape(S, 8 * A)
    mask_t = jnp.transpose(pad8(mask).astype(jnp.float32))
    enc_len = jnp.sum(pad8(mask).astype(jnp.int32), axis = 1)[None, :]
    return memory, pm, mask, mem_t, pm_t, mask_t, enc_len


def _tiny_hp(** extra):
    """Reduced dims for fast interpret-mode parity (full-size parity is the
    `slow` profile + the TPU class)."""
    hp = dict(
        n_mel_channels = 8, encoder_embedding_dim = 16, encoder_n_conv = 1,
        encoder_kernel_size = 3, prenet_sizes = (8, 8), lsa_attention_dim = 8,
        lsa_attention_filters = 4, lsa_attention_kernel_size = 31,
        attention_rnn_dim = 16, decoder_rnn_dim = 16, postnet_n_conv = 2,
        postnet_filters = 8, postnet_kernel_size = 3,
    )
    hp.update(extra)
    return hp


class TestInferFusedTiny:
    """Fast (not slow) interpret-mode parity at reduced dims — keeps the
    fused-decoder logic covered in the default CI profile."""

    def test_matches_infer(self):
        arch, params, state, tokens = _setup(
            2, 32, vocab = 24, ** _tiny_hp(max_decoder_steps = 16))
        ref = arch.infer(params, state, tokens, deterministic = True,
                         early_stopping = False, max_length = 16)
        got = arch.infer_fused(params, state, tokens, deterministic = True,
                               early_stopping = False, max_length = 16,
                               chunk = 8, interpret = True)
        assert float(jnp.abs(got.mel - ref.mel).max()) < 5e-4
        assert float(jnp.abs(got.stop_tokens - ref.stop_tokens).max()) < 5e-4

    def test_int8_lstm_close_to_fused(self):
        # int8 LSTM weights (the serving latency mode): per-output-channel
        # weight scales + per-row activation quant keep the AR decode within
        # ~1% of the unquantized fused path at this horizon
        arch, params, state, tokens = _setup(
            2, 32, vocab = 24, ** _tiny_hp(max_decoder_steps = 16))
        ref = arch.infer_fused(params, state, tokens, deterministic = True,
                               early_stopping = False, max_length = 16,
                               chunk = 8, interpret = True)
        got = arch.infer_fused(params, state, tokens, deterministic = True,
                               early_stopping = False, max_length = 16,
                               chunk = 8, interpret = True, int8_lstm = True)
        scale = float(jnp.abs(ref.mel).mean())
        assert float(jnp.abs(got.mel - ref.mel).max()) < 0.05 * scale
        assert float(jnp.abs(got.stop_tokens - ref.stop_tokens).max()) < 1e-2

    def test_short_memory(self):
        # S <= LOC_PAD (15): location-conv taps with no valid rows must be
        # skipped, not emitted as out-of-bound scratch slices (regression)
        arch, params, state, tokens = _setup(
            2, 8, vocab = 24, ** _tiny_hp(max_decoder_steps = 16))
        ref = arch.infer(params, state, tokens, deterministic = True,
                         early_stopping = False, max_length = 16)
        got = arch.infer_fused(params, state, tokens, deterministic = True,
                               early_stopping = False, max_length = 16,
                               chunk = 8, interpret = True)
        assert float(jnp.abs(got.mel - ref.mel).max()) < 5e-4

    def test_lengths_clamped_to_max_length(self):
        # max_length not divisible by chunk: reported lengths stay <= max
        arch, params, state, tokens = _setup(
            2, 32, vocab = 24, ** _tiny_hp(max_decoder_steps = 12))
        got = arch.infer_fused(params, state, tokens, deterministic = True,
                               early_stopping = False, max_length = 12,
                               chunk = 8, interpret = True)
        assert got.mel.shape[1] == 12
        assert int(jnp.max(got.lengths)) <= 12


@pytest.mark.slow
class TestDecoderStepsKernel:
    def test_matches_xla_chain(self):
        B, S, K = 2, 64, 4
        arch, params, state, tokens = _setup(B, S)
        memory, pm, mask, mem_t, pm_t, mask_t, enc_len = _kernel_inputs(
            arch, params, state, tokens)
        w = pack_decoder_weights(params['decoder'], dtype = jnp.float32)
        st = init_decoder_state(S, memory.shape[-1],
                                arch.hp.attention_rnn_dim, jnp.float32)
        extra = jnp.zeros((8, arch.hp.prenet_sizes[-1]), jnp.float32)
        steps, attn_t, _ = decoder_steps(
            w, mem_t, pm_t, mask_t, enc_len, extra, st,
            jnp.zeros((1,), jnp.int32),
            n_steps = K, deterministic = True, interpret = True)

        cell_state = arch.init_cell_state(B, S, jnp.float32)
        frame = jnp.zeros((B, 80))
        for t in range(K):
            pre = arch.prenet(params['decoder'], frame,
                              rng = jax.random.PRNGKey(0), deterministic = True)
            cell_out, aw, cell_state = arch.decoder_cell(
                params['decoder'], pre, memory, pm, mask, cell_state)
            frame, gate = arch._project(params['decoder'], cell_out)
            got = steps[t, :B]
            assert float(jnp.abs(got[:, :80] - frame).max()) < 1e-4
            assert float(jnp.abs(got[:, 80] - gate[:, 0]).max()) < 1e-4
            assert float(jnp.abs(attn_t[t, :, :B].T - aw).max()) < 1e-4
        # padding lanes of the recycled frame|gate vector must stay zero
        assert float(jnp.abs(steps[:, :, 81:]).max()) == 0.

    def test_state_carries_across_launches(self):
        B, S = 1, 32
        arch, params, state, tokens = _setup(B, S)
        memory, pm, mask, mem_t, pm_t, mask_t, enc_len = _kernel_inputs(
            arch, params, state, tokens)
        w = pack_decoder_weights(params['decoder'], dtype = jnp.float32)
        extra = jnp.zeros((8, arch.hp.prenet_sizes[-1]), jnp.float32)
        seed = jnp.zeros((1,), jnp.int32)

        st = init_decoder_state(S, memory.shape[-1],
                                arch.hp.attention_rnn_dim, jnp.float32)
        full, _, _ = decoder_steps(
            w, mem_t, pm_t, mask_t, enc_len, extra, st, seed,
            n_steps = 4, deterministic = True, interpret = True)

        st = init_decoder_state(S, memory.shape[-1],
                                arch.hp.attention_rnn_dim, jnp.float32)
        a, _, st = decoder_steps(
            w, mem_t, pm_t, mask_t, enc_len, extra, st, seed,
            n_steps = 2, deterministic = True, interpret = True)
        b, _, _ = decoder_steps(
            w, mem_t, pm_t, mask_t, enc_len, extra, st, seed,
            n_steps = 2, deterministic = True, interpret = True)
        chunked = jnp.concatenate([a, b], axis = 0)
        assert float(jnp.abs(full - chunked).max()) < 1e-5


@pytest.mark.slow
class TestInferFused:
    def test_matches_infer(self):
        arch, params, state, tokens = _setup(2, 64, max_decoder_steps = 32)
        ref = arch.infer(params, state, tokens, deterministic = True,
                         early_stopping = False, max_length = 32)
        got = arch.infer_fused(params, state, tokens, deterministic = True,
                               early_stopping = False, max_length = 32,
                               chunk = 16, interpret = True)
        assert float(jnp.abs(got.mel - ref.mel).max()) < 5e-4
        assert float(jnp.abs(got.decoder_output - ref.decoder_output).max()) < 5e-4
        assert float(jnp.abs(got.stop_tokens - ref.stop_tokens).max()) < 5e-4
        assert float(jnp.abs(
            got.attention_weights - ref.attention_weights).max()) < 5e-4

    def test_sliding_window_matches(self):
        arch, params, state, tokens = _setup(2, 64, max_decoder_steps = 32)
        kw = dict(deterministic = True, early_stopping = False,
                  max_length = 32, attn_mask_win_len = 16)
        ref = arch.infer(params, state, tokens, ** kw)
        got = arch.infer_fused(params, state, tokens, chunk = 16,
                               interpret = True, ** kw)
        assert float(jnp.abs(got.mel - ref.mel).max()) < 5e-4
        assert float(jnp.abs(
            got.attention_weights - ref.attention_weights).max()) < 5e-4

    def test_speaker_embedding_prenet_concat(self):
        arch = Tacotron2(vocab_size = 40, speaker_embedding_dim = 32,
                         speaker_concat_pos = ('end', 'prenet'),
                         max_decoder_steps = 16)
        params, state = arch.init(jax.random.PRNGKey(0))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 1, 40)
        spk = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
        kw = dict(speaker_embedding = spk, deterministic = True,
                  early_stopping = False, max_length = 16)
        ref = arch.infer(params, state, tokens, ** kw)
        got = arch.infer_fused(params, state, tokens, chunk = 8,
                               interpret = True, ** kw)
        assert float(jnp.abs(got.mel - ref.mel).max()) < 5e-4

    def test_early_stopping_prefix_consistent(self):
        # with early stopping the fused loop may overshoot to the chunk
        # boundary; the generated prefix must match the no-stop decode
        arch, params, state, tokens = _setup(1, 32, max_decoder_steps = 16)
        a = arch.infer_fused(params, state, tokens, deterministic = True,
                             early_stopping = True, max_length = 16,
                             chunk = 8, interpret = True)
        b = arch.infer_fused(params, state, tokens, deterministic = True,
                             early_stopping = False, max_length = 16,
                             chunk = 8, interpret = True)
        n = int(jnp.max(a.lengths))
        if n > 0:
            assert float(jnp.abs(a.decoder_output[:, :n]
                                 - b.decoder_output[:, :n]).max()) < 1e-5


@pytest.mark.tpu
@pytest.mark.skipif(not _has_tpu(), reason = "needs a TPU (set TTS_TEST_TPU=1)")
class TestInferFusedTPU:
    def test_matches_infer_full_size(self):
        # short horizon: with random weights the AR dynamics are chaotic, so
        # any reassociation difference (the kernel fuses [x|h]@[Wx;Wh] into
        # one matmul) amplifies exponentially with steps; 8 steps tests the
        # per-step math without measuring chaos growth
        arch, params, state, tokens = _setup(2, 64, vocab = 148,
                                             max_decoder_steps = 8)
        tpu = jax.devices('tpu')[0]
        params, state, tokens = jax.device_put((params, state, tokens), tpu)
        # true-f32 on both sides: the XLA default for f32 matmuls on TPU is
        # a single bf16 pass, which diverges autoregressively
        with jax.default_matmul_precision('highest'):
            ref = jax.jit(lambda p, s, t: arch.infer(
                p, s, t, deterministic = True, early_stopping = False,
                max_length = 8))(params, state, tokens)
            got = jax.jit(lambda p, s, t: arch.infer_fused(
                p, s, t, deterministic = True, early_stopping = False,
                max_length = 8, chunk = 8))(params, state, tokens)
        assert float(jnp.abs(got.mel - ref.mel).max()) < 2e-3
