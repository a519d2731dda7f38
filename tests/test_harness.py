"""The reproducibility + jit-compatibility harness applied to the compute
front-ends (the reference exercises its analogs on exactly these surfaces:
STFT/mel goldens, graph-compiled text/audio ops)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from harness import assert_reproducible, assert_jit_compatible
from text_to_speech_tpu.ops.stft import TacotronSTFT


def _test_signal(seconds = 0.5, rate = 22050):
    t = np.arange(int(seconds * rate)) / rate
    return (0.5 * np.sin(2 * np.pi * 440. * t)
            + 0.2 * np.sin(2 * np.pi * 1320. * t)).astype(np.float32)


class TestReproducibility:
    def test_mel_front_end_reproducible(self):
        mel_fn = TacotronSTFT()
        mel = mel_fn.mel_spectrogram(jnp.asarray(_test_signal())[None])
        # bf16-free front end: tight budget catches precision regressions
        assert_reproducible(np.asarray(mel), 'mel-TacotronSTFT', max_err = 2e-4)

    def test_waveglow_upsample_reproducible(self):
        from text_to_speech_tpu.models.waveglow_arch import WaveGlow
        from text_to_speech_tpu.nn import layers as nn
        arch = WaveGlow()
        params = {'upsample': nn.init_conv1d_transpose(
            jax.random.PRNGKey(0), 1024, 80, 80)}
        mel = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 80))
        out = arch.upsample_mel(params, mel)
        assert_reproducible(np.asarray(out)[:, :512], 'waveglow-upsample',
                            max_err = 1e-5)


class TestJitCompatibility:
    def test_mel_jit_matches_eager(self):
        mel_fn = TacotronSTFT()
        audio = jnp.asarray(_test_signal())[None]
        assert_jit_compatible(
            lambda a: mel_fn.mel_spectrogram(a), audio, max_err = 1e-4)

    def test_wn_block_reference_jit(self):
        from text_to_speech_tpu.ops.pallas_kernels import wn_layer_reference
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, 64, 32)) * 0.3
        cond = jax.random.normal(key, (1, 64, 64)) * 0.3
        w_in = jax.random.normal(key, (3, 32, 64)) * 0.05
        w_rs = jax.random.normal(key, (1, 32, 64)) * 0.05
        assert_jit_compatible(
            lambda *a: wn_layer_reference(*a, dilation = 2),
            x, cond, w_in, jnp.zeros((64,)), w_rs, jnp.zeros((64,)),
            max_err = 1e-5)


# smoke tier: host-side/cheap-compile tests that gate every commit
# (<3 min cold on one core; see pytest.ini)
pytestmark = [pytest.mark.smoke]
