import numpy as np
import jax
import jax.numpy as jnp
import pytest

from text_to_speech_tpu.ops.pallas_kernels import fused_wn_layer, wn_layer_reference


def _has_tpu():
    try:
        return len(jax.devices('tpu')) > 0
    except RuntimeError:
        return False


def _make_inputs(B = 1, T = 1024, C = 128, seed = 0):
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (B, T, C)) * 0.3
    cond = jax.random.normal(key, (B, T, 2 * C)) * 0.3
    w_in = jax.random.normal(key, (3, C, 2 * C)) * 0.05
    b_in = jax.random.normal(key, (2 * C,)) * 0.05
    w_rs = jax.random.normal(key, (1, C, 2 * C)) * 0.05
    b_rs = jax.random.normal(key, (2 * C,)) * 0.05
    return x, cond, w_in, b_in, w_rs, b_rs


@pytest.mark.skipif(not _has_tpu(), reason = 'pallas TPU kernel needs a TPU')
class TestFusedWNLayerTPU:
    @pytest.mark.parametrize('dilation', [1, 4, 64])
    def test_matches_xla_reference(self, dilation):
        x, cond, w_in, b_in, w_rs, b_rs = _make_inputs()
        pad = -(-dilation // 16) * 16
        tpu = jax.devices('tpu')[0]
        args = jax.device_put((x, cond, w_in, b_in, w_rs, b_rs), tpu)
        x_pad = jnp.pad(args[0], ((0, 0), (pad, pad), (0, 0)))

        out_x, out_skip = fused_wn_layer(
            x_pad, * args[1:], dilation = dilation, pad = pad, tile = 512,
        )
        ref_x, ref_skip = wn_layer_reference(* args, dilation = dilation)
        assert float(jnp.abs(out_x - jax.device_put(ref_x, tpu)).max()) < 1e-5
        assert float(jnp.abs(out_skip - jax.device_put(ref_skip, tpu)).max()) < 1e-5

    def test_no_residual_last_layer(self):
        x, cond, w_in, b_in, _, _ = _make_inputs()
        C = x.shape[-1]
        key = jax.random.PRNGKey(1)
        w_rs = jax.random.normal(key, (1, C, C)) * 0.05     # last layer: skip only
        b_rs = jnp.zeros((C,))
        tpu = jax.devices('tpu')[0]
        args = jax.device_put((x, cond, w_in, b_in, w_rs, b_rs), tpu)
        x_pad = jnp.pad(args[0], ((0, 0), (16, 16), (0, 0)))
        out_x, out_skip = fused_wn_layer(
            x_pad, * args[1:], dilation = 2, pad = 16, residual = False,
        )
        _, ref_skip = wn_layer_reference(* args, dilation = 2, residual = False)
        assert float(jnp.abs(out_skip - jax.device_put(ref_skip, tpu)).max()) < 1e-5
        np.testing.assert_allclose(np.asarray(out_x), np.asarray(args[0]), atol = 1e-6)


@pytest.mark.skipif(not _has_tpu(), reason = 'needs a TPU')
class TestWaveGlowPallasPath:
    def test_arch_equivalence(self):
        from text_to_speech_tpu.models.waveglow_arch import WaveGlow
        tpu = jax.devices('tpu')[0]
        base = WaveGlow(n_flows = 1, wn_layers = 2, wn_channels = 128,
                        upsample_width = 32, upsample_stride = 16)
        pall = WaveGlow(n_flows = 1, wn_layers = 2, wn_channels = 128,
                        upsample_width = 32, upsample_stride = 16,
                        use_pallas = True)
        params = jax.device_put(base.init(jax.random.PRNGKey(0)), tpu)
        mel = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (1, 256, 80)), tpu)
        a1 = jax.jit(lambda p, m: base.infer(p, m, deterministic = True))(params, mel)
        a2 = jax.jit(lambda p, m: pall.infer(p, m, deterministic = True))(params, mel)
        assert float(jnp.abs(a1 - a2).max()) < 1e-5
