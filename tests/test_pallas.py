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


def _make_block_inputs(B, T, C, S, L, seed = 0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    mk = lambda k, shape, s = 0.05: jax.random.normal(k, shape) * s
    return (mk(ks[0], (B, T, C), 0.3), mk(ks[1], (B, T, S), 0.3),
            mk(ks[2], (L, S, 2 * C)), mk(ks[3], (L, 2 * C)),
            mk(ks[4], (L, 3, C, 2 * C)), mk(ks[5], (L, 2 * C)),
            mk(ks[6], (max(L - 1, 1), C, 2 * C)), mk(ks[7], (max(L - 1, 1), 2 * C)),
            mk(ks[8], (C, C)), mk(ks[9], (C,)))


class TestFusedWNBlock:
    """Whole-coupling-block kernel semantics (CPU interpret mode: exact)."""

    @pytest.mark.parametrize('L,T,tile', [(2, 1024, 512), (8, 2048, 1024),
                                          (8, 2048, 512)])
    def test_matches_xla_chain(self, L, T, tile):
        from text_to_speech_tpu.ops.pallas_kernels import (
            fused_wn_block, wn_block_reference, wn_block_pad)
        args = _make_block_inputs(2, T, 128, 96, L)
        pad = wn_block_pad(L)
        xp = jnp.pad(args[0], ((0, 0), (pad, pad), (0, 0)))
        sp = jnp.pad(args[1], ((0, 0), (pad, pad), (0, 0)))
        out = fused_wn_block(xp, sp, * args[2:], tile = tile, seq_len = T,
                             interpret = True)
        ref = wn_block_reference(* args)
        assert float(jnp.abs(out - ref).max()) < 1e-5


@pytest.mark.skipif(not _has_tpu(), reason = 'needs a TPU')
class TestFusedWNBlockTPU:
    def test_matches_xla_chain_tpu(self):
        from text_to_speech_tpu.ops.pallas_kernels import (
            fused_wn_block, wn_block_reference, wn_block_pad)
        tpu = jax.devices('tpu')[0]
        args = jax.device_put(_make_block_inputs(2, 2048, 128, 128, 8), tpu)
        pad = wn_block_pad(8)
        xp = jnp.pad(args[0], ((0, 0), (pad, pad), (0, 0)))
        sp = jnp.pad(args[1], ((0, 0), (pad, pad), (0, 0)))
        out = fused_wn_block(xp, sp, * args[2:], tile = 1024, seq_len = 2048)
        with jax.default_matmul_precision('highest'):
            ref = jax.jit(wn_block_reference)(* args)
        assert float(jnp.abs(out - ref).max()) < 1e-4


class TestFastUpsample:
    def test_matches_conv_transpose(self):
        from text_to_speech_tpu.models.waveglow_arch import WaveGlow
        from text_to_speech_tpu.nn import layers as nn
        arch = WaveGlow()
        params = {'upsample': nn.init_conv1d_transpose(
            jax.random.PRNGKey(0), 1024, 80, 80)}
        mel = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 80))
        fast = arch.upsample_mel(params, mel)
        spect = nn.conv1d_transpose(params['upsample'], mel, stride = 256)
        spect = spect[:, :spect.shape[1] - 768, :]
        lg = spect.shape[1] // 8
        spect = spect.reshape(2, lg, 8, 80)
        slow = jnp.swapaxes(spect, 2, 3).reshape(2, lg, -1)
        assert fast.shape == slow.shape
        assert float(jnp.abs(fast - slow).max()) < 2e-5


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
