"""Sweep int8 WN-block kernel variants at the SERVING config (single-tile
mode, tile = T = 8192, halo-free) to attack the VPU-serialization gap:
profile_int8.py shows non-kernel time is only ~3%, the kernel runs at ~71%
of the int8 MXU ceiling, and the missing ~0.115 s/iter matches the
quant/dequant/transcendental VPU tail — so the levers are MXU/VPU overlap
(static unroll) and VPU-op reduction (static gate scale).

Chained 12-launch timing (each launch consumes the previous output, no CSE).
"""

import os
import sys
import time
import json

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

B = int(os.environ.get('SWEEP_B', 32))
T = int(os.environ.get('SWEEP_T', 8192))
ITERS = int(os.environ.get('SWEEP_ITERS', 4))


def main():
    import jax
    import jax.numpy as jnp
    from text_to_speech_tpu.ops import pallas_kernels as pk

    cpu = jax.devices('cpu')[0]
    tpu = jax.devices()[0]
    pad = pk.wn_block_pad_int8(8)

    with jax.default_device(cpu):
        x = jax.random.normal(jax.random.PRNGKey(3), (B, T + 2 * pad, 512),
                              dtype = jnp.bfloat16) * 0.3
        spect = jax.random.normal(jax.random.PRNGKey(4), (B, T + 2 * pad, 640),
                                  dtype = jnp.bfloat16) * 0.3
        packed = {
            'w_cond': jax.random.normal(jax.random.PRNGKey(5), (8, 640, 1024)) * 0.05,
            'b_cond': jax.random.normal(jax.random.PRNGKey(6), (8, 1024)) * 0.05,
            'w_in': jax.random.normal(jax.random.PRNGKey(7), (8, 3, 512, 1024)) * 0.05,
            'b_in': jax.random.normal(jax.random.PRNGKey(8), (8, 1024)) * 0.05,
            'w_rs': jax.random.normal(jax.random.PRNGKey(9), (7, 512, 1024)) * 0.05,
            'b_rs': jax.random.normal(jax.random.PRNGKey(10), (7, 1024)) * 0.05,
            'w_rs_last': jax.random.normal(jax.random.PRNGKey(11), (512, 512)) * 0.05,
            'b_rs_last': jax.random.normal(jax.random.PRNGKey(12), (512,)) * 0.05,
        }
        quant = jax.tree_util.tree_map(jnp.asarray, pk.quantize_wn_weights(packed))
    x, spect, quant = jax.device_put((x, spect, quant), tpu)
    audio_equiv_s = ITERS * B * T * 8 / 22050.
    print('setup done', flush = True)

    def k12(x, spect, quant, tile, chunk, unroll, sgs):
        for _ in range(12):
            out = pk.fused_wn_block_int8(x, spect, quant, tile = tile,
                                         seq_len = T, chunk = chunk,
                                         unroll = unroll,
                                         static_gate_scale = sgs)
            x = jax.lax.dynamic_update_slice(
                x, out.astype(x.dtype), (0, pad, 0))
        return x

    results = {}
    variants = [
        # label                tile  chunk unroll static_gate
        ('single_fori_c512',   T,    512,  False, False),   # serving today
        ('single_fori_sgs',    T,    512,  False, True),
        ('single_unroll_c512', T,    512,  True,  False),
        ('single_unroll_sgs',  T,    512,  True,  True),
        ('single_fori_c1024',  T,    1024, False, False),
        ('single_sgs_c1024',   T,    1024, False, True),
    ]
    only = os.environ.get('SWEEP_VARIANTS')
    if only:
        wanted = only.split(',')
        variants = [v for v in variants if v[0] in wanted]
    for label, tile, chunk, unroll, sgs in variants:
        try:
            fn = jax.jit(
                lambda x, s, q, t = tile, c = chunk, u = unroll, g = sgs:
                jnp.sum(k12(x, s, q, t, c, u, g)))
            float(fn(x, spect, quant))
            for _ in range(2):
                out = fn(x, spect, quant)
            float(out)
            start = time.perf_counter()
            for _ in range(ITERS):
                out = fn(x, spect, quant)
            float(out)
            t = (time.perf_counter() - start) / ITERS
            results[label] = t
            print('{}: {:.4f}s/12launch  ({:.2f}ms/launch, {:.1f}x RT-equiv)'
                  .format(label, t, t * 1000 / 12,
                          audio_equiv_s / (ITERS * t)), flush = True)
        except Exception as e:
            print('{}: FAILED {}'.format(label, str(e)[:200]), flush = True)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
