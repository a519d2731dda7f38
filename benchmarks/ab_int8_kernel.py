"""A/B the int8 WN-block kernel optimizations at the serving design point:
bias fold + per-layer edge zeroing (now default) with the chunk loop as
fori_loop vs statically unrolled.  Chained 12-launch timing (no CSE).
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
    import _cache
    _cache.enable()
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
    print('setup done', flush = True)

    def k12(x, spect, quant, chunk, unroll, probe = False):
        # tile = T: the halo-free single-tile serving mode (what
        # waveglow_arch's serving path selects at the bench shape)
        for _ in range(12):
            out = pk.fused_wn_block_int8(x, spect, quant, tile = T,
                                         seq_len = T, chunk = chunk,
                                         unroll = unroll,
                                         aligned_probe = probe)
            x = jax.lax.dynamic_update_slice(
                x, out.astype(x.dtype), (0, pad, 0))
        return x

    # configs: name -> (chunk, unroll, aligned_probe); select via
    # SWEEP_CONFIGS="fori_c512,unroll_c2048" (default keeps the historical A/B)
    all_configs = {
        'fori_c512': (512, False, False),
        'fori_c1024': (1024, False, False),
        'fori_c2048': (2048, False, False),
        'aligned_probe': (512, False, True),
        'unroll_c1024': (1024, True, False),
        'unroll_c2048': (2048, True, False),
        'unroll_c4096': (4096, True, False),
    }
    selected = os.environ.get('SWEEP_CONFIGS', 'fori_c512,aligned_probe')
    names = [n for n in selected.split(',') if n]
    unknown = [n for n in names if n not in all_configs]
    if unknown:
        raise ValueError('unknown SWEEP_CONFIGS {} (known: {})'.format(
            unknown, sorted(all_configs)))
    configs = [(name, * all_configs[name]) for name in names]

    results = {}
    for label, chunk, unroll, probe in configs:
        try:
            fn = jax.jit(lambda x, s, q, c = chunk, u = unroll, pr = probe:
                         jnp.sum(k12(x, s, q, c, u, pr)))
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
            print('{}: {:.4f}s/12  ({:.2f}ms/launch)'.format(
                label, t, t * 1000 / 12), flush = True)
        except Exception as e:
            print('{}: FAILED {}'.format(label, str(e)[:160]), flush = True)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
