"""Chunk-size sweep for the int8 WN-block kernel at the serving design point
(tile=4096, ext=4608): chunk in {512, 768, 1536, 2304, 4608} all divide ext,
but only 512 was ever benchmarked (the auto-picker tries 512,256,...).

Chains the 12 launches through dynamic_update_slice so XLA cannot CSE them.
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
    print('setup done', flush = True)

    def k12(x, spect, quant, tile, chunk):
        for _ in range(12):
            out = pk.fused_wn_block_int8(x, spect, quant, tile = tile,
                                         seq_len = T, chunk = chunk)
            # chain: next launch consumes this one's output (defeats CSE,
            # matches the real flow-to-flow dependency)
            x = jax.lax.dynamic_update_slice(
                x, out.astype(x.dtype), (0, pad, 0))
        return x

    results = {}
    configs = [(4096, 512), (4096, 768), (4096, 1536),
               (4096, 2304), (4096, 4608), (2048, 2560),
               (4096, 576), (4096, 1152)]
    if os.environ.get('SWEEP_SINGLE_TILE'):
        # single-tile mode (tile == T): halo = 0, ext = T — the bench's
        # actual serving design point; the auto-picker always lands on 512
        configs = [(T, int(c)) for c in os.environ.get(
            'SWEEP_CHUNKS', '512,1024,2048').split(',')]
    for tile, chunk in configs:
        ext = tile + (0 if tile == T else 2 * 256)
        if T % tile or ext % chunk or chunk % 32:
            print('skip tile={} chunk={}'.format(tile, chunk), flush = True)
            continue
        try:
            fn = jax.jit(lambda x, s, q, tile = tile, chunk = chunk:
                         jnp.sum(k12(x, s, q, tile, chunk)))
            float(fn(x, spect, quant))
            for _ in range(2):
                out = fn(x, spect, quant)
            float(out)
            start = time.perf_counter()
            for _ in range(ITERS):
                out = fn(x, spect, quant)
            float(out)
            t = (time.perf_counter() - start) / ITERS
            results['t{}_c{}'.format(tile, chunk)] = t
            print('tile={} chunk={}: {:.4f}s/12-launch  ({:.2f}ms/launch)'
                  .format(tile, chunk, t, t * 1000 / 12), flush = True)
        except Exception as e:
            print('tile={} chunk={}: FAILED {}'.format(
                tile, chunk, str(e)[:160]), flush = True)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
