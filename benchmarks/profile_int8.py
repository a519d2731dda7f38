"""Itemize where int8 WaveGlow serving time goes at the bench design point
(B=32, F=256 → T=8192 grouped steps), to attack the 178x → ≥200x gap.

Components timed separately:
  1. full int8 infer (the bench configuration)        → baseline
  2. upsample_mel alone
  3. infer with the Pallas block stubbed to zeros     → non-kernel time
  4. kernel-only: 12 sequential fused_wn_block_int8   → kernel share
  5. kernel tile/chunk sweep around the design point

Usage: python benchmarks/profile_int8.py [--batch 32] [--frames 256] [--iters 4]
"""

import os
import sys
import time
import json
import argparse

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x))


def timeit(fn, iters, *args):
    import jax
    out = fn(*args)
    sync(out)                        # compile + warm
    for _ in range(2):
        out = fn(*args)
    sync(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - start) / iters


def main():
    import _cache
    _cache.enable()
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type = int, default = 32)
    parser.add_argument('--frames', type = int, default = 256)
    parser.add_argument('--iters', type = int, default = 4)
    parser.add_argument('--sweep', action = 'store_true')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from text_to_speech_tpu.models.waveglow_arch import WaveGlow
    from text_to_speech_tpu.ops import pallas_kernels as pk

    B, F = args.batch, args.frames
    T = F * 256 // 8
    audio_s = B * F * 256 / 22050.
    results = {}

    arch = WaveGlow(use_pallas = True)
    # all setup on CPU (eager ops over the axon tunnel pay ~30ms each —
    # hundreds of init/pack/quantize ops would take many minutes), then one
    # bulk device_put
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        raw = arch.fuse_params(arch.init(jax.random.PRNGKey(0)))
        key = jax.random.PRNGKey(7)
        for name, v in raw.items():
            if name.startswith('flow_'):
                key, sub = jax.random.split(key)
                end = v['block']['end']
                v['block']['end'] = {
                    'kernel': 0.02 * jax.random.normal(sub, end['kernel'].shape),
                    'bias': end['bias']}
        params = arch.quantize_pallas_params(arch.pack_pallas_params(raw))
        mel = jax.random.normal(jax.random.PRNGKey(1), (B, F, 80)) * 2. - 6.
    tpu = jax.devices()[0]
    params = jax.device_put(params, tpu)
    mel = jax.device_put(mel, tpu)
    rng = jax.random.PRNGKey(2)
    print('setup done', flush = True)

    # 1. baseline
    infer = jax.jit(lambda p, m, r: arch.infer(p, m, rng = r, dtype = jnp.bfloat16))
    t = timeit(infer, args.iters, params, mel, rng)
    results['full_infer_s'] = t
    results['full_rtf'] = audio_s / t
    print('full int8 infer: {:.4f}s  ({:.1f}x RT)'.format(t, audio_s / t), flush = True)

    # 2. upsample only (bf16 like the timed path casts it)
    def up_fn(p, m):
        k = {'upsample': jax.tree_util.tree_map(
            lambda leaf: leaf.astype(jnp.bfloat16), p['upsample'])}
        return arch.upsample_mel(k, m.astype(jnp.bfloat16))
    up = jax.jit(up_fn)
    t = timeit(up, args.iters, params, mel)
    results['upsample_s'] = t
    print('upsample_mel:    {:.4f}s'.format(t), flush = True)

    # 3. kernel stubbed -> non-kernel time
    real_kernel = pk.fused_wn_block_int8
    def stub(x_padded, spect_padded, quant, *, tile, seq_len, chunk = None,
             interpret = False):
        C = quant['w_in'].shape[2]
        return jnp.zeros((x_padded.shape[0], seq_len, C), x_padded.dtype)
    pk.fused_wn_block_int8 = stub
    try:
        infer_stub = jax.jit(
            lambda p, m, r: arch.infer(p, m, rng = r, dtype = jnp.bfloat16))
        t = timeit(infer_stub, args.iters, params, mel, rng)
    finally:
        pk.fused_wn_block_int8 = real_kernel
    results['nonkernel_s'] = t
    print('kernel stubbed:  {:.4f}s  (non-kernel share {:.0f}%)'.format(
        t, 100 * t / results['full_infer_s']), flush = True)

    # 4. kernel-only: 12 launches at the serving shape
    pad = pk.wn_block_pad_int8(8)
    with jax.default_device(cpu):
        x = jax.random.normal(jax.random.PRNGKey(3), (B, T + 2 * pad, 512),
                              dtype = jnp.bfloat16) * 0.3
        spect = jax.random.normal(jax.random.PRNGKey(4), (B, T + 2 * pad, 640),
                                  dtype = jnp.bfloat16) * 0.3
    x, spect = jax.device_put((x, spect), tpu)
    quant = params['flow_0']['block']['packed_q']

    def k12(x, spect, quant, tile, chunk):
        out = x[:, pad: pad + T, :]
        for _ in range(12):
            out = pk.fused_wn_block_int8(
                jnp.pad(out, ((0, 0), (pad, pad), (0, 0))) if False else x,
                spect, quant, tile = tile, seq_len = T, chunk = chunk)
        return out

    for tile, chunk in ([(4096, 512)] if not args.sweep else
                        [(4096, 512), (4096, 256), (2048, 512), (8192, 512),
                         (8192, 256), (4096, 1024)]):
        if T % tile:
            continue
        try:
            fn = jax.jit(lambda x, s, q, tile = tile, chunk = chunk:
                         k12(x, s, q, tile, chunk))
            t = timeit(fn, args.iters, x, spect, quant)
            results['kernel12_t{}_c{}_s'.format(tile, chunk)] = t
            print('kernel x12 tile={} chunk={}: {:.4f}s ({:.1f}x RT-equiv, '
                  '{:.0f}% of full)'.format(
                      tile, chunk, t, audio_s / t,
                      100 * t / results['full_infer_s']), flush = True)
        except Exception as e:
            print('kernel x12 tile={} chunk={}: FAILED {}'.format(
                tile, chunk, str(e)[:200]), flush = True)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
