"""WaveGlow vocoder real-time factor (one chip).

Usage: python benchmarks/waveglow_rtf.py [--batch 32] [--frames 256]
       [--iters 6] [--dtype bfloat16|float32] [--pallas]

Note (axon tunnel): run ONE TPU process at a time; timing is synchronized by
a scalar device→host transfer (block_until_ready can silently no-op).
"""

import os
import sys
import time
import argparse

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))


def main():
    import _cache
    _cache.enable()
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type = int, default = 32)
    parser.add_argument('--frames', type = int, default = 256)
    parser.add_argument('--iters', type = int, default = 6)
    parser.add_argument('--dtype', default = 'bfloat16')
    parser.add_argument('--pallas', action = 'store_true')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from text_to_speech_tpu.models.waveglow_arch import WaveGlow

    arch = WaveGlow(use_pallas = args.pallas)
    params = arch.fuse_params(arch.init(jax.random.PRNGKey(0)))
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (args.batch, args.frames, 80)) * 2. - 6.
    dtype = getattr(jnp, args.dtype)

    infer = jax.jit(lambda p, m, r: jnp.sum(arch.infer(p, m, rng = r, dtype = dtype)))
    rng = jax.random.PRNGKey(2)
    float(infer(params, mel, rng))                       # compile + warm

    start = time.perf_counter()
    for i in range(args.iters):
        out = infer(params, mel, jax.random.fold_in(rng, i))
    float(out)                                           # sync
    elapsed = time.perf_counter() - start

    audio_s = args.iters * args.batch * args.frames * 256 / 22050.
    print('batch={} frames={} dtype={} pallas={}'.format(
        args.batch, args.frames, args.dtype, args.pallas))
    print('{:.2f}s for {:.1f}s audio -> {:.1f}x real-time '
          '({:.0f} TFLOP/s implied)'.format(
              elapsed, audio_s, audio_s / elapsed,
              audio_s * 1.45 / elapsed))


if __name__ == '__main__':
    main()
