"""HiFi-GAN / Vocos vocoder real-time factor (one chip) — beyond-reference
vocoder families.

Full-size HiFi-GAN v1 (~13 GFLOP / audio-second vs WaveGlow's ~1.45 TFLOP)
or Vocos (~2.4 GFLOP/s, frame-rate-only ConvNeXt + iSTFT — no sample-rate
convs at all).

Usage: python benchmarks/hifigan_rtf.py [--arch hifigan|vocos] [--batch 32]
       [--frames 256] [--iters 6] [--dtype bfloat16|float32]

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
    parser.add_argument('--arch', default = 'hifigan',
                        choices = ('hifigan', 'vocos'))
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    if args.arch == 'vocos':
        from text_to_speech_tpu.models.vocos_arch import Vocos
        arch = Vocos()                                     # full-size
    else:
        from text_to_speech_tpu.models.hifigan_arch import HiFiGAN
        arch = HiFiGAN()                                   # full-size v1
    params = arch.init(jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (args.batch, args.frames, 80)) * 2. - 6.
    dtype = getattr(jnp, args.dtype) if args.dtype != 'float32' else None

    infer = jax.jit(lambda p, m: jnp.sum(arch.apply(p, m, dtype = dtype)))
    float(infer(params, mel))                              # compile + warm

    start = time.perf_counter()
    for _ in range(args.iters):
        out = infer(params, mel)
    float(out)                                             # sync
    elapsed = time.perf_counter() - start

    audio_s = args.iters * args.batch * args.frames * 256 / 22050.
    print('arch={} batch={} frames={} dtype={}'.format(
        args.arch, args.batch, args.frames, args.dtype))
    print('{:.2f}s for {:.1f}s audio -> {:.1f}x real-time'.format(
        elapsed, audio_s, audio_s / elapsed))


if __name__ == '__main__':
    main()
