"""Tacotron-2 autoregressive decode throughput (one chip).

Usage: python benchmarks/tacotron_decode.py [--batch 8] [--steps 256]
       [--tokens 128] [--dtype float32|bfloat16]
"""

import os
import sys
import time
import argparse

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

AUDIO_FPS = 22050 / 256.      # mel frames per second of audio


def main():
    import _cache
    _cache.enable()
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type = int, default = 8)
    parser.add_argument('--steps', type = int, default = 256)
    parser.add_argument('--tokens', type = int, default = 128)
    parser.add_argument('--dtype', default = 'float32')
    parser.add_argument('--fused', action = 'store_true',
                        help = 'fused decoder-step Pallas kernel '
                               '(ops/decoder_kernel.py)')
    parser.add_argument('--int8-lstm', action = 'store_true',
                        help = 'int8 LSTM weights inside the fused kernel '
                               '(halves the weight stream, the B=1 bound)')
    parser.add_argument('--r', type = int, default = 1,
                        help = 'reduction factor n_frames_per_step: r mel '
                               'frames per sequential step (train-time '
                               'choice; divides the latency axis by r)')
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from text_to_speech_tpu.models.tacotron2_arch import Tacotron2

    arch = Tacotron2(n_frames_per_step = args.r)
    if args.fused and args.r != 1:
        raise SystemExit('--fused requires r=1 (kernel covers the '
                         'reference configuration)')
    params, state = arch.init(jax.random.PRNGKey(0))
    tokens = np.ones((args.batch, args.tokens), np.int32)
    dtype = None if args.dtype == 'float32' else getattr(jnp, args.dtype)

    if args.fused:
        infer = jax.jit(lambda p, s, t, r: jnp.sum(arch.infer_fused(
            p, s, t, rng = r, max_length = args.steps,
            early_stopping = False, dtype = dtype,
            int8_lstm = args.int8_lstm).mel))
    else:
        infer = jax.jit(lambda p, s, t, r: jnp.sum(arch.infer(
            p, s, t, rng = r, max_length = args.steps,
            early_stopping = False, dtype = dtype).mel))
    rng = jax.random.PRNGKey(1)
    float(infer(params, state, tokens, rng))

    best = float('inf')
    for i in range(3):
        start = time.perf_counter()
        float(infer(params, state, tokens, jax.random.fold_in(rng, i)))
        best = min(best, time.perf_counter() - start)

    fps = args.batch * args.steps / best
    loop_steps = -(-args.steps // args.r)    # frames -> sequential steps
    print('batch={} frames={} r={} dtype={}'.format(
        args.batch, args.steps, args.r, args.dtype))
    print('{:.1f} us/seq-step ({:.1f} us/frame) -> {:.0f} frames/s '
          '-> {:.1f}x real-time'.format(
              best / loop_steps * 1e6, best / args.steps * 1e6,
              fps, fps / AUDIO_FPS))


if __name__ == '__main__':
    main()
