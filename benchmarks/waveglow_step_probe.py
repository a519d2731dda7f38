"""Decompose the mixed-precision WaveGlow training step (VERDICT r4 #2).

tpu_session5 falsified two hypotheses: the shifted-matmul conv REGRESSED
(741 -> 789 ms mixed; 1045 -> 1307 f32) so XLA's dilated-conv lowering was
not the bottleneck, and the 'acts' remat policy crashed the axon AOT
compile helper at B=8.  This probe gathers the numbers that either find
the remaining lever or PROVE the HBM floor:

  - forward-only vs loss+grad vs full step (where the wall lives),
  - XLA's own bytes-accessed estimate -> achieved HBM GB/s vs the
    ~819 GB/s v5e peak (the floor proof),
  - no-remat at B=2/B=4 (bf16 halves activations; does dropping the
    recompute pay per audio-second?),
  - the 'acts' policy at B=4 (does the compile crash track program
    buffer size?).

Usage: python benchmarks/waveglow_step_probe.py [--frames 192] [--iters 3]
"""

import os
import sys
import time
import argparse

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

PEAK_BF16 = 197e12
PEAK_HBM = 819e9                 # 1x v5e


def main():
    import _cache
    _cache.enable()
    p = argparse.ArgumentParser()
    p.add_argument('--frames', type = int, default = 192)
    p.add_argument('--iters', type = int, default = 3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from text_to_speech_tpu.models.waveglow_arch import WaveGlow

    arch = WaveGlow()
    params = arch.fuse_params(arch.init(jax.random.PRNGKey(0)))

    def data(batch):
        mel = jax.random.normal(jax.random.PRNGKey(1),
                                (batch, args.frames, 80))
        audio = jax.random.normal(jax.random.PRNGKey(2),
                                  (batch, args.frames * 256)) * 0.1
        return mel, audio

    def timed(label, fn, *xs, batch = 8):
        try:
            compiled = jax.jit(fn).lower(*xs).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            flops = float(ca.get('flops', 0.))
            nbytes = float(ca.get('bytes accessed', 0.))
            jfn = jax.jit(fn)
            out = jfn(*xs)
            float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = jfn(*xs)
            float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            el = (time.perf_counter() - t0) / args.iters
            audio_s = batch * args.frames * 256 / 22050.
            print('%-34s %7.0f ms  %5.1f TFLOP/s (%2.0f%%)  '
                  '%6.1f GB/s HBM est (%2.0f%%)  %5.1f audio-s/s' % (
                      label, el * 1e3,
                      flops / el / 1e12, 100. * flops / el / PEAK_BF16,
                      nbytes / el / 1e9, 100. * nbytes / el / PEAK_HBM,
                      audio_s / el), flush = True)
        except Exception as e:
            print('%-34s FAILED: %s' % (label, repr(e)[:160]), flush = True)

    mel8, audio8 = data(8)
    cd = jnp.bfloat16

    def grad_of(remat, compute_dtype):
        # return the FULL grads pytree so the backward stays live (taking
        # only the value let XLA dead-code-eliminate the whole backward —
        # the first run of this probe timed forwards labeled 'grad')
        def fn(p, m, a):
            l, g = jax.value_and_grad(
                lambda q: arch.loss(q, m, a, remat = remat,
                                    compute_dtype = compute_dtype))(p)
            return l, g
        return fn

    timed('fwd-only mixed B=8 (no remat)',
          lambda p, m, a: arch.loss(p, m, a, remat = False,
                                    compute_dtype = cd),
          params, mel8, audio8)
    timed('grad mixed B=8 (remat)', grad_of(True, cd),
          params, mel8, audio8)
    timed('grad f32 B=8 (remat)', grad_of(True, None),
          params, mel8, audio8)

    for batch in (4, 2):
        mel, audio = data(batch)
        timed('grad mixed B=%d (NO remat)' % batch,
              grad_of(False, cd), params, mel, audio, batch = batch)
    mel4, audio4 = data(4)
    timed('grad mixed B=4 (acts policy)', grad_of('acts', cd),
          params, mel4, audio4, batch = 4)
    timed('grad mixed B=4 (remat)', grad_of(True, cd),
          params, mel4, audio4, batch = 4)


if __name__ == '__main__':
    main()
