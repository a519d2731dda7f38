"""Is the 2.2-second Tacotron mixed-bf16 reading a PROGRAM cost or a
TUNNEL STALL?  (Bimodal evidence: bf16-native measured 187/195/190 ms in
three fresh processes and 2292 ms in tpu_session5; bf16-islands measured
193 then 2201 ms in back-to-back fresh processes; r4 recorded 2307 ms.)

Runs the bench's exact train step (loss + adam, boundary cast) and times
EVERY iteration with a scalar-transfer barrier.  A slow PROGRAM shows a
flat ~2.2 s distribution; a tunnel stall shows ~190 ms medians with one
huge outlier.

Usage: python benchmarks/tacotron_stall_probe.py [--iters 20]
           [--mode native|islands|f32]
"""

import os
import sys
import time
import argparse

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))


def main():
    import _cache
    _cache.enable()
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type = int, default = 20)
    p.add_argument('--mode', default = 'islands',
                   choices = ('native', 'islands', 'f32'))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
    from text_to_speech_tpu.train.losses import TacotronLoss
    from text_to_speech_tpu.train.optimizers import get_optimizer
    from text_to_speech_tpu.train.precision import cast_floating

    arch = Tacotron2(scan_native_bf16 = args.mode == 'native')
    params, state = arch.init(jax.random.PRNGKey(0))
    loss_obj = TacotronLoss()
    opt = get_optimizer('adam', lr = 1e-3)
    opt_state = opt.init(params)
    B, S, T = 32, 128, 384
    tok = jnp.ones((B, S), jnp.int32)
    mel_in = jnp.zeros((B, T, 80))
    mel_out = jnp.zeros((B, T, 80))
    gate_t = jnp.zeros((B, T))
    lengths = jnp.full((B,), T, jnp.int32)
    mixed = args.mode != 'f32'

    @jax.jit
    def step(p, st, os_, rng):
        def loss_of(q):
            mi = mel_in
            if mixed:
                q, mi = cast_floating(q, jnp.bfloat16), \
                    mel_in.astype(jnp.bfloat16)
            (dec, post, g), st2 = arch(q, st, tok, mi,
                                       mel_lengths = lengths,
                                       train = True, rng = rng)
            preds = tuple(t.astype(jnp.float32) for t in (dec, post, g))
            losses = loss_obj((mel_out, gate_t), preds)
            return jnp.mean(losses['loss']), st2
        (l, st2), grads = jax.value_and_grad(loss_of, has_aux = True)(p)
        updates, os2 = opt.update(grads, os_, p)
        return optax.apply_updates(p, updates), st2, os2, l

    rng = jax.random.PRNGKey(1)
    params, state, opt_state, l = step(params, state, opt_state, rng)
    float(l)
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        params, state, opt_state, l = step(
            params, state, opt_state, jax.random.fold_in(rng, i))
        float(l)                         # barrier EVERY iteration
        times.append(time.perf_counter() - t0)
    ms = sorted(t * 1e3 for t in times)
    print('mode=%s per-iter ms: %s' % (
        args.mode, [round(t * 1e3) for t in times]), flush = True)
    print('median %.0f ms  p90 %.0f ms  max %.0f ms' % (
        ms[len(ms) // 2], ms[(9 * len(ms)) // 10], ms[-1]), flush = True)


if __name__ == '__main__':
    main()
