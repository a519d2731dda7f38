"""Bisect WHERE the mixed-bf16 Tacotron train step loses ~2 s
(tpu_session5: f32 233 ms vs bf16 2292 ms; tacotron_scan_probe showed the
decoder scan fwd AND grad cost only ~31 ms in bf16 — the regression is
NOT the scan).

Times value_and_grad of CUMULATIVE stages of the real arch composition,
f32 vs bf16 boundary-cast (the bench's exact cast):

    enc       encode + process_memory           (conv stack + BiLSTM, train)
    +prenet   ... + prenet over the target mels
    +scan     ... + the teacher-forced decoder scan
    +proj     ... + frame/gate projections + mask
    full      ... + postnet  (== the arch __call__)
    +loss     full + TacotronLoss + adam update (== the bench step)

Usage: python benchmarks/tacotron_bisect_probe.py [--iters 3]
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
    p.add_argument('--batch', type = int, default = 32)
    p.add_argument('--tokens', type = int, default = 128)
    p.add_argument('--frames', type = int, default = 384)
    p.add_argument('--iters', type = int, default = 3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    import optax
    from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
    from text_to_speech_tpu.train.losses import TacotronLoss
    from text_to_speech_tpu.train.optimizers import get_optimizer
    from text_to_speech_tpu.train.precision import cast_floating

    arch = Tacotron2()
    params, state = arch.init(jax.random.PRNGKey(0))
    hp = arch.hp
    B, S, T = args.batch, args.tokens, args.frames
    tok = jnp.ones((B, S), jnp.int32)
    mel_in = jnp.zeros((B, T, 80))
    mel_out = jnp.zeros((B, T, 80))
    gate_t = jnp.zeros((B, T))
    lengths = jnp.full((B,), T, jnp.int32)
    rng = jax.random.PRNGKey(1)
    loss_obj = TacotronLoss()
    opt = get_optimizer('adam', lr = 1e-3)
    opt_state = opt.init(params)

    def stages(p, st, mi, upto, rng):
        rng_enc, rng_pre, rng_post = jax.random.split(rng, 3)
        enc, mask, st2 = arch.encode(p, st, tok, train = True, rng = rng_enc)
        memory, pm = arch.process_memory(p['decoder'], enc, mask)
        acc = memory.sum().astype(jnp.float32) + pm.sum().astype(jnp.float32)
        if upto == 'enc':
            return acc
        prenet_out = arch.prenet(p['decoder'], mi, rng = rng_pre)
        acc = acc + prenet_out.sum().astype(jnp.float32)
        if upto == '+prenet':
            return acc
        cell_state = arch.init_cell_state(B, S, mi.dtype)

        def step(c, x_t):
            out, _, c2 = arch.decoder_cell(p['decoder'], x_t, memory, pm,
                                           mask, c)
            return c2, out
        _, cell_outputs = lax.scan(step, cell_state,
                                   jnp.swapaxes(prenet_out, 0, 1))
        cell_outputs = jnp.swapaxes(cell_outputs, 0, 1)
        acc = acc + cell_outputs.sum().astype(jnp.float32)
        if upto == '+scan':
            return acc
        frames, gates = arch._project(p['decoder'], cell_outputs)
        dec_mask = jnp.arange(T)[None] < lengths[:, None]
        frames = jnp.where(dec_mask[..., None], frames, 0.)
        acc = acc + frames.sum().astype(jnp.float32) \
            + gates.sum().astype(jnp.float32)
        if upto == '+proj':
            return acc
        post, _ = arch.postnet(p, st2, frames, train = True, rng = rng_post)
        return acc + post.sum().astype(jnp.float32)

    def timed(label, fn, *xs):
        try:
            jfn = jax.jit(fn)
            out = jfn(*xs)
            float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = jfn(*xs)
            float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            el = (time.perf_counter() - t0) / args.iters
            print('%-22s %8.0f ms' % (label, el * 1e3), flush = True)
        except Exception as e:
            print('%-22s FAILED: %s' % (label, repr(e)[:140]), flush = True)

    for upto in ('enc', '+prenet', '+scan', '+proj', 'full'):
        for mixed in (False, True):
            def grad_fn(p, st, rng, upto = upto, mixed = mixed):
                def loss_of(q):
                    mi = mel_in
                    if mixed:
                        q, mi = cast_floating(q, jnp.bfloat16), \
                            mel_in.astype(jnp.bfloat16)
                    return stages(q, st, mi, upto, rng)
                return jax.value_and_grad(loss_of)(p)[0]
            timed('%s %s' % (upto, 'bf16' if mixed else 'f32'),
                  grad_fn, params, state, rng)

    # the bench's exact step (loss + adam) for closure
    for mixed in (False, True):
        def bench_step(p, st, os_, rng, mixed = mixed):
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
        timed('+loss+adam %s' % ('bf16' if mixed else 'f32'),
              bench_step, params, state, opt_state, rng)


if __name__ == '__main__':
    main()
