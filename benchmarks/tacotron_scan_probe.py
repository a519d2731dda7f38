"""Pinpoint WHICH op makes the Tacotron teacher-forced scan ~7x slower in
bfloat16 (measured tpu_session5: f32 233 ms vs bf16 2292 ms at B=32 T=384,
native-carry and f32-island variants within noise of each other — so the
cost is NOT the dtype converts; some op is slow in bf16 itself).

Times a jitted `lax.scan` of T iterations over isolated slices of
`decoder_cell` in f32 vs bf16:

    full      the real decoder_cell (both LSTMs + LSA attention)
    lstm      the two LSTM cells only (context/attention frozen)
    attn      attention_step only (query dense + location conv + energies
              + softmax + context einsum)
    attn-noconv   attention_step with the location conv/dense replaced by
              a constant (isolates the 31-wide 2->32-channel conv)
    locconv   the location conv alone
    einsum    the (B,S)x(B,S,D) context einsum alone

Usage: python benchmarks/tacotron_scan_probe.py [--batch 32] [--tokens 128]
           [--steps 384] [--iters 3]
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
    p.add_argument('--steps', type = int, default = 384)
    p.add_argument('--iters', type = int, default = 3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
    from text_to_speech_tpu.nn import layers as nn

    arch = Tacotron2()
    params, _ = arch.init(jax.random.PRNGKey(0))
    dec = params['decoder']
    B, S, T = args.batch, args.tokens, args.steps
    hp = arch.hp
    D = arch.encoder_output_dim

    def run(label, dtype, body, carry_fn, x_t_shape):
        cast = lambda t: jax.tree_util.tree_map(
            lambda l: l.astype(dtype) if jnp.issubdtype(l.dtype, jnp.floating)
            else l, t)
        p = cast(dec)
        memory = cast(jax.random.normal(jax.random.PRNGKey(1), (B, S, D)))
        pm = cast(jax.random.normal(jax.random.PRNGKey(2),
                                    (B, S, hp.lsa_attention_dim)))
        mask = jnp.ones((B, S), bool)
        xs = cast(jax.random.normal(jax.random.PRNGKey(3), (T,) + x_t_shape))

        @jax.jit
        def scan_fn(p, memory, pm, mask, xs, carry):
            def step(c, x):
                return body(p, memory, pm, mask, c, x)
            c, ys = lax.scan(step, carry, xs)
            return jax.tree_util.tree_leaves(c)[0].sum() + ys.sum()

        carry = cast(carry_fn(dtype))
        out = scan_fn(p, memory, pm, mask, xs, carry)
        float(out)                       # compile + barrier
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = scan_fn(p, memory, pm, mask, xs, carry)
        float(out)
        el = (time.perf_counter() - t0) / args.iters
        print('%-12s %-9s %7.1f ms  (%5.3f ms/step)' % (
            label, np.dtype(dtype).name, el * 1e3, el * 1e3 / T), flush = True)
        return el

    def full_body(p, memory, pm, mask, c, x):
        out, _, c2 = arch.decoder_cell(p, x, memory, pm, mask, c)
        return c2, out.sum()

    def full_carry(dtype):
        return arch.init_cell_state(B, S, dtype)

    def lstm_body(p, memory, pm, mask, c, x):
        a_state, d_states = c
        ctx = memory[:, 0]                     # frozen context read
        h, a_state = nn.lstm_cell(p['attention_rnn'],
                                  jnp.concatenate([x, ctx], -1), a_state)
        y = jnp.concatenate([h, ctx], -1)
        new = []
        for i in range(hp.decoder_n_lstm):
            y, s = nn.lstm_cell(p['decoder_rnn']['cell_{}'.format(i)],
                                y, d_states[i])
            new.append(s)
        return (a_state, tuple(new)), y.sum()

    def lstm_carry(dtype):
        return (nn.lstm_init_carry(B, hp.attention_rnn_dim, dtype),
                tuple(nn.lstm_init_carry(B, hp.decoder_rnn_dim, dtype)
                      for _ in range(hp.decoder_n_lstm)))

    def attn_body(p, memory, pm, mask, c, x):
        prev, cum = c
        ctx, w = arch.attention_step(p, x, memory, pm, prev, cum, mask)
        return (w, cum + w), ctx.sum()

    def attn_carry(dtype):
        adt = dtype if (dtype == jnp.bfloat16
                        and hp.scan_native_bf16) else jnp.float32
        return (jnp.zeros((B, S), adt), jnp.zeros((B, S), adt))

    def attn_noconv_body(p, memory, pm, mask, c, x):
        prev, cum = c
        att = p['attention']
        cd = memory.dtype
        q = nn.dense(att['query'], x)[:, None, :]
        energies = nn.dense(att['value'], jnp.tanh(q + pm))[..., 0]
        energies = jnp.where(mask, energies, jnp.asarray(-1e9, cd))
        w = jax.nn.softmax(energies, axis = -1)
        ctx = jnp.einsum('bs,bsd->bd', w.astype(cd), memory)
        return (w.astype(prev.dtype), cum + w.astype(prev.dtype)), ctx.sum()

    def locconv_body(p, memory, pm, mask, c, x):
        prev, cum = c
        att = p['attention']
        attn_cat = jnp.stack([prev, cum], -1)
        loc = nn.dense(att['location_dense'],
                       nn.conv1d(att['location_conv'], attn_cat,
                                 padding = 'SAME'))
        w = prev + loc[..., 0] * 1e-6          # keep carry shape, use output
        return (w, cum), loc.sum()

    def einsum_body(p, memory, pm, mask, c, x):
        prev, cum = c
        ctx = jnp.einsum('bs,bsd->bd', prev, memory)
        return (prev, cum), ctx.sum()

    variants = [
        ('full', full_body, full_carry, (B, hp.prenet_sizes[-1])),
        ('lstm', lstm_body, lstm_carry, (B, hp.prenet_sizes[-1])),
        ('attn', attn_body, attn_carry, (B, hp.attention_rnn_dim)),
        ('attn-noconv', attn_noconv_body, attn_carry,
         (B, hp.attention_rnn_dim)),
        ('locconv', locconv_body, attn_carry, (B, hp.attention_rnn_dim)),
        ('einsum', einsum_body, attn_carry, (B, hp.attention_rnn_dim)),
    ]
    def run_grad(label, dtype, body, carry_fn, x_t_shape):
        """Same scan, but timed through value_and_grad wrt the params —
        the training step's shape (the forward probe showed the bf16
        forward scan costs ~32 ms while the full train step regressed by
        ~2000 ms, so the backward scan is the suspect)."""
        cast = lambda t: jax.tree_util.tree_map(
            lambda l: l.astype(dtype) if jnp.issubdtype(l.dtype, jnp.floating)
            else l, t)
        p = cast(dec)
        memory = cast(jax.random.normal(jax.random.PRNGKey(1), (B, S, D)))
        pm = cast(jax.random.normal(jax.random.PRNGKey(2),
                                    (B, S, hp.lsa_attention_dim)))
        mask = jnp.ones((B, S), bool)
        xs = cast(jax.random.normal(jax.random.PRNGKey(3), (T,) + x_t_shape))
        carry = cast(carry_fn(dtype))

        @jax.jit
        def grad_fn(p, memory, pm, mask, xs, carry):
            def loss(q):
                def step(c, x):
                    return body(q, memory, pm, mask, c, x)
                c, ys = lax.scan(step, carry, xs)
                return (jax.tree_util.tree_leaves(c)[0].sum()
                        + ys.sum()).astype(jnp.float32)
            return jax.value_and_grad(loss)(p)[0]

        out = grad_fn(p, memory, pm, mask, xs, carry)
        float(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = grad_fn(p, memory, pm, mask, xs, carry)
        float(out)
        el = (time.perf_counter() - t0) / args.iters
        print('%-12s %-9s %7.1f ms  (%5.3f ms/step)  [grad]' % (
            label, np.dtype(dtype).name, el * 1e3, el * 1e3 / T),
            flush = True)

    for label, body, carry_fn, x_shape in variants:
        for dtype in (jnp.float32, jnp.bfloat16):
            try:
                run(label, dtype, body, carry_fn, x_shape)
            except Exception as e:
                print('%-12s %-9s FAILED: %r' % (
                    label, np.dtype(dtype).name, e), flush = True)
    for label, body, carry_fn, x_shape in variants:
        for dtype in (jnp.float32, jnp.bfloat16):
            try:
                run_grad(label, dtype, body, carry_fn, x_shape)
            except Exception as e:
                print('%-12s %-9s FAILED: %r  [grad]' % (
                    label, np.dtype(dtype).name, e), flush = True)


if __name__ == '__main__':
    main()
