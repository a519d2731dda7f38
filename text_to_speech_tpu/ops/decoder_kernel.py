"""Fused Tacotron-2 decoder-step Pallas kernel — the B=1 latency path.

The reference decodes one mel frame per step through a chain of ~15 small
ops (prenet, attention LSTM, location-sensitive attention, decoder LSTM,
projections — ``/root/reference/architectures/tacotron2_arch.py:336-489``).
Under XLA's ``lax.while_loop`` every step re-streams ~36 MB of decoder
weights from HBM and pays per-op dispatch, so a single stream decodes at
only ~10x real-time.  This kernel runs K steps per launch with ALL decoder
weights resident in VMEM, so the per-step cost is pure compute:

  - batch rows ride the sublane dimension (B <= 8, padded);
  - the projection emits ``[mel(80) | gate(1) | 0...]`` as one padded
    128-lane vector that feeds the next step's prenet matmul directly;
  - attention tensors are TRANSPOSED — S on sublanes — so the 31-tap
    location conv is an im2col of cheap sublane shifts plus ONE matmul
    against a precomputed block-diagonal weight that also folds in
    ``location_dense`` (see `pack_decoder_weights`);
  - alignments, LSTM cell states and the softmax stay f32; matmuls run in
    bf16 on the MXU;
  - the prenet's always-on dropout uses the TPU PRNG, seeded per step;
  - decode state crosses launches through input/output-aliased buffers, so
    a host-level ``lax.while_loop`` chains K-step launches with early
    stopping on the gate, re-paying the weight DMA only once per K steps.

Numerical contract: identical math to `Tacotron2.decoder_cell` +
`Tacotron2._project` (deterministic mode is bit-comparable; dropout draws
from a different PRNG stream than the XLA path).
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOC_KERNEL = 31                 # location conv taps (reference default)
LOC_PAD = LOC_KERNEL // 2       # 15


def _round_up(x, m):
    return -(-x // m) * m


def quantize_lstm_weights(weights):
    """int8-quantize the two LSTM matmul weights of a packed decoder
    (`pack_decoder_weights` output).  Symmetric per-output-channel scales;
    activations quantize per row inside the kernel.  All other (small)
    weights stay in bf16.

    MEASURED (1x v5e, B=1): 126.6 vs 128 us/step — NO speedup.  The
    serial-step floor is MXU weight-LOAD CYCLES, not bytes: the systolic
    array loads one weight element per cell per cycle regardless of dtype
    (~1088 128x128 weight tiles per step across att_w+dec_w), so halving
    weight bytes buys nothing at M=8 activation rows.  Kept as a memory
    optimization (halves the decoder's VMEM weight footprint) and as the
    documented probe result; quality cost ~1% on the AR mel at short
    horizons (see tests/test_decoder_kernel.py)."""
    out = dict(weights)
    for key in ('att_w', 'dec_w'):
        w = jnp.asarray(weights[key], jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis = 0), 1e-8) / 127.
        out[key] = jnp.clip(jnp.round(w / scale), -127., 127.).astype(jnp.int8)
        out['s_' + key] = scale
    return out


def _row_quant8(x_f32):
    """Per-row symmetric int8 quant of an (8, K) activation block."""
    amax = jnp.max(jnp.abs(x_f32), axis = -1, keepdims = True)
    scale = jnp.maximum(amax, 1e-8) * (1. / 127.)
    q = jnp.clip(jnp.round(x_f32 / scale), -127., 127.).astype(jnp.int8)
    return q, scale


def pack_decoder_weights(dec, *, n_mel = 80, dtype = jnp.bfloat16):
    """Re-lay `params['decoder']` for the fused kernel.

    Fully traceable (jnp only) so it can run inside the jitted inference —
    the relayout is a handful of pads/reshapes, negligible next to decode.

    Returns a dict of MXU-ready tensors:
      w0 (128, P): prenet layer 0, frame rows padded 80→128 (the gate lane
        and padding lanes of the recycled projection output hit zero rows);
      w1 (P, P'), b0/b1;
      att_w (P'+D+U, 4U): [Wx; Wh] stacked so `[x|ctx|h] @ att_w` is ONE
        matmul; att_b (4U,);
      q_w (U, A);
      loc_w (512, 8*A): block-diagonal location-conv weight — input lanes
        (c*31+k)*8+b (channel c, tap k, batch b), output lanes b*A+d;
        folds location_conv (31,2,F) @ location_dense (F,A);
      v_w (1, 8*A): the value vector tiled per batch group;
      dec_w (2U+D, 4U): same stacking for the decoder LSTM; dec_b (4U,);
      proj_w (U+D, 128): linear_projection (·,n_mel) and gate_layer (·,1)
        side by side, zero-padded to 128 lanes; proj_b (1, 128).
    """
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    p0 = dec['prenet']['layer_0']
    p1 = dec['prenet']['layer_1']
    P = p0['kernel'].shape[1]
    in0 = f32(p0['kernel'])                             # (prenet_in, P)
    w0 = jnp.pad(in0[:n_mel], ((0, 128 - n_mel), (0, 0)))
    b0 = f32(p0['bias']) if 'bias' in p0 else jnp.zeros((P,))
    b1 = f32(p1['bias']) if 'bias' in p1 else jnp.zeros((p1['kernel'].shape[1],))

    att = dec['attention']
    # fold location_dense into the conv: (31, 2, F) @ (F, A) → (31, 2, A)
    wl = jnp.einsum('kcf,fd->kcd', f32(att['location_conv']['kernel']),
                    f32(att['location_dense']['kernel']))
    A = wl.shape[2]
    # (c, k, d) → rows col=c*31+k; expand per batch lane with a kron-eye
    wl_ck = jnp.transpose(wl, (1, 0, 2)).reshape(2 * LOC_KERNEL, A)
    loc_w = (wl_ck[:, None, None, :] * jnp.eye(8)[None, :, :, None])
    loc_w = loc_w.reshape(2 * LOC_KERNEL * 8, 8 * A)
    loc_w = jnp.pad(loc_w, ((0, 512 - loc_w.shape[0]), (0, 0)))

    v = f32(att['value']['kernel'])[:, 0]               # (A,)
    v_w = jnp.tile(v, 8)[None, :]                       # (1, 8A)

    a_rnn, d_rnn = dec['attention_rnn'], dec['decoder_rnn']['cell_0']
    # one [x | h] @ [Wx; Wh] matmul per LSTM instead of two + add (halves
    # the serial MXU dispatches in the step's critical path)
    att_w = jnp.concatenate(
        [jnp.asarray(a_rnn['kernel']), jnp.asarray(a_rnn['recurrent_kernel'])],
        axis = 0)
    dec_w = jnp.concatenate(
        [jnp.asarray(d_rnn['kernel']), jnp.asarray(d_rnn['recurrent_kernel'])],
        axis = 0)
    proj, gate = dec['linear_projection'], dec['gate_layer']
    pw = f32(proj['kernel'])                            # (U+D, n_mel)
    gw = f32(gate['kernel'])                            # (U+D, 1)
    proj_w = jnp.pad(jnp.concatenate([pw, gw], axis = 1),
                     ((0, 0), (0, 128 - n_mel - 1)))
    proj_b = jnp.pad(
        jnp.concatenate([f32(proj['bias']), f32(gate['bias'])]),
        (0, 128 - n_mel - 1))[None, :]

    as_dt = lambda a: jnp.asarray(a, dtype)
    return {
        'w0': as_dt(w0), 'b0': b0,
        'w1': as_dt(p1['kernel']), 'b1': b1,
        'att_w': as_dt(att_w), 'att_b': f32(a_rnn['bias']),
        'q_w': as_dt(att['query']['kernel']),
        'loc_w': as_dt(loc_w), 'v_w': v_w,
        'dec_w': as_dt(dec_w), 'dec_b': f32(d_rnn['bias']),
        'proj_w': as_dt(proj_w), 'proj_b': proj_b,
    }


def _decoder_kernel(seed_ref,
                    mem_ref, pm_ref, mask_ref, len_ref,
                    w0_ref, b0_ref, w1_ref, b1_ref, extra_ref,
                    att_w_ref, att_b_ref,
                    q_w_ref, loc_w_ref, v_w_ref,
                    dec_w_ref, dec_b_ref,
                    proj_w_ref, proj_b_ref,
                    s_att_ref, s_dec_ref,
                    frame_ref, h_att_ref, c_att_ref, h_dec_ref, c_dec_ref,
                    ctx_ref, prev_ref, cum_ref, main_ref,
                    frame_o, h_att_o, c_att_o, h_dec_o, c_dec_o,
                    ctx_o, prev_o, cum_o, main_o,
                    steps_out, attn_out,
                    win_scratch,
                    *, S, D, U, P, A, drop_threshold, drop_scale,
                    deterministic, use_window, win_len, win_offset,
                    gate_lane, int8_lstm = False, ablate = ()):
    g = pl.program_id(0)
    dt = mem_ref.dtype                     # compute (matmul) dtype
    # f32 parity runs want true-f32 matmuls (the MXU's default for f32
    # operands is a bf16 pass); bf16 serving uses native precision
    mxu = jax.lax.Precision.HIGHEST \
        if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    dot = functools.partial(
        jnp.dot, preferred_element_type = jnp.float32, precision = mxu)

    # state refs: read from the aliased outputs after step 0 (same buffers
    # as the inputs — aliasing makes in/out one allocation, this is just
    # for clarity)
    if not deterministic:
        pltpu.prng_seed(seed_ref[0] + g)

    # ---- prenet -------------------------------------------------------------
    frame = frame_o[:]                                      # (8, 128) f32
    x = dot(frame.astype(dt), w0_ref[:]) + b0_ref[:] + extra_ref[:]
    x = jnp.maximum(x, 0.)
    if not deterministic:
        bits = pltpu.bitcast(pltpu.prng_random_bits((8, P)), jnp.uint32)
        x = jnp.where(bits >= jnp.uint32(drop_threshold), x * drop_scale, 0.)
    x = jnp.maximum(dot(x.astype(dt), w1_ref[:]) + b1_ref[:], 0.)
    if not deterministic:
        bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
        x = jnp.where(bits >= jnp.uint32(drop_threshold), x * drop_scale, 0.)

    def lstm_matmul(xin, w_ref, s_ref, b_ref):
        """(8, K) @ (K, 4U) — int8 mode streams the (large) LSTM weight
        through the MXU at the 2x int8 rate: per-row activation quant,
        per-output-channel weight scales, f32 accumulate/dequant (the VPU
        cost at 8 rows is negligible next to the weight stream)."""
        if int8_lstm:
            q, sx = _row_quant8(xin.astype(jnp.float32))
            z = jnp.dot(q, w_ref[:], preferred_element_type = jnp.int32)
            return (z.astype(jnp.float32) * sx
                    * s_ref[:].astype(jnp.float32)) + b_ref[:]
        return dot(xin, w_ref[:]) + b_ref[:]

    # ---- attention LSTM -----------------------------------------------------
    xin = jnp.concatenate([x.astype(dt), ctx_o[:], h_att_o[:]], axis = -1)
    z = lstm_matmul(xin, att_w_ref, s_att_ref, att_b_ref)   # (8, 4U)
    i_g = jax.nn.sigmoid(z[:, :U])
    f_g = jax.nn.sigmoid(z[:, U: 2 * U])
    g_g = jnp.tanh(z[:, 2 * U: 3 * U])
    o_g = jax.nn.sigmoid(z[:, 3 * U:])
    c_att = f_g * c_att_o[:] + i_g * g_g                    # f32
    h_att = o_g * jnp.tanh(c_att)
    c_att_o[:] = c_att
    h_att_o[:] = h_att.astype(dt)

    # ---- location-sensitive attention (S on sublanes) ------------------------
    pq = dot(h_att.astype(dt), q_w_ref[:])                  # (8, A) f32

    if 'loc' not in ablate:
        # im2col: window column (c*31+k) of output s holds attn_c[s + k - 15];
        # sublane shifts of the transposed alignments are cheap
        win_scratch[:] = jnp.zeros_like(win_scratch)
        for c, ref in ((0, prev_o), (1, cum_o)):
            a_t = ref[:].astype(dt)                         # (S, 8)
            for k in range(LOC_KERNEL):
                shift = k - LOC_PAD
                src_lo, dst_lo = max(0, shift), max(0, -shift)
                n = S - abs(shift)
                if n <= 0:      # short memory (S <= LOC_PAD): tap has no
                    continue    # valid rows; scratch stays zeroed
                col = (c * LOC_KERNEL + k) * 8
                win_scratch[dst_lo: dst_lo + n, col: col + 8] = \
                    a_t[src_lo: src_lo + n, :]
        feat = dot(win_scratch[:], loc_w_ref[:])            # (S, 8A) f32
    else:
        feat = 0.

    if 'energies' not in ablate:
        pm = pm_ref[:].astype(jnp.float32)                  # (S, 8A)
        pq_row = pq.reshape(1, 8 * A)                       # (1, 8A)
        e = jnp.tanh(pq_row + pm + feat) * v_w_ref[:]       # (S, 8A) f32
        energies = jnp.sum(e.reshape(S, 8, A), axis = -1)   # (S, 8)
    else:
        energies = pq[:, :8].reshape(1, 8) \
            + jax.lax.broadcasted_iota(jnp.float32, (S, 8), 0) * 1e-3

    mask = mask_ref[:] > 0.                                 # (S, 8)
    if use_window:
        center = jnp.maximum(main_o[:], win_offset)         # (1, 8) i32
        center = jnp.minimum(center, len_ref[:] - win_len + win_offset)
        lo = center - win_offset
        pos = jax.lax.broadcasted_iota(jnp.int32, (S, 8), 0)
        mask = mask & (pos >= lo) & (pos <= lo + win_len)
    if 'softmax' not in ablate:
        energies = jnp.where(mask, energies, -1e9)
        energies = energies - jnp.max(energies, axis = 0, keepdims = True)
        ew = jnp.exp(energies)
        attn = ew / jnp.sum(ew, axis = 0, keepdims = True)  # (S, 8) f32
    else:
        attn = energies * (1. / S)

    cum = cum_o[:] + attn
    prev_o[:] = attn
    cum_o[:] = cum
    if 'argmax' not in ablate:
        main_o[:] = jnp.argmax(attn, axis = 0)[None, :].astype(jnp.int32)

    if 'context' not in ablate:
        ctx = jnp.sum(attn[:, :, None].astype(dt) * mem_ref[:],
                      axis = 0, dtype = jnp.float32)        # (8, D)
        ctx_o[:] = ctx.astype(dt)
    else:
        ctx = ctx_o[:].astype(jnp.float32)

    # ---- decoder LSTM ---------------------------------------------------------
    yin = jnp.concatenate(
        [h_att.astype(dt), ctx.astype(dt), h_dec_o[:]], axis = -1)
    z = lstm_matmul(yin, dec_w_ref, s_dec_ref, dec_b_ref)   # (8, 4U)
    i_g = jax.nn.sigmoid(z[:, :U])
    f_g = jax.nn.sigmoid(z[:, U: 2 * U])
    g_g = jnp.tanh(z[:, 2 * U: 3 * U])
    o_g = jax.nn.sigmoid(z[:, 3 * U:])
    c_dec = f_g * c_dec_o[:] + i_g * g_g
    h_dec = o_g * jnp.tanh(c_dec)
    c_dec_o[:] = c_dec
    h_dec_o[:] = h_dec.astype(dt)

    # ---- projections (frame | gate | zero-pad) --------------------------------
    cell_out = jnp.concatenate([h_dec.astype(dt), ctx.astype(dt)], axis = -1)
    out = dot(cell_out, proj_w_ref[:]) + proj_b_ref[:]      # (8, 128) f32
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.where(lane == gate_lane, jax.nn.sigmoid(out), out)
    out = jnp.where(lane > gate_lane, 0., out)
    frame_o[:] = out
    steps_out[0] = out
    attn_out[0] = attn

    # outputs not written above mirror their (aliased) inputs — nothing to do
    del (frame_ref, h_att_ref, c_att_ref, h_dec_ref, c_dec_ref,
         ctx_ref, prev_ref, cum_ref, main_ref)


@functools.partial(
    jax.jit,
    static_argnames = ('n_steps', 'deterministic', 'use_window',
                       'win_len', 'win_offset', 'gate_lane', 'interpret',
                       'ablate', 'drop_rate'),
)
def decoder_steps(weights, mem_t, pm_t, mask_t, enc_len, extra, state, seed,
                  *, n_steps, deterministic = False, use_window = False,
                  win_len = 0, win_offset = 0, gate_lane = 80,
                  interpret = False, ablate = (), drop_rate = 0.5):
    """Run `n_steps` fused decoder steps.

    - weights: dict from `pack_decoder_weights`;
    - mem_t (S, 8, D) bf16: encoder memory, batch on sublanes of dim 1;
    - pm_t (S, 8*A): processed memory, transposed+flattened;
    - mask_t (S, 8) f32: 1/0 encoder mask;  enc_len (1, 8) int32;
    - extra (8, P) f32: per-row prenet layer-0 pre-activation addend (the
      folded speaker-embedding concat; zeros otherwise);
    - state: dict(frame (8,128) f32, h_att/c_att (8,U), h_dec/c_dec (8,U),
      ctx (8,D), prev/cum (S,8) f32, main (1,8) i32) — h/ctx in compute
      dtype, c/frame/alignments f32;
    - seed (1,) int32 (prenet dropout stream; ignored when deterministic).

    Returns (steps (n_steps, 8, 128) f32 — ``[:, :, :80]`` mel frame,
    ``[:, :, 80]`` gate —, attn (n_steps, S, 8) f32, new_state).
    """
    S, _, D = mem_t.shape
    U = weights['att_w'].shape[1] // 4
    P = weights['w1'].shape[0]
    A = weights['q_w'].shape[1]
    assert S % 8 == 0, S

    # int8 LSTM serving mode is carried by the packed weights themselves
    # (see `quantize_lstm_weights`) — dtype is a trace-time constant
    int8_lstm = jnp.dtype(weights['att_w'].dtype) == jnp.int8
    s_att = weights.get('s_att_w')
    s_dec = weights.get('s_dec_w')
    if not int8_lstm:
        s_att = jnp.ones((4 * U,), jnp.float32) if s_att is None else s_att
        s_dec = jnp.ones((4 * U,), jnp.float32) if s_dec is None else s_dec

    assert 0. <= drop_rate < 1., drop_rate
    kernel = functools.partial(
        _decoder_kernel, S = S, D = D, U = U, P = P, A = A,
        # keep iff u32 bits >= round(p·2³²); scale survivors by 1/(1-p)
        drop_threshold = min(int(round(drop_rate * 4294967296.)), 4294967295),
        drop_scale = 1. / (1. - drop_rate),
        deterministic = deterministic, use_window = use_window,
        win_len = win_len, win_offset = win_offset, gate_lane = gate_lane,
        int8_lstm = int8_lstm,
        ablate = tuple(ablate),   # perf-bisection switches; () in production
    )

    whole = lambda shape: pl.BlockSpec(
        shape, lambda g: (0,) * len(shape), memory_space = pltpu.VMEM)

    w = weights
    state_in = (state['frame'], state['h_att'], state['c_att'],
                state['h_dec'], state['c_dec'], state['ctx'],
                state['prev'], state['cum'], state['main'])
    state_shapes = tuple(
        jax.ShapeDtypeStruct(s.shape, s.dtype) for s in state_in)
    state_specs = tuple(whole(s.shape) for s in state_in)

    n_inputs = 21 + len(state_in)
    outs = pl.pallas_call(
        kernel,
        grid = (n_steps,),
        in_specs = [
            pl.BlockSpec(memory_space = pltpu.SMEM),        # seed
            whole(mem_t.shape), whole(pm_t.shape),
            whole(mask_t.shape), whole(enc_len.shape),
            whole(w['w0'].shape), whole(w['b0'].shape),
            whole(w['w1'].shape), whole(w['b1'].shape), whole(extra.shape),
            whole(w['att_w'].shape), whole(w['att_b'].shape),
            whole(w['q_w'].shape), whole(w['loc_w'].shape),
            whole(w['v_w'].shape),
            whole(w['dec_w'].shape), whole(w['dec_b'].shape),
            whole(w['proj_w'].shape), whole(w['proj_b'].shape),
            whole(s_att.shape), whole(s_dec.shape),
        ] + list(state_specs),
        out_specs = tuple(state_specs) + (
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                         memory_space = pltpu.VMEM),
            pl.BlockSpec((1, S, 8), lambda g: (g, 0, 0),
                         memory_space = pltpu.VMEM),
        ),
        out_shape = state_shapes + (
            jax.ShapeDtypeStruct((n_steps, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, S, 8), jnp.float32),
        ),
        scratch_shapes = [
            pltpu.VMEM((S, 512), mem_t.dtype),              # im2col windows
        ],
        input_output_aliases = {
            n_inputs - len(state_in) + i: i for i in range(len(state_in))
        },
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes = 127 * 1024 * 1024,
        ),
        interpret = interpret,
    )(seed, mem_t, pm_t, mask_t, enc_len,
      w['w0'], w['b0'], w['w1'], w['b1'], extra,
      w['att_w'], w['att_b'],
      w['q_w'], w['loc_w'], w['v_w'],
      w['dec_w'], w['dec_b'],
      w['proj_w'], w['proj_b'],
      s_att, s_dec,
      * state_in)

    new_state = dict(zip(
        ('frame', 'h_att', 'c_att', 'h_dec', 'c_dec', 'ctx', 'prev', 'cum',
         'main'), outs[:len(state_in)]))
    return outs[-2], outs[-1], new_state


def init_decoder_state(S, D, U, dtype = jnp.bfloat16):
    """Fresh decode state for `decoder_steps` (B padded to 8)."""
    return dict(
        frame = jnp.zeros((8, 128), jnp.float32),
        h_att = jnp.zeros((8, U), dtype), c_att = jnp.zeros((8, U), jnp.float32),
        h_dec = jnp.zeros((8, U), dtype), c_dec = jnp.zeros((8, U), jnp.float32),
        ctx = jnp.zeros((8, D), dtype),
        prev = jnp.zeros((S, 8), jnp.float32),
        cum = jnp.zeros((S, 8), jnp.float32),
        main = jnp.zeros((1, 8), jnp.int32),
    )
