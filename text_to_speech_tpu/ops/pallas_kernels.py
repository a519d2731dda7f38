"""Pallas TPU kernels for the hot compute paths.

`fused_wn_layer` fuses one WaveGlow WN layer — dilated 3-tap conv +
conditioning add + gated tanh·sigmoid + res/skip pointwise conv + residual
add — into a single kernel.  XLA runs the convs themselves near peak but
round-trips the (B, T, 2C) activations through HBM between them (~2 GB per
layer at serving shapes); the fused kernel keeps them in VMEM.

Status (v5e, B=32 × T=8192 × C=512): the whole-block kernels below supersede
the per-layer one.  bf16 `fused_wn_block`: 113x real-time end-to-end (163
eff TFLOP/s, 83% of MXU peak — bf16 is peak-bound at ~135x).  int8
`fused_wn_block_int8` (per-row dynamic activation scales, per-channel weight
scales, f32 accumulation): 179x real-time (259 bf16-equivalent TFLOP/s), and
HIGHER fidelity than bf16 serving (42 vs -3 dB waveform SNR vs f32 in the
stable-flow regime) since only matmul operands quantize — the residual
stream and all accumulation stay f32.

Layout: grid over (batch, time tiles); weights live whole in VMEM (4 MB);
the input tile is DMA'd from HBM with a ``dilation``-sized halo (the input
is pre-padded by ``max_dilation`` so edge tiles stay in bounds); matmuls
accumulate in f32 on the MXU.
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wn_layer_kernel(x_hbm, cond_ref, w_in_ref, b_in_ref, w_rs_ref, b_rs_ref,
                     x_out_ref, skip_ref, xbuf, sems,
                     *, tile, channels, dilation, pad, residual, n_tiles):
    # 1-D grid (batch*tiles) so double-buffered halo DMAs pipeline across
    # both the time and batch dimensions: tile g+1 streams in while tile g
    # computes
    g = pl.program_id(0)
    total = pl.num_programs(0)

    def make_dma(step, slot):
        return pltpu.make_async_copy(
            x_hbm.at[step // n_tiles,
                     pl.ds((step % n_tiles) * tile, tile + 2 * pad), :],
            xbuf.at[slot], sems.at[slot],
        )

    @pl.when(g == 0)
    def _():
        make_dma(0, 0).start()

    @pl.when(g + 1 < total)
    def _():
        make_dma(g + 1, (g + 1) % 2).start()

    slot = g % 2
    make_dma(g, slot).wait()

    x_center = xbuf[slot, pad: pad + tile, :]
    x_left = xbuf[slot, pad - dilation: pad - dilation + tile, :]
    x_right = xbuf[slot, pad + dilation: pad + dilation + tile, :]

    acts = (
        jnp.dot(x_left, w_in_ref[0], preferred_element_type = jnp.float32)
        + jnp.dot(x_center, w_in_ref[1], preferred_element_type = jnp.float32)
        + jnp.dot(x_right, w_in_ref[2], preferred_element_type = jnp.float32)
        + b_in_ref[:].astype(jnp.float32)
        + cond_ref[0].astype(jnp.float32)
    )
    gated = jnp.tanh(acts[:, :channels]) * jax.nn.sigmoid(acts[:, channels:])

    res_skip = jnp.dot(
        gated.astype(x_center.dtype), w_rs_ref[0],
        preferred_element_type = jnp.float32,
    ) + b_rs_ref[:].astype(jnp.float32)

    if residual:
        x_out_ref[0] = (x_center.astype(jnp.float32)
                        + res_skip[:, :channels]).astype(x_out_ref.dtype)
        skip_ref[0] = res_skip[:, channels:].astype(skip_ref.dtype)
    else:
        x_out_ref[0] = x_center
        skip_ref[0] = res_skip.astype(skip_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames = ('dilation', 'pad', 'residual', 'tile'),
)
def fused_wn_layer(x_padded, cond, w_in, b_in, w_rs, b_rs, *,
                   dilation, pad, residual = True, tile = 512):
    """One fused WN layer.

    - x_padded: (B, T + 2*pad, C) — input pre-padded with `pad >= dilation`
      zeros on the time axis;
    - cond: (B, T, 2C) conditioning (already projected);
    - w_in: (3, C, 2C) the three dilated-conv taps; b_in: (2C,);
    - w_rs: (1, C, rs_out) pointwise res/skip kernel; b_rs: (rs_out,);
    - returns (x_out (B, T, C) [= x + res when residual], skip (B, T, S)).
    """
    B = x_padded.shape[0]
    T = cond.shape[1]
    C = x_padded.shape[2]
    rs_out = w_rs.shape[2]
    skip_ch = rs_out - C if residual else rs_out
    assert T % tile == 0, 'T ({}) must be a multiple of tile ({})'.format(T, tile)
    assert pad >= dilation

    n_tiles = T // tile
    grid = (B * n_tiles,)
    out_shapes = (
        jax.ShapeDtypeStruct((B, T, C), x_padded.dtype),
        jax.ShapeDtypeStruct((B, T, skip_ch), x_padded.dtype),
    )

    kernel = functools.partial(
        _wn_layer_kernel, tile = tile, channels = C,
        dilation = dilation, pad = pad, residual = residual,
        n_tiles = n_tiles,
    )

    def tile_index(g):
        return (g // n_tiles, g % n_tiles, 0)

    return pl.pallas_call(
        kernel,
        grid = grid,
        in_specs = [
            pl.BlockSpec(memory_space = pl.ANY),            # x (manual DMA)
            pl.BlockSpec((1, tile, 2 * C), tile_index,
                         memory_space = pltpu.VMEM),
            pl.BlockSpec((3, C, 2 * C), lambda g: (0, 0, 0),
                         memory_space = pltpu.VMEM),
            pl.BlockSpec((2 * C,), lambda g: (0,),
                         memory_space = pltpu.VMEM),
            pl.BlockSpec((1, C, rs_out), lambda g: (0, 0, 0),
                         memory_space = pltpu.VMEM),
            pl.BlockSpec((rs_out,), lambda g: (0,),
                         memory_space = pltpu.VMEM),
        ],
        out_specs = (
            pl.BlockSpec((1, tile, C), tile_index,
                         memory_space = pltpu.VMEM),
            pl.BlockSpec((1, tile, skip_ch), tile_index,
                         memory_space = pltpu.VMEM),
        ),
        out_shape = out_shapes,
        scratch_shapes = [
            pltpu.VMEM((2, tile + 2 * pad, C), x_padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x_padded, cond, w_in, b_in, w_rs, b_rs)


def _round_up(x, m):
    return -(-x // m) * m


def _wn_block_kernel(x_hbm, spect_hbm,
                     w_cond_ref, b_cond_ref, w_in_ref, b_in_ref,
                     w_rs_ref, b_rs_ref, w_rs_last_ref, b_rs_last_ref,
                     skip_out_ref,
                     xbuf, xalt, spectbuf, skipacc, sems,
                     *, tile, channels, n_layers, n_tiles, seq_len,
                     halo, margin, chunk, skip = 0):
    """One whole WN coupling block (all dilated layers) for one (batch,
    time-tile) grid step.  See `fused_wn_block` for the contract."""
    C = channels
    g = pl.program_id(0)
    total = pl.num_programs(0)
    pad = halo + margin            # total pre-padding of x/spect on each side
    t_b = tile + 2 * pad           # buffer rows
    ext = tile + 2 * halo          # compute extent (rows [margin, margin+ext))
    n_chunks = ext // chunk

    def dma(src_hbm, dst, sem_base, step, slot):
        return pltpu.make_async_copy(
            src_hbm.at[step // n_tiles,
                       pl.ds(skip + (step % n_tiles) * tile, t_b), :],
            dst.at[slot], sems.at[sem_base + slot],
        )

    @pl.when(g == 0)
    def _():
        dma(x_hbm, xbuf, 0, 0, 0).start()
        dma(spect_hbm, spectbuf, 2, 0, 0).start()

    @pl.when(g + 1 < total)
    def _():
        dma(x_hbm, xbuf, 0, g + 1, (g + 1) % 2).start()
        dma(spect_hbm, spectbuf, 2, g + 1, (g + 1) % 2).start()

    slot = g % 2
    dma(x_hbm, xbuf, 0, g, slot).wait()
    dma(spect_hbm, spectbuf, 2, g, slot).wait()

    # f32 inputs (parity tests) want true-f32 matmuls (bf16x3 passes); bf16
    # serving uses the MXU's native precision
    mxu = jax.lax.Precision.HIGHEST \
        if xbuf.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    dot = functools.partial(
        jnp.dot, preferred_element_type = jnp.float32, precision = mxu)

    # the ping-pong buffer's margins are never written by the layer updates;
    # zero them once so out-of-extent taps read SAME-pad zeros
    xalt[0: margin, :] = jnp.zeros((margin, C), xalt.dtype)
    xalt[t_b - margin: t_b, :] = jnp.zeros((margin, C), xalt.dtype)
    skipacc[:] = jnp.zeros((ext, C), jnp.float32)

    # global position of buffer row `margin` (start of the compute extent);
    # rows outside [0, seq_len) are zeroed after each update to preserve the
    # reference's per-layer SAME-pad semantics at utterance edges
    ext_start = (g % n_tiles) * tile - halo

    src, dst = xbuf.at[slot], xalt
    for i in range(n_layers):
        dilation = 2 ** i
        last = i == n_layers - 1

        def chunk_body(c, _, *, i = i, dilation = dilation, last = last,
                       src = src, dst = dst):
            off = pl.multiple_of(c * chunk, chunk) + margin
            if dilation % 16 == 0:
                # dynamic offsets stay sublane-aligned
                xl = src[pl.ds(off - dilation, chunk), :]
                xc = src[pl.ds(off, chunk), :]
                xr = src[pl.ds(off + dilation, chunk), :]
            else:
                # Mosaic requires aligned dynamic loads: fetch one aligned
                # window, shift in-register with static slices
                a = 16
                win = src[pl.ds(off - a, chunk + 2 * a), :]
                xl = jax.lax.slice(win, (a - dilation, 0), (a - dilation + chunk, C))
                xc = jax.lax.slice(win, (a, 0), (a + chunk, C))
                xr = jax.lax.slice(win, (a + dilation, 0), (a + dilation + chunk, C))
            sp = spectbuf[slot, pl.ds(off, chunk), :]

            acts = (
                dot(xl, w_in_ref[i, 0])
                + dot(xc, w_in_ref[i, 1])
                + dot(xr, w_in_ref[i, 2])
                + dot(sp, w_cond_ref[i])
                + b_in_ref[i].astype(jnp.float32)
                + b_cond_ref[i].astype(jnp.float32)
            )
            gated = (jnp.tanh(acts[:, :C])
                     * jax.nn.sigmoid(acts[:, C:])).astype(src.dtype)

            acc_rows = pl.ds(off - margin, chunk)
            if last:
                skip = dot(gated, w_rs_last_ref[:]) \
                    + b_rs_last_ref[:].astype(jnp.float32)
                skipacc[acc_rows, :] = skipacc[acc_rows, :] + skip
            else:
                rs = dot(gated, w_rs_ref[i]) \
                    + b_rs_ref[i].astype(jnp.float32)
                new_x = xc.astype(jnp.float32) + rs[:, :C]
                gpos = ext_start + (off - margin) \
                    + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
                valid = (gpos >= 0) & (gpos < seq_len)
                dst[pl.ds(off, chunk), :] = jnp.where(
                    valid, new_x, 0.).astype(dst.dtype)
                skipacc[acc_rows, :] = skipacc[acc_rows, :] + rs[:, C:]
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        src, dst = dst, src

    skip_out_ref[0] = skipacc[halo: halo + tile, :].astype(skip_out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames = ('tile', 'seq_len', 'chunk', 'interpret'),
)
def fused_wn_block(x_padded, spect_padded, w_cond, b_cond, w_in, b_in,
                   w_rs, b_rs, w_rs_last, b_rs_last, *, tile, seq_len,
                   chunk = None, interpret = False):
    """Whole WN coupling block — all `n_layers` dilated gated layers,
    conditioning projections included — in ONE Pallas kernel.

    Equivalent computation to the reference's WaveglowBlock
    (``/root/reference/architectures/waveglow_arch.py:27-156``: per-layer
    dilated conv + cond add + tanh*sigmoid gate + res/skip conv), minus the
    surrounding start/end pointwise convs (cheap; left to XLA).

    TPU design: all layer weights (~44 MB bf16 at full size) stay resident
    in VMEM across the whole grid; the conditioning projections run
    *inside* the kernel from the raw upsampled-mel tile, so the (B, T,
    n_layers*2C) conditioning tensor never exists in HBM; x/spect tiles
    stream in with double-buffered halo DMAs; activations accumulate in
    f32 and never leave VMEM between layers (ping-pong x buffers).

    Boundary semantics match the per-layer SAME-pad reference exactly:
    the halo covers the full receptive field (sum of dilations) plus a
    `margin` of max-dilation zero rows, and positions outside
    ``[0, seq_len)`` are re-zeroed after every residual update.

    Args:
      x_padded: (B, T + 2*pad, C) — start-conv output, zero-padded in time
        by ``pad = round_up(sum(dilations),16) + round_up(max_dilation,16)``
        (use `wn_block_pad(n_layers)`).
      spect_padded: (B, T + 2*pad, S) — upsampled grouped mel, same padding.
      w_cond: (L, S, 2C); b_cond: (L, 2C) — per-layer conditioning weights.
      w_in: (L, 3, C, 2C); b_in: (L, 2C) — 3-tap dilated conv weights.
      w_rs: (L-1, C, 2C); b_rs: (L-1, 2C) — res/skip weights (layers 0..L-2).
      w_rs_last: (C, C); b_rs_last: (C,) — last layer emits skip only.
      tile: time-tile size (multiple of 512 dividing T).
      seq_len: T (unpadded), for edge masking.

    Returns skip_sum (B, T, C); apply the block's `end` conv outside.
    """
    n_layers = w_in.shape[0]
    C = w_in.shape[2]
    S = spect_padded.shape[2]
    B = x_padded.shape[0]
    halo = _round_up(2 ** n_layers - 1, 16)
    margin = _round_up(2 ** (n_layers - 1), 16)
    pad = halo + margin
    T = x_padded.shape[1] - 2 * pad
    assert T == seq_len and T % tile == 0, (T, seq_len, tile)
    ext = tile + 2 * halo
    if chunk is None:
        chunk = next(c for c in (512, 256, 128, 64, 32, 16, 8) if ext % c == 0)
    assert ext % chunk == 0

    n_tiles = T // tile
    t_b = tile + 2 * pad
    kernel = functools.partial(
        _wn_block_kernel, tile = tile, channels = C, n_layers = n_layers,
        n_tiles = n_tiles, seq_len = seq_len, halo = halo, margin = margin,
        chunk = chunk,
    )

    const = lambda shape: pl.BlockSpec(
        shape, lambda g: (0,) * len(shape), memory_space = pltpu.VMEM)

    flops_tile = 2 * ext * C * 2 * C * (3 * n_layers + (n_layers - 1) + S / C * n_layers + 0.5)
    return pl.pallas_call(
        kernel,
        grid = (B * n_tiles,),
        in_specs = [
            pl.BlockSpec(memory_space = pl.ANY),      # x (manual DMA)
            pl.BlockSpec(memory_space = pl.ANY),      # spect (manual DMA)
            const((n_layers, S, 2 * C)),
            const((n_layers, 2 * C)),
            const((n_layers, 3, C, 2 * C)),
            const((n_layers, 2 * C)),
            const((max(n_layers - 1, 1), C, 2 * C)),
            const((max(n_layers - 1, 1), 2 * C)),
            const((C, C)),
            const((C,)),
        ],
        out_specs = pl.BlockSpec(
            (1, tile, C), lambda g, n_tiles = n_tiles: (g // n_tiles, g % n_tiles, 0),
            memory_space = pltpu.VMEM),
        out_shape = jax.ShapeDtypeStruct((B, T, C), x_padded.dtype),
        scratch_shapes = [
            pltpu.VMEM((2, t_b, C), x_padded.dtype),     # DMA'd x (ping)
            pltpu.VMEM((t_b, C), x_padded.dtype),        # pong
            pltpu.VMEM((2, t_b, S), spect_padded.dtype),
            pltpu.VMEM((ext, C), jnp.float32),           # skip accumulator
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes = 127 * 1024 * 1024,
        ),
        interpret = interpret,
        cost_estimate = pl.CostEstimate(
            flops = int(flops_tile) * B * n_tiles,
            bytes_accessed = B * n_tiles * t_b * (C + S) * 2,
            transcendentals = B * n_tiles * ext * 2 * C * n_layers,
        ),
    )(x_padded, spect_padded, w_cond, b_cond, w_in, b_in,
      w_rs, b_rs, w_rs_last, b_rs_last)


def wn_block_pad(n_layers):
    """Time padding `fused_wn_block` expects on each side of x/spect."""
    return _round_up(2 ** n_layers - 1, 16) + _round_up(2 ** (n_layers - 1), 16)


def wn_block_reference(x, spect, w_cond, b_cond, w_in, b_in, w_rs, b_rs,
                       w_rs_last, b_rs_last):
    """Pure-XLA reference of `fused_wn_block` (for numeric verification):
    the per-layer SAME-pad chain with per-layer conditioning projections."""
    n_layers = w_in.shape[0]
    C = w_in.shape[2]
    skip_sum = 0.
    for i in range(n_layers):
        cond = spect @ w_cond[i] + b_cond[i]
        last = i == n_layers - 1
        if last:
            w, b = w_rs_last[None], b_rs_last
        else:
            w, b = w_rs[i][None], b_rs[i]
        x, skip = wn_layer_reference(
            x, cond, w_in[i], b_in[i], w, b,
            dilation = 2 ** i, residual = not last,
        )
        skip_sum = skip_sum + skip
    return skip_sum


def wn_layer_reference(x, cond, w_in, b_in, w_rs, b_rs, *, dilation,
                       residual = True):
    """Pure-XLA reference of the fused layer (for numeric verification)."""
    from jax import lax
    acts = lax.conv_general_dilated(
        x, w_in, (1,), 'SAME', rhs_dilation = (dilation,),
        dimension_numbers = ('NWC', 'WIO', 'NWC'),
    ) + b_in + cond
    C = x.shape[-1]
    gated = jnp.tanh(acts[..., :C]) * jax.nn.sigmoid(acts[..., C:])
    res_skip = lax.conv_general_dilated(
        gated, w_rs, (1,), 'SAME', dimension_numbers = ('NWC', 'WIO', 'NWC'),
    ) + b_rs
    if residual:
        return x + res_skip[..., :C], res_skip[..., C:]
    return x, res_skip


# ---------------------------------------------------------------------------
# int8 whole-block kernel
#
# Same structure as `_wn_block_kernel`, but every matmul runs on the MXU's
# int8 path (v5e: 394 TOPS vs 197 TFLOP/s bf16).  Weights are pre-quantized
# symmetric int8 with PER-OUTPUT-CHANNEL scales (`quantize_wn_weights`);
# activations quantize dynamically PER ROW (per time step) inside the kernel
# — the quant/dequant passes are VPU work fused between the matmuls, so
# unlike the XLA-level int8 path (see waveglow_arch.quantize_params notes)
# nothing round-trips through HBM.  The gated tanh·sigmoid tail, scale
# arithmetic, residual adds and skip accumulation all stay f32 in VMEM.
# ---------------------------------------------------------------------------

_INT8_EPS = 1e-8


def _row_quant(x_f32, eps = _INT8_EPS):
    """Per-row symmetric int8 quantization: returns (q_int8, scale_f32[r,1])."""
    amax = jnp.max(jnp.abs(x_f32), axis = -1, keepdims = True)
    scale = jnp.maximum(amax, eps) * (1. / 127.)
    q = jnp.clip(jnp.round(x_f32 / scale), -127., 127.).astype(jnp.int8)
    return q, scale


def _wn_block_int8_kernel(x_hbm, spect_hbm,
                          w_cond_ref, s_cond_ref,
                          w_in_ref, s_in_ref, b_ref,
                          w_rs_ref, s_rs_ref, b_rs_ref,
                          w_rs_last_ref, s_rs_last_ref, b_rs_last_ref,
                          skip_out_ref,
                          xbuf, xalt, spectbuf, spq, sspq, xq, sxq,
                          skipacc, sems,
                          *, tile, channels, n_layers, n_tiles, seq_len,
                          halo, margin, chunk, unroll = False,
                          aligned_probe = False, skip = 0,
                          static_gate_scale = False):
    """int8 whole WN coupling block for one (batch, time-tile) grid step.
    See `fused_wn_block_int8` for the contract."""
    C = channels
    g = pl.program_id(0)
    total = pl.num_programs(0)
    pad = halo + margin
    t_b = tile + 2 * pad
    ext = tile + 2 * halo
    n_chunks = ext // chunk

    def dma(src_hbm, dst, sem_base, step, slot):
        return pltpu.make_async_copy(
            src_hbm.at[step // n_tiles,
                       pl.ds(skip + (step % n_tiles) * tile, t_b), :],
            dst.at[slot], sems.at[sem_base + slot],
        )

    @pl.when(g == 0)
    def _():
        dma(x_hbm, xbuf, 0, 0, 0).start()
        dma(spect_hbm, spectbuf, 2, 0, 0).start()

    @pl.when(g + 1 < total)
    def _():
        dma(x_hbm, xbuf, 0, g + 1, (g + 1) % 2).start()
        dma(spect_hbm, spectbuf, 2, g + 1, (g + 1) % 2).start()

    slot = g % 2
    dma(x_hbm, xbuf, 0, g, slot).wait()
    dma(spect_hbm, spectbuf, 2, g, slot).wait()

    doti = functools.partial(jnp.dot, preferred_element_type = jnp.int32)

    # quantize the conditioning tile ONCE; it is reused by all layers
    q, s = _row_quant(spectbuf[slot].astype(jnp.float32))
    spq[:] = q
    sspq[:] = s

    xalt[0: margin, :] = jnp.zeros((margin, C), xalt.dtype)
    xalt[t_b - margin: t_b, :] = jnp.zeros((margin, C), xalt.dtype)
    skipacc[:] = jnp.zeros((ext, C), jnp.float32)

    # Seed the quantized-x ping-pong margins with zeros.  NOTE: the full-slot
    # write `xq[0] = q` below immediately overwrites slot 0's margins with
    # quantized DMA'd rows, and later layers writing a slot leave stale margin
    # rows behind — correctness does NOT rest on these zeros.  It rests on
    # halo (256) >= the stack's total receptive field (sum of dilations = 255),
    # which keeps any corrupted edge rows out of the emitted tile.
    for qs in (0, 1):
        xq[qs, 0: margin, :] = jnp.zeros((margin, C), jnp.int8)
        xq[qs, t_b - margin: t_b, :] = jnp.zeros((margin, C), jnp.int8)
        # the row-scale margins must also be defined: a NaN/garbage scale
        # times a zero q row is NaN, which in halo-free (single-tile) mode
        # would land in EMITTED rows (the tiled path merely contained it
        # inside the unemitted halo)
        sxq[qs, 0: margin, :] = jnp.zeros((margin, 1), jnp.float32)
        sxq[qs, t_b - margin: t_b, :] = jnp.zeros((margin, 1), jnp.float32)

    # layer 0 quantizes the DMA'd input once; later layers requantize
    # inside the residual-update write (no extra buffer pass)
    q, s = _row_quant(xbuf[slot].astype(jnp.float32))
    xq[0] = q
    sxq[0] = s

    ext_start = (g % n_tiles) * tile - halo

    src, dst = xbuf.at[slot], xalt
    for i in range(n_layers):
        dilation = 2 ** i
        if aligned_probe and dilation < 32:
            dilation = 32          # PERF PROBE ONLY: wrong numerics
        last = last_layer = i == n_layers - 1
        qs = i % 2          # quantized-x slot for this layer

        def chunk_body(c, _, *, i = i, dilation = dilation, last = last,
                       src = src, dst = dst, qs = qs):
            off = pl.multiple_of(c * chunk, chunk) + margin
            if dilation % 32 == 0:
                # int8 sublane tiling is 32: aligned dynamic loads only
                xl = xq[qs, pl.ds(off - dilation, chunk), :]
                xc = xq[qs, pl.ds(off, chunk), :]
                xr = xq[qs, pl.ds(off + dilation, chunk), :]
                sl = sxq[qs, pl.ds(off - dilation, chunk), :]
                sc = sxq[qs, pl.ds(off, chunk), :]
                sr = sxq[qs, pl.ds(off + dilation, chunk), :]
            else:
                # fetch one 32-aligned window, shift in-register
                a = 32
                win = xq[qs, pl.ds(off - a, chunk + 2 * a), :]
                swin = sxq[qs, pl.ds(off - a, chunk + 2 * a), :]
                xl = jax.lax.slice(win, (a - dilation, 0), (a - dilation + chunk, C))
                xc = jax.lax.slice(win, (a, 0), (a + chunk, C))
                xr = jax.lax.slice(win, (a + dilation, 0), (a + dilation + chunk, C))
                sl = jax.lax.slice(swin, (a - dilation, 0), (a - dilation + chunk, 1))
                sc = jax.lax.slice(swin, (a, 0), (a + chunk, 1))
                sr = jax.lax.slice(swin, (a + dilation, 0), (a + dilation + chunk, 1))
            sp = spq[pl.ds(off, chunk), :]
            ssp = sspq[pl.ds(off, chunk), :]

            # each tap's i32 product carries its own row scale; the shared
            # per-output-channel weight scale factors out of the sum
            in_acc = (doti(xl, w_in_ref[i, 0]).astype(jnp.float32) * sl
                      + doti(xc, w_in_ref[i, 1]).astype(jnp.float32) * sc
                      + doti(xr, w_in_ref[i, 2]).astype(jnp.float32) * sr)
            cond_acc = doti(sp, w_cond_ref[i]).astype(jnp.float32) * ssp
            # b = b_in + b_cond folded at call time (one VPU pass saved)
            acts = (in_acc * s_in_ref[i].astype(jnp.float32)
                    + cond_acc * s_cond_ref[i].astype(jnp.float32)
                    + b_ref[i].astype(jnp.float32))
            gated = jnp.tanh(acts[:, :C]) * jax.nn.sigmoid(acts[:, C:])

            if static_gate_scale:
                # tanh·sigmoid is bounded in (-1, 1): a fixed 1/127 scale is
                # always valid, so the per-row amax reduce + div disappears —
                # the 1/127 is pre-folded into s_rs/s_rs_last at call time
                g_q = jnp.clip(jnp.round(gated * 127.),
                               -127., 127.).astype(jnp.int8)
                g_s = None
            else:
                g_q, g_s = _row_quant(gated)

            def descale(prod, s_ref):
                w_scale = s_ref.astype(jnp.float32)
                if g_s is None:
                    return prod.astype(jnp.float32) * w_scale
                return prod.astype(jnp.float32) * g_s * w_scale

            acc_rows = pl.ds(off - margin, chunk)
            if last:
                skip = (descale(doti(g_q, w_rs_last_ref[:]), s_rs_last_ref[:])
                        + b_rs_last_ref[:].astype(jnp.float32))
                skipacc[acc_rows, :] = skipacc[acc_rows, :] + skip
            else:
                rs = (descale(doti(g_q, w_rs_ref[i]), s_rs_ref[i])
                      + b_rs_ref[i].astype(jnp.float32))
                # residual base is the TRUE stream from src (not the
                # dequantized xc) so quantization error does not compound
                # across layers through the residual path
                xc_true = src[pl.ds(off, chunk), :]
                new_x = xc_true.astype(jnp.float32) + rs[:, :C]
                dst[pl.ds(off, chunk), :] = new_x.astype(dst.dtype)
                # fused requantization for the next layer's taps
                nq, ns = _row_quant(new_x)
                xq[1 - qs, pl.ds(off, chunk), :] = nq
                sxq[1 - qs, pl.ds(off, chunk), :] = ns
                skipacc[acc_rows, :] = skipacc[acc_rows, :] + rs[:, C:]
            return 0

        if unroll:
            # static unroll: Mosaic sees one DAG per layer and can overlap a
            # chunk's MXU matmuls with the previous chunk's elementwise tail
            for c in range(n_chunks):
                chunk_body(c, 0)
        else:
            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

        if not last_layer and halo > 0:
            # Sequence-edge semantics (conv 'SAME' zero padding): rows before
            # position 0 / after seq_len-1 must read as zeros in the next
            # layer's taps.  Zeroing the halo rows ONCE per layer replaces a
            # per-chunk iota+compare+where over all of ext (~15% of the
            # kernel's VPU work).  Stale sxq scales over q=0 dequantize to 0.
            tile_idx = g % n_tiles
            qn = 1 - (i % 2)

            @pl.when(tile_idx == 0)
            def _():
                dst[pl.ds(margin, halo), :] = jnp.zeros((halo, C), dst.dtype)
                xq[qn, pl.ds(margin, halo), :] = jnp.zeros((halo, C), jnp.int8)

            @pl.when(tile_idx == n_tiles - 1)
            def _():
                o = t_b - margin - halo
                dst[pl.ds(o, halo), :] = jnp.zeros((halo, C), dst.dtype)
                xq[qn, pl.ds(o, halo), :] = jnp.zeros((halo, C), jnp.int8)

        src, dst = dst, src

    skip_out_ref[0] = skipacc[halo: halo + tile, :].astype(skip_out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames = ('tile', 'seq_len', 'chunk', 'interpret', 'unroll',
                       'aligned_probe', 'static_gate_scale'),
)
def fused_wn_block_int8(x_padded, spect_padded, quant, *, tile, seq_len,
                        chunk = None, interpret = False, unroll = False,
                        aligned_probe = False, static_gate_scale = False):
    """int8 variant of `fused_wn_block`.

    `quant` is the dict produced by `quantize_wn_weights` from the packed
    f32 weights: int8 kernels ``w_*`` with per-output-channel f32 scales
    ``s_*`` and f32 biases ``b_*``.  x/spect layouts and padding are
    identical to the bf16 kernel (use `wn_block_pad`).  Activation rows
    quantize dynamically in-kernel.  Returns skip_sum (B, T, C) in
    ``x_padded.dtype``.
    """
    w_in = quant['w_in']
    n_layers = w_in.shape[0]
    C = w_in.shape[2]
    S = spect_padded.shape[2]
    B = x_padded.shape[0]
    caller_pad = (x_padded.shape[1] - seq_len) // 2
    assert x_padded.shape[1] == seq_len + 2 * caller_pad
    margin = _round_up(2 ** (n_layers - 1), 32)
    if tile == seq_len:
        # single-tile mode: no internal tile boundaries, and the sequence
        # edges are zeros ('SAME' padding) kept zero by the margin rows —
        # so NO halo rows are recomputed at all (the tiled path recomputes
        # 2*halo rows per tile per layer, 12.5% extra at tile=4096)
        halo = 0
    else:
        halo = _round_up(2 ** n_layers - 1, 32)
    pad = halo + margin
    skip = caller_pad - pad
    assert skip >= 0, (caller_pad, pad)
    T = seq_len
    assert T % tile == 0, (T, tile)
    ext = tile + 2 * halo
    if chunk is None:
        chunk = next(c for c in (512, 256, 128, 64, 32) if ext % c == 0)
    assert ext % chunk == 0 and chunk % 32 == 0

    n_tiles = T // tile
    t_b = tile + 2 * pad
    kernel = functools.partial(
        _wn_block_int8_kernel, tile = tile, channels = C,
        n_layers = n_layers, n_tiles = n_tiles, seq_len = seq_len,
        halo = halo, margin = margin, chunk = chunk, unroll = unroll,
        aligned_probe = aligned_probe, skip = skip,
        static_gate_scale = static_gate_scale,
    )

    const = lambda shape: pl.BlockSpec(
        shape, lambda g: (0,) * len(shape), memory_space = pltpu.VMEM)

    flops_tile = 2 * ext * C * 2 * C * (3 * n_layers + (n_layers - 1) + S / C * n_layers + 0.5)
    call = pl.pallas_call(
        kernel,
        grid = (B * n_tiles,),
        in_specs = [
            pl.BlockSpec(memory_space = pl.ANY),      # x (manual DMA)
            pl.BlockSpec(memory_space = pl.ANY),      # spect (manual DMA)
            const((n_layers, S, 2 * C)),                 # w_cond int8
            const((n_layers, 2 * C)),                    # s_cond
            const((n_layers, 3, C, 2 * C)),              # w_in int8
            const((n_layers, 2 * C)),                    # s_in
            const((n_layers, 2 * C)),                    # b = b_in + b_cond
            const((max(n_layers - 1, 1), C, 2 * C)),     # w_rs int8
            const((max(n_layers - 1, 1), 2 * C)),        # s_rs
            const((max(n_layers - 1, 1), 2 * C)),        # b_rs
            const((C, C)),                               # w_rs_last int8
            const((C,)),                                 # s_rs_last
            const((C,)),                                 # b_rs_last
        ],
        out_specs = pl.BlockSpec(
            (1, tile, C), lambda g, n_tiles = n_tiles: (g // n_tiles, g % n_tiles, 0),
            memory_space = pltpu.VMEM),
        out_shape = jax.ShapeDtypeStruct((B, T, C), x_padded.dtype),
        scratch_shapes = [
            pltpu.VMEM((2, t_b, C), x_padded.dtype),     # DMA'd x (ping)
            pltpu.VMEM((t_b, C), x_padded.dtype),        # pong
            pltpu.VMEM((2, t_b, S), spect_padded.dtype),
            pltpu.VMEM((t_b, S), jnp.int8),              # quantized spect
            pltpu.VMEM((t_b, 1), jnp.float32),           # spect row scales
            pltpu.VMEM((2, t_b, C), jnp.int8),           # quantized x ping-pong
            pltpu.VMEM((2, t_b, 1), jnp.float32),        # x row scales ping-pong
            pltpu.VMEM((ext, C), jnp.float32),           # skip accumulator
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes = 128 * 1024 * 1024,
        ),
        interpret = interpret,
        cost_estimate = pl.CostEstimate(
            # int8 matmul "flops" at half the bf16 cost steers the scheduler
            flops = int(flops_tile) * B * n_tiles // 2,
            bytes_accessed = B * n_tiles * t_b * (C + S) * 2,
            transcendentals = B * n_tiles * ext * 2 * C * n_layers,
        ),
    )
    gs = (1. / 127.) if static_gate_scale else 1.   # pre-folded gate scale
    return call(x_padded, spect_padded,
                quant['w_cond'], quant['s_cond'],
                quant['w_in'], quant['s_in'],
                (quant['b_in'] + quant['b_cond']).astype(jnp.float32),
                quant['w_rs'], quant['s_rs'] * gs, quant['b_rs'],
                quant['w_rs_last'], quant['s_rs_last'] * gs,
                quant['b_rs_last'])


def wn_block_pad_int8(n_layers):
    """Time padding `fused_wn_block_int8` expects (32-aligned for int8
    sublane tiling, vs 16 for the bf16 kernel)."""
    return _round_up(2 ** n_layers - 1, 32) + _round_up(2 ** (n_layers - 1), 32)


def quantize_wn_weights(packed):
    """Pre-quantize one block's packed WN weights (see
    `WaveGlow.pack_pallas_params`) to symmetric int8 with per-output-channel
    scales, for `fused_wn_block_int8`.  The three taps of each dilated conv
    share their output-channel scale so it factors out of the tap sum."""
    import numpy as np

    def q(w, axes):
        """Quantize per output channel; scale returned without the reduced
        axes (e.g. (L,3,C,2C) reduced over (1,2) → scale (L,2C))."""
        w = np.asarray(w, np.float32)
        scale = np.maximum(
            np.max(np.abs(w), axis = axes, keepdims = True), _INT8_EPS) / 127.
        w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return w_q, np.squeeze(scale, axis = axes).astype(np.float32)

    w_in, s_in = q(packed['w_in'], (1, 2))          # → scale (L, 2C)
    w_cond, s_cond = q(packed['w_cond'], (1,))      # → scale (L, 2C)
    w_rs, s_rs = q(packed['w_rs'], (1,))            # → scale (L-1, 2C)
    w_last, s_last = q(packed['w_rs_last'], (0,))   # → scale (C,)
    return {
        'w_in': w_in, 's_in': s_in,
        'b_in': np.asarray(packed['b_in'], np.float32),
        'w_cond': w_cond, 's_cond': s_cond,
        'b_cond': np.asarray(packed['b_cond'], np.float32),
        'w_rs': w_rs, 's_rs': s_rs,
        'b_rs': np.asarray(packed['b_rs'], np.float32),
        'w_rs_last': w_last, 's_rs_last': s_last,
        'b_rs_last': np.asarray(packed['b_rs_last'], np.float32),
    }


def wn_block_int8_reference(x, spect, quant, static_gate_scale = False):
    """Pure-XLA simulation of `fused_wn_block_int8`'s exact arithmetic
    (per-row activation quant, per-channel weight scales, f32 accumulate)
    for numeric verification of the kernel."""
    n_layers = quant['w_in'].shape[0]
    C = quant['w_in'].shape[2]

    def row_q(v):
        amax = jnp.max(jnp.abs(v), axis = -1, keepdims = True)
        scale = jnp.maximum(amax, _INT8_EPS) / 127.
        return jnp.clip(jnp.round(v / scale), -127, 127).astype(jnp.int8), scale

    x = x.astype(jnp.float32)
    sp_q, sp_s = row_q(spect.astype(jnp.float32))
    skip_sum = 0.
    for i in range(n_layers):
        last = i == n_layers - 1
        x_q, x_s = row_q(x)
        w = quant['w_in'][i]
        d = 2 ** i
        def tap(k):
            # SAME-pad dilated tap: roll + zero the wrapped edge
            T = x_q.shape[1]
            idx = jnp.arange(T) + k
            valid = (idx >= 0) & (idx < T)
            rolled_q = jnp.roll(x_q, -k, axis = 1)
            rolled_s = jnp.roll(x_s, -k, axis = 1)
            qv = jnp.where(valid[None, :, None], rolled_q, 0)
            return qv, rolled_s
        acc = 0.
        for t, k in enumerate((-d, 0, d)):
            qv, sv = tap(k)
            acc = acc + jnp.einsum(
                'btc,cd->btd', qv.astype(jnp.int32), w[t].astype(jnp.int32),
            ).astype(jnp.float32) * sv
        cond = jnp.einsum(
            'bts,sd->btd', sp_q.astype(jnp.int32),
            quant['w_cond'][i].astype(jnp.int32),
        ).astype(jnp.float32) * sp_s
        # parenthesization matters: the kernel adds the pre-folded
        # b_in+b_cond in ONE f32 add; matching it keeps row-amax ties (and
        # hence the int8 quantization grids) bit-identical
        acts = (acc * quant['s_in'][i] + cond * quant['s_cond'][i]
                + (quant['b_in'][i] + quant['b_cond'][i]))
        gated = jnp.tanh(acts[..., :C]) * jax.nn.sigmoid(acts[..., C:])
        if static_gate_scale:
            # mirror the kernel: fixed 1/127 activation scale pre-folded
            # into the weight scales (same multiply order bit-for-bit)
            g_q = jnp.clip(jnp.round(gated * 127.), -127., 127.).astype(jnp.int8)
            s_last = quant['s_rs_last'] * (1. / 127.)
            s_rs_i = quant['s_rs'] * (1. / 127.)
            g_s = 1.
        else:
            g_q, g_s = row_q(gated)
            s_last = quant['s_rs_last']
            s_rs_i = quant['s_rs']
        if last:
            skip = jnp.einsum(
                'btc,cd->btd', g_q.astype(jnp.int32),
                quant['w_rs_last'].astype(jnp.int32),
            ).astype(jnp.float32) * g_s * s_last + quant['b_rs_last']
            skip_sum = skip_sum + skip
        else:
            rs = jnp.einsum(
                'btc,cd->btd', g_q.astype(jnp.int32),
                quant['w_rs'][i].astype(jnp.int32),
            ).astype(jnp.float32) * g_s * s_rs_i[i] + quant['b_rs'][i]
            # like the kernel, the residual base is the true stream
            x = x + rs[..., :C]
            skip_sum = skip_sum + rs[..., C:]
    return skip_sum
