"""WaveGlow inverse-flow vocoder as pure JAX functions.

Capability parity with ``/root/reference/architectures/waveglow_arch.py``
(WN coupling block :27-156, flow stack + grouped reshape + early outputs
:159-306, invertible 1x1 conv ``layers/invertible_conv.py:16``) — re-designed
TPU-first:

  - every WN layer is a dilated conv + pointwise convs over (B, T, C):
    pure MXU work, XLA fuses the gated-tanh elementwise tail;
  - the 1x1 invertible convs are (c, c) matmuls; inverses are computed
    on-device (c ≤ 8, negligible) instead of cached Python-side;
  - inference is a Python loop over the *static* 12 flows inside one jit —
    unrolled by XLA into a single fused program;
  - forward (training) direction returns (z, log_s_total, log_det_W_total)
    for the flow maximum-likelihood loss.
"""

import jax
import jax.numpy as jnp

from ..hparams import HParams
from ..nn import layers as nn

HParamsWaveGlow = HParams(
    n_mel_channels = 80,
    n_flows = 12,
    n_group = 8,
    n_early_every = 4,
    n_early_size = 2,
    wn_layers = 8,
    wn_channels = 512,
    wn_kernel_size = 3,
    wn_fused = False,      # one (cond_ch, n_layers*2*wn_ch) cond matmul per block
    use_pallas = False,    # fused double-buffered Pallas WN-layer kernel
    # differentiable-path conv formulation: 'dilated' = conv_general_dilated,
    # 'shifted' = width shifted matmuls (nn.conv1d_shifted — pure MXU dots
    # for any dilation; the training-step A/B in train_throughput.py)
    wn_train_conv = 'dilated',
    # training forward through the fused whole-block Pallas kernel with an
    # XLA custom_vjp backward (`wn_block_train`): the kernel runs the
    # forward at its serving efficiency while gradients come from jax.vjp
    # over the reference XLA chain — the same recompute per-flow remat
    # already pays.  Requires wn_channels % 128 == 0, kernel 3, and the
    # grouped length % 512 == 0 (falls back otherwise).
    wn_train_fused = False,
    upsample_width = 1024,
    upsample_stride = 256,
    sigma = 1.0,
)


class WaveGlow:
    """Stateless architecture: static hparams + pure apply functions."""

    def __init__(self, ** kwargs):
        self.hp = HParamsWaveGlow.extract(kwargs)
        hp = self.hp
        # per-flow channel bookkeeping (early outputs shrink the stack)
        self.flow_channels = []
        n_remaining = hp.n_group
        for k in range(hp.n_flows):
            if k % hp.n_early_every == 0 and k > 0:
                n_remaining -= hp.n_early_size
            self.flow_channels.append(n_remaining)
        self.n_remaining_channels = n_remaining
        self.cond_channels = hp.n_mel_channels * hp.n_group

    # -- init ------------------------------------------------------------------

    def init(self, key):
        hp = self.hp
        keys = nn.split_keys(key, 2 + hp.n_flows * (2 + 3 * hp.wn_layers))
        params = {
            'upsample': nn.init_conv1d_transpose(
                next(keys), hp.upsample_width, hp.n_mel_channels, hp.n_mel_channels
            ),
        }
        for k in range(hp.n_flows):
            c = self.flow_channels[k]
            n_half = c // 2
            # orthogonal init keeps the 1x1 conv invertible from the start
            w = nn.orthogonal(next(keys), (c, c))
            block = {
                'start': nn.init_conv1d(next(keys), 1, n_half, hp.wn_channels),
                'end': {'kernel': jnp.zeros((1, hp.wn_channels, 2 * n_half)),
                        'bias': jnp.zeros((2 * n_half,))},
            }
            if hp.wn_fused:
                block['cond_layer'] = nn.init_conv1d(
                    next(keys), 1, self.cond_channels,
                    hp.wn_layers * 2 * hp.wn_channels,
                )
            for i in range(hp.wn_layers):
                block['in_conv_{}'.format(i)] = nn.init_conv1d(
                    next(keys), hp.wn_kernel_size, hp.wn_channels, 2 * hp.wn_channels
                )
                if not hp.wn_fused:
                    block['cond_conv_{}'.format(i)] = nn.init_conv1d(
                        next(keys), 1, self.cond_channels, 2 * hp.wn_channels
                    )
                out_ch = 2 * hp.wn_channels if i < hp.wn_layers - 1 else hp.wn_channels
                block['res_skip_conv_{}'.format(i)] = nn.init_conv1d(
                    next(keys), 1, hp.wn_channels, out_ch
                )
            params['flow_{}'.format(k)] = {'convinv': {'kernel': w}, 'block': block}
        return params

    def fuse_params(self, params):
        """Concatenate each block's per-layer cond convs into one wide
        ``cond_layer`` (numerically identical; one MXU matmul per block)."""
        fused = {}
        for name, value in params.items():
            if not name.startswith('flow_'):
                fused[name] = value
                continue
            block = dict(value['block'])
            if 'cond_layer' not in block and 'cond_conv_0' in block:
                kernels, biases = [], []
                for i in range(self.hp.wn_layers):
                    conv = block.pop('cond_conv_{}'.format(i))
                    kernels.append(conv['kernel'])
                    biases.append(conv['bias'])
                block['cond_layer'] = {
                    'kernel': jnp.concatenate(kernels, axis = 2),
                    'bias': jnp.concatenate(biases, axis = 0),
                }
            fused[name] = {'convinv': value['convinv'], 'block': block}
        return fused

    def _pack_block(self, block):
        """ONE block's WN weights → the fused-kernel stacked layout
        (numerically identity relayout; shared by `pack_pallas_params`
        and the trainable fused forward)."""
        L = self.hp.wn_layers
        if 'cond_layer' in block:
            k = block['cond_layer']['kernel'][0]              # (S, L*2C)
            S = k.shape[0]
            w_cond = jnp.transpose(k.reshape(S, L, -1), (1, 0, 2))
            b_cond = block['cond_layer']['bias'].reshape(L, -1)
        else:
            w_cond = jnp.stack(
                [block['cond_conv_{}'.format(i)]['kernel'][0] for i in range(L)])
            b_cond = jnp.stack(
                [block['cond_conv_{}'.format(i)]['bias'] for i in range(L)])
        w_in = jnp.stack(
            [block['in_conv_{}'.format(i)]['kernel'] for i in range(L)])
        b_in = jnp.stack(
            [block['in_conv_{}'.format(i)]['bias'] for i in range(L)])
        w_rs = jnp.stack(
            [block['res_skip_conv_{}'.format(i)]['kernel'][0] for i in range(L - 1)])
        b_rs = jnp.stack(
            [block['res_skip_conv_{}'.format(i)]['bias'] for i in range(L - 1)])
        last = block['res_skip_conv_{}'.format(L - 1)]
        return {
            'w_cond': w_cond, 'b_cond': b_cond, 'w_in': w_in, 'b_in': b_in,
            'w_rs': w_rs, 'b_rs': b_rs,
            'w_rs_last': last['kernel'][0], 'b_rs_last': last['bias'],
        }

    def pack_pallas_params(self, params):
        """Re-lay each block's WN weights into the stacked tensors the fused
        whole-block Pallas kernel (`ops.pallas_kernels.fused_wn_block`)
        consumes.  Numerically identity; call once at load time."""
        packed_params = {}
        for name, value in params.items():
            if not name.startswith('flow_'):
                packed_params[name] = value
                continue
            block = dict(value['block'])
            block['packed'] = self._pack_block(block)
            packed_params[name] = {'convinv': value['convinv'], 'block': block}
        return packed_params

    def wn_block_train(self, block, audio_half, spect):
        """WN stack with a PALLAS FORWARD and an XLA BACKWARD.

        `jax.custom_vjp`: the forward runs the fused whole-block kernel
        (activations never leave VMEM between layers — the serving path's
        efficiency, measured ~83 % of bf16 peak, vs the unfused XLA
        chain's ~19 %); the backward recomputes through the reference XLA
        chain with `jax.vjp` — the same recompute the per-flow remat
        already pays, so gradients are bit-identical to the unfused
        training path while the forward gets the kernel.  Value/gradient
        mismatch is bounded by the kernel's bf16 buffers (the quality
        gate in benchmarks/mixed_precision_parity.py arbitrates, as for
        every mixed path).  Gated by ``hp.wn_train_fused`` + the kernel's
        shape envelope (see `forward`)."""
        import jax as _jax
        from ..ops.pallas_kernels import fused_wn_block, wn_block_pad

        hp = self.hp

        def kernel_forward(block, audio_half, spect):
            pad = wn_block_pad(hp.wn_layers)
            buf_dtype = spect.dtype
            if jnp.dtype(buf_dtype).itemsize > 2:
                buf_dtype = jnp.bfloat16
            T = audio_half.shape[1]
            tile = next(t for t in (4096, 2048, 1024, 512) if T % t == 0)
            x = nn.conv1d(block['start'], audio_half.astype(
                block['start']['kernel'].dtype))
            x = jnp.pad(x.astype(buf_dtype), ((0, 0), (pad, pad), (0, 0)))
            sp = jnp.pad(spect, ((0, 0), (pad, pad), (0, 0))) \
                .astype(buf_dtype)
            p = _jax.tree_util.tree_map(
                lambda l: l.astype(buf_dtype), self._pack_block(block))
            skip_sum = fused_wn_block(
                x, sp, p['w_cond'], p['b_cond'], p['w_in'], p['b_in'],
                p['w_rs'], p['b_rs'], p['w_rs_last'], p['b_rs_last'],
                tile = tile, seq_len = T,
                interpret = _jax.default_backend() != 'tpu')
            w_end = block['end']['kernel'][0].astype(skip_sum.dtype)
            out = jnp.einsum('btc,ck->btk', skip_sum, w_end,
                             preferred_element_type = jnp.float32)
            if 'bias' in block['end']:
                out = out + block['end']['bias'].astype(jnp.float32)
            return out.astype(spect.dtype)

        @_jax.custom_vjp
        def f(block, audio_half, spect):
            return kernel_forward(block, audio_half, spect)

        def f_fwd(block, audio_half, spect):
            return kernel_forward(block, audio_half, spect), \
                (block, audio_half, spect)

        def f_bwd(res, g):
            block, audio_half, spect = res
            _, vjp = _jax.vjp(
                lambda b, a, s: self.wn_block(b, a, s, fused = False),
                block, audio_half, spect)
            return vjp(g)

        f.defvjp(f_fwd, f_bwd)
        return f(block, audio_half, spect)

    # -- int8 quantization -------------------------------------------------------

    def quantize_pallas_params(self, params, keep_packed = False):
        """Quantize each block's packed WN weights to int8 for the fused
        int8 Pallas kernel (`ops.pallas_kernels.fused_wn_block_int8`):
        per-output-channel weight scales computed here once; activations
        quantize per-row dynamically inside the kernel.  Call on the output
        of `pack_pallas_params`.  `keep_packed` retains the f32 packed
        weights alongside (for A/B comparison; doubles block HBM)."""
        from ..ops.pallas_kernels import quantize_wn_weights
        out = {}
        for name, value in params.items():
            if not name.startswith('flow_') or 'packed' not in value['block']:
                out[name] = value
                continue
            block = dict(value['block'])
            block['packed_q'] = jax.tree_util.tree_map(
                jnp.asarray, quantize_wn_weights(block['packed']))
            if not keep_packed:
                del block['packed']
            out[name] = {'convinv': value['convinv'], 'block': block}
        return out

    def quantize_params(self, params):
        """Quantize the WN convs to int8 (symmetric, per-output-channel
        weight scales); activations quantize dynamically per tensor.

        EXPERIMENTAL — measured on v5e (random weights): isolated int8 convs
        run ~2x bf16 (495 vs 255 TOPS), but end-to-end this path is ~5x
        SLOWER than bf16 (16x vs 81x real-time) because the per-conv
        quant/dequant elementwise passes dominate.  SUPERSEDED by
        `quantize_pallas_params` + the fused int8 whole-block kernel
        (`ops.pallas_kernels.fused_wn_block_int8`): 179x vs 113x real-time,
        and BETTER fidelity than bf16 serving (42 vs -3 dB waveform SNR vs
        f32 in the stable-flow regime) because only matmul operands are
        quantized — accumulation, residuals and everything outside the
        kernels stay f32.  This method remains as the pure-XLA fallback.
        """
        import numpy as np

        def quantize_conv(conv):
            w = np.asarray(conv['kernel'], np.float32)
            scale = np.max(np.abs(w), axis = (0, 1)) / 127.
            scale = np.maximum(scale, 1e-8)
            out = {
                'kernel_q': np.clip(np.round(w / scale), -127, 127).astype(np.int8),
                'scale': scale.astype(np.float32),
            }
            if 'bias' in conv: out['bias'] = np.asarray(conv['bias'])
            return out

        quantized = {}
        for name, value in params.items():
            if not name.startswith('flow_'):
                quantized[name] = value
                continue
            block = {}
            for key, conv in value['block'].items():
                if key.startswith(('in_conv', 'cond', 'res_skip')):
                    block[key] = quantize_conv(conv)
                else:
                    block[key] = conv
            quantized[name] = {'convinv': value['convinv'], 'block': block}
        return quantized

    @staticmethod
    def _conv_int8(q, x, *, dilation = 1):
        """Dynamic-activation int8 conv: y = (x_q ⊛ w_q) · (a_scale · w_scale)."""
        from jax import lax
        a_scale = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32) / 127., 1e-8)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                       -127, 127).astype(jnp.int8)
        y = lax.conv_general_dilated(
            x_q, q['kernel_q'], (1,), 'SAME', rhs_dilation = (dilation,),
            dimension_numbers = ('NWC', 'WIO', 'NWC'),
            preferred_element_type = jnp.int32,
        )
        y = y.astype(jnp.float32) * (a_scale * q['scale'])
        if 'bias' in q: y = y + q['bias']
        return y

    # -- WN coupling block -----------------------------------------------------

    def wn_block(self, block, audio_half, spect, spect_padded = None,
                 fused = True):
        """WaveNet-like stack: gated dilated convs conditioned on the mel,
        residual + skip accumulation; returns (B, T, 2*n_half) [b | s].

        With ``fused`` and packed weights present (see `pack_pallas_params`),
        the whole stack runs as one Pallas kernel; the XLA per-layer chain
        remains the differentiable / fallback path."""
        hp = self.hp
        n_ch = hp.wn_channels
        int8 = 'kernel_q' in block.get('in_conv_0', {})

        T = audio_half.shape[1]
        if fused and ('packed' in block or 'packed_q' in block) \
                and n_ch % 128 == 0 and T % 512 == 0:
            # whole coupling block in one Pallas kernel: all layers' weights
            # resident in VMEM, conditioning projected in-kernel, activations
            # never leave VMEM between layers; the int8 variant (packed_q)
            # runs the matmuls on the MXU's 2x-rate int8 path
            from ..ops.pallas_kernels import (
                fused_wn_block, fused_wn_block_int8,
                wn_block_pad, wn_block_pad_int8,
            )
            int8_kernel = 'packed_q' in block
            pad = wn_block_pad_int8(hp.wn_layers) if int8_kernel \
                else wn_block_pad(hp.wn_layers)
            buf_dtype = spect.dtype
            if jnp.dtype(buf_dtype).itemsize > 2:
                # the fused kernels are bf16/int8 matmul machines with f32
                # accumulation; f32 buffers + VMEM-resident weights would
                # blow past the per-core VMEM budget at serving tiles (and
                # halve the MXU rate).  f32 callers get mixed precision —
                # bf16 kernel operands, f32 skip accumulation and a f32
                # return — the same contract as int8 serving.
                buf_dtype = jnp.bfloat16
            if int8_kernel and T <= 8192:
                # single-tile mode: no internal tile boundaries → the kernel
                # skips ALL halo recompute (the tiled path redoes 2×halo rows
                # per tile per layer — 12.5% extra at tile=4096); VMEM-bound
                # to T ≤ 8192 at 512 channels / 16-bit buffers (~109 MB)
                tile = T
            else:
                tile = next(t for t in (4096, 2048, 1024, 512) if T % t == 0)
            x = nn.conv1d(block['start'], audio_half.astype(
                block['start']['kernel'].dtype))
            x = jnp.pad(x.astype(buf_dtype), ((0, 0), (pad, pad), (0, 0)))
            if spect_padded is None:
                spect_padded = jnp.pad(spect, ((0, 0), (pad, pad), (0, 0)))
            spect_padded = spect_padded.astype(buf_dtype)
            if int8_kernel:
                skip_sum = fused_wn_block_int8(
                    x, spect_padded, block['packed_q'],
                    tile = tile, seq_len = T,
                )
            else:
                p = jax.tree_util.tree_map(
                    lambda l: l.astype(buf_dtype), block['packed'])
                skip_sum = fused_wn_block(
                    x, spect_padded, p['w_cond'], p['b_cond'], p['w_in'],
                    p['b_in'], p['w_rs'], p['b_rs'], p['w_rs_last'],
                    p['b_rs_last'], tile = tile, seq_len = T,
                )
            # end conv with f32 accumulation: bf16 operands (no upconvert of
            # the (B, T, C) skip tensor) but f32 b/s outputs for the f32
            # audio stream (int8 mixed precision); the bf16 kernel path
            # keeps its uniform-dtype contract
            w_end = block['end']['kernel'][0].astype(skip_sum.dtype)
            out = jnp.einsum('btc,ck->btk', skip_sum, w_end,
                             preferred_element_type = jnp.float32)
            if 'bias' in block['end']:
                out = out + block['end']['bias'].astype(jnp.float32)
            # int8 keeps the f32 audio-stream contract; the bf16 kernel
            # returns in the CALLER's dtype (f32 callers forced to bf16
            # buffers above still get their f32 back)
            return out if int8_kernel else out.astype(spect.dtype)
        # 'shifted' expresses every conv as plain dots (see conv1d_shifted)
        # — the differentiable-path formulation the training-step A/B
        # selects; pointwise (width-1) convs become bare matmuls
        shifted = hp.get('wn_train_conv', 'dilated') == 'shifted'
        _conv = (lambda p, v, dilation = 1:
                 nn.conv1d_shifted(p, v, dilation = dilation)) if shifted \
            else (lambda p, v, dilation = 1:
                  nn.conv1d(p, v, dilation = dilation, padding = 'SAME'))
        x = _conv(block['start'], audio_half)
        cond_all = None
        if 'cond_layer' in block:
            # single wide matmul for every layer's conditioning projection
            if int8:
                cond_all = self._conv_int8(block['cond_layer'], spect)
            else:
                cond_all = _conv(block['cond_layer'], spect)

        # the fused Pallas kernel needs lane-aligned channels and whole tiles
        pallas_ok = (
            hp.use_pallas
            and n_ch % 128 == 0
            and x.shape[1] % 512 == 0
            and hp.wn_kernel_size == 3
        )

        output = None
        for i in range(hp.wn_layers):
            if cond_all is not None:
                cond = cond_all[..., i * 2 * n_ch: (i + 1) * 2 * n_ch]
            elif int8:
                cond = self._conv_int8(block['cond_conv_{}'.format(i)], spect)
            else:
                cond = nn.conv1d(block['cond_conv_{}'.format(i)], spect)

            in_conv = block['in_conv_{}'.format(i)]
            rs_conv = block['res_skip_conv_{}'.format(i)]
            last = i == hp.wn_layers - 1

            if int8:
                acts = self._conv_int8(in_conv, x, dilation = 2 ** i) + cond
                gated = jnp.tanh(acts[..., :n_ch]) * jax.nn.sigmoid(acts[..., n_ch:])
                res_skip = self._conv_int8(rs_conv, gated)
                if not last:
                    x = x + res_skip[..., :n_ch].astype(x.dtype)
                    skip = res_skip[..., n_ch:]
                else:
                    skip = res_skip
                output = skip if output is None else output + skip
                continue

            if pallas_ok:
                from ..ops.pallas_kernels import fused_wn_layer
                dilation = 2 ** i
                # halo rounded up to the sublane tiling (Mosaic requires
                # 8/16-aligned slice sizes in VMEM)
                pad = -(-dilation // 16) * 16
                x_pad = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
                b_rs = rs_conv.get('bias')
                if b_rs is None:
                    b_rs = jnp.zeros((rs_conv['kernel'].shape[2],), x.dtype)
                # fold the in-conv bias into the conditioning add
                x, skip = fused_wn_layer(
                    x_pad, cond + in_conv.get('bias', 0.),
                    in_conv['kernel'], jnp.zeros((2 * n_ch,), x.dtype),
                    rs_conv['kernel'], b_rs,
                    dilation = dilation, pad = pad, residual = not last,
                )
            else:
                from jax.ad_checkpoint import checkpoint_name
                # checkpoint_name marks the remat-policy save points the
                # training forward can elect (forward(remat='acts'):
                # saving acts + the residual stream makes the flow backward
                # recompute only elementwise gates, never a conv)
                acts = checkpoint_name(
                    _conv(in_conv, x, dilation = 2 ** i) + cond, 'wn_acts')
                gated = jnp.tanh(acts[..., :n_ch]) * jax.nn.sigmoid(acts[..., n_ch:])
                res_skip = _conv(rs_conv, gated)
                if not last:
                    x = checkpoint_name(x + res_skip[..., :n_ch], 'wn_x')
                    skip = res_skip[..., n_ch:]
                else:
                    skip = res_skip
            output = skip if output is None else output + skip
        # int8 layers accumulate skips in f32; match the end kernel's dtype
        return _conv(block['end'], output.astype(block['end']['kernel'].dtype))

    # -- mel conditioning ------------------------------------------------------

    def upsample_mel(self, params, mel):
        """mel (B, F, n_mel) → grouped conditioning (B, Lg, n_mel*n_group).

        Fast path: a stride-s width-w conv-transpose is algebraically a
        causal (w/s)-tap conv over frames whose output channels enumerate
        the s within-frame phases — XLA runs that as one dense matmul
        instead of a 256x-dilated conv (~100x faster on TPU).  The
        n_group interleave ([mel-major, group-minor]) is folded into the
        kernel's output-channel layout so no relayout is needed."""
        hp = self.hp
        w, s, g = hp.upsample_width, hp.upsample_stride, hp.n_group
        n_mel = hp.n_mel_channels
        kernel = params['upsample']['kernel']
        if w % s == 0 and s % g == 0 and kernel.shape[0] == w:
            taps = w // s
            # lax.conv_transpose applies the kernel unflipped, so
            # y[s*f + r] = sum_j mel[f-j] @ W[w-1 - s*j - r]; as a causal
            # cross-correlation over frames the conv tap k carries phase
            # weight W[s*k + (s-1-r)] — flip only the within-stride phase.
            # grouped channel layout: [rr, mel, gg] with r = rr*g + gg
            wk = kernel.reshape(taps, s // g, g, kernel.shape[1], n_mel)
            wk = wk[:, ::-1, ::-1]
            wk = jnp.transpose(wk, (0, 3, 1, 4, 2))       # (j, cin, rr, m, gg)
            # explicit im2col (taps shifted copies of the tiny mel input)
            # + ONE dense matmul: measured 8.6 vs 11.1 ms for the
            # conv_general_dilated lowering at the serving shape
            # (benchmarks/upsample_probe.py, B=64xF=256 on v5e) — the
            # windows are 160x smaller than the output, so the concat is
            # free and the matmul hits the MXU directly
            wk = wk.reshape(taps * kernel.shape[1], s * n_mel)
            padded = jnp.pad(mel, ((0, 0), (taps - 1, 0), (0, 0)))
            windows = jnp.concatenate(
                [padded[:, i: i + mel.shape[1]] for i in range(taps)],
                axis = -1)
            spect = windows @ wk
            if 'bias' in params['upsample']:
                spect = spect + jnp.tile(
                    jnp.repeat(params['upsample']['bias'], g), s // g
                ).astype(spect.dtype)
            return spect.reshape(mel.shape[0], mel.shape[1] * (s // g),
                                 n_mel * g)
        spect = nn.conv1d_transpose(params['upsample'], mel, stride = s)
        time_cutoff = w - s
        spect = spect[:, :spect.shape[1] - time_cutoff, :]
        lg = spect.shape[1] // g
        spect = spect[:, : lg * g, :]
        spect = spect.reshape(spect.shape[0], lg, g, n_mel)
        spect = jnp.swapaxes(spect, 2, 3).reshape(spect.shape[0], lg, -1)
        return spect

    # -- inference (inverse flow) ----------------------------------------------

    def infer(self, params, mel, *, rng = None, sigma = None, z = None,
              deterministic = False, dtype = None, use_pallas = None):
        """mel (B, F, n_mel) → waveform (B, F*upsample_stride).

        `dtype=jnp.bfloat16` runs the whole flow stack on the MXU's native
        precision (~3-6x faster on TPU); the 1x1-conv inverses are still
        computed in f32 then cast.  `use_pallas` overrides the hparam per
        call (the fused whole-block kernel requires a TPU backend).
        """
        hp = self.hp
        if use_pallas is None: use_pallas = hp.use_pallas
        if sigma is None: sigma = hp.sigma
        if rng is None: rng = jax.random.PRNGKey(0)
        int8_mode = use_pallas and 'packed_q' in params['flow_0']['block']
        if dtype is not None:
            # int8 serving runs MIXED precision: the WN kernels and the
            # start/end convs consume bf16 operands (halved VMEM/DMA; the
            # end conv accumulates in f32 so its b/s outputs are f32), but
            # the AUDIO stream — the ≤8-channel affine update and 1x1
            # inverses — stays f32.  A bf16 audio stream accumulates
            # rounding through all 12 inverse flows and lands at ~-3 dB SNR
            # vs f32 (measured); mixed scores ~39 dB.
            keep_f32 = {'packed_q'} | ({'convinv'} if int8_mode else set())

            def cast(path, leaf):
                if any(getattr(k, 'key', None) in keep_f32 for k in path):
                    return leaf
                if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
                    return leaf.astype(dtype)
                return leaf
            params = jax.tree_util.tree_map_with_path(cast, params)
            mel = mel.astype(dtype)

        if use_pallas and hp.wn_channels % 128 == 0 and hp.wn_layers > 1 \
                and 'packed' not in params['flow_0']['block'] \
                and 'packed_q' not in params['flow_0']['block'] \
                and 'kernel' in params['flow_0']['block']['in_conv_0']:
            params = self.pack_pallas_params(params)

        spect = self.upsample_mel(params, mel)
        batch, lg = spect.shape[0], spect.shape[1]

        spect_padded = None
        block0 = params['flow_0']['block']
        if use_pallas and ('packed' in block0 or 'packed_q' in block0) \
                and lg % 512 == 0:
            from ..ops.pallas_kernels import wn_block_pad, wn_block_pad_int8
            p = wn_block_pad_int8(hp.wn_layers) if 'packed_q' in block0 \
                else wn_block_pad(hp.wn_layers)
            spect_padded = jnp.pad(spect, ((0, 0), (p, p), (0, 0)))

        # int8 mixed precision: the audio stream is f32 even when the
        # conditioning/kernels run bf16 (see the cast above)
        out_dtype = jnp.float32 if int8_mode else spect.dtype

        def noise(key, channels):
            if deterministic:
                return jnp.zeros((batch, lg, channels), out_dtype)
            return jax.random.normal(key, (batch, lg, channels), out_dtype)

        rngs = jax.random.split(rng, hp.n_flows + 1)
        if z is not None:
            audio = sigma * z[:, :, :self.n_remaining_channels]
            z_rest = z[:, :, self.n_remaining_channels:]
        else:
            audio = sigma * noise(rngs[0], self.n_remaining_channels)
            z_rest = None

        def inv_flow(audio, flow):
            n_half = audio.shape[-1] // 2
            audio_0, audio_1 = audio[..., :n_half], audio[..., n_half:]
            wn_out = self.wn_block(flow['block'], audio_0, spect,
                                   spect_padded = spect_padded,
                                   fused = use_pallas)
            b, s = wn_out[..., :n_half], wn_out[..., n_half:]
            audio_1 = (audio_1 - b) * jnp.exp(-s)
            audio = jnp.concatenate([audio_0, audio_1], axis = -1)
            w_inv = jnp.linalg.inv(
                flow['convinv']['kernel'].astype(jnp.float32)
            ).astype(audio.dtype)
            return audio @ w_inv

        # flows run as a reversed `lax.scan` per channel group (equal shapes
        # stack along the scan axis): ONE traced flow body per group instead
        # of 12 — ~4x smaller program, ~3-4x faster XLA compiles; runtime
        # identical (the scanned pallas/XLA body is the same computation)
        for first, count, c in reversed(self._flow_groups()):
            stacked = self._stack_flows(params, first, count)
            audio, _ = jax.lax.scan(
                lambda a, f: (inv_flow(a, f), None), audio, stacked,
                reverse = True)
            if first % hp.n_early_every == 0 and first > 0:
                # z layout: [final | early(last) | ... | early(first)] —
                # groups walk outward in descending first-k, consuming from
                # the front (same order as the per-flow loop)
                if z_rest is not None:
                    z_i = sigma * z_rest[..., :hp.n_early_size]
                    z_rest = z_rest[..., hp.n_early_size:]
                else:
                    z_i = sigma * noise(rngs[first], hp.n_early_size)
                audio = jnp.concatenate([z_i, audio], axis = -1)

        return audio.reshape(batch, -1)

    # -- forward (training direction) ------------------------------------------

    def _flow_groups(self):
        """Runs of consecutive flows with equal audio-channel count (the
        early outputs only ever shrink it, exactly at `n_early_every`
        boundaries): [(first_k, n_flows_in_run, channels), ...]."""
        groups = []
        for k, c in enumerate(self.flow_channels):
            if groups and groups[-1][2] == c:
                groups[-1] = (groups[-1][0], groups[-1][1] + 1, c)
            else:
                groups.append((k, 1, c))
        return groups

    def _stack_flows(self, params, first, count):
        """Stack `count` flows' params (identical shapes within a channel
        group) along a leading scan axis."""
        flows = [params['flow_{}'.format(first + i)] for i in range(count)]
        return jax.tree_util.tree_map(lambda * leaves: jnp.stack(leaves), * flows)

    def forward(self, params, mel, audio, *, remat = False,
                compute_dtype = None):
        """audio (B, T) + mel (B, F, n_mel) → (z, log_s_total, log_det_w_total)
        for the flow negative-log-likelihood loss.

        Flows run as `lax.scan` over channel groups (flows with equal shapes
        stack along the scan axis) — the traced program holds ONE flow body
        per group instead of 12, which large-batch training needs to even
        compile.  ``remat=True`` additionally checkpoints each flow: ~12x
        less activation memory for ~1.3x flow FLOPs.

        ``compute_dtype=jnp.bfloat16`` is the mixed-precision training path
        (train/precision.py): the WN stacks + mel upsample — 98.9 % of the
        step's FLOPs — run with bf16 operands on the MXU, while the audio
        stream, the 8x8 invertible-conv slogdet, and every log-likelihood
        reduction stay float32.  Params arrive float32 (masters) and are
        cast at the matmul boundary, so gradients leave float32."""
        hp = self.hp
        mixed = compute_dtype is not None and \
            jnp.dtype(compute_dtype) != jnp.dtype(jnp.float32)
        if mixed:
            from ..train.precision import cast_floating
            # conditioning chain in compute dtype end-to-end; convinv
            # kernels stay f32 for the slogdet (and the 8x8 matmul is
            # negligible FLOPs)
            params = cast_floating(params, compute_dtype,
                                   exempt = ('convinv',))
            mel = mel.astype(compute_dtype)
        spect = self.upsample_mel(params, mel)
        lg = spect.shape[1]

        audio = audio[:, : lg * hp.n_group]
        audio = audio.reshape(audio.shape[0], lg, hp.n_group)

        # hp.wn_train_fused: forward through the fused Pallas kernel with
        # an XLA custom_vjp backward (wn_block_train), when the kernel's
        # shape envelope holds; otherwise the differentiable XLA chain
        use_fused_train = (
            hp.get('wn_train_fused', False)
            and hp.wn_channels % 128 == 0 and hp.wn_kernel_size == 3
            and lg % 512 == 0)

        def flow_step(audio, flow, spect):
            w = flow['convinv']['kernel']
            audio = audio @ w
            _, logdet = jnp.linalg.slogdet(w)
            n_half = audio.shape[-1] // 2
            audio_0, audio_1 = audio[..., :n_half], audio[..., n_half:]
            # under mixed precision the WN block's operands are cast here
            # and b/s return to f32 for the f32 audio stream + log|s| sum
            if use_fused_train:
                wn_out = self.wn_block_train(
                    flow['block'], audio_0.astype(spect.dtype), spect)
            else:
                wn_out = self.wn_block(flow['block'],
                                       audio_0.astype(spect.dtype), spect,
                                       fused = False)
            b, s = wn_out[..., :n_half], wn_out[..., n_half:]
            s = s.astype(jnp.float32)
            audio_1 = jnp.exp(s) * audio_1 + b.astype(jnp.float32)
            audio = jnp.concatenate([audio_0, audio_1], axis = -1)
            return audio, jnp.sum(s), logdet

        if remat == 'acts':
            # policy remat: per-layer acts + residual stream are SAVED
            # (checkpoint_name marks in wn_block), so the flow backward
            # recomputes only elementwise gates — no conv recompute — at
            # ~3x the activation memory of full per-flow remat.  A/B:
            # benchmarks/train_throughput.py --remat-policy acts
            from jax.ad_checkpoint import checkpoint_policies
            flow_step = jax.checkpoint(
                flow_step, policy = checkpoint_policies.save_only_these_names(
                    'wn_acts', 'wn_x'))
        elif remat:
            flow_step = jax.checkpoint(flow_step)

        def body(carry, flow):
            audio, s_acc, d_acc = carry
            audio, log_s, logdet = flow_step(audio, flow, spect)
            return (audio, s_acc + log_s, d_acc + logdet), None

        z_out = []
        log_s_total = 0.
        log_det_total = 0.
        for first, count, c in self._flow_groups():
            if first % hp.n_early_every == 0 and first > 0:
                z_out.append(audio[..., :hp.n_early_size])
                audio = audio[..., hp.n_early_size:]
            stacked = self._stack_flows(params, first, count)
            (audio, log_s, logdet), _ = jax.lax.scan(
                body, (audio, 0., 0.), stacked)
            log_s_total = log_s_total + log_s
            log_det_total = log_det_total + audio.shape[0] * lg * logdet

        z_out.append(audio)
        return jnp.concatenate(z_out, axis = -1), log_s_total, log_det_total

    def loss(self, params, mel, audio, sigma = None, *, remat = False,
             compute_dtype = None):
        """WaveGlow negative log-likelihood (per element)."""
        if sigma is None: sigma = self.hp.sigma
        z, log_s, log_det = self.forward(params, mel, audio, remat = remat,
                                         compute_dtype = compute_dtype)
        return (jnp.sum(z * z) / (2 * sigma * sigma) - log_s - log_det) / z.size

    def get_config(self):
        return self.hp.get_config()
