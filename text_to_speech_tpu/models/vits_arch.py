"""VITS — end-to-end text → waveform (Kim et al., 2021, public architecture).

Beyond-reference capability: the reference pipeline is always two models
(an AR synthesizer + a flow vocoder, ``/root/reference/models/tts/
tacotron2.py`` + ``waveglow.py``) trained separately on mel targets.  VITS
is a single conditional-VAE trained adversarially end-to-end — one parallel
forward from phonemes to 22.05 kHz audio, with no mel hand-off, no separate
vocoder training, and latent durations learned by monotonic alignment
search (MAS) instead of attention.  On TPU this is the throughput-optimal
shape: every stage (text encoder, posterior/flow WaveNet stacks, HiFi-GAN
decoder) is batched MXU work with static shapes; MAS itself is two
`lax.scan`s of O(L) VPU rows — no host round-trip in the training step.

House style: pytree params + pure stateless apply fns.  Reuses this repo's
building blocks by composition —

  - the text-encoder blocks implement the published windowed relative
    attention (`text_rel_window`, heads-shared rel_k/rel_v, no absolute
    positional term — importer-exact); `text_rel_window=None` falls back
    to `transformers/attention.mha` with sinusoidal positions;
  - the HiFi-GAN generator + MPD/MSD discriminators and GAN loss statics
    (`models/hifigan_arch.py`) as the waveform decoder, with the VITS
    global-conditioning hook (`apply(..., cond = g)`);
  - `fastspeech2_arch.length_regulator` for the static-shape duration
    expansion at inference.

Training-objective pieces (`kl_loss`, `duration_loss`, `neg_cross_entropy`,
`maximum_path`, random windowed segments) live here; the alternating GAN
step is `train/gan.make_vits_train_step`.
"""

import collections

import jax
import jax.numpy as jnp
from jax import lax

from ..hparams import HParams
from ..nn import layers as nn
from .transformers.attention import init_mha, mha
from .transformers.transformer_arch import sinusoidal_embedding
from .fastspeech2_arch import length_regulator
from .hifigan_arch import HiFiGAN, HParamsHiFiGAN

VITSInferenceOutput = collections.namedtuple(
    'VITSInferenceOutput',
    ['audio', 'lengths', 'stop_tokens', 'attention_weights',
     'decoder_output', 'durations'],
)

HParamsVITS = HParams(
    vocab_size = 148,
    pad_token = 0,
    spec_channels = 513,            # linear-STFT bins (n_fft // 2 + 1)

    inter_channels = 192,           # latent z
    hidden_channels = 192,
    filter_channels = 768,          # text-encoder FFN
    n_heads = 2,
    n_text_layers = 6,
    text_kernel_size = 3,           # text-encoder conv-FFN kernel
    text_rel_window = 4,            # windowed relative attention (published
                                    # VITS design; None → plain MHA)
    drop_rate = 0.1,
    epsilon = 1e-9,
    max_position = 2048,

    posterior_layers = 16,
    posterior_kernel_size = 5,

    flow_layers = 4,                # residual coupling layers (flip between)
    flow_wn_layers = 4,
    flow_kernel_size = 5,

    # duration predictor: deterministic conv stack (log-domain) or the
    # published stochastic flow (`use_sdp`)
    duration_filters = 256,
    duration_kernel_size = 3,
    duration_drop_rate = 0.5,
    use_sdp = False,
    sdp_filter_channels = 192,
    sdp_kernel_size = 3,
    sdp_n_flows = 4,
    sdp_dds_layers = 3,
    sdp_n_bins = 10,
    sdp_tail_bound = 5.0,
    sdp_drop_rate = 0.5,

    # speaker conditioning: a learned table (n_speakers) and/or an external
    # SV2TTS-style embedding projected to gin_channels
    n_speakers = None,
    speaker_embedding_dim = None,
    gin_channels = 256,

    # HiFi-GAN decoder (defaults = published VITS/LJSpeech config)
    upsample_rates = (8, 8, 2, 2),
    upsample_kernel_sizes = (16, 16, 4, 4),
    upsample_initial_channel = 512,
    resblock_kernel_sizes = (3, 7, 11),
    resblock_dilation_sizes = ((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    resblock_version = 1,
    leaky_slope = 0.1,
    mpd_periods = (2, 3, 5, 7, 11),
    msd_scales = 3,

    segment_frames = 32,            # training: random windowed decode
    max_frames = 1024,              # inference expansion buffer
)

_NEG = -1e9
_LOG_2PI = 1.8378770664093453


def neg_cross_entropy(z_p, m_p, logs_p, token_mask):
    """Pointwise prior log-likelihood matrix for MAS — all matmuls.

    z_p (B, T, C) frame latents; m_p/logs_p (B, L, C) token prior stats.
    Returns (B, T, L): log N(z_p[t]; m_p[l], exp(logs_p[l])) summed over C.
    """
    z_p = z_p.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    r = jnp.exp(-2. * logs_p)                                    # 1/sigma^2
    nc1 = jnp.sum(-0.5 * _LOG_2PI - logs_p, axis = -1)           # (B, L)
    nc2 = -0.5 * jnp.einsum('btc,blc->btl', z_p ** 2, r)
    nc3 = jnp.einsum('btc,blc->btl', z_p, m_p * r)
    nc4 = -0.5 * jnp.sum(m_p ** 2 * r, axis = -1)                # (B, L)
    out = nc1[:, None, :] + nc2 + nc3 + nc4[:, None, :]
    return jnp.where(token_mask[:, None, :], out, _NEG)


def maximum_path(neg_cent, frame_mask, token_mask):
    """Monotonic alignment search (Viterbi over a strictly monotonic,
    surjective token→frame alignment) as two `lax.scan`s — batched, jittable,
    O(T·L) VPU work with static shapes (the published implementation is a
    per-sample Cython loop).

    neg_cent (B, T, L) f32; frame_mask (B, T) bool; token_mask (B, L) bool.
    Returns the optimal path as one-hot (B, T, L) f32 (stop-gradient).

    DP: Q[t, l] = neg_cent[t, l] + max(Q[t-1, l], Q[t-1, l-1]) with
    Q[0] = neg_cent[0, 0] at l=0 (−inf elsewhere); the path ends at
    (T_b−1, L_b−1) and is recovered by a reverse scan over the stored rows.
    """
    neg_cent = jnp.where(token_mask[:, None, :], neg_cent.astype(jnp.float32),
                         _NEG)
    B, T, L = neg_cent.shape
    frame_len = jnp.sum(frame_mask.astype(jnp.int32), axis = 1)      # (B,)
    token_len = jnp.sum(token_mask.astype(jnp.int32), axis = 1)

    nc_t = jnp.moveaxis(neg_cent, 1, 0)                              # (T, B, L)
    q0 = nc_t[0] + jnp.where(jnp.arange(L) == 0, 0., _NEG)[None, :]

    def forward(q, nc_row):
        shifted = jnp.concatenate(
            [jnp.full_like(q[:, :1], _NEG), q[:, :-1]], axis = 1)
        q_new = nc_row + jnp.maximum(q, shifted)
        return q_new, q                         # emit Q[t-1] for backtracking

    _, prev_rows = lax.scan(forward, q0, nc_t[1:])   # (T-1, B, L) = Q[0..T-2]

    l_end = jnp.maximum(token_len - 1, 0)                            # (B,)
    cols = jnp.arange(L)

    def backward(l, inp):
        q_prev, t = inp                          # q_prev = Q[t-1]; t in T-1..1
        active = t < frame_len                                        # (B,)
        emit = (cols[None, :] == l[:, None]) & active[:, None]
        stay = jnp.take_along_axis(q_prev, l[:, None], axis = 1)[:, 0]
        down_l = jnp.maximum(l - 1, 0)
        down = jnp.take_along_axis(q_prev, down_l[:, None], axis = 1)[:, 0]
        step_down = active & (l > 0) & (down >= stay)
        return jnp.where(step_down, l - 1, l), emit

    ts = jnp.arange(1, T, dtype = jnp.int32)
    l_final, emits = lax.scan(backward, l_end, (prev_rows, ts),
                              reverse = True)   # emits[i] ↔ frame t = i+1
    first = (cols[None, :] == l_final[:, None]) & (frame_len > 0)[:, None]
    path = jnp.concatenate([first[None], emits], axis = 0)           # (T, B, L)
    path = jnp.moveaxis(path, 0, 1).astype(jnp.float32)
    return lax.stop_gradient(path)


class VITS:
    """Stateless architecture: static hparams + pure apply functions."""

    def __init__(self, ** kwargs):
        self.hp = HParamsVITS.extract(kwargs)
        hp = self.hp
        self.generator = HiFiGAN(** {
            ** {k: hp[k] for k in HParamsHiFiGAN.get_config()
                if k in hp.get_config()},
            'n_mel_channels': hp.inter_channels,
        })
        self.upsample_rate = self.generator.total_upsampling
        self.half_channels = hp.inter_channels // 2

    @property
    def uses_global_cond(self):
        return bool(self.hp.n_speakers or self.hp.speaker_embedding_dim)

    # -- init --------------------------------------------------------------

    def _init_wn(self, key, channels, n_layers, kernel_size):
        keys = nn.split_keys(key, 2 * n_layers + 1)
        wn = {}
        for i in range(n_layers):
            wn['in_conv_{}'.format(i)] = nn.init_conv1d(
                next(keys), kernel_size, channels, 2 * channels)
            out_ch = 2 * channels if i < n_layers - 1 else channels
            wn['res_skip_conv_{}'.format(i)] = nn.init_conv1d(
                next(keys), 1, channels, out_ch)
        if self.uses_global_cond:
            wn['cond'] = nn.init_dense(
                next(keys), self.hp.gin_channels, n_layers * 2 * channels)
        return wn

    def _init_text_block(self, key):
        hp = self.hp
        keys = nn.split_keys(key, 5)
        block = {
            'attention': init_mha(next(keys), hp.hidden_channels, hp.n_heads),
            'attention_norm': nn.init_layer_norm(hp.hidden_channels),
            'conv1': nn.init_conv1d(next(keys), hp.text_kernel_size,
                                    hp.hidden_channels, hp.filter_channels),
            'conv2': nn.init_conv1d(next(keys), hp.text_kernel_size,
                                    hp.filter_channels, hp.hidden_channels),
            'ffn_norm': nn.init_layer_norm(hp.hidden_channels),
        }
        if hp.text_rel_window is not None:
            w = hp.text_rel_window
            head_dim = hp.hidden_channels // hp.n_heads
            scale = head_dim ** -0.5
            # shared across heads (the published heads_share=True layout)
            block['rel_k'] = jax.random.normal(
                next(keys), (2 * w + 1, head_dim)) * scale
            block['rel_v'] = jax.random.normal(
                next(keys), (2 * w + 1, head_dim)) * scale
        return block

    def init(self, key):
        hp = self.hp
        keys = nn.split_keys(key, hp.n_text_layers + hp.flow_layers + 16)
        params = {
            'embedding': nn.init_embedding(next(keys), hp.vocab_size,
                                           hp.hidden_channels),
            'text_encoder': {
                'layer_{}'.format(i): self._init_text_block(next(keys))
                for i in range(hp.n_text_layers)
            },
            'text_proj': nn.init_conv1d(next(keys), 1, hp.hidden_channels,
                                        2 * hp.inter_channels),
            'posterior': {
                'pre': nn.init_conv1d(next(keys), 1, hp.spec_channels,
                                      hp.hidden_channels),
                'wn': self._init_wn(next(keys), hp.hidden_channels,
                                    hp.posterior_layers,
                                    hp.posterior_kernel_size),
                'proj': nn.init_conv1d(next(keys), 1, hp.hidden_channels,
                                       2 * hp.inter_channels),
            },
            'duration_predictor': (self._init_sdp(next(keys)) if hp.use_sdp
                                   else self._init_duration_predictor(
                                       next(keys))),
            'generator': self.generator.init(next(keys)),
        }
        half = self.half_channels
        for k in range(hp.flow_layers):
            params['flow_{}'.format(k)] = {
                'pre': nn.init_conv1d(next(keys), 1, half, hp.hidden_channels),
                'wn': self._init_wn(next(keys), hp.hidden_channels,
                                    hp.flow_wn_layers, hp.flow_kernel_size),
                # zero-init post: couplings start as the identity
                'post': {'kernel': jnp.zeros((1, hp.hidden_channels, half)),
                         'bias': jnp.zeros((half,))},
            }
        if hp.n_speakers:
            params['speaker_embedding'] = nn.init_embedding(
                next(keys), hp.n_speakers, hp.gin_channels)
        if hp.speaker_embedding_dim:
            params['speaker_projection'] = nn.init_dense(
                next(keys), hp.speaker_embedding_dim, hp.gin_channels)
        if self.uses_global_cond:
            params['generator_cond'] = nn.init_dense(
                next(keys), hp.gin_channels, hp.upsample_initial_channel)
            if not hp.use_sdp:
                # the SDP carries its own 'cond' head; a deterministic-DP
                # cond here would be dead weight (and an init-vs-imported
                # tree-shape mismatch)
                params['duration_cond'] = nn.init_dense(
                    next(keys), hp.gin_channels, hp.hidden_channels)
        return params, {}

    def _init_duration_predictor(self, key):
        hp = self.hp
        keys = nn.split_keys(key, 3)
        k = hp.duration_kernel_size
        return {
            'conv1': nn.init_conv1d(next(keys), k, hp.hidden_channels,
                                    hp.duration_filters),
            'norm1': nn.init_layer_norm(hp.duration_filters),
            'conv2': nn.init_conv1d(next(keys), k, hp.duration_filters,
                                    hp.duration_filters),
            'norm2': nn.init_layer_norm(hp.duration_filters),
            'proj': nn.init_dense(next(keys), hp.duration_filters, 1),
        }

    # -- stochastic duration predictor (published VITS flow) --------------------

    def _init_dds(self, key, channels):
        """Dilated depth-separable conv stack params."""
        hp = self.hp
        keys = nn.split_keys(key, 2 * hp.sdp_dds_layers)
        dds = {}
        for i in range(hp.sdp_dds_layers):
            dds['layer_{}'.format(i)] = {
                'depthwise': nn.init_conv1d(next(keys), hp.sdp_kernel_size,
                                            1, channels),
                'pointwise': nn.init_conv1d(next(keys), 1, channels, channels),
                'norm1': nn.init_layer_norm(channels),
                'norm2': nn.init_layer_norm(channels),
            }
        return dds

    def _init_conv_flow(self, key):
        hp = self.hp
        f = hp.sdp_filter_channels
        keys = nn.split_keys(key, 3)
        return {
            'pre': nn.init_conv1d(next(keys), 1, 1, f),
            'dds': self._init_dds(next(keys), f),
            # zero-init proj: the spline starts as the identity
            'proj': {'kernel': jnp.zeros((1, f, 3 * hp.sdp_n_bins - 1)),
                     'bias': jnp.zeros((3 * hp.sdp_n_bins - 1,))},
        }

    def _init_flow_stack(self, key):
        hp = self.hp
        keys = nn.split_keys(key, hp.sdp_n_flows + 1)
        stack = {'affine': {'m': jnp.zeros((2,)), 'logs': jnp.zeros((2,))}}
        for i in range(hp.sdp_n_flows):
            stack['conv_flow_{}'.format(i)] = self._init_conv_flow(next(keys))
        return stack

    def _init_sdp(self, key):
        hp = self.hp
        f = hp.sdp_filter_channels
        keys = nn.split_keys(key, 9)
        sdp = {
            'pre': nn.init_conv1d(next(keys), 1, hp.hidden_channels, f),
            'dds': self._init_dds(next(keys), f),
            'proj': nn.init_conv1d(next(keys), 1, f, f),
            'flows': self._init_flow_stack(next(keys)),
            'post_pre': nn.init_conv1d(next(keys), 1, 1, f),
            'post_dds': self._init_dds(next(keys), f),
            'post_proj': nn.init_conv1d(next(keys), 1, f, f),
            'post_flows': self._init_flow_stack(next(keys)),
        }
        if self.uses_global_cond:
            sdp['cond'] = nn.init_dense(next(keys), hp.gin_channels, f)
        return sdp

    def _dds(self, dds, x, mask, *, g = None, train = False, rng = None,
             salt = 0):
        """Dilated depth-separable convs: depthwise (groups = C) → LN → GELU
        → pointwise → LN → GELU → residual."""
        hp = self.hp
        if g is not None:
            x = x + g
        for i in range(hp.sdp_dds_layers):
            p = dds['layer_{}'.format(i)]
            d = hp.sdp_kernel_size ** i
            kernel = p['depthwise']['kernel']          # (W, 1, C) depthwise
            h = lax.conv_general_dilated(
                x * mask, kernel, window_strides = (1,), padding = 'SAME',
                rhs_dilation = (d,), feature_group_count = x.shape[-1],
                dimension_numbers = ('NWC', 'WIO', 'NWC'),
            ) + p['depthwise']['bias']
            h = jax.nn.gelu(nn.layer_norm(p['norm1'], h, hp.epsilon))
            h = nn.conv1d(p['pointwise'], h)
            h = jax.nn.gelu(nn.layer_norm(p['norm2'], h, hp.epsilon))
            h = self._dropout(h, hp.sdp_drop_rate, train, rng, salt + i)
            x = (x + h) * mask
        return x

    def _flow_stack(self, stack, z, mask, cond, *, reverse = False,
                    train = False, rng = None, salt = 0,
                    skip_conv_flow_0 = False):
        """[ElementwiseAffine] + n × [spline ConvFlow, Flip] on (B, L, 2).
        Returns (z, total logdet) (logdet is 0-filled when reversed).

        `skip_conv_flow_0` reproduces the published SDP inference quirk:
        the torch reverse path drops the first ConvFlow
        (``flows[:-2] + [flows[-1]]`` — trained but never sampled through),
        keeping its Flip."""
        from ..nn.flows import rational_quadratic_spline
        hp = self.hp
        logdet = jnp.zeros(z.shape[:1], jnp.float32)
        m2 = mask[..., 0]

        def affine(z, reverse):
            m, logs = stack['affine']['m'], stack['affine']['logs']
            if reverse:
                return (z - m) * jnp.exp(-logs) * mask, \
                    -jnp.sum(logs * jnp.ones_like(z) * mask, axis = (1, 2))
            return (m + jnp.exp(logs) * z) * mask, \
                jnp.sum(logs * jnp.ones_like(z) * mask, axis = (1, 2))

        def conv_flow(p, z, reverse, salt_i):
            z0, z1 = z[..., :1], z[..., 1:]
            h = nn.conv1d(p['pre'], z0)
            h = self._dds(p['dds'], h, mask, g = cond, train = train,
                          rng = rng, salt = salt_i)
            params_out = nn.conv1d(p['proj'], h) * mask     # (B, L, 3K-1)
            K = hp.sdp_n_bins
            scale = jnp.sqrt(float(hp.sdp_filter_channels))
            # spline math in f32 regardless of the compute dtype (bin
            # search + logdet are precision-sensitive)
            params_out = params_out.astype(jnp.float32)
            w_un = params_out[..., :K] / scale
            h_un = params_out[..., K: 2 * K] / scale
            d_un = params_out[..., 2 * K:]
            # the spline returns the logdet of the direction it ran (the
            # inverse call already negates) — no extra sign here
            y1, ld = rational_quadratic_spline(
                z1[..., 0].astype(jnp.float32), w_un, h_un, d_un,
                inverse = reverse, tail_bound = hp.sdp_tail_bound)
            z = jnp.concatenate([z0, y1[..., None].astype(z0.dtype)],
                                axis = -1) * mask
            return z, jnp.sum(ld * m2.astype(jnp.float32), axis = 1)

        steps = ['affine'] + [
            name for i in range(hp.sdp_n_flows)
            for name in ('conv_flow_{}'.format(i), 'flip')]
        if reverse:
            steps = steps[::-1]
        if skip_conv_flow_0:
            steps = [s for s in steps if s != 'conv_flow_0']
        for si, name in enumerate(steps):
            if name == 'affine':
                z, ld = affine(z, reverse)
            elif name == 'flip':
                z, ld = z[..., ::-1], 0.
            else:
                z, ld = conv_flow(stack[name], z, reverse, salt + 10 * si)
            logdet = logdet + ld
        return z, logdet

    def sdp_nll(self, params, h, w, token_mask, *, g = None, train = True,
                rng = None):
        """Stochastic-duration-predictor negative log-likelihood of the MAS
        durations `w` (B, L), per batch row (masked mean over tokens).
        Variational dequantization: posterior flows produce u∈(0,1) and an
        auxiliary channel from noise; the main flows model (w−u, aux)."""
        # f32 island: the SDP is spline flows over (B, L, 2) — negligible
        # FLOPs but precision-sensitive log-dets — so under the mixed
        # bf16 policy it runs float32 end-to-end (params re-upcast here,
        # the conditioning h detached + upcast)
        from ..train.precision import cast_floating
        p = cast_floating(params['duration_predictor'], jnp.float32)
        h = h.astype(jnp.float32)
        if g is not None:
            g = g.astype(jnp.float32)
        mask = token_mask[..., None].astype(jnp.float32)
        w = w.astype(jnp.float32)[..., None] * mask              # (B, L, 1)

        if rng is None:
            rng = jax.random.PRNGKey(0)
        k_noise, k_drop = jax.random.split(rng)

        x = nn.conv1d(p['pre'], lax.stop_gradient(h))
        cond = None
        if g is not None and 'cond' in p:
            cond = nn.dense(p['cond'], lax.stop_gradient(g))[:, None, :]
            x = x + cond
        x = self._dds(p['dds'], x, mask, train = train, rng = k_drop,
                      salt = 300)
        x = nn.conv1d(p['proj'], x) * mask

        # posterior q(u, aux | w, h)
        h_w = nn.conv1d(p['post_pre'], w)
        h_w = self._dds(p['post_dds'], h_w, mask, train = train, rng = k_drop,
                        salt = 320)
        h_w = nn.conv1d(p['post_proj'], h_w) * mask

        e_q = jax.random.normal(k_noise, w.shape[:2] + (2,)) * mask
        # salt 500: disjoint from the main flows' 360+10*si range (340
        # would collide at 370/390/410 → identical dropout masks across
        # the two stacks)
        z_q, logdet_q = self._flow_stack(
            p['post_flows'], e_q, mask, (x + h_w), train = train,
            rng = k_drop, salt = 500)
        z_u, z_aux = z_q[..., :1], z_q[..., 1:]
        u = jax.nn.sigmoid(z_u) * mask
        z0 = (w - u) * mask
        # sigmoid logdet for u plus the base density of e_q
        logdet_q = logdet_q + jnp.sum(
            (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * mask,
            axis = (1, 2))
        logq = jnp.sum(-0.5 * (_LOG_2PI + e_q ** 2) * mask, axis = (1, 2)) \
            - logdet_q

        # main flows: log-transform the dequantized duration, then splines
        z0 = jnp.log(jnp.maximum(z0, 1e-5)) * mask
        logdet = jnp.sum(-z0 * mask, axis = (1, 2))              # d log(w)/dw
        z = jnp.concatenate([z0, z_aux], axis = -1)
        z, ld = self._flow_stack(p['flows'], z, mask, x, train = train,
                                 rng = k_drop, salt = 360)
        logdet = logdet + ld
        nll = jnp.sum(0.5 * (_LOG_2PI + z ** 2) * mask, axis = (1, 2)) \
            - logdet
        denom = jnp.maximum(jnp.sum(token_mask.astype(jnp.float32)), 1.)
        return jnp.sum(nll + logq) / denom

    def sdp_sample(self, params, h, token_mask, *, g = None,
                   noise_scale_w = 0.8, rng = None):
        """Sample log-durations from the SDP flows (inference direction)."""
        p = params['duration_predictor']
        mask = token_mask[..., None].astype(h.dtype)
        if rng is None:
            rng = jax.random.PRNGKey(0)

        x = nn.conv1d(p['pre'], lax.stop_gradient(h))
        if g is not None and 'cond' in p:
            x = x + nn.dense(p['cond'], lax.stop_gradient(g))[:, None, :]
        x = self._dds(p['dds'], x, mask)
        x = nn.conv1d(p['proj'], x) * mask

        # run the flows in the compute dtype (params may be bf16-cast);
        # the spline itself computes in f32 internally (see conv_flow)
        z = jax.random.normal(rng, mask.shape[:2] + (2,)).astype(h.dtype)
        z = z * jnp.asarray(noise_scale_w, h.dtype) * mask
        # skip_conv_flow_0: the published sampling path (trained flows
        # minus the first ConvFlow) — importer-exact behavior
        z, _ = self._flow_stack(p['flows'], z, mask, x, reverse = True,
                                skip_conv_flow_0 = True)
        return z[..., 0].astype(jnp.float32) * token_mask.astype(jnp.float32)

    # -- shared blocks -------------------------------------------------------

    def _dropout(self, x, rate, train, rng, salt):
        if not train or rng is None or rate <= 0.:
            return x
        return nn.dropout(jax.random.fold_in(rng, salt), x, rate, train = True)

    def _wn(self, wn, x, mask, g, n_layers):
        """Gated residual WaveNet stack (non-causal, dilation 1 — the VITS
        variant): in-conv → gated tanh (+ global cond bias) → res/skip."""
        C = x.shape[-1]
        cond = None
        if g is not None and 'cond' in wn:
            cond = nn.dense(wn['cond'], g)                  # (B, n_layers*2C)
        skip = jnp.zeros_like(x)
        for i in range(n_layers):
            h = nn.conv1d(wn['in_conv_{}'.format(i)], x)
            if cond is not None:
                h = h + cond[:, None, i * 2 * C: (i + 1) * 2 * C].astype(h.dtype)
            a, b = jnp.split(h, 2, axis = -1)
            acts = jnp.tanh(a) * jax.nn.sigmoid(b)
            out = nn.conv1d(wn['res_skip_conv_{}'.format(i)], acts)
            if i < n_layers - 1:
                res, s = jnp.split(out, 2, axis = -1)
                x = (x + res) * mask
                skip = skip + s
            else:
                skip = skip + out
        return skip * mask

    def global_cond(self, params, *, speaker_ids = None,
                    speaker_embedding = None):
        """→ g (B, gin_channels) or None."""
        g = None
        if speaker_ids is not None and 'speaker_embedding' in params:
            g = nn.embedding(params['speaker_embedding'], speaker_ids)
        if speaker_embedding is not None and 'speaker_projection' in params:
            proj = nn.dense(params['speaker_projection'], speaker_embedding)
            g = proj if g is None else g + proj
        return g

    # -- prior (text) side ----------------------------------------------------

    def _text_attention(self, blk, x, attn_mask):
        """Self-attention with windowed relative position terms (published
        VITS text-encoder design): positions beyond ±window contribute zero
        relative embeddings.  Text lengths are small (≤ a few hundred), so
        the (L, L, D) relative gathers are cheap."""
        hp = self.hp
        if 'rel_k' not in blk:
            out, _ = mha(blk['attention'], x, n_heads = hp.n_heads,
                         mask = attn_mask)
            return out
        B, L, _ = x.shape
        H = hp.n_heads
        p = blk['attention']
        D = p['query']['kernel'].shape[-1] // H
        to_heads = lambda t: nn.dense(p[t], x).reshape(B, L, H, D) \
            .transpose(0, 2, 1, 3)
        q, k, v = to_heads('query'), to_heads('key'), to_heads('value')
        scale = D ** -0.5

        logits = jnp.einsum('bhld,bhmd->bhlm', q, k) * scale

        w = hp.text_rel_window
        pad = L - 1 - w

        def table_for(emb):
            emb = emb.astype(x.dtype)
            if pad >= 0:                # zero beyond the window
                return jnp.pad(emb, ((pad, pad), (0, 0)))
            return emb[-pad: -pad + 2 * L - 1]
        idx = jnp.clip(jnp.arange(L)[None, :] - jnp.arange(L)[:, None]
                       + L - 1, 0, 2 * L - 2)                    # (L, L)

        rel_local = jnp.einsum('bhld,rd->bhlr', q,
                               table_for(blk['rel_k'])) * scale
        logits = logits + jnp.take_along_axis(
            rel_local, jnp.broadcast_to(idx, (B, H, L, L)), axis = -1)

        logits = jnp.where(attn_mask, logits, jnp.asarray(-1e9, logits.dtype))
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis = -1) \
            .astype(x.dtype)
        out = jnp.einsum('bhlm,bhmd->bhld', attn, v)
        out = out + jnp.einsum('bhlm,lmd->bhld', attn,
                               table_for(blk['rel_v'])[idx])
        out = out.transpose(0, 2, 1, 3).reshape(B, L, H * D)
        return nn.dense(p['output'], out)

    def encode_text(self, params, tokens, *, train = False, rng = None):
        """tokens (B, L) → (h (B, L, H), m_p, logs_p (B, L, C), token mask)."""
        hp = self.hp
        L = tokens.shape[1]
        valid = tokens != hp.pad_token
        attn_mask = valid[:, None, None, :]
        fmask = valid[..., None].astype(jnp.float32)

        x = nn.embedding(params['embedding'], tokens) \
            * jnp.sqrt(float(hp.hidden_channels))
        if hp.text_rel_window is None:
            # plain-MHA variant needs absolute positions; the published
            # windowed-relative encoder has NO absolute positional term —
            # adding one would feed imported official checkpoints
            # out-of-distribution activations
            x = x + sinusoidal_embedding(
                hp.max_position, hp.hidden_channels)[None, :L].astype(x.dtype)
        x = self._dropout(x, hp.drop_rate, train, rng, 10)
        x = x * fmask.astype(x.dtype)
        for i in range(hp.n_text_layers):
            blk = params['text_encoder']['layer_{}'.format(i)]
            h = self._text_attention(blk, x, attn_mask)
            h = self._dropout(h, hp.drop_rate, train, rng, 20 + 2 * i)
            x = nn.layer_norm(blk['attention_norm'], x + h, hp.epsilon)
            x = x * fmask.astype(x.dtype)
            h = jax.nn.relu(nn.conv1d(blk['conv1'], x))
            h = self._dropout(h, hp.drop_rate, train, rng, 21 + 2 * i)
            # mask between the k>1 convs: conv1's bias+relu make pad rows
            # non-zero, and conv2 would leak them back into valid rows
            h = nn.conv1d(blk['conv2'], h * fmask.astype(h.dtype))
            x = nn.layer_norm(blk['ffn_norm'], x + h, hp.epsilon)
            x = x * fmask.astype(x.dtype)
        stats = nn.conv1d(params['text_proj'], x) * fmask.astype(x.dtype)
        m_p, logs_p = jnp.split(stats, 2, axis = -1)
        return x, m_p, logs_p, valid

    def predict_log_durations(self, params, h, token_mask, *, g = None,
                              train = False, rng = None):
        """Deterministic duration predictor over (detached) text states."""
        hp = self.hp
        x = lax.stop_gradient(h)
        if g is not None and 'duration_cond' in params:
            x = x + nn.dense(params['duration_cond'],
                             lax.stop_gradient(g))[:, None, :]
        p = params['duration_predictor']
        fmask = token_mask[..., None].astype(x.dtype)
        x = x * fmask
        x = jax.nn.relu(nn.conv1d(p['conv1'], x))
        x = nn.layer_norm(p['norm1'], x, hp.epsilon)
        x = self._dropout(x, hp.duration_drop_rate, train, rng, 50)
        x = x * fmask
        x = jax.nn.relu(nn.conv1d(p['conv2'], x))
        x = nn.layer_norm(p['norm2'], x, hp.epsilon)
        x = self._dropout(x, hp.duration_drop_rate, train, rng, 51)
        return nn.dense(p['proj'], x)[..., 0] * token_mask

    # -- posterior / flow -------------------------------------------------------

    def posterior(self, params, spec, frame_mask, *, g = None, rng = None):
        """Linear spectrogram (B, T, spec_ch) → sampled latent z + stats."""
        hp = self.hp
        p = params['posterior']
        mask = frame_mask[..., None].astype(spec.dtype)
        x = nn.conv1d(p['pre'], spec) * mask
        x = self._wn(p['wn'], x, mask, g, hp.posterior_layers)
        stats = nn.conv1d(p['proj'], x) * mask
        m_q, logs_q = jnp.split(stats, 2, axis = -1)
        eps = jax.random.normal(rng, m_q.shape, m_q.dtype) \
            if rng is not None else 0.
        z = (m_q + eps * jnp.exp(logs_q)) * mask
        return z, m_q, logs_q

    def flow(self, params, x, frame_mask, *, g = None, reverse = False):
        """Residual coupling stack (mean-only ⇒ volume-preserving, logdet 0);
        `reverse=True` is the inference direction (prior → latent)."""
        hp = self.hp
        mask = frame_mask[..., None].astype(x.dtype)
        order = range(hp.flow_layers)
        for k in (reversed(order) if reverse else order):
            flow_p = params['flow_{}'.format(k)]
            if reverse:
                x = x[..., ::-1]                 # undo the post-coupling flip
            x0, x1 = jnp.split(x, 2, axis = -1)
            h = nn.conv1d(flow_p['pre'], x0) * mask
            h = self._wn(flow_p['wn'], h, mask, g, hp.flow_wn_layers)
            m = nn.conv1d(flow_p['post'], h) * mask
            x1 = (x1 - m) if reverse else (x1 + m)
            x = jnp.concatenate([x0, x1 * mask], axis = -1)
            if not reverse:
                x = x[..., ::-1]                 # flip between couplings
        return x

    # -- training forward ---------------------------------------------------------

    def train_forward(self, params, tokens, spec, spec_lengths, audio, rng,
                      *, speaker_ids = None, speaker_embedding = None,
                      train = True):
        """One full training pass → everything the GAN losses need.

        tokens (B, L); spec (B, T, spec_ch) linear magnitudes;
        spec_lengths (B,); audio (B, T*hop) waveform aligned to spec.
        """
        hp = self.hp
        k_post, k_seg, k_drop, k_dur = jax.random.split(rng, 4)
        g = self.global_cond(params, speaker_ids = speaker_ids,
                             speaker_embedding = speaker_embedding)

        h, m_p_tok, logs_p_tok, tok_mask = self.encode_text(
            params, tokens, train = train, rng = k_drop)

        T = spec.shape[1]
        frame_mask = jnp.arange(T)[None, :] < spec_lengths[:, None]
        z, m_q, logs_q = self.posterior(params, spec, frame_mask, g = g,
                                        rng = k_post)
        z_p = self.flow(params, z, frame_mask, g = g)

        # -- MAS alignment (no gradient) --------------------------------------
        nc = neg_cross_entropy(lax.stop_gradient(z_p),
                               lax.stop_gradient(m_p_tok),
                               lax.stop_gradient(logs_p_tok), tok_mask)
        path = maximum_path(nc, frame_mask, tok_mask)        # (B, T, L)

        m_p = jnp.einsum('btl,blc->btc', path, m_p_tok)
        logs_p = jnp.einsum('btl,blc->btc', path, logs_p_tok)
        w = jnp.sum(path, axis = 1)                          # (B, L) durations

        if hp.use_sdp:
            duration_nll = self.sdp_nll(params, h, w, tok_mask, g = g,
                                        train = train, rng = k_dur)
            logw_hat = None
        else:
            duration_nll = None
            logw_hat = self.predict_log_durations(
                params, h, tok_mask.astype(h.dtype), g = g, train = train,
                rng = k_drop)

        # -- random windowed decode ---------------------------------------------
        seg = hp.segment_frames
        hop = self.upsample_rate
        max_start = jnp.maximum(spec_lengths - seg, 0)
        starts = jnp.floor(
            jax.random.uniform(k_seg, (z.shape[0],)) * (max_start + 1)
        ).astype(jnp.int32)
        z_seg = jax.vmap(
            lambda zi, s: lax.dynamic_slice(zi, (s, 0), (seg, zi.shape[-1]))
        )(z, starts)
        audio_seg = jax.vmap(
            lambda ai, s: lax.dynamic_slice(ai, (s * hop,), (seg * hop,))
        )(audio, starts)
        cond = nn.dense(params['generator_cond'], g) \
            if (g is not None and 'generator_cond' in params) else None
        audio_hat = self.generator.apply(params['generator'], z_seg,
                                         cond = cond)

        return {
            'z_p': z_p, 'm_p': m_p, 'logs_p': logs_p, 'logs_q': logs_q,
            'frame_mask': frame_mask, 'token_mask': tok_mask,
            'durations': w, 'log_durations_hat': logw_hat,
            'duration_nll': duration_nll,
            'audio_hat': audio_hat, 'audio_seg': audio_seg, 'starts': starts,
        }

    # -- losses -------------------------------------------------------------------

    @staticmethod
    def kl_loss(z_p, logs_q, m_p, logs_p, frame_mask):
        """KL(posterior ‖ flow-mapped prior), sampled form, masked mean."""
        z_p = z_p.astype(jnp.float32)
        kl = logs_p.astype(jnp.float32) - logs_q.astype(jnp.float32) - 0.5
        kl = kl + 0.5 * (z_p - m_p.astype(jnp.float32)) ** 2 \
            * jnp.exp(-2. * logs_p.astype(jnp.float32))
        mask = frame_mask[..., None].astype(jnp.float32)
        return jnp.sum(kl * mask) / (jnp.sum(mask) * z_p.shape[-1])

    @staticmethod
    def duration_loss(log_durations_hat, durations, token_mask):
        mask = token_mask.astype(jnp.float32)
        target = jnp.log(durations.astype(jnp.float32) + 1e-6) * mask
        err = (log_durations_hat.astype(jnp.float32) - target) ** 2 * mask
        return jnp.sum(err) / jnp.maximum(jnp.sum(mask), 1.)

    # -- inference ------------------------------------------------------------------

    def infer_latent(self, params, tokens, *, speaker_embedding = None,
                     speaker_ids = None, max_frames = None,
                     noise_scale = 0.667, noise_scale_w = 0.8,
                     d_control = 1., min_duration = 0, dtype = None,
                     rng = None):
        """Everything up to (and including) the reverse flow: text →
        durations → expanded prior → sampled latent `z` (B, max_frames, C).

        This is the cheap part of inference (the HiFi-GAN decode is ~50-100×
        the FLOPs of the flow stack), split out so the decode can run
        windowed/incrementally over `z` — see `decode_frames` and
        ``runtimes/serving.make_vits_stepper``.  Returns
        ``(z, cond, lengths, durations, align)``."""
        hp = self.hp
        if max_frames is None:
            max_frames = hp.max_frames
        if rng is None:
            rng = jax.random.PRNGKey(0)

        cast = (lambda t: jax.tree_util.tree_map(
            lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, t)) \
            if dtype is not None else (lambda t: t)
        params = cast(params)
        if speaker_embedding is not None and dtype is not None:
            speaker_embedding = speaker_embedding.astype(dtype)

        g = self.global_cond(params, speaker_ids = speaker_ids,
                             speaker_embedding = speaker_embedding)
        h, m_p, logs_p, tok_valid = self.encode_text(params, tokens)
        tok_mask = tok_valid.astype(h.dtype)

        k_dur, rng = jax.random.split(rng)
        if hp.use_sdp:
            logw = self.sdp_sample(params, h, tok_valid, g = g,
                                   noise_scale_w = noise_scale_w, rng = k_dur)
        else:
            logw = self.predict_log_durations(params, h, tok_mask, g = g)
        w = jnp.exp(logw.astype(jnp.float32)) \
            * tok_mask.astype(jnp.float32) * d_control
        durations = jnp.ceil(w)
        durations = jnp.maximum(durations, float(min_duration)).astype(jnp.int32)
        durations = durations * tok_valid

        stats = jnp.concatenate([m_p, logs_p], axis = -1)
        stats, frame_mask, lengths, idx = length_regulator(
            stats, durations, max_frames)
        m_p_f, logs_p_f = jnp.split(stats, 2, axis = -1)

        eps = jax.random.normal(rng, m_p_f.shape, jnp.float32).astype(m_p_f.dtype)
        # noise_scale may arrive as a traced f32 scalar (task-model controls
        # array): cast so it cannot promote bf16 latents back to f32
        z_p = m_p_f + eps * jnp.exp(logs_p_f) \
            * jnp.asarray(noise_scale, m_p_f.dtype)
        z_p = z_p * frame_mask[..., None].astype(z_p.dtype)
        z = self.flow(params, z_p, frame_mask, g = g, reverse = True)
        z = z * frame_mask[..., None].astype(z.dtype)

        cond = nn.dense(params['generator_cond'], g) \
            if (g is not None and 'generator_cond' in params) else None

        align = jax.nn.one_hot(idx, tokens.shape[1], dtype = jnp.float32)
        align = align * frame_mask[..., None]
        return z, cond, lengths, durations, align

    def decode_frames(self, params, z, cond = None, *, dtype = None):
        """Latent frames `z` (B, T, C) → waveform (B, T·rate).  Fully
        convolutional, so a window of `z` with enough real left/right
        context frames (≥ the generator's receptive field) reproduces the
        full decode exactly on the interior — the basis of incremental
        VITS streaming."""
        gen = params['generator']
        if dtype is not None:
            # cast only the generator subtree (the rest of the model is
            # not touched here)
            gen = jax.tree_util.tree_map(
                lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p,
                gen)
            z = z.astype(dtype)
            if cond is not None:
                cond = cond.astype(dtype)
        return self.generator.apply(gen, z, cond = cond)

    def infer(self, params, state, tokens, *, speaker_embedding = None,
              speaker_ids = None, max_frames = None, noise_scale = 0.667,
              noise_scale_w = 0.8, d_control = 1., min_duration = 0,
              dtype = None, rng = None, ** _):
        """One parallel pass: text → durations → expanded prior → inverse
        flow → HiFi-GAN decode.  Returns `VITSInferenceOutput`, field-
        compatible with `Tacotron2InferenceOutput` (`audio` replaces `mel`;
        `attention_weights` is the hard duration alignment) so the shared
        task-model machinery applies.
        """
        z, cond, lengths, durations, align = self.infer_latent(
            params, tokens, speaker_embedding = speaker_embedding,
            speaker_ids = speaker_ids, max_frames = max_frames,
            noise_scale = noise_scale, noise_scale_w = noise_scale_w,
            d_control = d_control, min_duration = min_duration,
            dtype = dtype, rng = rng)
        audio = self.decode_frames(params, z, cond, dtype = dtype)

        return VITSInferenceOutput(
            audio = audio.astype(jnp.float32),
            lengths = lengths,
            stop_tokens = None,
            attention_weights = align,
            decoder_output = None,
            durations = durations,
        )

    apply = train_forward

    def get_config(self):
        return self.hp.get_config()
