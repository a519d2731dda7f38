"""HiFi-GAN vocoder (generator + discriminators) as pure JAX functions.

Beyond-reference capability: the reference ships WaveGlow only
(``/root/reference/architectures/waveglow_arch.py``); HiFi-GAN (Kong et
al., 2020 — public architecture) synthesizes the same 22.05 kHz audio from
the same 80-mel inputs at ~2 orders of magnitude fewer FLOPs (~13 GFLOP vs
~1.45 TFLOP per audio-second), which on TPU turns vocoding from the e2e
bottleneck into noise.  Implemented TPU-first in this repo's house style:

  - pytree params + stateless apply functions over (B, T, C);
  - every conv is `lax.conv_general_dilated` NWC — pure MXU work, the
    leaky-relu tails fuse;
  - the multi-receptive-field (MRF) blocks and upsample stages are Python
    loops over *static* module lists inside one jit;
  - discriminators (multi-period + multi-scale) and the full GAN loss set
    (LSGAN adversarial, feature matching, L1 mel) for training.

The task-model wrapper (`models/tts/hifigan.py`) exposes the same vocoder
interface as WaveGlow (`infer(mel) -> audio`).
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..hparams import HParams
from ..nn import layers as nn

HParamsHiFiGAN = HParams(
    n_mel_channels = 80,
    upsample_rates = (8, 8, 2, 2),              # product = 256 = mel hop
    upsample_kernel_sizes = (16, 16, 4, 4),
    upsample_initial_channel = 512,
    resblock_kernel_sizes = (3, 7, 11),
    resblock_dilation_sizes = ((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    resblock_version = 1,   # 1: dilated+plain conv pairs; 2: single dilated conv
    leaky_slope = 0.1,
    # discriminators
    mpd_periods = (2, 3, 5, 7, 11),
    msd_scales = 3,
)


#: published config presets (v1 = the HParams defaults; v2 small-channel,
#: v3 shallow-fast) — pass as `HiFiGAN(** HIFIGAN_V2)`
HIFIGAN_V1 = {}
HIFIGAN_V2 = {'upsample_initial_channel': 128}
HIFIGAN_V3 = {
    'upsample_rates': (8, 8, 4),
    'upsample_kernel_sizes': (16, 16, 8),
    'upsample_initial_channel': 256,
    'resblock_kernel_sizes': (3, 5, 7),
    'resblock_dilation_sizes': ((1, 2), (2, 6), (3, 12)),
    'resblock_version': 2,
}


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


class HiFiGAN:
    """Stateless architecture: static hparams + pure apply functions."""

    def __init__(self, ** kwargs):
        self.hp = HParamsHiFiGAN.extract(kwargs)
        self.total_upsampling = 1
        for r in self.hp.upsample_rates:
            self.total_upsampling *= r

    # -- generator ---------------------------------------------------------

    def init(self, key):
        hp = self.hp
        n_up = len(hp.upsample_rates)
        n_res = len(hp.resblock_kernel_sizes)
        n_keys = 2 + n_up * (1 + n_res * 2 * max(
            len(d) for d in hp.resblock_dilation_sizes))
        keys = nn.split_keys(key, n_keys)

        params = {'conv_pre': nn.init_conv1d(
            next(keys), 7, hp.n_mel_channels, hp.upsample_initial_channel)}
        ch = hp.upsample_initial_channel
        for i, (rate, width) in enumerate(zip(hp.upsample_rates,
                                              hp.upsample_kernel_sizes)):
            out_ch = ch // 2
            stage = {'up': nn.init_conv1d_transpose(next(keys), width, ch, out_ch)}
            for j, (k, dils) in enumerate(zip(hp.resblock_kernel_sizes,
                                              hp.resblock_dilation_sizes)):
                # dict-of-dicts (not a list) so the checkpoint flattener and
                # tree utilities see a uniform nested-dict pytree
                stage['res{}'.format(j)] = {
                    'd{}'.format(di): (
                        {'conv1': nn.init_conv1d(next(keys), k, out_ch, out_ch),
                         'conv2': nn.init_conv1d(next(keys), k, out_ch, out_ch)}
                        if hp.resblock_version == 1 else
                        {'conv1': nn.init_conv1d(next(keys), k, out_ch, out_ch)}
                    )
                    for di, d in enumerate(dils)
                }
            params['up{}'.format(i)] = stage
            ch = out_ch
        params['conv_post'] = nn.init_conv1d(next(keys), 7, ch, 1)
        return params

    def _resblock(self, block, x, kernel_size, dilations, slope):
        for di, d in enumerate(dilations):
            unit = block['d{}'.format(di)]
            h = _leaky(x, slope)
            h = nn.conv1d(unit['conv1'], h, dilation = d)
            if 'conv2' in unit:                 # ResBlock1 (v1/v2 configs)
                h = _leaky(h, slope)
                h = nn.conv1d(unit['conv2'], h)
            x = x + h
        return x

    def apply(self, params, mel, *, cond = None, dtype = None):
        """mel (B, T, n_mel) → waveform (B, T * 256).

        `cond` (B, upsample_initial_channel) is an optional global
        conditioning bias added after `conv_pre` — the hook VITS-style
        end-to-end models use for speaker conditioning (the projection
        itself lives in the caller's params)."""
        hp = self.hp
        x = mel.astype(dtype) if dtype is not None else mel
        if dtype is not None:
            params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)
        x = nn.conv1d(params['conv_pre'], x)
        if cond is not None:
            x = x + cond[:, None, :].astype(x.dtype)
        for i, (rate, width) in enumerate(zip(hp.upsample_rates,
                                              hp.upsample_kernel_sizes)):
            stage = params['up{}'.format(i)]
            x = _leaky(x, hp.leaky_slope)
            # SAME-style transposed conv: crop the VALID output back to T*rate
            x = nn.conv1d_transpose(stage['up'], x, stride = rate)
            extra = x.shape[1] - (mel.shape[1] * _prod(hp.upsample_rates[:i + 1]))
            x = x[:, extra // 2: x.shape[1] - (extra - extra // 2)]
            acc = None
            for j, (k, dils) in enumerate(zip(hp.resblock_kernel_sizes,
                                              hp.resblock_dilation_sizes)):
                y = self._resblock(stage['res{}'.format(j)], x, k, dils,
                                   hp.leaky_slope)
                acc = y if acc is None else acc + y
            x = acc / len(hp.resblock_kernel_sizes)
        # the published generator's final activation uses torch's default
        # leaky slope (0.01), unlike the 0.1 used everywhere else
        x = _leaky(x, 0.01)
        x = nn.conv1d(params['conv_post'], x)
        return jnp.tanh(x)[..., 0].astype(jnp.float32)

    infer = apply

    # -- multi-period discriminator -----------------------------------------

    _MPD_CHANNELS = (32, 128, 512, 1024)

    def init_mpd(self, key):
        hp = self.hp
        keys = nn.split_keys(key, len(hp.mpd_periods) * 6)
        return {'p{}'.format(i): self._init_period_d(keys)
                for i in range(len(hp.mpd_periods))}

    def _init_period_d(self, keys):
        convs, in_ch = {}, 1
        for ci, ch in enumerate(self._MPD_CHANNELS):
            convs['c{}'.format(ci)] = nn.init_conv1d(next(keys), 5, in_ch, ch)
            in_ch = ch
        return {'convs': convs,
                'conv5': nn.init_conv1d(next(keys), 3, in_ch, 1024),
                'post': nn.init_conv1d(next(keys), 3, 1024, 1)}

    def _apply_period_d(self, p, audio, period, slope):
        B, T = audio.shape
        pad = (-T) % period
        # reflect padding only supports pad <= T-1; fall back to edge
        x = jnp.pad(audio, ((0, 0), (0, pad)),
                    mode = 'reflect' if 0 < pad <= T - 1 else 'edge')
        # (B, T/p, p): the period axis becomes the batch of independent 1-D
        # signals — conv over the T/p axis with kernel (5,) stride 3, shared
        # across phases (equivalent to the published (5,1)x(3,1) 2-D convs)
        x = x.reshape(B, -1, period)                       # (B, T/p, p)
        x = jnp.swapaxes(x, 1, 2).reshape(B * period, -1, 1)
        feats = []
        for ci in range(len(p['convs'])):
            x = _leaky(nn.conv1d(p['convs']['c{}'.format(ci)], x, stride = 3),
                       slope)
            feats.append(x)
        x = _leaky(nn.conv1d(p['conv5'], x), slope)
        feats.append(x)
        x = nn.conv1d(p['post'], x)
        feats.append(x)
        return x.reshape(B, -1), feats

    def apply_mpd(self, params, audio):
        """audio (B, T) → list of (score, features) per period."""
        hp = self.hp
        return [self._apply_period_d(params['p{}'.format(i)], audio, period,
                                     hp.leaky_slope)
                for i, period in enumerate(hp.mpd_periods)]

    # -- multi-scale discriminator --------------------------------------------

    _MSD_SPECS = (      # (width, stride, groups, out_ch)
        (15, 1, 1, 128), (41, 2, 4, 128), (41, 2, 16, 256), (41, 4, 16, 512),
        (41, 4, 16, 1024), (41, 1, 16, 1024), (5, 1, 1, 1024),
    )

    def init_msd(self, key):
        keys = nn.split_keys(key, self.hp.msd_scales * (len(self._MSD_SPECS) + 1))
        scales = {}
        for si in range(self.hp.msd_scales):
            convs, in_ch = {}, 1
            for ci, (width, stride, groups, out_ch) in enumerate(self._MSD_SPECS):
                convs['c{}'.format(ci)] = nn.init_conv1d(
                    next(keys), width, in_ch // groups, out_ch)
                in_ch = out_ch
            scales['s{}'.format(si)] = {
                'convs': convs,
                'post': nn.init_conv1d(next(keys), 3, in_ch, 1)}
        return scales

    def _apply_scale_d(self, p, audio, slope):
        x = audio[..., None]                                  # (B, T, 1)
        feats = []
        for ci, (width, stride, groups, out_ch) in enumerate(self._MSD_SPECS):
            conv = p['convs']['c{}'.format(ci)]
            x = lax.conv_general_dilated(
                x, conv['kernel'], window_strides = (stride,),
                padding = 'SAME', feature_group_count = groups,
                dimension_numbers = ('NWC', 'WIO', 'NWC')) + conv['bias']
            x = _leaky(x, slope)
            feats.append(x)
        x = nn.conv1d(p['post'], x)
        feats.append(x)
        return x.reshape(x.shape[0], -1), feats

    def apply_msd(self, params, audio):
        """audio (B, T) → list of (score, features) per scale (×1, ×2, ×4
        average-pooled)."""
        hp = self.hp
        out = []
        x = audio
        for i in range(hp.msd_scales):
            p = params['s{}'.format(i)]
            if i > 0:
                x = lax.reduce_window(
                    x, 0., lax.add, (1, 4), (1, 2), 'SAME') / 4.
            out.append(self._apply_scale_d(p, x, hp.leaky_slope))
        return out

    # -- losses ----------------------------------------------------------------

    @staticmethod
    def discriminator_loss(real_outs, fake_outs):
        """LSGAN: real → 1, fake → 0 (fake scores must be stop-gradiented
        upstream or computed on detached audio).  Score means accumulate
        float32 (the mixed-precision policy feeds bf16 scores)."""
        loss = 0.
        for (real, _), (fake, _) in zip(real_outs, fake_outs):
            loss = loss + jnp.mean((real.astype(jnp.float32) - 1.) ** 2) \
                + jnp.mean(fake.astype(jnp.float32) ** 2)
        return loss

    @staticmethod
    def generator_adversarial_loss(fake_outs):
        loss = 0.
        for fake, _ in fake_outs:
            loss = loss + jnp.mean((fake.astype(jnp.float32) - 1.) ** 2)
        return loss

    @staticmethod
    def feature_matching_loss(real_outs, fake_outs):
        loss = 0.
        for (_, real_feats), (_, fake_feats) in zip(real_outs, fake_outs):
            for r, f in zip(real_feats, fake_feats):
                loss = loss + jnp.mean(jnp.abs(
                    r.astype(jnp.float32) - f.astype(jnp.float32)))
        return loss

    def generator_loss(self, gen_params, disc_params, mel_fn, mel, audio,
                       *, lambda_mel = 45., lambda_fm = 2.,
                       compute_dtype = None):
        """Full HiFi-GAN generator objective → (loss, components dict).

        ``compute_dtype`` is the mixed-precision hook (train/precision.py):
        generator + discriminator convs run in that dtype; the L1-mel term
        compares f32 spectrograms of the f32-upcast fake against the
        UNCAST real audio, and every score/feature reduction is f32."""
        if compute_dtype is not None:
            from ..train.precision import cast_floating
            gen_params = cast_floating(gen_params, compute_dtype)
            disc_params = cast_floating(disc_params, compute_dtype)
            mel = mel.astype(compute_dtype)
        fake = self.apply(gen_params, mel)
        n = min(fake.shape[1], audio.shape[1])
        fake, real = fake[:, :n], audio[:, :n]
        # `apply` returns f32 waveforms by contract; under the mixed policy
        # the discriminators run in the compute dtype, so their operands
        # cast here (the mel term below keeps the f32 streams)
        fake_c = fake if compute_dtype is None else fake.astype(compute_dtype)
        real_c = real.astype(fake_c.dtype)

        mpd_real = self.apply_mpd(disc_params['mpd'], real_c)
        mpd_fake = self.apply_mpd(disc_params['mpd'], fake_c)
        msd_real = self.apply_msd(disc_params['msd'], real_c)
        msd_fake = self.apply_msd(disc_params['msd'], fake_c)

        adv = (self.generator_adversarial_loss(mpd_fake)
               + self.generator_adversarial_loss(msd_fake))
        fm = (self.feature_matching_loss(mpd_real, mpd_fake)
              + self.feature_matching_loss(msd_real, msd_fake))
        mel_l1 = jnp.mean(jnp.abs(
            mel_fn(fake.astype(jnp.float32))
            - mel_fn(real.astype(jnp.float32)))) \
            if mel_fn is not None else 0.
        loss = adv + lambda_fm * fm + lambda_mel * mel_l1
        return loss, {'adv': adv, 'fm': fm, 'mel': mel_l1}

    def discriminator_step_loss(self, disc_params, gen_params, mel, audio,
                                *, compute_dtype = None):
        """Discriminator objective on detached generator audio."""
        if compute_dtype is not None:
            from ..train.precision import cast_floating
            gen_params = cast_floating(gen_params, compute_dtype)
            disc_params = cast_floating(disc_params, compute_dtype)
            mel = mel.astype(compute_dtype)
        fake = lax.stop_gradient(self.apply(gen_params, mel))
        n = min(fake.shape[1], audio.shape[1])
        fake, real = fake[:, :n], audio[:, :n]
        if compute_dtype is not None:       # `apply` returns f32 by contract
            fake, real = fake.astype(compute_dtype), real.astype(compute_dtype)
        return (self.discriminator_loss(self.apply_mpd(disc_params['mpd'], real),
                                        self.apply_mpd(disc_params['mpd'], fake))
                + self.discriminator_loss(self.apply_msd(disc_params['msd'], real),
                                          self.apply_msd(disc_params['msd'], fake)))

    def get_config(self):
        return self.hp.get_config()


def _prod(xs):
    out = 1
    for x in xs:
        out *= x
    return out
