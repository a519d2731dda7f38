"""FastSpeech 2 — non-autoregressive text → mel (Ren et al., 2021).

Beyond-reference capability: the reference's only synthesizer is the
autoregressive Tacotron-2 (``/root/reference/models/tts/tacotron2.py``),
whose sequential decode loop is the end-to-end latency bottleneck on any
accelerator.  FastSpeech 2 generates every mel frame in ONE parallel pass —
on TPU that turns the synthesizer from a ~100 µs/frame serial chain into a
handful of large batched matmuls on the MXU, removing the decode loop
entirely.  This is the TPU-first answer to the reference's "decoder-bound"
profile, implemented in the house style:

  - pytree params + pure stateless apply fns over static shapes;
  - feed-forward transformer (FFT) blocks reusing the shared MHA
    primitives (`transformers/attention.py`), post-LN as published, with
    the conv1d (k=9/1) position-wise FFN;
  - a variance adaptor (duration / pitch / energy predictors + quantized
    variance embeddings) at phoneme or frame level;
  - the length regulator as a vectorized comparison + gather — no
    data-dependent shapes inside jit: frames are expanded into a static
    `max_frames` buffer and masked, so one executable serves any utterance
    (the task model buckets `max_frames` exactly like Tacotron-2's decoder
    buffer);
  - an optional Tacotron-style conv+BN postnet (same layout as
    `tacotron2_arch`, so published-checkpoint conventions carry over).

Inference returns a `Tacotron2InferenceOutput`-compatible tuple (the
duration-expanded token map doubles as the "attention" alignment), so every
task-model path — chunking, frames-per-token gates, pipelined vocoding,
callbacks — works unchanged (`models/tts/fastspeech2.py`).
"""

import collections

import jax
import jax.numpy as jnp

from ..hparams import HParams
from ..nn import layers as nn
from .transformers.attention import init_mha, mha
from .transformers.transformer_arch import sinusoidal_embedding

FastSpeech2InferenceOutput = collections.namedtuple(
    'FastSpeech2InferenceOutput',
    ['mel', 'lengths', 'stop_tokens', 'attention_weights', 'decoder_output',
     'durations', 'pitch', 'energy'],
)

HParamsFastSpeech2 = HParams(
    vocab_size = 148,
    pad_token = 0,
    n_mel_channels = 80,

    dim = 256,
    n_heads = 2,
    encoder_layers = 4,
    decoder_layers = 6,
    ffn_dim = 1024,
    ffn_kernels = (9, 1),
    drop_rate = 0.2,
    epsilon = 1e-9,
    max_position = 2048,        # static positional-table length (mel frames)

    # variance adaptor
    variance_filters = 256,
    variance_kernel_size = 3,
    variance_drop_rate = 0.5,
    variance_level = 'phoneme',     # 'phoneme' | 'frame' (pitch/energy)
    use_pitch = True,
    use_energy = True,
    n_bins = 256,
    pitch_min = -3.,            # bin range (features are usually normalized)
    pitch_max = 3.,
    energy_min = -3.,
    energy_max = 3.,

    # speaker conditioning (SV2TTS-style external embedding)
    speaker_embedding_dim = None,

    # postnet (Tacotron-style conv+BN refiner)
    use_postnet = True,
    postnet_n_conv = 5,
    postnet_filters = 256,
    postnet_kernel_size = 5,
    postnet_drop_rate = 0.5,
    postnet_epsilon = 1e-5,
    postnet_momentum = 0.1,

    max_frames = 1024,          # default inference expansion buffer
)


def length_regulator(x, durations, max_frames):
    """Expand phoneme states to frame rate without data-dependent shapes.

    x (B, L, D); durations (B, L) int — frames per token.  Returns
    (expanded (B, max_frames, D), frame mask (B, max_frames), lengths (B),
    token index per frame (B, max_frames)).

    Frame t belongs to token i iff ``cum_dur[i-1] <= t < cum_dur[i]``; the
    index is computed as a vectorized comparison against the cumulative
    durations (O(T·L) VPU ops, no scatter / sort / dynamic shape) and the
    expansion is one `take_along_axis` gather — the XLA-friendly form of
    the reference-world loop-and-repeat length regulator.
    """
    L = x.shape[1]
    ends = jnp.cumsum(durations.astype(jnp.int32), axis = 1)        # (B, L)
    total = ends[:, -1]
    t = jnp.arange(max_frames, dtype = jnp.int32)
    idx = jnp.sum(t[None, :, None] >= ends[:, None, :], axis = -1)  # (B, T)
    mask = t[None, :] < total[:, None]
    idx = jnp.minimum(idx, L - 1)
    expanded = jnp.take_along_axis(x, idx[..., None], axis = 1)
    expanded = expanded * mask[..., None].astype(x.dtype)
    return expanded, mask, jnp.minimum(total, max_frames), idx


class FastSpeech2:
    """Stateless architecture: static hparams + pure apply functions."""

    def __init__(self, ** kwargs):
        self.hp = HParamsFastSpeech2.extract(kwargs)

    # -- init ------------------------------------------------------------------

    def _init_fft_block(self, key):
        hp = self.hp
        keys = nn.split_keys(key, 3)
        k1, k2 = hp.ffn_kernels
        return {
            'attention': init_mha(next(keys), hp.dim, hp.n_heads),
            'attention_norm': nn.init_layer_norm(hp.dim),
            'conv1': nn.init_conv1d(next(keys), k1, hp.dim, hp.ffn_dim),
            'conv2': nn.init_conv1d(next(keys), k2, hp.ffn_dim, hp.dim),
            'ffn_norm': nn.init_layer_norm(hp.dim),
        }

    def _init_variance_predictor(self, key):
        hp = self.hp
        keys = nn.split_keys(key, 3)
        k = hp.variance_kernel_size
        return {
            'conv1': nn.init_conv1d(next(keys), k, hp.dim, hp.variance_filters),
            'norm1': nn.init_layer_norm(hp.variance_filters),
            'conv2': nn.init_conv1d(next(keys), k, hp.variance_filters,
                                    hp.variance_filters),
            'norm2': nn.init_layer_norm(hp.variance_filters),
            'proj': nn.init_dense(next(keys), hp.variance_filters, 1),
        }

    def init(self, key):
        hp = self.hp
        keys = nn.split_keys(key, hp.encoder_layers + hp.decoder_layers + 12)
        params = {
            'embedding': nn.init_embedding(next(keys), hp.vocab_size, hp.dim),
            'encoder': {'layer_{}'.format(i): self._init_fft_block(next(keys))
                        for i in range(hp.encoder_layers)},
            'decoder': {'layer_{}'.format(i): self._init_fft_block(next(keys))
                        for i in range(hp.decoder_layers)},
            'duration_predictor': self._init_variance_predictor(next(keys)),
            'mel_linear': nn.init_dense(next(keys), hp.dim, hp.n_mel_channels),
        }
        if hp.use_pitch:
            params['pitch_predictor'] = self._init_variance_predictor(next(keys))
            params['pitch_embedding'] = nn.init_embedding(
                next(keys), hp.n_bins, hp.dim)
        if hp.use_energy:
            params['energy_predictor'] = self._init_variance_predictor(next(keys))
            params['energy_embedding'] = nn.init_embedding(
                next(keys), hp.n_bins, hp.dim)
        if hp.speaker_embedding_dim:
            params['speaker_projection'] = nn.init_dense(
                next(keys), hp.speaker_embedding_dim, hp.dim)
        if hp.use_postnet:
            params['postnet'] = self._init_postnet(next(keys))
        return params, self.init_state()

    def _init_postnet(self, key):
        hp = self.hp
        keys = nn.split_keys(key, hp.postnet_n_conv)
        postnet = {}
        for i in range(hp.postnet_n_conv):
            in_ch = hp.n_mel_channels if i == 0 else hp.postnet_filters
            out_ch = hp.n_mel_channels if i == hp.postnet_n_conv - 1 \
                else hp.postnet_filters
            bn_params, _ = nn.init_batch_norm(out_ch)
            postnet['conv_{}'.format(i)] = {
                'conv': nn.init_conv1d(next(keys), hp.postnet_kernel_size,
                                       in_ch, out_ch),
                'bn': bn_params,
            }
        return postnet

    def init_state(self):
        hp = self.hp
        if not hp.use_postnet:
            return {}
        state = {}
        for i in range(hp.postnet_n_conv):
            out_ch = hp.n_mel_channels if i == hp.postnet_n_conv - 1 \
                else hp.postnet_filters
            state['conv_{}'.format(i)] = {'bn': {
                'moving_mean': jnp.zeros((out_ch,)),
                'moving_var': jnp.ones((out_ch,)),
            }}
        return {'postnet': state}

    # -- blocks ----------------------------------------------------------------

    def _dropout(self, x, rate, train, rng, salt):
        if not train or rng is None or rate <= 0.:
            return x
        return nn.dropout(jax.random.fold_in(rng, salt), x, rate, train = True)

    def _fft_block(self, params, x, *, mask = None, pad_mask = None,
                   train = False, rng = None, salt = 0):
        """Post-LN feed-forward-transformer block (self-attn + conv FFN)."""
        hp = self.hp
        h, _ = mha(params['attention'], x, n_heads = hp.n_heads, mask = mask)
        h = self._dropout(h, hp.drop_rate, train, rng, salt)
        x = nn.layer_norm(params['attention_norm'], x + h, hp.epsilon)
        if pad_mask is not None:
            x = x * pad_mask.astype(x.dtype)

        h = jax.nn.relu(nn.conv1d(params['conv1'], x))
        h = nn.conv1d(params['conv2'], h)
        h = self._dropout(h, hp.drop_rate, train, rng, salt + 1)
        x = nn.layer_norm(params['ffn_norm'], x + h, hp.epsilon)
        if pad_mask is not None:
            x = x * pad_mask.astype(x.dtype)
        return x

    def _variance_predictor(self, params, x, *, pad_mask = None, train = False,
                            rng = None, salt = 0):
        """2× [conv → relu → LN → dropout] → linear → (B, T)."""
        hp = self.hp
        h = jax.nn.relu(nn.conv1d(params['conv1'], x))
        h = nn.layer_norm(params['norm1'], h, hp.epsilon)
        h = self._dropout(h, hp.variance_drop_rate, train, rng, salt)
        h = jax.nn.relu(nn.conv1d(params['conv2'], h))
        h = nn.layer_norm(params['norm2'], h, hp.epsilon)
        h = self._dropout(h, hp.variance_drop_rate, train, rng, salt + 1)
        out = nn.dense(params['proj'], h)[..., 0]
        if pad_mask is not None:
            out = out * pad_mask[..., 0]
        return out

    def _bucketize(self, values, lo, hi):
        hp = self.hp
        scaled = (values - lo) / max(hi - lo, 1e-9) * hp.n_bins
        return jnp.clip(scaled.astype(jnp.int32), 0, hp.n_bins - 1)

    def _variance_embedding(self, params, name, values, lo, hi):
        return nn.embedding(params[name + '_embedding'],
                            self._bucketize(values, lo, hi))

    # -- encoder / decoder ------------------------------------------------------

    def encode(self, params, tokens, *, speaker_embedding = None,
               train = False, rng = None):
        """tokens (B, L) → (hidden (B, L, D), attn mask, pad mask (B, L, 1))."""
        hp = self.hp
        L = tokens.shape[1]
        valid = tokens != hp.pad_token                      # (B, L)
        attn_mask = valid[:, None, None, :]
        pad_mask = valid[..., None].astype(jnp.float32)

        x = nn.embedding(params['embedding'], tokens)
        x = x + sinusoidal_embedding(hp.max_position, hp.dim)[None, :L].astype(x.dtype)
        x = self._dropout(x, hp.drop_rate, train, rng, 100)
        for i in range(hp.encoder_layers):
            x = self._fft_block(params['encoder']['layer_{}'.format(i)], x,
                                mask = attn_mask, pad_mask = pad_mask,
                                train = train, rng = rng, salt = 110 + 2 * i)
        if speaker_embedding is not None and 'speaker_projection' in params:
            spk = nn.dense(params['speaker_projection'], speaker_embedding)
            x = x + spk[:, None, :] * pad_mask.astype(x.dtype)
        return x, attn_mask, pad_mask

    def decode(self, params, x, frame_mask, *, train = False, rng = None):
        """Frame-rate states (B, T, D) → mel (B, T, n_mel)."""
        hp = self.hp
        T = x.shape[1]
        attn_mask = frame_mask[:, None, None, :]
        pad_mask = frame_mask[..., None].astype(jnp.float32)
        x = x + sinusoidal_embedding(hp.max_position, hp.dim)[None, :T].astype(x.dtype)
        x = self._dropout(x, hp.drop_rate, train, rng, 200)
        for i in range(hp.decoder_layers):
            x = self._fft_block(params['decoder']['layer_{}'.format(i)], x,
                                mask = attn_mask, pad_mask = pad_mask,
                                train = train, rng = rng, salt = 210 + 2 * i)
        return nn.dense(params['mel_linear'], x)

    def postnet(self, params, state, mel, *, train = False, rng = None,
                frame_mask = None):
        """Residual conv+BN refiner (layout mirrors ``tacotron2_arch``)."""
        hp = self.hp
        if not hp.use_postnet:
            return mel, state
        x = mel
        new_state = {}
        pn_state = (state or {}).get('postnet') or self.init_state()['postnet']
        for i in range(hp.postnet_n_conv):
            name = 'conv_{}'.format(i)
            p = params['postnet'][name]
            x = nn.conv1d(p['conv'], x)
            x, bn_state = nn.batch_norm(
                p['bn'], pn_state[name]['bn'], x, train = train,
                momentum = hp.postnet_momentum, epsilon = hp.postnet_epsilon,
                mask = frame_mask if train else None)
            new_state[name] = {'bn': bn_state}
            if i < hp.postnet_n_conv - 1:
                x = jnp.tanh(x)
            x = self._dropout(x, hp.postnet_drop_rate, train, rng, 300 + i)
        out = mel + x
        if frame_mask is not None:
            out = out * frame_mask[..., None].astype(out.dtype)
        merged = dict(state or {})
        merged['postnet'] = new_state
        return out, merged

    # -- variance adaptor -------------------------------------------------------

    def _apply_variances(self, params, x, *, pad_mask, pitch_target,
                         energy_target, p_control, e_control, train, rng):
        """Predict pitch/energy on `x`, add the (target or predicted)
        variance embeddings.  Returns (x, pitch_pred, energy_pred)."""
        hp = self.hp
        pitch_pred = energy_pred = None
        if hp.use_pitch:
            pitch_pred = self._variance_predictor(
                params['pitch_predictor'], x, pad_mask = pad_mask,
                train = train, rng = rng, salt = 400)
            pitch = pitch_target if pitch_target is not None \
                else pitch_pred * p_control
            x = x + self._variance_embedding(params, 'pitch', pitch,
                                             hp.pitch_min, hp.pitch_max)
        if hp.use_energy:
            energy_pred = self._variance_predictor(
                params['energy_predictor'], x, pad_mask = pad_mask,
                train = train, rng = rng, salt = 410)
            energy = energy_target if energy_target is not None \
                else energy_pred * e_control
            x = x + self._variance_embedding(params, 'energy', energy,
                                             hp.energy_min, hp.energy_max)
        if pad_mask is not None:
            x = x * pad_mask.astype(x.dtype)
        return x, pitch_pred, energy_pred

    # -- full passes ------------------------------------------------------------

    def __call__(self, params, state, tokens, *, durations, pitch = None,
                 energy = None, speaker_embedding = None, max_frames = None,
                 train = False, rng = None):
        """Teacher-forced training pass with ground-truth variances.

        durations (B, L) int — frames per token (sums define mel length);
        pitch/energy — phoneme-level (B, L) or frame-level (B, T) per
        `variance_level`.  Returns ((mel, mel_postnet, log_duration_pred,
        pitch_pred, energy_pred, frame_mask, token_mask), new_state) —
        the two masks let `FastSpeech2Loss` normalize over valid
        frames/tokens only.
        """
        hp = self.hp
        if max_frames is None:
            max_frames = hp.max_frames

        enc, _, pad_mask = self.encode(
            params, tokens, speaker_embedding = speaker_embedding,
            train = train, rng = rng)

        log_d_pred = self._variance_predictor(
            params['duration_predictor'], enc, pad_mask = pad_mask,
            train = train, rng = rng, salt = 420)

        pitch_pred = energy_pred = None
        if hp.variance_level == 'phoneme':
            enc, pitch_pred, energy_pred = self._apply_variances(
                params, enc, pad_mask = pad_mask, pitch_target = pitch,
                energy_target = energy, p_control = 1., e_control = 1.,
                train = train, rng = rng)

        x, frame_mask, lengths, _ = length_regulator(enc, durations, max_frames)

        if hp.variance_level == 'frame':
            fmask = frame_mask[..., None].astype(jnp.float32)
            x, pitch_pred, energy_pred = self._apply_variances(
                params, x, pad_mask = fmask, pitch_target = pitch,
                energy_target = energy, p_control = 1., e_control = 1.,
                train = train, rng = rng)

        mel = self.decode(params, x, frame_mask, train = train, rng = rng)
        mel = mel * frame_mask[..., None].astype(mel.dtype)
        mel_post, new_state = self.postnet(params, state, mel, train = train,
                                           rng = rng, frame_mask = frame_mask)
        return (mel, mel_post, log_d_pred, pitch_pred, energy_pred,
                frame_mask, pad_mask[..., 0]), new_state

    apply = __call__

    def infer(self, params, state, tokens, *, speaker_embedding = None,
              max_frames = None, d_control = 1., p_control = 1.,
              e_control = 1., min_duration = 0, dtype = None, rng = None,
              ** _):
        """Single-pass parallel inference.  Predicted durations drive the
        length regulator; `d/p/e_control` scale speed / pitch / energy.
        `min_duration` floors each non-pad token's frame count (static int) —
        a production guard against collapsed duration predictions (and the
        way random-weight benchmarks get realistic mel lengths).

        Returns `FastSpeech2InferenceOutput` — field-compatible with
        `Tacotron2InferenceOutput` (`attention_weights` is the hard
        duration alignment (B, T, L)), so the Tacotron task-model machinery
        (frames-per-token gates, pipelined vocoding, callbacks) applies
        unchanged.
        """
        hp = self.hp
        if max_frames is None:
            max_frames = hp.max_frames

        cast = (lambda t: jax.tree_util.tree_map(
            lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, t)) \
            if dtype is not None else (lambda t: t)
        params = cast(params)
        state = cast(state) if state else state
        if speaker_embedding is not None and dtype is not None:
            speaker_embedding = speaker_embedding.astype(dtype)

        enc, _, pad_mask = self.encode(params, tokens,
                                       speaker_embedding = speaker_embedding)

        log_d = self._variance_predictor(params['duration_predictor'], enc,
                                         pad_mask = pad_mask)
        durations = jnp.round(
            (jnp.exp(log_d.astype(jnp.float32)) - 1.) * d_control)
        durations = jnp.maximum(durations, float(min_duration)).astype(jnp.int32)
        durations = durations * (pad_mask[..., 0] > 0)

        pitch_pred = energy_pred = None
        if hp.variance_level == 'phoneme':
            enc, pitch_pred, energy_pred = self._apply_variances(
                params, enc, pad_mask = pad_mask, pitch_target = None,
                energy_target = None, p_control = p_control,
                e_control = e_control, train = False, rng = None)

        x, frame_mask, lengths, idx = length_regulator(enc, durations,
                                                       max_frames)

        if hp.variance_level == 'frame':
            fmask = frame_mask[..., None].astype(x.dtype)
            x, pitch_pred, energy_pred = self._apply_variances(
                params, x, pad_mask = fmask, pitch_target = None,
                energy_target = None, p_control = p_control,
                e_control = e_control, train = False, rng = None)

        mel = self.decode(params, x, frame_mask)
        mel = mel * frame_mask[..., None].astype(mel.dtype)
        mel_post, _ = self.postnet(params, state, mel, frame_mask = frame_mask)

        # hard alignment from the duration map — the attention analog
        align = jax.nn.one_hot(idx, tokens.shape[1], dtype = jnp.float32)
        align = align * frame_mask[..., None]

        return FastSpeech2InferenceOutput(
            mel = mel_post.astype(jnp.float32),
            lengths = lengths,
            stop_tokens = None,
            attention_weights = align,
            decoder_output = mel.astype(jnp.float32),
            durations = durations,
            pitch = pitch_pred,
            energy = energy_pred,
        )

    def get_config(self):
        return self.hp.get_config()
