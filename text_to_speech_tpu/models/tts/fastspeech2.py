"""FastSpeech-2 task model: parallel (non-autoregressive) text → mel.

Beyond-reference capability: the reference's synthesizers are all
autoregressive (``/root/reference/models/tts/tacotron2.py``), so their
latency scales with the number of mel frames.  This task model drives the
parallel `models/fastspeech2_arch.FastSpeech2` — one device launch per
(bucketed) batch regardless of utterance length — while reusing the whole
Tacotron-2 task surface unchanged: text splitting/cleaning/encoding, the
frames-per-token quality gates, pipelined vocoding, batched multi-text
`predict`, callbacks, streaming warm-up.  Only `compiled_infer` (a single
forward instead of an AR decode) and the training data pipeline (duration /
pitch / energy targets instead of teacher forcing) differ.

Duration targets come from `data['durations']`, from a teacher alignment
(`ops/pitch.durations_from_attention` distils them from this repo's
Tacotron-2 attention maps), or — fallback for smoke tests — a uniform
split.  Pitch/energy targets are extracted on the fly from the waveform
(`ops/pitch`) when not precomputed.
"""

import time
import logging

import numpy as np

from .tacotron2 import Tacotron2
from ...utils import pad_to_multiple, pad_batch
from ...ops.pitch import (
    estimate_pitch, frame_energy, log_normalize, phoneme_average,
)
from ...loggers import timer

logger = logging.getLogger(__name__)


class FastSpeech2(Tacotron2):
    mixed_precision_ok = True       # parallel forward: bf16 matmuls pay off
    _default_loss = 'FastSpeech2Loss'

    def __init__(self, lang = None, *, name = None, ** kwargs):
        super().__init__(lang, name = name or 'fastspeech2', ** kwargs)

    def build(self, *, model = None, tts_model = None, ** kwargs):
        if tts_model is not None: model = tts_model
        if model is None:
            model = {
                'architecture': kwargs.pop('architecture', 'fastspeech2'),
                'pad_token': self.blank_token_idx,
                'vocab_size': self.vocab_size,
                'n_mel_channels': self.n_mel_channels,
                ** kwargs,
            }
        return Tacotron2.build(self, model = model)

    # -- compiled inference ----------------------------------------------------

    def compiled_infer(self,
                       inputs,
                       *,
                       max_length = None,
                       padding_multiple = 64,
                       d_control = 1.,
                       p_control = 1.,
                       e_control = 1.,
                       min_duration = 0,
                       dtype = None,
                       ** _
                      ):
        """ONE bucketed parallel forward (no decode loop).  `max_length`
        keeps the Tacotron semantics (float = frames-per-token ratio) and
        only sizes the static expansion buffer."""
        import jax.numpy as jnp

        if isinstance(inputs, tuple):
            tokens, speaker_embedding = inputs
        else:
            tokens, speaker_embedding = inputs, None

        tokens = np.asarray(tokens)
        if tokens.ndim == 1: tokens = tokens[None]
        tokens = pad_to_multiple(
            tokens, padding_multiple, axis = 1,
            constant_values = self.blank_token_idx)

        if max_length is None:
            max_length = self.arch.hp.max_frames
        elif isinstance(max_length, float):
            max_length = int(tokens.shape[1] * max_length)
        max_frames = int(min(max_length, self.max_output_length,
                             self.arch.hp.max_position))
        max_frames = -(-max_frames // padding_multiple) * padding_multiple
        # re-clamp after rounding: a clamp that is not a multiple of
        # padding_multiple would otherwise round past max_position and the
        # decoder's positional-table slice [:T] broadcast-fails at trace
        if max_frames > self.arch.hp.max_position:
            max_frames = (self.arch.hp.max_position
                          // padding_multiple) * padding_multiple

        key = ('infer', max_frames, dtype, speaker_embedding is not None,
               int(min_duration))

        def builder():
            def fn(params, state, tokens, controls, spk):
                return self.arch.infer(
                    params, state, tokens, speaker_embedding = spk,
                    max_frames = max_frames, d_control = controls[0],
                    p_control = controls[1], e_control = controls[2],
                    min_duration = int(min_duration), dtype = dtype,
                )
            return fn

        controls = jnp.asarray([d_control, p_control, e_control], jnp.float32)
        fn = self.get_compiled(key, builder)
        return fn(self.params, self.state, tokens, controls,
                  None if speaker_embedding is None
                  else np.asarray(speaker_embedding, np.float32))

    def compiled_tts(self,
                     inputs,
                     vocoder,
                     *,
                     max_length = None,
                     padding_multiple = 64,
                     d_control = 1.,
                     p_control = 1.,
                     e_control = 1.,
                     min_duration = 0,
                     dtype = None,
                     rng = None,
                     vocoder_config = {},
                     ** _):
        """ONE-LAUNCH text→PCM for the parallel family: the duration-driven
        forward + vocoder + int16 quantization in one jitted program (the
        FastSpeech-2 counterpart of `Tacotron2.compiled_tts` — same
        device-array return contract, same single-blocking-read caller)."""
        import jax
        import jax.numpy as jnp

        if isinstance(inputs, tuple):
            tokens, speaker_embedding = inputs
        else:
            tokens, speaker_embedding = inputs, None

        tokens = np.asarray(tokens)
        if tokens.ndim == 1: tokens = tokens[None]
        tokens = pad_to_multiple(
            tokens, padding_multiple, axis = 1,
            constant_values = self.blank_token_idx)

        if max_length is None:
            max_length = self.arch.hp.max_frames
        elif isinstance(max_length, float):
            max_length = int(tokens.shape[1] * max_length)
        max_frames = int(min(max_length, self.max_output_length,
                             self.arch.hp.max_position))
        max_frames = -(-max_frames // padding_multiple) * padding_multiple
        # re-clamp after rounding: a clamp that is not a multiple of
        # padding_multiple would otherwise round past max_position and the
        # decoder's positional-table slice [:T] broadcast-fails at trace
        if max_frames > self.arch.hp.max_position:
            max_frames = (self.arch.hp.max_position
                          // padding_multiple) * padding_multiple

        if rng is None:
            rng = jax.random.PRNGKey(int(time.time_ns()) % (2 ** 31))

        voc_fn, voc_params, voc_tag = vocoder.device_vocoder_fn(
            ** vocoder_config)
        voc_pad = getattr(vocoder, 'serving_pad_multiple', 256)
        pad_val = getattr(vocoder, 'pad_mel_value', -11.)

        key = ('tts1', max_frames, dtype, speaker_embedding is not None,
               int(min_duration), voc_tag, voc_pad)

        def builder():
            def fn(params, state, voc_params, tokens, controls, rng, spk):
                out = self.arch.infer(
                    params, state, tokens, speaker_embedding = spk,
                    max_frames = max_frames, d_control = controls[0],
                    p_control = controls[1], e_control = controls[2],
                    min_duration = int(min_duration), dtype = dtype,
                )
                mel = out.mel
                if mel.shape[1] % voc_pad:
                    mel = jnp.pad(
                        mel,
                        ((0, 0), (0, voc_pad - mel.shape[1] % voc_pad),
                         (0, 0)),
                        constant_values = pad_val)
                audio = voc_fn(voc_params, mel, rng)
                a16 = jnp.round(jnp.clip(audio, -1., 1.) * 32767.) \
                    .astype(jnp.int16)
                return a16, out.lengths, out.mel, out.attention_weights
            return fn

        controls = jnp.asarray([d_control, p_control, e_control], jnp.float32)
        fn = self.get_compiled(key, builder)
        return fn(self.params, self.state, voc_params, tokens, controls, rng,
                  None if speaker_embedding is None
                  else np.asarray(speaker_embedding, np.float32))

    @timer(name = 'inference FastSpeech2')
    def infer(self, text, *, min_fpt_ratio = 0., max_fpt_ratio = float('inf'),
              max_length = 10., ** kwargs):
        """Same surface as Tacotron-2's `infer`; the frames-per-token gates
        default to off — parallel generation cannot diverge the way AR
        attention can (durations are explicit and bounded)."""
        return super().infer(text, min_fpt_ratio = min_fpt_ratio,
                             max_fpt_ratio = max_fpt_ratio,
                             max_length = max_length, ** kwargs)

    # -- training data pipeline ------------------------------------------------

    @property
    def variance_level(self):
        return self.arch.hp.variance_level if self.arch is not None else 'phoneme'

    def _load_durations(self, data, n_tokens, n_frames):
        durations = data.get('durations') if isinstance(data, dict) else None
        if isinstance(durations, str):
            durations = np.load(durations)
        if durations is None and isinstance(data, dict) \
                and data.get('alignment') is not None:
            from ...ops.pitch import durations_from_attention
            align = data['alignment']
            if isinstance(align, str): align = np.load(align)
            durations = durations_from_attention(align, n_tokens = n_tokens)
        if durations is None:
            # uniform fallback: keeps the pipeline runnable without an
            # aligner (demo/test quality only)
            if not getattr(self, '_warned_uniform_durations', False):
                logger.warning(
                    'no duration targets in data: falling back to a uniform '
                    'split (provide data["durations"] or data["alignment"] '
                    'for real training)')
                self._warned_uniform_durations = True
            base = n_frames // max(n_tokens, 1)
            durations = np.full((n_tokens,), base, np.int32)
            durations[: n_frames - base * n_tokens] += 1
        durations = np.asarray(durations, np.int32)[:n_tokens]
        if len(durations) < n_tokens:
            durations = np.pad(durations, (0, n_tokens - len(durations)))
        # exact consistency: the spans must tile the mel
        diff = n_frames - int(durations.sum())
        if diff != 0:
            durations[-1] = max(0, durations[-1] + diff)
            overflow = int(durations.sum()) - n_frames
            if overflow > 0:        # last token hit zero: trim from the left
                for i in range(len(durations) - 2, -1, -1):
                    take = min(durations[i], overflow)
                    durations[i] -= take
                    overflow -= take
                    if overflow == 0: break
        return durations

    def _load_variances(self, data, durations, n_frames):
        """(pitch, energy) targets at the arch's variance level."""
        hp = self.arch.hp
        pitch = data.get('pitch') if isinstance(data, dict) else None
        energy = data.get('energy') if isinstance(data, dict) else None
        if isinstance(pitch, str): pitch = np.load(pitch)
        if isinstance(energy, str): energy = np.load(energy)

        if (pitch is None and hp.use_pitch) or (energy is None and hp.use_energy):
            audio = None
            if isinstance(data, dict) and any(
                    k in data for k in ('audio', 'wavs_22050', 'filename', 'wav')):
                from ...ops.audio_io import load_audio
                try:
                    audio = np.asarray(load_audio(data, self.rate))
                except Exception:
                    audio = None
            hop = getattr(self.mel_fn, 'hop_length', 256)
            win = getattr(self.mel_fn, 'win_length', 1024)
            if pitch is None and hp.use_pitch:
                if audio is not None and len(audio) > win:
                    f0, _ = estimate_pitch(audio, self.rate,
                                           hop_length = hop, win_length = win)
                    pitch, _, _ = log_normalize(f0)
                else:
                    pitch = np.zeros((n_frames,), np.float32)
            if energy is None and hp.use_energy:
                if audio is not None and len(audio) > win:
                    e = frame_energy(audio, hop_length = hop, win_length = win)
                    energy, _, _ = log_normalize(e, log_scale = False)
                else:
                    energy = np.zeros((n_frames,), np.float32)

        def _fit(v):
            if v is None:
                return np.zeros((0,), np.float32)
            v = np.asarray(v, np.float32)
            if self.variance_level == 'phoneme':
                if len(v) != len(durations):        # frame-level → average
                    v = phoneme_average(v[:n_frames], durations)
                return v
            v = v[:n_frames]
            if len(v) < n_frames:
                v = np.pad(v, (0, n_frames - len(v)))
            return v

        return _fit(pitch), _fit(energy)

    def prepare_data(self, data):
        """((tokens, durations, pitch, energy), (mel, durations, pitch,
        energy)) — the variance targets appear on both sides: inputs
        condition the decoder (teacher-forced variances), targets supervise
        the predictors."""
        tokens = self.prepare_input(data)
        mel = np.asarray(self.get_audio(data))
        durations = self._load_durations(data, len(tokens), len(mel))
        pitch, energy = self._load_variances(data, durations, len(mel))
        inputs = (tokens, durations, pitch, energy)
        return inputs, (mel, durations, pitch, energy)

    def filter_data(self, inputs, outputs):
        return (len(inputs[0]) <= self.max_input_length
                and outputs[0].shape[0] <= self.max_output_length)

    def get_padding_values(self):
        return ((self.blank_token_idx, 0, 0., 0.),
                (self.pad_mel_value, 0, 0., 0.))

    def collate(self, batch):
        inputs, outputs = zip(* batch)
        tokens = pad_batch([i[0] for i in inputs],
                           pad_value = self.blank_token_idx)
        durations = pad_batch([i[1] for i in inputs], pad_value = 0)
        pitch = pad_batch([i[2] for i in inputs], pad_value = 0.)
        energy = pad_batch([i[3] for i in inputs], pad_value = 0.)
        mel = pad_batch([o[0] for o in outputs],
                        pad_value = self.pad_mel_value)
        return ((tokens, durations, pitch, energy),
                (mel, durations, pitch, energy))

    def bucket_pad(self, batch, *, token_multiple = 32, frame_multiple = 64):
        """Trainer bucketing hook: tokens (and phoneme-level variances) pad
        to `token_multiple`, mel (and frame-level variances) to
        `frame_multiple` — durations keep summing to the true mel length,
        the extra padding is masked."""
        (tokens, durations, pitch, energy), (mel, *_rest) = batch
        tokens = pad_to_multiple(np.asarray(tokens), token_multiple, axis = 1,
                                 constant_values = self.blank_token_idx)
        durations = pad_to_multiple(np.asarray(durations), token_multiple,
                                    axis = 1)
        mel = pad_to_multiple(np.asarray(mel), frame_multiple, axis = 1,
                              constant_values = self.pad_mel_value)
        multiple = token_multiple if self.variance_level == 'phoneme' \
            else frame_multiple
        pitch = pad_to_multiple(np.asarray(pitch), multiple, axis = 1)
        energy = pad_to_multiple(np.asarray(energy), multiple, axis = 1)
        inputs = (tokens, durations, pitch, energy)
        return inputs, (mel, durations, pitch, energy)
