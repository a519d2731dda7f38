"""VITS task model: end-to-end text → waveform, no separate vocoder.

Beyond-reference capability: every reference pipeline is a synthesizer +
vocoder pair trained separately on mel targets
(``/root/reference/models/tts/tacotron2.py`` + ``waveglow.py``); VITS
(`models/vits_arch.py`) generates audio in ONE parallel device call.  The
task model keeps the whole Tacotron-2 task surface — text splitting /
cleaning / encoding, batched multi-text `predict`, callbacks, `tts()` —
by acting as its own vocoder: `tts(text, model = vits_model)` resolves the
vocoder to the model itself (`is_end_to_end`), and the pipelined
synthesize+vocode stage is one `compiled_infer` that already returns
waveforms.

Training is adversarial (`train/gan.make_vits_train_step`); `prepare_data`
yields (tokens, linear spectrogram, frames, waveform) batches.
"""

import time
import logging

import numpy as np

from .tacotron2 import Tacotron2
from ...utils import pad_to_multiple, pad_batch
from ...loggers import timer, Timer

logger = logging.getLogger(__name__)


class VITS(Tacotron2):
    #: resolves `tts(...)`'s vocoder to the model itself (see
    #: `models/tts/__init__.get_models`)
    is_end_to_end = True

    def __init__(self, lang = None, *, name = None, ** kwargs):
        super().__init__(lang, name = name or 'vits', ** kwargs)

    @classmethod
    def from_torch_pretrained(cls, checkpoint, *, name = 'pretrained_vits',
                              lang = 'en', config = None, ** kwargs):
        """Create a model from a published torch VITS checkpoint (the
        official LJSpeech / VCTK ``SynthesizerTrn`` releases).

        Architecture hyperparameters are inferred from the state dict's
        tensor shapes (``tts_checkpoints.vits_config_from_state_dict``);
        pass `config` overrides for the few non-derivable fields (e.g.
        `upsample_rates` if the training config used stride != kernel//2).
        The tokenizer must reproduce the checkpoint's symbol table — pass
        `tokenizer = {'vocab': [...], 'level': 'char', ...}` matching the
        original training config."""
        import jax
        import jax.numpy as jnp
        from ..tts_checkpoints import (
            _load_state_dict, remove_torch_weight_norm, convert_vits,
            vits_config_from_state_dict,
        )

        sd = remove_torch_weight_norm(_load_state_dict(checkpoint))
        inferred = vits_config_from_state_dict(sd)
        inferred.update(config or {})

        # pad_token is a training-config fact (0 = '_' in the official
        # symbol tables), not shape-derivable; override via `config`
        model = cls(lang = lang, name = name,
                    tts_model = {'architecture': 'vits', ** inferred},
                    ** kwargs)
        if model.vocab_size != inferred['vocab_size']:
            logger.warning(
                'tokenizer vocab (%d) != checkpoint embedding table (%d): '
                'pass a `tokenizer` matching the original training config',
                model.vocab_size, inferred['vocab_size'])
        model.set_weights(jax.tree_util.tree_map(
            jnp.asarray, convert_vits(sd)))
        model.save()
        return model

    def build(self, *, model = None, tts_model = None, ** kwargs):
        if tts_model is not None: model = tts_model
        if model is None:
            model = {
                'architecture': kwargs.pop('architecture', 'vits'),
                'pad_token': self.blank_token_idx,
                'vocab_size': self.vocab_size,
                'spec_channels': self.mel_fn.filter_length // 2 + 1,
                ** kwargs,
            }
        out = Tacotron2.build(self, model = model)
        if self.arch.upsample_rate != self.mel_fn.hop_length:
            logger.warning(
                'generator upsampling (%d) != STFT hop (%d): training '
                'spectrograms and waveform segments will be misaligned',
                self.arch.upsample_rate, self.mel_fn.hop_length)
        return out

    @property
    def upsample_rate(self):
        return self.arch.upsample_rate

    # -- compiled inference ------------------------------------------------------

    def compiled_infer(self,
                       inputs,
                       *,
                       max_length = None,
                       padding_multiple = 64,
                       noise_scale = 0.667,
                       noise_scale_w = 0.8,
                       d_control = 1.,
                       min_duration = 0,
                       dtype = None,
                       rng = None,
                       ** _
                      ):
        """ONE parallel text→waveform forward per shape bucket."""
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

        if rng is None:
            rng = jax.random.PRNGKey(int(time.time_ns()) % (2 ** 31))

        key = ('infer', max_frames, dtype, speaker_embedding is not None,
               int(min_duration))

        def builder():
            def fn(params, state, tokens, controls, rng, spk):
                return self.arch.infer(
                    params, state, tokens, speaker_embedding = spk,
                    max_frames = max_frames, noise_scale = controls[0],
                    d_control = controls[1], noise_scale_w = controls[2],
                    min_duration = int(min_duration), dtype = dtype,
                    rng = rng,
                )
            return fn

        controls = jnp.asarray([noise_scale, d_control, noise_scale_w],
                               jnp.float32)
        fn = self.get_compiled(key, builder)
        return fn(self.params, self.state, tokens, controls, rng,
                  None if speaker_embedding is None
                  else np.asarray(speaker_embedding, np.float32))

    @timer(name = 'inference VITS')
    def infer(self, text, *, vocoder = None, min_fpt_ratio = 0.,
              max_fpt_ratio = float('inf'), max_length = 10., ** kwargs):
        """Same surface as Tacotron-2's `infer`; the model is its own
        vocoder and the frames-per-token gates default to off (durations
        are explicit and bounded)."""
        return super().infer(text, vocoder = vocoder or self,
                             min_fpt_ratio = min_fpt_ratio,
                             max_fpt_ratio = max_fpt_ratio,
                             max_length = max_length, ** kwargs)

    def predict(self, inputs, *, vocoder = None, ** kwargs):
        return super().predict(inputs, vocoder = vocoder or self, ** kwargs)

    def stream(self, stream, *, vocoder = None, ** kwargs):
        return super().stream(stream, vocoder = vocoder or self, ** kwargs)

    def _synthesize_and_vocode(self, encoded, vocoder, *, embeddings = None,
                               max_length = 10., min_fpt_ratio = 0.,
                               max_fpt_ratio = float('inf'),
                               vocoder_config = {}, fetch_attention = True,
                               ** kwargs):
        """One end-to-end device call for ALL chunks (the synthesizer IS the
        vocoder).  Never falls back: durations are deterministic given the
        weights, so a ratio-gate retry cannot change the outcome — failures
        are logged and kept."""
        lengths = [len(e) for e in encoded]
        tokens = pad_batch(encoded, pad_value = self.blank_token_idx)
        if embeddings is not None:
            emb = np.broadcast_to(
                np.asarray(embeddings, np.float32),
                (len(encoded), np.asarray(embeddings).shape[-1]),
            )
            inputs = (tokens, emb)
        else:
            inputs = tokens

        with Timer('compiled_infer'):
            outputs = self.compiled_infer(
                inputs, max_length = max_length,
                ** {** kwargs, ** vocoder_config})

        for buf in ([outputs.audio, outputs.attention_weights]
                    if fetch_attention else [outputs.audio]):
            try:
                buf.copy_to_host_async()
            except AttributeError:
                pass

        out_lengths = np.asarray(outputs.lengths)
        for i in range(len(encoded)):
            ratio = float(out_lengths[i]) / max(lengths[i], 1)
            if not (min_fpt_ratio < ratio < max_fpt_ratio):
                logger.info('chunk %d frames/token %.2f outside (%s, %s); '
                            'keeping the output (durations are deterministic)',
                            i, ratio, min_fpt_ratio, max_fpt_ratio)

        audio_host = np.asarray(outputs.audio)
        attn_host = np.asarray(outputs.attention_weights) \
            if fetch_attention else None
        rate = self.upsample_rate

        mels, attn, audios = [], [], []
        for i in range(len(encoded)):
            out_len = max(1, int(out_lengths[i]))
            mels.append(None)               # no mel hand-off in this family
            attn.append(attn_host[i, :out_len] if attn_host is not None
                        else None)
            audios.append(audio_host[i, : out_len * rate])
        return mels, attn, audios

    # -- training data pipeline ---------------------------------------------------

    def fit(self, data, ** kwargs):
        """Adversarial training (the family's only objective): History +
        rotating checkpoints + discriminator/optimizer-state resume via
        `train/gan.fit_gan`."""
        from ...train.gan import fit_gan
        return fit_gan(self, data, ** kwargs)

    def prepare_data(self, data):
        """(tokens, linear spectrogram (T, n_fft//2+1), T, waveform (T*hop,))
        — the `train/gan.make_vits_train_step` batch layout."""
        from ...ops.audio_io import load_audio

        tokens = self.prepare_input(data)
        audio = np.asarray(load_audio(data, self.rate), np.float32)
        hop = self.mel_fn.hop_length
        magnitude, _ = self.mel_fn.stft_fn.transform(audio[None])
        spec = np.asarray(magnitude[0], np.float32)
        n_frames = min(spec.shape[0], len(audio) // hop)
        spec = spec[:n_frames]
        audio = audio[: n_frames * hop]
        return tokens, spec, n_frames, audio

    def filter_data(self, * args):
        if len(args) == 1:
            args = args[0]
        tokens, spec = args[0], args[1]
        return (len(tokens) <= self.max_input_length
                and len(tokens) <= spec.shape[0]       # MAS needs T >= L
                and spec.shape[0] <= self.max_output_length)

    def get_padding_values(self):
        return (self.blank_token_idx, 0., 0, 0.)

    def collate(self, batch):
        tokens = pad_batch([b[0] for b in batch],
                           pad_value = self.blank_token_idx)
        spec = pad_batch([b[1] for b in batch], pad_value = 0.)
        lengths = np.asarray([b[2] for b in batch], np.int32)
        audio = pad_batch([b[3] for b in batch], pad_value = 0.)
        return tokens, spec, lengths, audio
