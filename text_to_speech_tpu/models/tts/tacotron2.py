"""Tacotron-2 task model: text → mel (→ waveform via a vocoder).

Capability parity with ``/root/reference/models/tts/tacotron2.py:30``:
text splitting + cleaning + encoding, per-chunk compiled inference with the
frames-per-token quality-retry loop (``:158-179``), per-chunk vocoding and
audio concatenation with generation-rate telemetry (``:203-209``),
teacher-forcing data preparation (``:254-259``), length filtering, inference
callbacks (mel/audio savers + ``map.json`` + playback, ``:276-352``), and
``precompile_for_stream`` XLA warm-up (``:354-356``).

TPU-native: `compiled_infer` pads token batches to a ×`padding_multiple`
bucket and buckets `max_length`, so `jax.jit` compiles one executable per
bucket and replays it for every chunk; the decode loop itself lives on
device (see ``models/tacotron2_arch.py``).
"""

import os
import time
import logging

import numpy as np

from .. import saving as saving_utils
from ..interfaces.base_model import BaseModel
from ..interfaces.base_text_model import BaseTextModel
from ..interfaces.base_audio_model import BaseAudioModel
from ...utils import load_json, pad_to_multiple, pad_batch
from ...utils.callbacks import (
    AudioSaver, SpectrogramSaver, JSONSaver, AudioPlayer, FunctionCallback,
    QueueCallback, apply_callbacks,
)
from ...utils.generic_utils import time_to_string
from ...text import split_text, split_sentences
from ...loggers import timer, Timer

logger = logging.getLogger(__name__)

DEFAULT_MAX_TEXT_LENGTH = 150
DEFAULT_MAX_MEL_LENGTH = 1024


class Tacotron2(BaseTextModel, BaseAudioModel, BaseModel):
    _default_loss = 'TacotronLoss'
    # r4 opted the teacher-forced scan out after measuring "311 → 2307 ms"
    # under the mixed policy; r5's per-iteration protocol exposed that as a
    # tunnel-stall ARTIFACT (one 10.8 s first-dispatch stall averaged into
    # a 5-iter loop — benchmarks/tacotron_stall_probe.py).  The true
    # medians: f32 130 ms, bf16 85 ms — mixed is 1.5x FASTER, with the
    # scan-native bf16 carry (hp.scan_native_bf16) and the quality gate
    # (benchmarks/mixed_precision_parity.py --family tacotron2: loss gap
    # 0.33 % of descent, mel MSE at parity)
    mixed_precision_ok = True
    # single-sentence calls fuse decode→postnet→vocode into one launch
    # (`compiled_tts`); subclasses overriding `compiled_infer` must provide
    # a matching `compiled_tts` or clear this flag
    one_launch_tts = True

    def __init__(self,
                 lang = None,
                 *,
                 name = None,
                 mel_fn = 'TacotronSTFT',
                 audio_format = 'mel',
                 max_input_length = DEFAULT_MAX_TEXT_LENGTH,
                 max_output_length = DEFAULT_MAX_MEL_LENGTH,
                 ** kwargs
                ):
        if getattr(self, '_initialized', False): return
        self.name = name or 'tacotron2'

        # merge persisted constructor config (disk values fill unset args)
        if saving_utils.is_model_name(self.name):
            disk = saving_utils.get_model_config(self.name).get('config', {})
            lang = lang or disk.get('lang')
            mel_fn = disk.get('mel_fn', mel_fn) if 'mel_fn' in disk else mel_fn
            max_input_length = disk.get('max_input_length', max_input_length)
            max_output_length = disk.get('max_output_length', max_output_length)
            for k, v in disk.items():
                if k not in ('lang', 'name', 'class_name', 'max_input_length',
                             'max_output_length', 'audio_format', 'pad_mel_value'):
                    kwargs.setdefault(k, v)

        self._init_text(lang = lang or 'en', ** kwargs)
        self._init_audio(audio_format = audio_format, mel_fn = mel_fn, ** kwargs)

        self.max_input_length = max_input_length
        self.max_output_length = max_output_length

        BaseModel.__init__(self, name = self.name, ** kwargs)

    @classmethod
    def from_nvidia_pretrained(cls, checkpoint, *, name = 'pretrained_tacotron2',
                               lang = 'en', config = None, ** kwargs):
        """Create a model from a NVIDIA-layout Tacotron-2 torch checkpoint
        (e.g. the published LJSpeech release, vocab 148 with ARPAbet).
        Architecture sizes are inferred from the state dict's shapes, so
        non-default checkpoints import too; pass `config` overrides for
        anything non-derivable (dropout rates, flags)."""
        import jax
        import jax.numpy as jnp
        from ..tts_checkpoints import (
            _load_state_dict, convert_nvidia_tacotron2,
            tacotron2_config_from_state_dict,
        )
        from ...text import en_symbols

        sd = _load_state_dict(checkpoint)
        inferred = tacotron2_config_from_state_dict(sd)
        inferred.pop('vocab_size', None)    # the tokenizer drives vocab_size
        inferred.update(config or {})
        model = cls(
            lang = lang, name = name,
            tokenizer = kwargs.pop('tokenizer', None) or {
                'vocab': en_symbols, 'level': 'char',
                'cleaners': ['english_cleaners']},
            ** {** inferred, ** kwargs},
        )
        params, state = convert_nvidia_tacotron2(sd)
        model.set_weights(
            jax.tree_util.tree_map(jnp.asarray, params),
            jax.tree_util.tree_map(jnp.asarray, state),
        )
        model.save()
        return model

    # -- build -----------------------------------------------------------------

    def build(self, *, model = None, tts_model = None, ** kwargs):
        if tts_model is not None: model = tts_model
        if model is None:
            model = {
                'architecture': kwargs.pop('architecture', 'tacotron2'),
                'pad_token': self.blank_token_idx,
                'vocab_size': self.vocab_size,
                'n_mel_channels': self.n_mel_channels,
                ** kwargs,
            }
        return super().build(model = model)

    # -- compiled inference ----------------------------------------------------

    def compiled_infer(self,
                       inputs,
                       *,
                       max_length = None,
                       padding_multiple = 64,
                       attn_mask_win_len = None,
                       attn_mask_offset = 0.5,
                       early_stopping = True,
                       deterministic = False,
                       dtype = None,
                       rng = None,
                       use_fused_decoder = None,
                       ** _):
        """Shape-bucketed jitted AR inference on one (batched) token array."""
        import jax

        if isinstance(inputs, tuple):
            tokens, speaker_embedding = inputs
        else:
            tokens, speaker_embedding = inputs, None

        tokens = np.asarray(tokens)
        if tokens.ndim == 1: tokens = tokens[None]
        tokens = pad_to_multiple(
            tokens, padding_multiple, axis = 1, constant_values = self.blank_token_idx
        )

        if max_length is None:
            max_length = self.arch.hp.max_decoder_steps
        elif isinstance(max_length, float):
            max_length = int(tokens.shape[1] * max_length)
        max_length = int(min(max_length, self.max_output_length))
        # bucket the decode-buffer length too
        max_length = -(-max_length // padding_multiple) * padding_multiple

        if rng is None:
            rng = jax.random.PRNGKey(int(time.time_ns()) % (2 ** 31))

        # fused decoder-step Pallas kernel for small (latency-bound) batches
        # on TPU; the XLA while_loop otherwise.  Default (None) auto-selects
        # the kernel on TPU for batches <= fused_decoder_max_batch (measured:
        # 1.8x faster at B=1; the batched XLA path wins at large B)
        if use_fused_decoder is None:
            import jax
            default_dev = jax.config.jax_default_device
            platform = default_dev.platform if default_dev is not None \
                else jax.default_backend()
            use_fused_decoder = (
                platform == 'tpu'
                and tokens.shape[0] <= getattr(self, 'fused_decoder_max_batch', 2)
            )
        fused = bool(use_fused_decoder) and self.arch.supports_fused_decoder(
            tokens.shape[0], tokens.shape[1])

        static = dict(
            max_length = max_length,
            early_stopping = bool(early_stopping),
            attn_mask_win_len = attn_mask_win_len,
            attn_mask_offset = attn_mask_offset,
            deterministic = bool(deterministic),
            dtype = dtype,
        )
        key = ('infer', tuple(sorted(static.items())),
               speaker_embedding is not None, fused)

        def builder():
            infer_fn = self.arch.infer_fused if fused else self.arch.infer

            def fn(params, state, tokens, rng, spk):
                return infer_fn(
                    params, state, tokens, rng = rng,
                    speaker_embedding = spk, ** static,
                )
            return fn

        fn = self.get_compiled(key, builder)
        return fn(self.params, self.state, tokens, rng,
                  None if speaker_embedding is None else np.asarray(speaker_embedding))

    def compiled_tts(self,
                     inputs,
                     vocoder,
                     *,
                     max_length = None,
                     padding_multiple = 64,
                     attn_mask_win_len = None,
                     attn_mask_offset = 0.5,
                     early_stopping = True,
                     deterministic = False,
                     dtype = None,
                     rng = None,
                     use_fused_decoder = None,
                     vocoder_config = {},
                     ** _):
        """ONE-LAUNCH text→PCM: decode + postnet + vocoder + int16
        quantization fused into a single jitted program.

        Returns device arrays ``(audio_i16 (B, F*rate), lengths (B,),
        mel (B, F, n_mel), attention (B, S_dec, S_enc))`` — nothing is
        fetched here; the caller issues ONE blocking read (audio+lengths)
        and overlaps the rest.  Rationale: the single-sentence e2e call is
        tunnel-RTT-bound, not device-bound (~30 ms/round-trip at a ~130 ms
        call — docs/PERFORMANCE.md's variance protocol), so the multi-launch
        decode→fetch→vocode→fetch pipeline pays 3-4 RTTs where this path
        pays ~2.  The decoder auto-selects like `compiled_infer`: the fused
        Pallas decoder-step kernel (128 µs/step, itself ONE program — a
        while_loop chaining kernel launches) for small batches on TPU, the
        XLA while_loop otherwise — with the whole chain in one executable
        the kernel's per-step advantage finally lands on the wall clock
        (the 2026-08-21 session measured the XLA-decode variant at 0.19 s,
        decode-bound).  Accelerates the reference hot path
        ``models/tts/tacotron2.py:103-209``."""
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
            max_length = self.arch.hp.max_decoder_steps
        elif isinstance(max_length, float):
            max_length = int(tokens.shape[1] * max_length)
        max_length = int(min(max_length, self.max_output_length))
        max_length = -(-max_length // padding_multiple) * padding_multiple

        if rng is None:
            rng = jax.random.PRNGKey(int(time.time_ns()) % (2 ** 31))

        voc_fn, voc_params, voc_tag = vocoder.device_vocoder_fn(
            ** vocoder_config)
        voc_pad = getattr(vocoder, 'serving_pad_multiple', 256)
        pad_val = getattr(vocoder, 'pad_mel_value', -11.)

        # decoder auto-selection: mirror compiled_infer (fused Pallas
        # kernel for latency-bound small batches on TPU)
        if use_fused_decoder is None:
            default_dev = jax.config.jax_default_device
            platform = default_dev.platform if default_dev is not None \
                else jax.default_backend()
            use_fused_decoder = (
                platform == 'tpu'
                and tokens.shape[0] <= getattr(self, 'fused_decoder_max_batch', 2)
            )
        fused = bool(use_fused_decoder) and self.arch.supports_fused_decoder(
            tokens.shape[0], tokens.shape[1])

        static = dict(
            max_length = max_length,
            early_stopping = bool(early_stopping),
            attn_mask_win_len = attn_mask_win_len,
            attn_mask_offset = attn_mask_offset,
            deterministic = bool(deterministic),
            dtype = dtype,
        )
        key = ('tts1', tuple(sorted(static.items())),
               speaker_embedding is not None, fused, voc_tag, voc_pad)

        def builder():
            infer_fn = self.arch.infer_fused if fused else self.arch.infer

            def fn(params, state, voc_params, tokens, rng, spk):
                out = infer_fn(
                    params, state, tokens, rng = rng,
                    speaker_embedding = spk, ** static)
                mel = out.mel
                if mel.shape[1] % voc_pad:
                    # the decode buffer buckets by `padding_multiple`; the
                    # vocoder's own bucket may be coarser.  Pad with the
                    # vocoder's silence value — frames past `lengths` are
                    # sliced off the audio anyway
                    mel = jnp.pad(
                        mel,
                        ((0, 0), (0, voc_pad - mel.shape[1] % voc_pad),
                         (0, 0)),
                        constant_values = pad_val)
                audio = voc_fn(voc_params, mel, jax.random.fold_in(rng, 1))
                # on-device PCM16 (same formula as the vocoders'
                # `_quantize_i16`): the d2h transfer halves vs f32 and the
                # host-side dequant is trivial (the serving stepper's
                # measured int16-transfer win, applied to the one-shot call)
                a16 = jnp.round(jnp.clip(audio, -1., 1.) * 32767.) \
                    .astype(jnp.int16)
                return a16, out.lengths, out.mel, out.attention_weights
            return fn

        fn = self.get_compiled(key, builder)
        return fn(self.params, self.state, voc_params, tokens, rng,
                  None if speaker_embedding is None
                  else np.asarray(speaker_embedding))

    def precompile_for_stream(self, ** kwargs):
        """Warm the XLA executable cache at the stream padding buckets."""
        for key in ('max_trial', 'padding_multiple', 'play', 'display',
                    'save', 'save_mel', 'save_audio'):
            kwargs.pop(key, None)
        for multiple in (64, 128):
            self.infer('precompile warmup', max_trial = 1,
                       padding_multiple = multiple, ** kwargs)

    # -- inference -------------------------------------------------------------

    @timer(name = 'inference')
    def infer(self,
              text,
              *,
              embeddings = None,
              callbacks = None,
              predicted = None,
              overwrite = False,
              return_output = True,
              max_length = 10.,
              max_text_length = -1,
              max_trial = 5,
              min_fpt_ratio = 2.,
              max_fpt_ratio = 10.,
              vocoder = None,
              silence_time = 0.15,
              vocoder_config = {},
              batch_chunks = True,
              fetch_attention = None,
              ** kwargs
             ):
        """Synthesize one text (possibly split into chunks).

        With `batch_chunks` (default) all chunks decode in ONE padded batch —
        a long document's N chunks cost ~1 decoder launch instead of N.  The
        frames-per-token ratio gates (`min/max_fpt_ratio`) detect degenerate
        attention (too short / runaway generation); only the failing chunks
        are retried (with fresh prenet-dropout noise), up to `max_trial`.
        """
        if isinstance(text, dict):
            text = text.get('text', text.get('content'))

        predicted = predicted if predicted is not None else {}
        if predicted and not overwrite and text in predicted:
            if callbacks:
                apply_callbacks(callbacks, predicted[text], {}, save = False)
            return predicted[text]

        with Timer('processing'):
            if max_text_length == -1:
                splitted = [text]
            elif max_text_length == -2:
                splitted = split_sentences(text)
            else:
                splitted = split_text(text, max_text_length)

            splitted = [self.clean_text(s) for s in splitted]
            splitted = [s for s in splitted if any(c.isalnum() for c in s)]
            cleaned = '\n\n'.join(splitted) if len(splitted) > 1 else (
                splitted[0] if splitted else ''
            )
            encoded = [self.encode_text(s, cleaned = True) for s in splitted]
            keep = [i for i, e in enumerate(encoded) if len(e) > 0]
            splitted = [splitted[i] for i in keep]
            encoded = [encoded[i] for i in keep]

        synth_time, vocoder_time = 0., 0.
        mels, attn_weights, audios = [], [], []

        # attention-fetch contract: `infer()` returns attention maps by
        # default (reference semantics, tacotron2_arch.py:866-925 — consumers
        # like duration distillation read out['attention']).  Only the
        # pipelined vocoder fast path treats them as telemetry and skips the
        # fetch when no callback will read them; pass fetch_attention=True
        # there to override.
        fa_sequential = True if fetch_attention is None else fetch_attention
        fa_pipelined = (bool(callbacks) if fetch_attention is None
                        else fetch_attention)

        if encoded:
            start = time.time()
            pipelined = None
            if vocoder is not None and batch_chunks:
                pipelined = self._synthesize_and_vocode(
                    encoded, vocoder, embeddings = embeddings,
                    max_length = max_length, min_fpt_ratio = min_fpt_ratio,
                    max_fpt_ratio = max_fpt_ratio,
                    vocoder_config = vocoder_config,
                    fetch_attention = fa_pipelined, ** kwargs,
                )
            if pipelined is not None:
                mels, attn_weights, audios = pipelined
                synth_time = time.time() - start
            else:
                mels, attn_weights = self._synthesize_chunks(
                    encoded, embeddings = embeddings, max_length = max_length,
                    max_trial = max_trial, min_fpt_ratio = min_fpt_ratio,
                    max_fpt_ratio = max_fpt_ratio, batch_chunks = batch_chunks,
                    fetch_attention = fa_sequential, ** kwargs,
                )
                synth_time = time.time() - start

                if vocoder is not None:
                    start = time.time()
                    audios = self._vocode_chunks(
                        vocoder, mels, batch_chunks = batch_chunks,
                        ** {** kwargs, ** vocoder_config},
                    )
                    vocoder_time = time.time() - start

        audio_infos = {}
        if vocoder is not None:
            if audios:
                audio = audios[0] if len(audios) == 1 else np.concatenate(audios, axis = 0)
                audio_infos = {
                    'audio': audio, 'rate': self.rate,
                    'time': len(audio) / self.rate,
                }
                total = synth_time + vocoder_time
                logger.info(
                    '%s of audio generated in %s (%.2fx real-time): %s synthesizer + %s vocoder',
                    time_to_string(audio_infos['time']), time_to_string(total),
                    audio_infos['time'] / max(total, 1e-9),
                    time_to_string(synth_time), time_to_string(vocoder_time),
                )
            else:
                audio_infos = {
                    'audio': np.zeros((int(silence_time * self.rate),), np.float32),
                    'rate': self.rate, 'time': silence_time,
                }

        output = {
            'text': text, 'cleaned': cleaned, 'splitted': splitted,
            'mel': mels, 'attention': attn_weights, ** audio_infos,
        }

        if callbacks:
            if text not in predicted:
                predicted[text] = {
                    k: v for k, v in output.items()
                    if k not in ('mel', 'attention', 'audio')
                }
            apply_callbacks(callbacks, predicted[text], output, save = True)

        if return_output:
            return output
        return predicted.get(text, {k: v for k, v in output.items()
                                    if k not in ('mel', 'attention')})

    def _synthesize_and_vocode(self, encoded, vocoder, *, embeddings = None,
                               max_length = 10., min_fpt_ratio = 2.,
                               max_fpt_ratio = 10., vocoder_config = {},
                               vocoder_batch = None, fetch_attention = True,
                               ** kwargs):
        """Pipelined decode→vocode (BASELINE config 5): the vocoder launches
        on the DEVICE mel before any bulk host fetch, so the device queue
        runs decoder→vocoder back-to-back and the mel/attention transfers
        overlap vocoder compute — removing the decode-fetch → re-upload
        round trips of the sequential path (~2 tunnel RTTs per call).

        Returns (mels, attention, audios) or None to fall back to the
        sequential retry path (vocoder without a compiled path, or a
        frames-per-token gate failure — retries keep their per-chunk
        granularity there).  Windowed vocoding (`win_len`) stays pipelined
        when the vocoder can slice windows on device
        (`vocode_windowed_from_device`); otherwise it falls back."""
        win_len = kwargs.pop('win_len', None) or vocoder_config.get('win_len')
        if win_len and not hasattr(vocoder, 'vocode_windowed_from_device'):
            return None
        if not hasattr(vocoder, 'compiled_infer'):
            return None

        if len(encoded) == 1 and not win_len \
                and hasattr(vocoder, 'device_vocoder_fn') \
                and getattr(self, 'one_launch_tts', False):
            # `one_launch_tts` marks classes whose `compiled_tts` fuses
            # their own decode interface (Tacotron-2 AR decode — fused
            # Pallas kernel or XLA while_loop, both one program —
            # FastSpeech-2's duration-driven forward); a subclass
            # overriding compiled_infer without a matching compiled_tts
            # must clear it
            # single sentence: the call is RTT-bound, not device-bound —
            # fuse decode→postnet→vocode into ONE launch + ONE int16 fetch
            one = self._tts_one_launch(
                encoded, vocoder, embeddings = embeddings,
                max_length = max_length, min_fpt_ratio = min_fpt_ratio,
                max_fpt_ratio = max_fpt_ratio,
                vocoder_config = vocoder_config,
                fetch_attention = fetch_attention, ** kwargs)
            if one is not None:
                return one

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
            outputs = self.compiled_infer(inputs, max_length = max_length,
                                          ** kwargs)

        # decode kwargs that would corrupt the vocoder's own bucketing are
        # dropped from the vocoder call
        vkwargs = {** kwargs, ** vocoder_config}
        for k in ('padding_multiple', 'use_fused_decoder', 'attn_mask_win_len',
                  'attn_mask_offset', 'early_stopping'):
            if k not in vocoder_config:
                vkwargs.pop(k, None)
        vkwargs.pop('win_len', None)
        hop_len = vkwargs.pop('hop_len', -64)

        # an explicitly passed top-level vocoder_batch wins on BOTH branches
        # (overriding any vocoder_config value): forwarded into the windowed
        # slicer's kwargs, and used for the sub-batch slicing below.  When
        # only vocoder_config provides it, that value is used consistently;
        # with neither, the non-windowed branch slices by 8 and the windowed
        # slicer keeps its auto MXU-sweet-spot policy (None).
        if vocoder_batch is not None:
            vkwargs['vocoder_batch'] = vocoder_batch
        else:
            vocoder_batch = vkwargs.get('vocoder_batch') or 8

        audio_dev = None
        if not win_len:
            # enqueue vocoder launches on the device mel IMMEDIATELY (async
            # dispatch, before the frames-per-token gate reads lengths)
            audio_dev = [
                vocoder.compiled_infer(outputs.mel[lo: lo + vocoder_batch],
                                       ** vkwargs)
                for lo in range(0, len(encoded), vocoder_batch)
            ]

        # start the mel/attention device→host copies NOW so they ride the
        # transfer engine while the vocoder computes (attention is fetched
        # only when a consumer asked for it — it is the largest buffer and
        # pure telemetry on the serving path)
        for buf in ([outputs.mel, outputs.attention_weights]
                    if fetch_attention else [outputs.mel]):
            try:
                buf.copy_to_host_async()
            except AttributeError:      # plain numpy under eager/CPU tests
                pass

        out_lengths = np.asarray(outputs.lengths)
        for i in range(len(encoded)):
            ratio = float(out_lengths[i]) / max(lengths[i], 1)
            if not (min_fpt_ratio < ratio < max_fpt_ratio):
                logger.info('pipelined chunk %d rejected (frames/token %.2f); '
                            'falling back to the retry path', i, ratio)
                return None

        rate = getattr(vocoder, 'upsample_rate', 256)
        if win_len:
            # windowed vocoding pipelined off the DEVICE mel: windows are
            # sliced on device (lengths were needed for the gate anyway), so
            # the mel fetch above overlaps the window vocode launches
            audios = vocoder.vocode_windowed_from_device(
                outputs.mel, out_lengths, win_len = win_len,
                hop_len = hop_len, ** vkwargs)

        mel_host = np.asarray(outputs.mel)
        attn_host = np.asarray(outputs.attention_weights) \
            if fetch_attention else None
        if not win_len:
            audio_host = [np.asarray(a) for a in audio_dev]

        mels, attn = [], []
        if not win_len: audios = []
        for i in range(len(encoded)):
            out_len = max(1, int(out_lengths[i]))
            mels.append(mel_host[i, :out_len])
            attn.append(attn_host[i, :out_len] if attn_host is not None
                        else None)
            if not win_len:
                audios.append(
                    audio_host[i // vocoder_batch][i % vocoder_batch,
                                                   : out_len * rate])
        return mels, attn, audios

    def _tts_one_launch(self, encoded, vocoder, *, embeddings = None,
                        max_length = 10., min_fpt_ratio = 2.,
                        max_fpt_ratio = 10., vocoder_config = {},
                        fetch_attention = False, ** kwargs):
        """Single-sentence fast path over `compiled_tts` (one fused
        decode→postnet→vocode launch, one blocking int16 read; mel and
        attention ride the transfer engine behind it).  Returns
        (mels, attention, audios) or None on a frames-per-token gate
        failure (the caller's retry path re-decodes chunk-by-chunk)."""
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

        with Timer('compiled_tts'):
            a16_dev, lengths_dev, mel_dev, attn_dev = self.compiled_tts(
                inputs, vocoder, max_length = max_length,
                vocoder_config = vocoder_config, ** kwargs)

        # start EVERY copy before the first blocking read: by the time the
        # (small) lengths array lands, the audio/mel payloads are already
        # streaming — on the tunneled transport the serialized
        # read-lengths-then-read-audio order paid an extra round trip
        # (attention only if a consumer asked)
        bufs = [a16_dev, mel_dev] + ([attn_dev] if fetch_attention else [])
        for buf in bufs:
            try:
                buf.copy_to_host_async()
            except AttributeError:      # plain numpy under eager/CPU tests
                pass

        out_lengths = np.asarray(lengths_dev)
        for i in range(len(encoded)):
            ratio = float(out_lengths[i]) / max(lengths[i], 1)
            if not (min_fpt_ratio < ratio < max_fpt_ratio):
                logger.info('one-launch tts rejected (frames/token %.2f); '
                            'falling back to the retry path', ratio)
                return None

        a16 = np.asarray(a16_dev)
        mel_host = np.asarray(mel_dev)
        attn_host = np.asarray(attn_dev) if fetch_attention else None
        rate = getattr(vocoder, 'upsample_rate', 256)

        mels, attn, audios = [], [], []
        for i in range(len(encoded)):
            out_len = max(1, int(out_lengths[i]))
            mels.append(mel_host[i, :out_len])
            attn.append(attn_host[i, :out_len] if attn_host is not None
                        else None)
            audios.append(
                a16[i, : out_len * rate].astype(np.float32) / 32767.)
        return mels, attn, audios

    def _synthesize_chunks(self, encoded, *, embeddings, max_length, max_trial,
                           min_fpt_ratio, max_fpt_ratio, batch_chunks = True,
                           fetch_attention = True, ** kwargs):
        """Decode every chunk, batched, with per-chunk ratio-gated retries.
        Returns (mels, attention_weights) lists trimmed to each chunk's length
        (attention entries are None unless `fetch_attention` — the maps are
        the largest decode output and pure telemetry on the serving path)."""
        n = len(encoded)
        lengths = [len(e) for e in encoded]
        mels = [None] * n
        attn = [None] * n

        pending = list(range(n))
        for trial in range(max(1, max_trial)):
            if not pending: break
            if batch_chunks and len(pending) > 1:
                groups = [pending]
            else:
                groups = [[i] for i in pending]

            still_failing = []
            for group in groups:
                tokens = pad_batch([encoded[i] for i in group],
                                   pad_value = self.blank_token_idx)
                if embeddings is not None:
                    emb = np.broadcast_to(
                        np.asarray(embeddings, np.float32),
                        (len(group), np.asarray(embeddings).shape[-1]),
                    )
                    inputs = (tokens, emb)
                else:
                    inputs = tokens
                with Timer('compiled_infer'):
                    outputs = self.compiled_infer(
                        inputs, max_length = max_length, ** kwargs
                    )
                out_lengths = np.asarray(outputs.lengths)
                # ONE bulk device→host fetch per output: per-row slice
                # transfers each pay the tunnel's ~30 ms round-trip latency
                # (16 slices cost ~0.5 s; two bulk fetches cost ~0.06 s)
                mel_host = np.asarray(outputs.mel)
                attn_host = np.asarray(outputs.attention_weights) \
                    if fetch_attention else None
                for row, i in enumerate(group):
                    ratio = float(out_lengths[row]) / max(lengths[i], 1)
                    ok = min_fpt_ratio < ratio < max_fpt_ratio
                    is_last = trial == max(1, max_trial) - 1
                    if ok or is_last or mels[i] is None:
                        # keep >=1 frame so downstream vocoding stays shape-valid
                        out_len = max(1, int(out_lengths[row]))
                        mels[i] = mel_host[row, :out_len]
                        attn[i] = attn_host[row, :out_len] \
                            if attn_host is not None else None
                    if not ok:
                        logger.info(
                            'chunk %d attempt %d rejected (frames/token %.2f)',
                            i, trial + 1, ratio)
                        still_failing.append(i)
            if still_failing and trial == max(1, max_trial) - 1:
                logger.warning('%d chunk(s) failed %d retries; keeping last output',
                               len(still_failing), max_trial)
            pending = still_failing
        return mels, attn

    def _vocode_chunks(self, vocoder, mels, *, batch_chunks = True,
                       vocoder_batch = None, ** kwargs):
        """Vocode chunk mels — in padded sub-batches of `vocoder_batch` when
        lengths are close (padding waste bounded) and no explicit windowing
        was requested, else per chunk (which honors `win_len`)."""
        if (len(mels) > 1 and batch_chunks and kwargs.get('win_len')
                and hasattr(vocoder, 'vocode_windowed_batch')):
            # long-document fast path: every chunk's windows in shared batches
            # (vocoder_batch None → the vocoder sizes launches at its MXU
            # sweet spot)
            return vocoder.vocode_windowed_batch(
                mels, pad_value = self.pad_mel_value,
                vocoder_batch = vocoder_batch, ** kwargs)

        if vocoder_batch is None: vocoder_batch = 8
        use_batch = (
            len(mels) > 1 and batch_chunks
            and hasattr(vocoder, 'compiled_infer')
            and kwargs.get('win_len') is None
            and min(m.shape[0] for m in mels) >= max(m.shape[0] for m in mels) // 2
        )
        if use_batch:
            rate = getattr(vocoder, 'upsample_rate', 256)
            audios = []
            for start in range(0, len(mels), vocoder_batch):
                group = mels[start: start + vocoder_batch]
                batch = pad_batch(group, pad_value = self.pad_mel_value)
                audio = np.asarray(vocoder.compiled_infer(batch, ** kwargs))
                audios.extend(audio[i, : m.shape[0] * rate]
                              for i, m in enumerate(group))
            return audios
        audios = []
        for mel in mels:
            audio = np.asarray(vocoder(mel, ** kwargs))
            audios.append(audio[0] if audio.ndim == 2 else audio)
        return audios

    # -- data processing (training) --------------------------------------------

    def prepare_output(self, data):
        """mel (T, n_mel) → (shifted mel with leading zero frame, gate)."""
        mel = np.asarray(self.get_audio(data))
        mel = np.pad(mel, [(1, 0), (0, 0)])
        gate = np.zeros((mel.shape[0],), np.float32)
        gate[-1] = 1.
        return mel, gate

    def prepare_data(self, data):
        """Teacher-forcing pair: ((tokens, mel[:-1], len), (mel[1:], gate[1:])).

        With a reduction factor (``n_frames_per_step = r > 1``) the decoder
        emits r frames per step, so inputs are group-rate: step g consumes
        ``mel[g*r]`` (the frame just before its first target) and its targets
        are frames ``mel[1 + g*r : 1 + (g+1)*r]``; ``len`` counts GROUPS
        (what the teacher-forced scan masks over) while targets stay at
        frame rate for the loss.
        """
        tokens = self.prepare_input(data)
        mel, gate = self.prepare_output(data)
        r = self.arch.hp.n_frames_per_step
        if r == 1:
            return (tokens, mel[:-1], len(mel) - 1), (mel[1:], gate[1:])
        n_groups = -(-(len(mel) - 1) // r)
        pad = 1 + n_groups * r - len(mel)
        if pad > 0:
            mel = np.pad(mel, ((0, pad), (0, 0)),
                         constant_values = self.pad_mel_value)
            gate = np.concatenate([gate, np.ones((pad,), gate.dtype)])
        mel_in = mel[0 : n_groups * r : r]
        return (tokens, mel_in, n_groups), (mel[1:], gate[1:])

    def filter_data(self, inputs, outputs):
        r = self.arch.hp.n_frames_per_step
        return (len(inputs[0]) <= self.max_input_length
                and inputs[-1] * r <= self.max_output_length)

    def get_padding_values(self):
        return ((self.blank_token_idx, self.pad_mel_value, 0),
                (self.pad_mel_value, 1.))

    def collate(self, batch):
        """List of prepare_data outputs → padded numpy batch."""
        inputs, outputs = zip(* batch)
        (pad_in, pad_out) = self.get_padding_values()
        tokens = pad_batch([i[0] for i in inputs], pad_value = pad_in[0])
        mel_in = pad_batch([i[1] for i in inputs], pad_value = pad_in[1])
        lengths = np.asarray([i[2] for i in inputs], np.int32)
        mel_out = pad_batch([o[0] for o in outputs], pad_value = pad_out[0])
        gate = pad_batch([o[1] for o in outputs], pad_value = pad_out[1])
        return (tokens, mel_in, lengths), (mel_out, gate)

    # -- callbacks -------------------------------------------------------------

    def get_inference_callbacks(self,
                                *,
                                vocoder = None,
                                save = None,
                                save_mel = None,
                                save_audio = None,
                                directory = None,
                                mel_dir = None,
                                audio_dir = None,
                                mel_filename = 'mel-{}.npy',
                                audio_filename = 'audio-{}.mp3',
                                play = False,
                                display = None,
                                post_processing = None,
                                save_in_parallel = False,
                                ** _):
        if vocoder is None:
            play, display, save_audio = False, False, False
        elif save_audio is None:
            save_audio = save is not False
        if save is None: save = bool(directory) or vocoder is None
        if save_mel is None: save_mel = save and vocoder is None

        save = save_mel or save_audio
        if vocoder is not None:
            if save:
                save_audio = True
            elif display is None:
                display = not play

        predicted, callbacks = {}, []
        if save:
            if directory is None: directory = self.pred_dir
            map_file = os.path.join(directory, 'map.json')
            predicted = load_json(map_file, default = {})

            if save_mel:
                if mel_dir is None: mel_dir = os.path.join(directory, 'mels')
                callbacks.append(SpectrogramSaver(
                    file_format = os.path.join(mel_dir, mel_filename),
                    save_in_parallel = save_in_parallel,
                ))
            if save_audio:
                if audio_dir is None: audio_dir = os.path.join(directory, 'audios')
                ext = audio_filename.rsplit('.', 1)[-1].lower()
                if ext != 'wav':
                    import shutil
                    if shutil.which('ffmpeg') is None:
                        logger.info('ffmpeg unavailable: saving audio as .wav '
                                    'instead of .%s', ext)
                        audio_filename = audio_filename.rsplit('.', 1)[0] + '.wav'
                callbacks.append(AudioSaver(
                    file_format = os.path.join(audio_dir, audio_filename),
                    save_in_parallel = save_in_parallel,
                ))
            callbacks.append(JSONSaver(
                data = predicted, filename = map_file, primary_key = 'text',
                save_in_parallel = save_in_parallel,
            ))

        if display or play:
            callbacks.append(AudioPlayer(display = bool(display), play = bool(play)))

        if post_processing is not None:
            if not isinstance(post_processing, list):
                post_processing = [post_processing]
            for fn in post_processing:
                if callable(fn):
                    callbacks.append(FunctionCallback(fn))
                elif hasattr(fn, 'put'):
                    callbacks.append(QueueCallback(fn))
        return predicted, callbacks

    # -- predict / stream -------------------------------------------------------

    @timer
    def predict(self, inputs, *, batch_size = None, ** kwargs):
        """With ``batch_size > 1`` and a list input, texts are synthesized in
        cross-text batches (every text's chunks share decoder/vocoder
        launches) instead of streaming one at a time."""
        if isinstance(inputs, (str, dict)): inputs = [inputs]
        if batch_size and batch_size > 1 and isinstance(inputs, (list, tuple)):
            return self.predict_batched(list(inputs), batch_size = batch_size,
                                        ** kwargs)
        return super().predict(inputs, ** kwargs)

    def predict_batched(self,
                        texts,
                        *,
                        batch_size = 8,
                        callbacks = None,
                        overwrite = False,
                        vocoder = None,
                        embeddings = None,
                        max_length = 10.,
                        max_text_length = -1,
                        max_trial = 5,
                        min_fpt_ratio = 2.,
                        max_fpt_ratio = 10.,
                        vocoder_config = {},
                        return_output = True,
                        ** kwargs
                       ):
        """Batched multi-text synthesis: all chunks of up to `batch_size`
        texts decode together; vocoding is batched the same way."""
        if callbacks is None:
            predicted, callbacks = self.get_inference_callbacks(
                vocoder = vocoder, ** kwargs)
        else:
            predicted = {}

        texts = [t.get('text', t.get('content')) if isinstance(t, dict) else t
                 for t in texts]

        # same attention-fetch contract as infer(): default True on the
        # sequential path, bool(callbacks) on the pipelined fast path;
        # an explicit fetch_attention kwarg wins everywhere
        fetch_attention = kwargs.pop('fetch_attention', None)
        fa_sequential = True if fetch_attention is None else fetch_attention
        fa_pipelined = (bool(callbacks) if fetch_attention is None
                        else fetch_attention)

        results = []
        for group_start in range(0, len(texts), batch_size):
            group = texts[group_start: group_start + batch_size]

            flat_chunks, owners, metas = [], [], []
            for text in group:
                if not overwrite and text in predicted:
                    metas.append(None)      # served from cache below
                    continue
                if max_text_length == -1:
                    splitted = [text]
                elif max_text_length == -2:
                    splitted = split_sentences(text)
                else:
                    splitted = split_text(text, max_text_length)
                splitted = [self.clean_text(s) for s in splitted]
                splitted = [s for s in splitted if any(c.isalnum() for c in s)]
                encoded = [self.encode_text(s, cleaned = True) for s in splitted]
                keep = [i for i, e in enumerate(encoded) if len(e)]
                splitted = [splitted[i] for i in keep]
                encoded = [encoded[i] for i in keep]
                metas.append((text, splitted))
                for enc in encoded:
                    owners.append(len(metas) - 1)
                    flat_chunks.append(enc)

            chunk_mels, chunk_attn, chunk_audios = [], [], []
            if flat_chunks:
                pipelined = None
                if vocoder is not None:
                    pipelined = self._synthesize_and_vocode(
                        flat_chunks, vocoder, embeddings = embeddings,
                        max_length = max_length,
                        min_fpt_ratio = min_fpt_ratio,
                        max_fpt_ratio = max_fpt_ratio,
                        vocoder_config = vocoder_config,
                        fetch_attention = fa_pipelined, ** kwargs,
                    )
                if pipelined is not None:
                    chunk_mels, chunk_attn, chunk_audios = pipelined
                else:
                    chunk_mels, chunk_attn = self._synthesize_chunks(
                        flat_chunks, embeddings = embeddings,
                        max_length = max_length, max_trial = max_trial,
                        min_fpt_ratio = min_fpt_ratio,
                        max_fpt_ratio = max_fpt_ratio,
                        fetch_attention = fa_sequential, ** kwargs,
                    )
                    chunk_audios = (
                        self._vocode_chunks(vocoder, chunk_mels,
                                            ** {** kwargs, ** vocoder_config})
                        if vocoder is not None and chunk_mels else []
                    )

            for meta_idx, meta in enumerate(metas):
                text = group[meta_idx]
                if meta is None:            # cache hit
                    if callbacks:
                        apply_callbacks(callbacks, predicted[text], {},
                                        save = False)
                    results.append(predicted[text])
                    continue
                _, splitted = meta
                idx = [i for i, o in enumerate(owners) if o == meta_idx]
                mels = [chunk_mels[i] for i in idx]
                attn = [chunk_attn[i] for i in idx]
                output = {
                    'text': text,
                    'cleaned': '\n\n'.join(splitted) if len(splitted) > 1
                               else (splitted[0] if splitted else ''),
                    'splitted': splitted, 'mel': mels, 'attention': attn,
                }
                if vocoder is not None:
                    audios = [chunk_audios[i] for i in idx]
                    audio = (audios[0] if len(audios) == 1
                             else np.concatenate(audios)) if audios else \
                        np.zeros((int(0.15 * self.rate),), np.float32)
                    output.update(audio = audio, rate = self.rate,
                                  time = len(audio) / self.rate)
                if callbacks:
                    if text not in predicted:
                        predicted[text] = {
                            k: v for k, v in output.items()
                            if k not in ('mel', 'attention', 'audio')
                        }
                    apply_callbacks(callbacks, predicted[text], output,
                                    save = True)
                results.append(output if return_output else predicted.get(text, {}))

        for cb in callbacks:
            if hasattr(cb, 'join'): cb.join()
        return results

    def stream(self, stream, *, vocoder, ** kwargs):
        self.precompile_for_stream(vocoder = vocoder, ** kwargs)
        return super().stream(stream, vocoder = vocoder, ** kwargs)

    # -- config ----------------------------------------------------------------

    def get_config(self):
        return {
            ** super().get_config(),
            ** self.get_config_text(),
            ** self.get_config_audio(),
            'max_input_length': self.max_input_length,
            'max_output_length': self.max_output_length,
        }

    def get_saving_objects(self):
        return {
            ** super().get_saving_objects(),
            ** self.get_saving_objects_text(),
            ** self.get_saving_objects_audio(),
        }
