"""Speaker-encoder task model: audio → l2-normalized speaker embedding.

The `encoder_name` delegate of SV2TTS (reference
``models/tts/sv2tts_tacotron2.py:76-82``): embeds reference audio for
zero-shot voice cloning, and trains with GE2E batches
(``custom_train_objects/generators/ge2e_generator.py:20`` analog).
"""

import logging

import numpy as np

from .. import saving as saving_utils
from ..interfaces.base_model import BaseModel
from ..interfaces.base_audio_model import BaseAudioModel
from ...utils import pad_batch, pad_to_multiple
from ...loggers import timer

logger = logging.getLogger(__name__)


class SpeakerEncoder(BaseAudioModel, BaseModel):
    _default_loss = 'GE2ELoss'
    # measured under the r5 stall-robust protocol (train_throughput
    # --model encoder, per-iter medians on v5e): f32 28.4 ms vs bf16
    # 29.1 ms — a tie.  The tiny LSTM stack is latency-bound, so bf16
    # buys nothing; staying f32 keeps the GE2E similarity math
    # bit-stable for free
    mixed_precision_ok = False

    def __init__(self, *, name = None, mel_fn = 'TacotronSTFT',
                 audio_rate = 16000, max_audio_time = 3.0, ** kwargs):
        if getattr(self, '_initialized', False): return
        self.name = name or 'speaker_encoder'

        if saving_utils.is_model_name(self.name):
            disk = saving_utils.get_model_config(self.name).get('config', {})
            audio_rate = disk.get('audio_rate', audio_rate)
            max_audio_time = disk.get('max_audio_time', max_audio_time)
            for k, v in disk.items():
                if k not in ('name', 'audio_rate', 'max_audio_time',
                             'audio_format', 'pad_mel_value'):
                    kwargs.setdefault(k, v)

        self.max_audio_time = max_audio_time
        self._init_audio(mel_fn = mel_fn, audio_format = 'mel',
                         audio_rate = audio_rate, ** kwargs)
        BaseModel.__init__(self, name = self.name, ** kwargs)

    def build(self, *, model = None, ** kwargs):
        if model is None:
            model = {
                'architecture': kwargs.pop('architecture', 'audio_encoder'),
                'n_mel_channels': self.n_mel_channels,
                ** kwargs,
            }
        return super().build(model = model)

    @property
    def embedding_dim(self):
        return self.arch.hp.embedding_dim

    # -- inference ---------------------------------------------------------------

    def compiled_embed(self, mel, lengths = None, *, padding_multiple = 64):
        mel = np.asarray(mel, np.float32)
        if mel.ndim == 2: mel = mel[None]
        if lengths is None:
            lengths = np.full((mel.shape[0],), mel.shape[1], np.int32)
        mel = pad_to_multiple(mel, padding_multiple, axis = 1,
                              constant_values = self.pad_mel_value)

        def builder():
            def fn(params, state, mel, lengths):
                emb, _ = self.arch(params, state, mel, lengths = lengths,
                                   train = False)
                return emb
            return fn

        fn = self.get_compiled(('embed',), builder)
        return fn(self.params, self.state, mel, np.asarray(lengths, np.int32))

    @timer(name = 'embed')
    def embed(self, audio, ** kwargs):
        """audio (file/array/row dict, or list of them) → (D,) or (N, D)."""
        single = not isinstance(audio, (list, tuple))
        items = [audio] if single else list(audio)
        mels = [np.asarray(self.get_audio(a, ** kwargs)) for a in items]
        lengths = np.asarray([len(m) for m in mels], np.int32)
        batch = pad_batch(mels, pad_value = self.pad_mel_value)
        emb = np.asarray(self.compiled_embed(batch, lengths))
        return emb[0] if single else emb

    __call__ = embed

    def identify(self, audio, embeddings, *, labels = None, method = 'cosine'):
        """Return the index (or label) of the closest reference embedding."""
        from ...utils.distances import distance
        query = self.embed(audio)
        sims = np.asarray(distance(query, np.asarray(embeddings),
                                   method = method, as_matrix = True))[0]
        idx = int(np.argmax(sims)) if method == 'cosine' else int(np.argmin(sims))
        return labels[idx] if labels is not None else idx

    # -- training -----------------------------------------------------------------

    @property
    def max_mel_frames(self):
        return self.mel_fn.get_mel_length(int(self.max_audio_time * self.rate))

    def prepare_data(self, row):
        mel = np.asarray(self.get_audio(row))
        if len(mel) > self.max_mel_frames:
            start = np.random.randint(0, len(mel) - self.max_mel_frames + 1)
            mel = mel[start: start + self.max_mel_frames]
        return mel

    def collate_ge2e(self, batch):
        """batch: [speakers][utterances] of mels → ((mel (N*M, T, C),
        lengths), None); the (N, M) grouping is static on `self.ge2e_shape`."""
        flat = [mel for group in batch for mel in group]
        lengths = np.asarray([len(m) for m in flat], np.int32)
        mels = pad_batch(flat, pad_value = self.pad_mel_value,
                         max_length = self.max_mel_frames)
        mels = pad_to_multiple(mels, 32, axis = 1,
                               constant_values = self.pad_mel_value)
        return (mels, lengths), None

    def fit(self, data, *, n_speakers = 8, n_utterances = 4,
            speaker_column = 'speaker', ** kwargs):
        from ...train.datasets import GE2EDataset
        self.ge2e_shape = (n_speakers, n_utterances)
        ds = GE2EDataset(
            data, speaker_column = speaker_column, n_speakers = n_speakers,
            n_utterances = n_utterances, map_fn = self.prepare_data,
            collate_fn = self.collate_ge2e,
        )
        from ...train.trainer import fit as _fit
        return _fit(self, ds, valid_size = 0., ** kwargs)

    def get_config(self):
        return {
            ** super().get_config(),
            ** self.get_config_audio(),
            'audio_rate': self.rate,
            'max_audio_time': self.max_audio_time,
        }

    def get_saving_objects(self):
        return {** super().get_saving_objects(), ** self.get_saving_objects_audio()}
