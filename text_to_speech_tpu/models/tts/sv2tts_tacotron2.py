"""SV2TTS Tacotron-2: zero-shot voice cloning via speaker embeddings.

Capability parity with ``/root/reference/models/tts/sv2tts_tacotron2.py:18``:
per-model embeddings directory + default-embedding file, `select_embedding`
modes (mean/random/label), optional delegated speaker-encoder model
(`encoder_name`), embedding injected into the input tuple, and
`from_pretrained` partial transfer from a single-speaker checkpoint
(widened decoder matrices zero-padded — ``models/weights_converter.py:465``
behavior).
"""

import os
import logging

import numpy as np

from .tacotron2 import Tacotron2
from .. import saving as saving_utils
from ...utils.embeddings import load_embeddings, save_embeddings, select_embedding

logger = logging.getLogger(__name__)


class SV2TTSTacotron2(Tacotron2):
    def __init__(self,
                 lang = None,
                 *,
                 name = None,
                 embedding_dim = 256,
                 encoder_name = None,
                 speaker_encoder_name = None,
                 ** kwargs
                ):
        if getattr(self, '_initialized', False): return
        if speaker_encoder_name: encoder_name = speaker_encoder_name
        resolved_name = name or 'sv2tts_tacotron2'
        if saving_utils.is_model_name(resolved_name):
            disk = saving_utils.get_model_config(resolved_name).get('config', {})
            embedding_dim = disk.get('embedding_dim', embedding_dim)
            encoder_name = encoder_name or disk.get('encoder_name')

        self.embedding_dim = embedding_dim
        self.encoder_name = encoder_name
        self._speaker_encoder = None
        self._default_embedding = None

        kwargs.setdefault('speaker_embedding_dim', embedding_dim)
        kwargs.setdefault('speaker_concat_pos', 'end')
        super().__init__(lang = lang, name = resolved_name, ** kwargs)

    def _non_build_keys(self):
        # `embedding_dim` is remapped to `speaker_embedding_dim`; the encoder
        # delegate name is task-level config
        return super()._non_build_keys() + ('embedding_dim', 'encoder_name')

    # -- embeddings ------------------------------------------------------------

    @property
    def embeddings_dir(self):
        return self.save_dir('embeddings')

    @property
    def default_embedding_file(self):
        return os.path.join(self.embeddings_dir, 'default_embedding.npy')

    def set_default_embedding(self, embedding):
        np.save(self.default_embedding_file, np.asarray(embedding))
        self._default_embedding = np.asarray(embedding)

    def get_default_embedding(self):
        if self._default_embedding is None:
            if os.path.exists(self.default_embedding_file):
                self._default_embedding = np.load(self.default_embedding_file)
        return self._default_embedding

    @property
    def speaker_encoder(self):
        """Lazily-loaded delegated speaker-encoder model (frozen)."""
        if self._speaker_encoder is None and self.encoder_name:
            from .. import get_pretrained
            self._speaker_encoder = get_pretrained(self.encoder_name)
        return self._speaker_encoder

    def embed_audio(self, audio, ** kwargs):
        """Compute a speaker embedding from reference audio via the delegated
        encoder."""
        encoder = self.speaker_encoder
        if encoder is None:
            raise ValueError(
                '{} has no speaker encoder; pass `embeddings=` explicitly or '
                'set `encoder_name`'.format(self.name)
            )
        return np.asarray(encoder.embed(audio, ** kwargs))

    def get_speaker_embedding(self,
                              embeddings = None,
                              *,
                              audio = None,
                              mode = 'mean',
                              label = None,
                              ** kwargs):
        """Resolve a (D,) speaker embedding from: an explicit vector, an
        embeddings table/file (with selection mode), reference audio, or the
        stored default."""
        if embeddings is None and audio is not None:
            return self.embed_audio(audio, ** kwargs)
        if embeddings is None:
            default = self.get_default_embedding()
            if default is None:
                raise ValueError('No embedding provided and no default stored')
            return default
        if isinstance(embeddings, str):
            embeddings = load_embeddings(embeddings)
        if isinstance(embeddings, np.ndarray) and embeddings.ndim == 1:
            return embeddings
        return select_embedding(embeddings, mode = mode, label = label)

    def save_embeddings(self, filename, embeddings, ** metadata):
        return save_embeddings(
            os.path.join(self.embeddings_dir, filename), embeddings, ** metadata
        )

    # -- inference -------------------------------------------------------------

    def infer(self, text, *, embeddings = None, audio = None, mode = 'mean',
              label = None, overwrite = True, ** kwargs):
        embedding = self.get_speaker_embedding(
            embeddings, audio = audio, mode = mode, label = label
        )
        return super().infer(
            text, embeddings = np.asarray(embedding, np.float32),
            overwrite = overwrite, ** kwargs
        )

    # -- data processing --------------------------------------------------------

    def prepare_data(self, data):
        (tokens, mel_in, length), outputs = super().prepare_data(data)
        embedding = np.asarray(
            data['embedding'] if isinstance(data, dict) and 'embedding' in data
            else self.get_speaker_embedding(data.get('embeddings') if isinstance(data, dict) else None)
        , np.float32)
        return (tokens, embedding, mel_in, length), outputs

    def collate(self, batch):
        from ...utils import pad_batch
        inputs, outputs = zip(* batch)
        (pad_in, pad_out) = self.get_padding_values()
        tokens = pad_batch([i[0] for i in inputs], pad_value = pad_in[0])
        embeddings = np.stack([i[1] for i in inputs])
        mel_in = pad_batch([i[2] for i in inputs], pad_value = pad_in[1])
        lengths = np.asarray([i[3] for i in inputs], np.int32)
        mel_out = pad_batch([o[0] for o in outputs], pad_value = pad_out[0])
        gate = pad_batch([o[1] for o in outputs], pad_value = pad_out[1])
        return (tokens, embeddings, mel_in, lengths), (mel_out, gate)

    def get_config(self):
        return {
            ** super().get_config(),
            'embedding_dim': self.embedding_dim,
            'encoder_name': self.encoder_name,
        }
