"""Shared SV2TTS speaker-embedding machinery.

The reference implements this once, inside its only multi-speaker task
model (``/root/reference/models/tts/sv2tts_tacotron2.py:18``): per-model
embeddings directory + default-embedding file, `select_embedding` modes
(mean/random/label), and an optional delegated speaker-encoder model
(`encoder_name`).  Here it is a mixin so every synthesizer family can be
speaker-conditioned the same way (`SV2TTSTacotron2`, `SV2TTSVITS`).
"""

import os
import logging

import numpy as np

from .. import saving as saving_utils
from ...utils.embeddings import (
    load_embeddings, save_embeddings, select_embedding,
)

logger = logging.getLogger(__name__)


class SpeakerEmbeddingMixin:
    """Expects `self.name`, `self.save_dir` (from BaseModel) and the
    attributes set by `_init_speaker_embedding` (call it BEFORE the base
    constructor so disk-config merging sees the resolved name)."""

    def _init_speaker_embedding(self, resolved_name, embedding_dim,
                                encoder_name):
        if saving_utils.is_model_name(resolved_name):
            disk = saving_utils.get_model_config(resolved_name).get('config', {})
            embedding_dim = disk.get('embedding_dim', embedding_dim)
            encoder_name = encoder_name or disk.get('encoder_name')
        self.embedding_dim = embedding_dim
        self.encoder_name = encoder_name
        self._speaker_encoder = None
        self._default_embedding = None
        return embedding_dim, encoder_name

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

    def get_speaker_config(self):
        return {
            'embedding_dim': self.embedding_dim,
            'encoder_name': self.encoder_name,
        }
