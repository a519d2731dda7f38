"""SV2TTS VITS: zero-shot voice cloning on the end-to-end family.

Beyond-reference capability: the reference's only cloning pipeline is
SV2TTS-Tacotron-2 + WaveGlow (``/root/reference/models/tts/
sv2tts_tacotron2.py``), i.e. two models and a mel hand-off.  This applies
the same speaker-embedding machinery (`SpeakerEmbeddingMixin`: embeddings
dir, default embedding, mean/random/label selection, delegated encoder) to
the single-program VITS synthesizer — the external embedding conditions
the flow/duration/decoder stacks through the arch's `speaker_embedding_dim`
projection (`models/vits_arch.py` `global_cond`), and training passes it as
the adversarial batch's speaker slot (`train/gan.make_vits_train_step`).
"""

import logging

import numpy as np

from .vits import VITS
from .speaker_embedding_mixin import SpeakerEmbeddingMixin

logger = logging.getLogger(__name__)


class SV2TTSVITS(SpeakerEmbeddingMixin, VITS):
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
        resolved_name = name or 'sv2tts_vits'
        embedding_dim, _ = self._init_speaker_embedding(
            resolved_name, embedding_dim, encoder_name)

        kwargs.setdefault('speaker_embedding_dim', embedding_dim)
        super().__init__(lang = lang, name = resolved_name, ** kwargs)

    def _non_build_keys(self):
        return super()._non_build_keys() + ('embedding_dim', 'encoder_name')

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
        """(tokens, spec, frames, waveform, embedding) — the embedding rides
        the adversarial batch's speaker slot."""
        tokens, spec, n_frames, audio = super().prepare_data(data)
        embedding = np.asarray(
            data['embedding'] if isinstance(data, dict) and 'embedding' in data
            else self.get_speaker_embedding(
                data.get('embeddings') if isinstance(data, dict) else None)
        , np.float32)
        return tokens, spec, n_frames, audio, embedding

    def get_padding_values(self):
        return super().get_padding_values() + (0.,)

    def collate(self, batch):
        tokens, spec, lengths, audio = super().collate(
            [b[:4] for b in batch])
        embeddings = np.stack([b[4] for b in batch])
        return tokens, spec, lengths, audio, embeddings

    def get_config(self):
        return {** super().get_config(), ** self.get_speaker_config()}
