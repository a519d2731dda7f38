"""SV2TTS Tacotron-2: zero-shot voice cloning via speaker embeddings.

Capability parity with ``/root/reference/models/tts/sv2tts_tacotron2.py:18``:
per-model embeddings directory + default-embedding file, `select_embedding`
modes (mean/random/label), optional delegated speaker-encoder model
(`encoder_name`), embedding injected into the input tuple, and
`from_pretrained` partial transfer from a single-speaker checkpoint
(widened decoder matrices zero-padded — ``models/weights_converter.py:465``
behavior).  The embedding machinery itself is the shared
`SpeakerEmbeddingMixin` (also behind `SV2TTSVITS`).
"""

import logging

import numpy as np

from .tacotron2 import Tacotron2
from .speaker_embedding_mixin import SpeakerEmbeddingMixin

logger = logging.getLogger(__name__)


class SV2TTSTacotron2(SpeakerEmbeddingMixin, Tacotron2):
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
        embedding_dim, _ = self._init_speaker_embedding(
            resolved_name, embedding_dim, encoder_name)

        kwargs.setdefault('speaker_embedding_dim', embedding_dim)
        kwargs.setdefault('speaker_concat_pos', 'end')
        super().__init__(lang = lang, name = resolved_name, ** kwargs)

    def _non_build_keys(self):
        # `embedding_dim` is remapped to `speaker_embedding_dim`; the encoder
        # delegate name is task-level config
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
        return {** super().get_config(), ** self.get_speaker_config()}
