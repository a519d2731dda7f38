import numpy as np
import jax
import pytest

from text_to_speech_tpu.models import saving
from text_to_speech_tpu.models.interfaces import reset_instances
from text_to_speech_tpu.models.encoder import SpeakerEncoder

TINY = dict(
    embedding_dim = 16,
    filters = (8, 8),
    strides = (2, 2),
    kernel_size = 3,
)


@pytest.fixture(autouse = True)
def model_root(tmp_path, monkeypatch):
    monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
    reset_instances()
    yield str(tmp_path)
    reset_instances()


def rows(n_speakers = 4, per_speaker = 3, rate = 16000):
    rng = np.random.RandomState(0)
    out = []
    for s in range(n_speakers):
        freq = 200. * (s + 1)
        for u in range(per_speaker):
            t = np.arange(int(rate * 0.4)) / rate
            audio = (np.sin(2 * np.pi * freq * t) * 0.5
                     + rng.randn(len(t)) * 0.01).astype(np.float32)
            out.append({'speaker': 'spk{}'.format(s), 'audio': audio, 'rate': rate})
    return out


class TestSpeakerEncoder:
    def test_embed_shapes(self):
        enc = SpeakerEncoder(name = 'enc_t', ** TINY)
        data = rows(1, 1)[0]
        emb = enc.embed(data)
        assert emb.shape == (16,)
        np.testing.assert_allclose(np.linalg.norm(emb), 1., atol = 1e-3)

    def test_embed_batch(self):
        enc = SpeakerEncoder(name = 'enc_t2', ** TINY)
        embs = enc.embed(rows(2, 1))
        assert embs.shape == (2, 16)

    def test_identify(self):
        enc = SpeakerEncoder(name = 'enc_t3', ** TINY)
        data = rows(3, 2)
        refs = enc.embed(data[::2])
        label = enc.identify(data[0], refs, labels = ['a', 'b', 'c'])
        assert label in ('a', 'b', 'c')

    def test_ge2e_training_separates(self):
        enc = SpeakerEncoder(name = 'enc_train', ** TINY)
        data = rows(4, 4)
        history = enc.fit(data, n_speakers = 4, n_utterances = 2,
                          epochs = 3, lr = 3e-3)
        losses = history.get_metric('loss')
        assert len(losses) == 3
        assert losses[-1] < losses[0]

    def test_sv2tts_clone_from_audio(self):
        """Full zero-shot flow: reference audio -> encoder embedding ->
        conditioned synthesis (the encoder_name delegation path)."""
        from text_to_speech_tpu.models.tts import SV2TTSTacotron2
        enc = SpeakerEncoder(name = 'clone_enc', ** TINY)
        model = SV2TTSTacotron2(
            lang = 'en', name = 'clone_sv', embedding_dim = enc.embedding_dim,
            encoder_name = 'clone_enc',
            encoder_embedding_dim = 16, encoder_n_conv = 1,
            prenet_sizes = (8, 8), lsa_attention_dim = 8,
            lsa_attention_filters = 4, attention_rnn_dim = 12,
            decoder_rnn_dim = 12, postnet_n_conv = 2, postnet_filters = 8,
            max_decoder_steps = 16,
        )
        ref_audio = rows(1, 1)[0]
        out = model.infer('hello there', audio = ref_audio,
                          max_trial = 1, max_length = 16)
        assert out['mel'][0].shape[1] == 80

    def test_persistence(self):
        enc = SpeakerEncoder(name = 'enc_persist', ** TINY)
        emb = enc.embed(rows(1, 1)[0])
        reset_instances()
        enc2 = SpeakerEncoder(name = 'enc_persist')
        np.testing.assert_allclose(enc2.embed(rows(1, 1)[0]), emb, atol = 1e-5)
