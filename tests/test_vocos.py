"""Vocos iSTFT vocoder family: arch, GAN training reuse, importer,
task-model surface."""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp

from text_to_speech_tpu.models import saving
from text_to_speech_tpu.models.interfaces import reset_instances
from text_to_speech_tpu.models.vocos_arch import Vocos

TINY_VOCOS = dict(
    n_mel_channels = 9, dim = 16, intermediate_dim = 32, n_layers = 2,
    kernel_size = 3, n_fft = 16, hop_length = 4, win_length = 16,
    mpd_periods = (2,), msd_scales = 1,
)


@pytest.fixture
def model_root(tmp_path, monkeypatch):
    monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
    reset_instances()
    yield str(tmp_path)
    reset_instances()


def make_arch(** kwargs):
    return Vocos(** {** TINY_VOCOS, ** kwargs})


class TestVocosArch:
    def test_apply_shape_and_length(self):
        arch = make_arch()
        params = arch.init(jax.random.PRNGKey(0))
        mel = jnp.asarray(np.random.RandomState(0).randn(2, 12, 9),
                          jnp.float32)
        audio = arch.apply(params, mel)
        assert audio.shape == (2, 12 * 4)           # exactly T * hop
        assert audio.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(audio)))

    def test_bf16_path(self):
        arch = make_arch()
        params = arch.init(jax.random.PRNGKey(0))
        mel = jnp.asarray(np.random.RandomState(0).randn(1, 8, 9),
                          jnp.float32)
        a = np.asarray(arch.apply(params, mel))
        b = np.asarray(arch.apply(params, mel, dtype = jnp.bfloat16))
        assert b.dtype == np.float32
        assert np.all(np.isfinite(b))
        # bf16 is an approximation of the f32 path, not garbage
        assert np.max(np.abs(a - b)) < 0.5

    def test_frame_rate_only(self):
        """No sample-rate convs: doubling hop_length changes ONLY the
        iSTFT, so the spectral head output is identical."""
        arch4 = make_arch()
        arch8 = make_arch(hop_length = 8)
        params = arch4.init(jax.random.PRNGKey(0))
        mel = jnp.asarray(np.random.RandomState(1).randn(1, 8, 9),
                          jnp.float32)
        m4, p4 = arch4.spectral_head(params, mel)
        m8, p8 = arch8.spectral_head(params, mel)
        np.testing.assert_array_equal(np.asarray(m4), np.asarray(m8))
        np.testing.assert_array_equal(np.asarray(p4), np.asarray(p8))

    def test_gan_train_step_reuse(self):
        """`make_hifigan_train_step` drives the Vocos arch unchanged."""
        from text_to_speech_tpu.train.gan import (
            make_hifigan_train_step, init_hifigan_train_state)
        from text_to_speech_tpu.train.optimizers import get_optimizer

        arch = make_arch()
        tx = get_optimizer('adam', lr = 1e-4)
        state = init_hifigan_train_state(arch, jax.random.PRNGKey(0), tx, tx)
        step = make_hifigan_train_step(arch, tx, tx, None, donate = False)

        rs = np.random.RandomState(0)
        mel = jnp.asarray(rs.randn(2, 16, 9), jnp.float32)
        audio = jnp.asarray(rs.randn(2, 16 * 4) * 0.1, jnp.float32)
        state, metrics = step(state, mel, audio)
        assert np.isfinite(float(metrics['gen_loss']))
        assert np.isfinite(float(metrics['disc_loss']))


class TestVocosImporter:
    """convert_vocos maps the official `backbone.convnext` layout onto this
    framework's tree — proven both ways by exporting our params into the
    official layout and asserting exact recovery."""

    def _export(self, params):
        sd = {}

        def conv(prefix, p):
            sd[prefix + '.weight'] = np.asarray(p['kernel']).transpose(2, 1, 0)
            sd[prefix + '.bias'] = np.asarray(p['bias'])

        def dense(prefix, p):
            sd[prefix + '.weight'] = np.asarray(p['kernel']).T
            sd[prefix + '.bias'] = np.asarray(p['bias'])

        def norm(prefix, p):
            sd[prefix + '.weight'] = np.asarray(p['gamma'])
            sd[prefix + '.bias'] = np.asarray(p['beta'])

        conv('backbone.embed', params['embed'])
        norm('backbone.norm', params['norm_pre'])
        norm('backbone.final_layer_norm', params['norm_post'])
        dense('head.out', params['head'])
        i = 0
        while 'block_{}'.format(i) in params:
            b = params['block_{}'.format(i)]
            p = 'backbone.convnext.{}'.format(i)
            conv(p + '.dwconv', b['depthwise'])
            norm(p + '.norm', b['norm'])
            dense(p + '.pwconv1', b['pw1'])
            dense(p + '.pwconv2', b['pw2'])
            sd[p + '.gamma'] = np.asarray(b['gamma'])
            i += 1
        return sd

    def test_roundtrip_and_config_inference(self):
        from text_to_speech_tpu.models.tts_checkpoints import (
            convert_vocos, vocos_config_from_state_dict)

        arch = make_arch()
        params = arch.init(jax.random.PRNGKey(3))
        sd = self._export(params)

        cfg = vocos_config_from_state_dict(sd)
        for field in ('dim', 'n_mel_channels', 'kernel_size', 'n_layers',
                      'intermediate_dim', 'n_fft'):
            assert cfg[field] == arch.hp[field], (field, cfg[field])

        got = convert_vocos(sd)

        def assert_equal(a, b, path = ''):
            assert set(a) == set(b), (path, set(a) ^ set(b))
            for k in b:
                if isinstance(b[k], dict):
                    assert_equal(a[k], b[k], path + '/' + str(k))
                else:
                    np.testing.assert_allclose(
                        np.asarray(a[k]), np.asarray(b[k]),
                        err_msg = path + '/' + str(k), atol = 1e-6)
        assert_equal(got, params)

    def test_converted_params_run(self):
        from text_to_speech_tpu.models.tts_checkpoints import convert_vocos

        arch = make_arch()
        params = arch.init(jax.random.PRNGKey(4))
        got = jax.tree_util.tree_map(jnp.asarray,
                                     convert_vocos(self._export(params)))
        mel = jnp.asarray(np.random.RandomState(2).randn(1, 8, 9),
                          jnp.float32)
        np.testing.assert_allclose(np.asarray(arch.apply(params, mel)),
                                   np.asarray(arch.apply(got, mel)),
                                   atol = 1e-6)


class TestVocosTaskModel:
    def _make(self, name = 'test_vocos'):
        from text_to_speech_tpu.models.tts import Vocos as VocosModel
        from text_to_speech_tpu.ops.stft import TacotronSTFT
        mel_fn = TacotronSTFT(sampling_rate = 8000, hop_length = 4,
                              filter_length = 16, win_length = 16,
                              n_mel_channels = 9)
        return VocosModel(name = name, mel_fn = mel_fn, ** TINY_VOCOS)

    def test_infer_and_reload(self, model_root):
        from text_to_speech_tpu.models import get_pretrained

        model = self._make()
        assert type(model.arch).__name__ == 'Vocos'
        mel = np.random.RandomState(0).randn(10, 9).astype(np.float32)
        audio = model(mel)
        assert audio.shape == (10 * 4,)
        assert np.all(np.isfinite(audio))
        model.save()
        reset_instances()
        reloaded = get_pretrained('test_vocos')
        assert type(reloaded).__name__ == 'Vocos'
        np.testing.assert_allclose(reloaded(mel), audio, atol = 1e-6)

    def test_from_torch_pretrained(self, model_root):
        from text_to_speech_tpu.models.tts import Vocos as VocosModel
        from text_to_speech_tpu.ops.stft import TacotronSTFT

        arch = make_arch()
        params = arch.init(jax.random.PRNGKey(5))
        sd = TestVocosImporter()._export(params)
        mel_fn = TacotronSTFT(sampling_rate = 8000, hop_length = 4,
                              filter_length = 16, win_length = 16,
                              n_mel_channels = 9)
        model = VocosModel.from_torch_pretrained(
            sd, name = 'imported_vocos', mel_fn = mel_fn,
            config = {'hop_length': 4, 'win_length': 16})
        mel = np.random.RandomState(3).randn(8, 9).astype(np.float32)
        # padding_multiple = len(mel): no pad frames, so the comparison to
        # the raw arch apply is exact
        audio = model(mel, padding_multiple = 8)
        np.testing.assert_allclose(
            audio, np.asarray(arch.apply(params, jnp.asarray(mel)[None]))[0],
            atol = 1e-5)
