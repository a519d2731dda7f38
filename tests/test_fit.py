"""End-to-end training integration: tiny models, synthetic data, real fit()
loop with checkpointing + history, single-device and 8-device CPU mesh."""

import os

import numpy as np
import jax
import pytest

from text_to_speech_tpu.models import saving
from text_to_speech_tpu.models.interfaces import reset_instances
from text_to_speech_tpu.models.tts import Tacotron2, WaveGlow
from text_to_speech_tpu.parallel import create_mesh, get_devices

TINY_TACO = dict(
    encoder_embedding_dim = 8,
    encoder_n_conv = 1,
    encoder_kernel_size = 3,
    prenet_sizes = (4, 4),
    lsa_attention_dim = 4,
    lsa_attention_filters = 2,
    lsa_attention_kernel_size = 5,
    attention_rnn_dim = 8,
    decoder_rnn_dim = 8,
    postnet_n_conv = 2,
    postnet_filters = 4,
    postnet_kernel_size = 3,
    max_decoder_steps = 16,
)


@pytest.fixture(autouse = True)
def model_root(tmp_path, monkeypatch):
    monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
    reset_instances()
    yield str(tmp_path)
    reset_instances()


def synthetic_rows(n = 6, rate = 22050):
    rng = np.random.RandomState(0)
    rows = []
    for i in range(n):
        dur = 2000 + 500 * (i % 3)
        rows.append({
            'text': ['hello there', 'this is a test', 'synthetic data'][i % 3],
            'audio': (rng.randn(dur) * 0.1).astype(np.float32),
            'rate': rate,
        })
    return rows


class TestFitTacotron2:
    @pytest.mark.slow
    def test_two_epochs_updates_and_persists(self, model_root):
        model = Tacotron2(lang = 'en', name = 'fit_taco', ** TINY_TACO)
        before = np.asarray(model.params['decoder']['linear_projection']['kernel']).copy()

        history = model.fit(
            synthetic_rows(), epochs = 2, batch_size = 3, valid_size = 2,
            lr = 1e-3, frame_multiple = 16, token_multiple = 8,
        )
        assert history.epochs == 2
        assert 'loss' in history.epoch_logs[0]['metrics']
        assert 'val_loss' in history.epoch_logs[0]['metrics']
        after = np.asarray(model.params['decoder']['linear_projection']['kernel'])
        assert np.abs(after - before).max() > 0
        # checkpoint rotation recorded
        assert model.ckpt_manager.latest_epoch == 2

    def test_resume_from_disk(self, model_root):
        model = Tacotron2(lang = 'en', name = 'fit_taco2', ** TINY_TACO)
        model.fit(synthetic_rows(4), epochs = 1, batch_size = 2, valid_size = 0.,
                  frame_multiple = 16, token_multiple = 8)
        trained = np.asarray(model.params['decoder']['linear_projection']['kernel'])
        reset_instances()
        reloaded = Tacotron2(name = 'fit_taco2')
        np.testing.assert_allclose(
            np.asarray(reloaded.params['decoder']['linear_projection']['kernel']),
            trained,
        )
        assert reloaded.epochs == 1

    def test_optimizer_state_resumes_exactly(self, model_root):
        """Adam moments + step count survive a process restart: the saved
        'opt' tree is restored by the next fit(), so the count keeps
        accumulating instead of resetting (the reference's Keras
        checkpoints store weights only)."""
        model = Tacotron2(lang = 'en', name = 'fit_taco_opt', ** TINY_TACO)
        model.fit(synthetic_rows(4), epochs = 1, batch_size = 2,
                  valid_size = 0., frame_multiple = 16, token_multiple = 8)

        def saved_count():
            ckpt = model.ckpt_manager.load()
            assert 'opt' in ckpt
            scalars = [int(v) for v in ckpt['opt'].values()
                       if np.ndim(v) == 0 and np.issubdtype(
                           np.asarray(v).dtype, np.integer)]
            assert scalars, 'adam count leaf missing'
            return max(scalars)

        n1 = saved_count()
        assert n1 > 0
        reset_instances()
        reloaded = Tacotron2(name = 'fit_taco_opt')
        reloaded.fit(synthetic_rows(4), epochs = 1, batch_size = 2,
                     valid_size = 0., frame_multiple = 16, token_multiple = 8)
        model = reloaded
        assert saved_count() == 2 * n1     # resumed, not reset

    @pytest.mark.slow
    def test_optimizer_config_change_starts_fresh(self, model_root):
        """Resuming under a DIFFERENT optimizer config must NOT silently
        restore stale moments/step count: the saved 'opt' tree carries a
        config fingerprint and is discarded on mismatch."""
        model = Tacotron2(lang = 'en', name = 'fit_taco_fp', ** TINY_TACO)
        model.fit(synthetic_rows(4), epochs = 1, batch_size = 2, lr = 1e-3,
                  valid_size = 0., frame_multiple = 16, token_multiple = 8)

        def saved_count():
            ckpt = model.ckpt_manager.load(trees = ('opt',))
            scalars = [int(v) for v in ckpt['opt'].values()
                       if np.ndim(v) == 0 and np.issubdtype(
                           np.asarray(v).dtype, np.integer)]
            return max(scalars)

        n1 = saved_count()
        assert n1 > 0
        model.fit(synthetic_rows(4), epochs = 1, batch_size = 2, lr = 5e-4,
                  valid_size = 0., frame_multiple = 16, token_multiple = 8)
        assert saved_count() == n1         # fresh start under the new lr

    @pytest.mark.slow
    def test_interrupt_emergency_save_keeps_opt(self, model_root, monkeypatch):
        """A KeyboardInterrupt mid-training must not defeat exact resume:
        the emergency save in fit()'s finally block re-writes the latest
        epoch's manifest entry and has to keep the 'opt' tree."""
        model = Tacotron2(lang = 'en', name = 'fit_taco_intr', ** TINY_TACO)
        model.fit(synthetic_rows(4), epochs = 1, batch_size = 2,
                  valid_size = 0., frame_multiple = 16, token_multiple = 8)
        ckpt = model.ckpt_manager.load()
        assert 'opt' in ckpt

        def boom(* args, ** kwargs):
            raise KeyboardInterrupt()
        monkeypatch.setattr(model.history, 'on_epoch_end', boom)
        model.fit(synthetic_rows(4), epochs = 1, batch_size = 2,
                  valid_size = 0., frame_multiple = 16, token_multiple = 8)
        ckpt = model.ckpt_manager.load()
        assert 'opt' in ckpt, 'emergency save dropped the optimizer tree'


class TestFitWaveGlow:
    @pytest.mark.slow
    def test_loss_decreases(self):
        model = WaveGlow(
            name = 'fit_wg', n_flows = 2, n_group = 4, wn_layers = 2,
            wn_channels = 8, upsample_width = 16, upsample_stride = 8,
        )
        history = model.fit(
            synthetic_rows(4), epochs = 3, batch_size = 2, valid_size = 0.,
            lr = 1e-3, frame_multiple = 16,
        )
        losses = history.get_metric('loss')
        assert len(losses) == 3
        assert losses[-1] < losses[0]


class TestOverfitTrainedInference:
    @pytest.mark.slow
    def test_overfit_then_autoregressive_synthesis(self, model_root):
        """Overfit on one real utterance, then run AR predict() with the
        TRAINED weights: loss must collapse and the decode must produce a
        finite mel (examples/overfit_single_utterance.py is the full-size
        version of this, incl. gate-timed stop + Griffin-Lim wavs)."""
        from text_to_speech_tpu.ops.audio_io import read_audio

        wav = '/root/reference/tests/data/audio_test.wav'
        if not os.path.isfile(wav):
            pytest.skip('reference test utterance unavailable')
        rate, audio = read_audio(wav)
        audio = audio[:int(1.5 * rate)]

        model = Tacotron2(
            lang = 'en', name = 'overfit_t', ** {
                ** TINY_TACO, 'encoder_embedding_dim': 32,
                'attention_rnn_dim': 64, 'decoder_rnn_dim': 64,
                'prenet_sizes': (32, 32), 'lsa_attention_dim': 16,
                'max_decoder_steps': 200,
            })
        text = 'a short test utterance.'
        rows = [{'text': text, 'audio': audio, 'rate': rate}] * 8
        history = model.fit(rows, epochs = 25, batch_size = 2,
                            valid_size = 0., lr = 2e-3,
                            frame_multiple = 16, token_multiple = 8)
        losses = history.get_metric('loss')
        assert losses[-1] < losses[0] / 5.

        out = model.predict(text, max_trial = 2, save = False)[0]
        mel = np.asarray(out['mel'][0])
        assert mel.ndim == 2 and mel.shape[1] == 80
        assert np.isfinite(mel).all()
        # trained mel must be far closer to the target than an untrained one
        gt = np.asarray(model.get_audio({'audio': audio, 'rate': rate}))
        n = min(len(mel), len(gt))
        assert n > 16
        assert np.abs(mel[:n] - gt[:n]).mean() < np.abs(gt).mean()


class TestFitOnMesh:
    def test_waveglow_pp_mesh_fit(self):
        """model.fit on a dp x pp mesh routes through the GPipe pipelined
        train step (parallel/pipeline.py) end-to-end."""
        devices = get_devices('cpu')
        mesh = create_mesh({'dp': 2, 'pp': 2}, devices = devices[:4])
        model = WaveGlow(
            name = 'fit_wg_pp', n_flows = 2, n_group = 4, wn_layers = 2,
            wn_channels = 8, upsample_width = 16, upsample_stride = 8,
        )
        history = model.fit(
            synthetic_rows(8), epochs = 1, batch_size = 8, valid_size = 0.,
            mesh = mesh, frame_multiple = 16,
        )
        assert history.epochs == 1
        assert np.isfinite(history.get_metric('loss')[0])

    def test_hybrid_dcn_mesh_fit(self):
        """fit() on a multi-slice hybrid mesh shards batches over
        ('dcn', 'dp')."""
        from text_to_speech_tpu.parallel import create_hybrid_mesh
        devices = get_devices('cpu')
        mesh = create_hybrid_mesh({'dp': 2}, {'dcn': 2},
                                  devices = devices[:4])
        model = Tacotron2(lang = 'en', name = 'fit_dcn', ** TINY_TACO)
        history = model.fit(
            synthetic_rows(8), epochs = 1, batch_size = 8, valid_size = 0.,
            mesh = mesh, frame_multiple = 16, token_multiple = 8,
        )
        assert history.epochs == 1
        assert np.isfinite(history.get_metric('loss')[0])

    def test_dp_mesh_train_step(self):
        """Full train step jitted over an 8-device CPU mesh (dp sharding)."""
        devices = get_devices('cpu')
        mesh = create_mesh({'dp': len(devices)}, devices = devices)
        model = Tacotron2(lang = 'en', name = 'fit_mesh', ** TINY_TACO)
        history = model.fit(
            synthetic_rows(8), epochs = 1, batch_size = 8, valid_size = 0.,
            mesh = mesh, frame_multiple = 16, token_multiple = 8,
        )
        assert history.epochs == 1
        assert np.isfinite(history.get_metric('loss')[0])
