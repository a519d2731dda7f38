"""FastSpeech-2 family: architecture, loss, data pipeline, task model.

Beyond-reference capability (the reference's synthesizers are all AR);
the test strategy mirrors the reference's task-model tests (SURVEY.md §4):
shape/mask invariants, loss-decrease training, persistence round-trip,
end-to-end synthesis through the shared TTS surface.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from text_to_speech_tpu.models import saving
from text_to_speech_tpu.models.interfaces import reset_instances
from text_to_speech_tpu.models.fastspeech2_arch import (
    FastSpeech2 as FS2Arch, length_regulator,
)
from text_to_speech_tpu.models.tts import FastSpeech2, HiFiGAN
from text_to_speech_tpu.train.losses import get_loss
from text_to_speech_tpu.ops.pitch import (
    estimate_pitch, frame_energy, log_normalize, phoneme_average,
    durations_from_attention,
)

TINY_FS2 = dict(
    dim = 24,
    n_heads = 2,
    encoder_layers = 1,
    decoder_layers = 1,
    ffn_dim = 48,
    variance_filters = 16,
    n_bins = 8,
    postnet_n_conv = 2,
    postnet_filters = 8,
    postnet_kernel_size = 3,
    max_frames = 64,
    max_position = 256,
)

TINY_HIFI = dict(
    upsample_rates = (4, 4),
    upsample_kernel_sizes = (8, 8),
    upsample_initial_channel = 8,
    resblock_kernel_sizes = (3,),
    resblock_dilation_sizes = ((1, 2),),
    mpd_periods = (2,),
    msd_scales = 1,
)


@pytest.fixture(autouse = True)
def model_root(tmp_path, monkeypatch):
    monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
    reset_instances()
    yield str(tmp_path)
    reset_instances()


def make_arch(** kwargs):
    return FS2Arch(vocab_size = 40, n_mel_channels = 20,
                   ** {** TINY_FS2, ** kwargs})


def make_model(name = 'test_fs2', ** kwargs):
    return FastSpeech2(lang = 'en', name = name,
                       ** {** TINY_FS2, ** kwargs})


class TestLengthRegulator:
    def test_expansion_indices(self):
        x = jnp.arange(12, dtype = jnp.float32).reshape(1, 4, 3)
        d = jnp.array([[2, 0, 1, 3]])
        out, mask, lengths, idx = length_regulator(x, d, 8)
        assert list(np.asarray(idx[0][:6])) == [0, 0, 2, 3, 3, 3]
        assert int(lengths[0]) == 6
        assert list(np.asarray(mask[0]).astype(int)) == [1] * 6 + [0] * 2
        # expanded rows match the gathered tokens; padding is zeroed
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(x[0, 0]))
        np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(x[0, 2]))
        assert np.all(np.asarray(out[0, 6:]) == 0.)

    def test_total_clamped_to_buffer(self):
        x = jnp.ones((1, 3, 2))
        d = jnp.array([[4, 4, 4]])
        out, mask, lengths, _ = length_regulator(x, d, 8)
        assert int(lengths[0]) == 8
        assert int(mask.sum()) == 8

    def test_zero_durations(self):
        x = jnp.ones((1, 3, 2))
        d = jnp.zeros((1, 3), jnp.int32)
        out, mask, lengths, _ = length_regulator(x, d, 4)
        assert int(lengths[0]) == 0 and int(mask.sum()) == 0


class TestFastSpeech2Arch:
    def test_forward_shapes_and_masks(self):
        arch = make_arch()
        params, state = arch.init(jax.random.PRNGKey(0))
        tokens = jnp.array([[3, 4, 5, 0, 0], [6, 7, 8, 9, 10]])
        dur = jnp.array([[2, 3, 1, 0, 0], [1, 1, 2, 2, 3]])
        pitch = jnp.full((2, 5), 0.3)
        energy = jnp.full((2, 5), -0.3)
        (mel, mel_post, log_d, p_pred, e_pred, fmask, tmask), new_state = arch(
            params, state, tokens, durations = dur, pitch = pitch,
            energy = energy, max_frames = 32, train = True,
            rng = jax.random.PRNGKey(1))
        assert mel.shape == (2, 32, 20) and mel_post.shape == (2, 32, 20)
        assert log_d.shape == (2, 5) and p_pred.shape == (2, 5)
        assert int(fmask[0].sum()) == 6 and int(fmask[1].sum()) == 9
        assert list(np.asarray(tmask[0]).astype(int)) == [1, 1, 1, 0, 0]
        # masked frames emit zeros
        assert np.all(np.abs(np.asarray(mel[0, 6:])) < 1e-6)
        # BN state updated in train mode
        leaves = jax.tree_util.tree_leaves(new_state)
        assert leaves, 'postnet BN state expected'

    def test_infer_jit_and_alignment(self):
        arch = make_arch()
        params, state = arch.init(jax.random.PRNGKey(0))
        tokens = jnp.array([[3, 4, 5, 6, 0, 0]])
        infer = jax.jit(lambda p, s, t: arch.infer(p, s, t, max_frames = 32))
        out = infer(params, state, tokens)
        assert out.mel.shape == (1, 32, 20)
        assert out.attention_weights.shape == (1, 32, 6)
        # alignment rows are one-hot over valid frames, zero past length
        n = int(out.lengths[0])
        a = np.asarray(out.attention_weights[0])
        if n:
            np.testing.assert_allclose(a[:n].sum(axis = 1), 1.)
        assert np.all(a[n:] == 0.)
        # pad tokens get zero duration
        assert np.all(np.asarray(out.durations[0, 4:]) == 0)

    def test_d_control_scales_durations(self):
        arch = make_arch()
        params, state = arch.init(jax.random.PRNGKey(3))
        tokens = jnp.array([[3, 4, 5, 6, 7, 8]])
        slow = arch.infer(params, state, tokens, max_frames = 64,
                          d_control = 2.)
        fast = arch.infer(params, state, tokens, max_frames = 64,
                          d_control = 0.5)
        assert int(slow.lengths[0]) >= int(fast.lengths[0])

    def test_min_duration_floors_nonpad_tokens(self):
        arch = make_arch()
        params, state = arch.init(jax.random.PRNGKey(5))
        tokens = jnp.array([[3, 4, 5, 6, 0, 0]])
        out = arch.infer(params, state, tokens, max_frames = 64,
                         min_duration = 5)
        dur = np.asarray(out.durations[0])
        assert np.all(dur[:4] >= 5)          # non-pad tokens floored
        assert np.all(dur[4:] == 0)          # pads stay zero

    def test_frame_level_variances(self):
        arch = make_arch(variance_level = 'frame')
        params, state = arch.init(jax.random.PRNGKey(0))
        tokens = jnp.array([[3, 4, 5]])
        dur = jnp.array([[2, 2, 2]])
        pitch = jnp.zeros((1, 16))
        energy = jnp.zeros((1, 16))
        (mel, _, log_d, p_pred, _, fmask, _), _ = arch(
            params, state, tokens, durations = dur, pitch = pitch,
            energy = energy, max_frames = 16)
        assert p_pred.shape == (1, 16)      # frame-level predictor
        out = arch.infer(params, state, tokens, max_frames = 16)
        assert out.pitch.shape == (1, 16)

    def test_bf16_infer(self):
        arch = make_arch()
        params, state = arch.init(jax.random.PRNGKey(0))
        tokens = jnp.array([[3, 4, 5, 6]])
        out = arch.infer(params, state, tokens, max_frames = 32,
                         dtype = jnp.bfloat16)
        assert out.mel.dtype == jnp.float32        # cast back on the way out
        ref = arch.infer(params, state, tokens, max_frames = 32)
        # same alignment decisions at tiny scale
        assert np.allclose(np.asarray(out.durations), np.asarray(ref.durations))


class TestFastSpeech2Loss:
    def _batch(self, rng, B = 2, L = 5, T = 16, n_mel = 6):
        mel_t = rng.randn(B, T, n_mel).astype(np.float32)
        dur = rng.randint(0, 4, (B, L)).astype(np.int32)
        pitch_t = rng.randn(B, L).astype(np.float32)
        energy_t = rng.randn(B, L).astype(np.float32)
        mel = rng.randn(B, T, n_mel).astype(np.float32)
        log_d = rng.randn(B, L).astype(np.float32)
        fmask = np.zeros((B, T), np.float32); fmask[:, :10] = 1.
        tmask = np.zeros((B, L), np.float32); tmask[:, :4] = 1.
        y_true = (mel_t, dur, pitch_t, energy_t)
        y_pred = (mel, mel * 0.9, log_d, log_d * 0.5, log_d * 0.2,
                  fmask, tmask)
        return y_true, y_pred

    def test_components_and_padding_invariance(self):
        loss = get_loss('FastSpeech2Loss')
        rng = np.random.RandomState(0)
        y_true, y_pred = self._batch(rng)
        out = loss(tuple(map(jnp.asarray, y_true)),
                   tuple(map(jnp.asarray, y_pred)))
        assert set(out) == set(loss.output_names)
        # corrupt MASKED positions only: loss must not change
        mel_t2 = np.array(y_true[0]); mel_t2[:, 10:] += 100.
        pred2 = list(y_pred)
        mel2 = np.array(pred2[0]); mel2[:, 10:] -= 50.; pred2[0] = mel2
        logd2 = np.array(pred2[2]); logd2[:, 4:] += 9.; pred2[2] = logd2
        out2 = loss((jnp.asarray(mel_t2),) + tuple(map(jnp.asarray, y_true[1:])),
                    tuple(map(jnp.asarray, pred2)))
        for k in loss.output_names:
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(out2[k]),
                                       rtol = 1e-5)

    def test_perfect_prediction_zero(self):
        loss = get_loss('FastSpeech2Loss')
        rng = np.random.RandomState(1)
        y_true, y_pred = self._batch(rng)
        dur = y_true[1]
        exact = (y_true[0], y_true[0], np.log1p(dur.astype(np.float32)),
                 y_true[2], y_true[3], np.ones_like(y_pred[5]),
                 np.ones_like(y_pred[6]))
        out = loss(tuple(map(jnp.asarray, y_true)),
                   tuple(map(jnp.asarray, exact)))
        assert float(jnp.sum(out['loss'])) < 1e-8


class TestPitchOps:
    def test_estimate_pitch_sine(self):
        rate = 22050
        t = np.arange(rate) / rate
        audio = np.sin(2 * np.pi * 220. * t).astype(np.float32)
        f0, voiced = estimate_pitch(audio, rate)
        v = f0[voiced]
        assert voiced.mean() > 0.8
        assert abs(np.median(v) - 220.) < 5.

    def test_estimate_pitch_noise_unvoiced(self):
        rate = 22050
        audio = np.random.RandomState(0).randn(rate // 2).astype(np.float32)
        f0, voiced = estimate_pitch(audio, rate, voicing_threshold = 0.6)
        assert voiced.mean() < 0.5

    def test_frame_energy_scales(self):
        rate = 22050
        audio = np.sin(2 * np.pi * 220. * np.arange(rate) / rate)
        e1 = frame_energy(audio)
        e2 = frame_energy(2. * audio)
        np.testing.assert_allclose(e2, 2. * e1, rtol = 1e-5)

    def test_log_normalize_roundtrip_stats(self):
        v = np.abs(np.random.RandomState(0).randn(100)) + 1.
        out, mean, std = log_normalize(v)
        nz = out[out != 0]
        assert abs(nz.mean()) < 1e-3 and abs(nz.std() - 1.) < 1e-3
        out2, _, _ = log_normalize(v, mean = mean, std = std)
        np.testing.assert_allclose(out, out2)

    def test_phoneme_average(self):
        vals = np.array([1., 2., 3., 4., 5., 6.])
        dur = np.array([2, 0, 3, 1])
        out = phoneme_average(vals, dur)
        np.testing.assert_allclose(out, [1.5, 0., 4., 6.])

    def test_durations_from_attention(self):
        attn = np.zeros((7, 3))
        attn[:2, 0] = 1.; attn[2:6, 1] = 1.; attn[6:, 2] = 1.
        np.testing.assert_array_equal(durations_from_attention(attn), [2, 4, 1])
        assert durations_from_attention(attn).sum() == 7


class TestFastSpeech2Model:
    def test_persistence_roundtrip(self, model_root):
        model = make_model()
        model.save()
        reset_instances()
        reloaded = FastSpeech2(name = 'test_fs2')
        assert reloaded.arch.hp.dim == TINY_FS2['dim']
        assert reloaded.arch.hp.encoder_layers == TINY_FS2['encoder_layers']

    def test_prepare_and_collate(self):
        model = make_model(name = 'test_fs2_data')
        rng = np.random.RandomState(0)
        rows = [{'text': 'hello world', 'mel': rng.randn(24, 80).astype(np.float32)},
                {'text': 'bye', 'mel': rng.randn(16, 80).astype(np.float32)}]
        prepared = [model.prepare_data(r) for r in rows]
        for (inp, out), row in zip(prepared, rows):
            assert int(inp[1].sum()) == len(out[0])   # durations tile the mel
        (tokens, dur, pitch, energy), (mel, *_r) = model.collate(prepared)
        assert tokens.shape[0] == 2 and mel.shape[0] == 2
        assert dur.shape == tokens.shape == pitch.shape
        # bucket_pad keeps the duration/mel contract
        inputs, targets = model.bucket_pad(
            model.collate(prepared), token_multiple = 8, frame_multiple = 16)
        assert inputs[0].shape[1] % 8 == 0
        assert targets[0].shape[1] % 16 == 0
        assert int(inputs[1].sum(axis = 1).max()) <= targets[0].shape[1]

    def test_explicit_durations_and_alignment(self):
        model = make_model(name = 'test_fs2_dur')
        mel = np.zeros((10, 80), np.float32)
        tokens = model.prepare_input({'text': 'abcd'})
        d = np.zeros((len(tokens),), np.int32); d[:2] = 5
        (inp, out) = model.prepare_data({'text': 'abcd', 'mel': mel,
                                         'durations': d})
        assert int(inp[1].sum()) == 10
        attn = np.zeros((10, len(tokens))); attn[:, 0] = 1.
        (inp2, _) = model.prepare_data({'text': 'abcd', 'mel': mel,
                                        'alignment': attn})
        assert int(inp2[1].sum()) == 10 and inp2[1][0] == 10

    @pytest.mark.slow
    def test_fit_loss_decreases(self):
        model = make_model(name = 'test_fs2_fit')
        rng = np.random.RandomState(0)
        data = [{'text': t, 'mel': rng.randn(32, 80).astype(np.float32) * 0.1}
                for t in ['hello world', 'this is a test',
                          'one two three', 'four five six'] * 2]
        hist = model.fit(data, epochs = 3, batch_size = 4, lr = 1e-3,
                         valid_size = 0., shuffle = False)
        losses = [e['metrics']['loss'] for e in hist.epoch_logs]
        assert losses[-1] < losses[0]
        for key in ('mel_loss', 'duration_loss', 'pitch_loss'):
            assert key in hist.epoch_logs[-1]['metrics']

    def test_infer_through_task_surface(self):
        model = make_model(name = 'test_fs2_infer')
        out = model.infer('hello world')
        assert 'mel' in out and len(out['mel']) == 1
        assert out['mel'][0].shape[1] == 80
        assert out['attention'][0] is not None

    @pytest.mark.slow
    def test_tts_with_vocoder(self):
        model = make_model(name = 'test_fs2_voc')
        vocoder = HiFiGAN(name = 'test_fs2_hifi', ** TINY_HIFI)
        out = model.infer('hello world', vocoder = vocoder,
                          vocoder_config = {'padding_multiple': 16})
        assert 'audio' in out
        n_frames = sum(m.shape[0] for m in out['mel'])
        assert len(out['audio']) == n_frames * vocoder.upsample_rate

    def test_one_launch_tts_matches_pipeline(self, monkeypatch):
        """The FS2 single-sentence path fuses forward+vocode into one
        launch (`FastSpeech2.compiled_tts`); parity with the multi-launch
        pipeline to PCM16 resolution (the parallel-family counterpart of
        the Tacotron-2 one-launch test)."""
        model = make_model(name = 'test_fs2_one')
        vocoder = HiFiGAN(name = 'test_fs2_hifi_one', ** TINY_HIFI)
        out1 = model.infer('hello world', vocoder = vocoder)
        assert 'audio' in out1

        monkeypatch.delattr(HiFiGAN, 'device_vocoder_fn')
        out2 = model.infer('hello world', overwrite = True,
                           vocoder = vocoder)

        np.testing.assert_allclose(out1['mel'][0], out2['mel'][0],
                                   atol = 1e-5)
        a1, a2 = np.asarray(out1['audio']), np.asarray(out2['audio'])
        assert a1.shape == a2.shape
        np.testing.assert_allclose(
            a1, np.clip(a2, -1., 1.), atol = 1.1 / 32767.)

    @pytest.mark.slow
    def test_predict_batched(self):
        model = make_model(name = 'test_fs2_batch')
        vocoder = HiFiGAN(name = 'test_fs2_hifi2', ** TINY_HIFI)
        results = model.predict(['hello world', 'goodbye world'],
                                batch_size = 2, vocoder = vocoder, save = False)
        assert len(results) == 2
        assert all('audio' in r for r in results)
