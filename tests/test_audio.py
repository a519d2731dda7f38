import os
import numpy as np
import pytest

from conftest import reference_path, has_reference

from text_to_speech_tpu.ops import (
    MelSTFT, TacotronSTFT, WhisperSTFT, mel_filterbank,
    resample_audio, normalize_audio, trim_silence, remove_silence, reduce_noise,
    read_audio, write_audio, load_audio, load_mel,
)

REF_WAV = reference_path('tests', 'data', 'audio_test.wav')
GOLDEN_MEL = reference_path('tests', '__reproduction', 'stft-TacotronSTFT.npy')
GOLDEN_RESAMPLE = reference_path('tests', '__reproduction', 'audio_resample.npy')


def synthetic_audio(rate = 22050, seconds = 0.8, freq = 440.):
    t = np.arange(int(rate * seconds)) / rate
    sig = 0.5 * np.sin(2 * np.pi * freq * t) * np.exp(-t)
    # silence padding at both ends for trim tests
    pad = np.zeros(int(rate * 0.2))
    return np.concatenate([pad, sig, pad]).astype(np.float32)


class TestMelFilterbank:
    def test_shape_and_norm(self):
        fb = mel_filterbank(22050, 1024, 80, 0., 8000.)
        assert fb.shape == (80, 513)
        assert (fb >= 0).all()
        # every filter has nonzero support
        assert (fb.sum(axis = 1) > 0).all()


class TestMelSTFT:
    def test_tacotron_shapes(self):
        stft = TacotronSTFT()
        audio = synthetic_audio()
        mel = np.asarray(stft(audio))
        assert mel.shape == (1, int(np.ceil(len(audio) / 256)), 80)

    def test_short_audio_padded(self):
        stft = TacotronSTFT()
        mel = np.asarray(stft(np.zeros(100, dtype = np.float32)))
        assert mel.shape[1] >= 1

    def test_mel_length_helpers(self):
        stft = TacotronSTFT()
        assert stft.get_mel_length(25600) == 100
        assert stft.get_audio_length(100) == 25600

    def test_config_roundtrip(self, tmp_path):
        stft = TacotronSTFT(normalize_mode = 'per_feature', pre_emph = 0.9)
        path = stft.save(str(tmp_path / 'mel.json'))
        stft2 = MelSTFT.load_from_file(path)
        assert isinstance(stft2, TacotronSTFT)
        assert stft2.get_config() == stft.get_config()
        audio = synthetic_audio()
        np.testing.assert_allclose(
            np.asarray(stft(audio)), np.asarray(stft2(audio)), atol = 1e-5
        )

    def test_whisper_range(self):
        stft = WhisperSTFT()
        audio = synthetic_audio(rate = 16000)
        mel = np.asarray(stft(audio))
        assert mel.shape[2] == 80
        assert mel.max() <= 1.5 and mel.min() >= -1.5

    def test_create_factory(self):
        stft = MelSTFT.create('TacotronSTFT', sampling_rate = 16000)
        assert stft.rate == 16000
        with pytest.raises(ValueError):
            MelSTFT.create('NoSuchSTFT')

    @pytest.mark.skipif(not os.path.exists(GOLDEN_MEL), reason = 'reference goldens unavailable')
    def test_golden_parity(self):
        """North-star gate: <2e-3 max deviation vs the reference TF2 mel."""
        audio = load_audio(REF_WAV, 22050)
        golden = np.load(GOLDEN_MEL)
        mel = np.asarray(TacotronSTFT()(audio))[0]
        assert mel.shape == golden.shape
        assert np.abs(mel - golden).max() < 2e-3


class TestReconstruction:
    def test_inverse_transform_roundtrip(self):
        """forward STFT -> inverse with true phase must reconstruct."""
        from text_to_speech_tpu.ops.stft import STFT
        stft = STFT(filter_length = 256, hop_length = 64, win_length = 256)
        audio = synthetic_audio(22050, 0.2)[None, :]
        mag, phase = stft.transform(audio)
        rec = np.asarray(stft.inverse_transform(mag, phase))[0]
        n = min(len(rec), audio.shape[1]) - 256
        # interior reconstruction (edges lose window overlap)
        assert np.abs(rec[256:n] - audio[0, 256:n]).max() < 1e-2

    def test_griffin_lim_tone(self):
        stft = TacotronSTFT()
        rate = 22050
        t = np.arange(rate // 2) / rate
        audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        mel = stft(audio)
        rec = np.asarray(stft.inverse(mel, n_iters = 8))[0]
        spec = np.abs(np.fft.rfft(rec))
        peak_hz = np.argmax(spec) * rate / len(rec)
        assert abs(peak_hz - 440) < 30


class TestAudioProcessing:
    def test_resample(self):
        audio = synthetic_audio(16000)
        out, rate = resample_audio(audio, 16000, 22050)
        assert rate == 22050
        assert abs(len(out) - len(audio) * 22050 / 16000) < 2

    @pytest.mark.skipif(not os.path.exists(GOLDEN_RESAMPLE), reason = 'reference goldens unavailable')
    def test_resample_golden_parity(self):
        audio = load_audio(REF_WAV, 22050)
        golden = np.load(GOLDEN_RESAMPLE)
        assert audio.shape == golden.shape
        assert np.abs(audio - golden).max() < 1e-6

    def test_normalize(self):
        audio = np.random.RandomState(0).randn(1000).astype(np.float32) * 10 + 3
        out = normalize_audio(audio, max_val = 1.)
        assert abs(np.abs(out).max() - 1.) < 1e-6
        assert abs(out.mean()) < 0.1

    @pytest.mark.parametrize('method', ['simple', 'rms', 'window'])
    def test_trim_silence(self, method):
        audio = synthetic_audio()
        trimmed = trim_silence(audio, 22050, method = method)
        assert 0 < len(trimmed) < len(audio)

    def test_trim_all_silence(self):
        assert len(trim_silence(np.zeros(1000), 22050, method = 'simple')) == 0

    def test_remove_silence(self):
        rate = 22050
        sig = synthetic_audio(rate, seconds = 0.3)
        audio = np.concatenate([sig, np.zeros(rate), sig])  # 1s internal gap
        out = remove_silence(audio, rate, max_silence_ms = 100.)
        assert len(out) < len(audio) - rate // 2

    def test_reduce_noise(self):
        rng = np.random.RandomState(1)
        rate = 22050
        clean = synthetic_audio(rate, 0.4)
        noise = (rng.randn(len(clean)) * 0.02).astype(np.float32)
        noisy = clean + noise
        out = reduce_noise(noisy, rate)
        assert out.shape == noisy.shape
        # silent head should be attenuated
        head = slice(0, int(0.15 * rate))
        assert np.abs(out[head]).mean() < np.abs(noisy[head]).mean()


class TestAudioIO:
    def test_wav_roundtrip(self, tmp_path):
        audio = (synthetic_audio() * 32767).astype(np.int16)
        path = str(tmp_path / 'x.wav')
        write_audio(path, audio, 22050)
        rate, loaded = read_audio(path, normalize = False)
        assert rate == 22050
        np.testing.assert_array_equal(audio, loaded)

    def test_load_audio_dict(self):
        audio = synthetic_audio()
        out = load_audio({'audio': audio, 'rate': 22050}, 22050, normalize = False)
        np.testing.assert_allclose(out, audio)

    def test_load_audio_resamples(self, tmp_path):
        audio = (synthetic_audio(16000) * 32767).astype(np.int16)
        path = str(tmp_path / 'x.wav')
        write_audio(path, audio, 16000)
        out = load_audio(path, 22050)
        assert abs(len(out) - len(audio) * 22050 / 16000) < 2

    def test_load_mel_from_npy(self, tmp_path):
        stft = TacotronSTFT()
        mel = np.random.randn(10, 80).astype(np.float32)
        path = str(tmp_path / 'mel.npy')
        np.save(path, mel)
        np.testing.assert_array_equal(load_mel(path, stft), mel)

    def test_load_mel_computes(self):
        stft = TacotronSTFT()
        mel = load_mel({'audio': synthetic_audio(), 'rate': 22050}, stft)
        assert mel.ndim == 2 and mel.shape[1] == 80

    def test_unknown_extension(self, tmp_path):
        with pytest.raises(ValueError):
            read_audio(str(tmp_path / 'x.xyz'))


GOLDEN_WHISPER = reference_path('tests', '__reproduction', 'stft-WhisperSTFT.npy')
GOLDEN_TRIM_WINDOW = reference_path(
    'tests', '__reproduction', 'audio_trim_silence-window.npy')
GOLDEN_REDUCE_NOISE = reference_path(
    'tests', '__reproduction', 'audio_reduce_noise.npy')


@pytest.mark.skipif(not os.path.exists(GOLDEN_WHISPER),
                    reason = 'reference goldens unavailable')
class TestGoldenParityExtended:
    def test_whisper_mel(self):
        audio = load_audio(REF_WAV, 16000)
        golden = np.load(GOLDEN_WHISPER)
        mel = np.asarray(WhisperSTFT()(audio))[0]
        assert mel.shape == golden.shape
        assert np.abs(mel - golden).max() < 2e-3

    def test_trim_silence_window(self):
        """The reference's default trim method must match bit-exactly."""
        audio = np.asarray(load_audio(REF_WAV, None))
        golden = np.load(GOLDEN_TRIM_WINDOW)
        trimmed = trim_silence(audio, 16000, method = 'window')
        assert trimmed.shape == golden.shape
        assert np.abs(trimmed - golden).max() == 0.

    def test_reduce_noise(self):
        """Spectral gating vs the reference's vendored noisereduce-v1
        (different implementation — capability-level tolerance)."""
        from text_to_speech_tpu.ops.audio_processing import reduce_noise
        audio = np.asarray(load_audio(REF_WAV, None))
        golden = np.load(GOLDEN_REDUCE_NOISE)
        out = reduce_noise(audio, 16000)
        assert out.shape == golden.shape
        assert np.abs(out - golden).max() < 1e-2


# smoke tier: host-side/cheap-compile tests that gate every commit
# (<3 min cold on one core; see pytest.ini)
pytestmark = [pytest.mark.smoke]
