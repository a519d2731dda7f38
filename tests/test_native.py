import numpy as np
import pytest

from text_to_speech_tpu import native


@pytest.fixture(scope = 'module')
def have_native():
    return native.available()


class TestNative:
    def test_builds(self, have_native):
        # the image ships g++, so the native library must build here
        assert have_native

    def test_pcm_roundtrip(self):
        x = (np.random.RandomState(0).randn(1000) * 0.3).astype(np.float32)
        pcm = native.f32_to_pcm16(x)
        back = native.pcm16_to_f32(pcm)
        assert np.abs(back - x).max() < 1e-3

    def test_pcm_matches_numpy(self):
        pcm = np.array([-32768, -1, 0, 1, 32767], np.int16)
        np.testing.assert_allclose(
            native.pcm16_to_f32(pcm), pcm.astype(np.float32) / 32768., atol = 1e-7
        )

    def test_normalize(self):
        x = np.random.RandomState(1).randn(500).astype(np.float32) * 3 + 2
        out = native.normalize(x, 1.)
        assert abs(np.abs(out).max() - 1.) < 1e-5
        assert abs(out.mean()) < 0.2

    def test_resample_preserves_tone(self):
        rate_in, rate_out, freq = 16000, 22050, 440.
        t = np.arange(rate_in) / rate_in
        sig = np.sin(2 * np.pi * freq * t).astype(np.float32)
        out = native.resample(sig, rate_in, rate_out)
        assert abs(len(out) - rate_out) <= 1
        # dominant frequency preserved
        spec = np.abs(np.fft.rfft(out[:rate_out]))
        peak_hz = np.argmax(spec) * rate_out / len(out[:rate_out]) / 1.0
        assert abs(peak_hz - freq) < 5.

    def test_frame_rms_matches_numpy(self):
        x = np.random.RandomState(2).randn(4000).astype(np.float32)
        fast = native.frame_rms(x, 400, 160)
        idx = np.arange(len(fast))[:, None] * 160 + np.arange(400)
        idx = np.minimum(idx, len(x) - 1)
        ref = np.sqrt(np.mean(x[idx] ** 2, axis = 1))
        np.testing.assert_allclose(fast, ref, rtol = 1e-5)

    def test_trim_bounds(self):
        rate = 16000
        sig = np.concatenate([
            np.zeros(rate // 4), np.sin(np.arange(rate) / 10).astype(np.float32),
            np.zeros(rate // 4),
        ]).astype(np.float32)
        start, end = native.trim_bounds(sig, 400, 160, 0.1)
        assert 0 < start <= rate // 4 + 400
        assert len(sig) - rate // 4 - 400 <= end <= len(sig)

    def test_trim_silence_only(self):
        start, end = native.trim_bounds(np.zeros(1000, np.float32), 100, 50)
        assert start == end == 0

    def test_overlap_stitch(self):
        parts = np.stack([np.full(10, 1.), np.full(10, 2.), np.full(10, 3.)]
                         ).astype(np.float32)
        overlaps = np.array([4, 4], np.int64)
        out = native.overlap_stitch(parts, overlaps)
        assert len(out) == 30 - 4 - 4
        # junction halves trimmed: 8 ones, 6 twos... (10-2) + (10-2-2) + (10-2)
        assert (out == 1.).sum() == 8
        assert (out == 3.).sum() == 8


class TestNativeDataLoader:
    """C++ WAV decode pool (`native/dataloader_native.cpp`) — the tf.data
    parallel-file-read analog.  Parity vs the Python readers."""

    @pytest.fixture(scope = 'class')
    def wav_dir(self, tmp_path_factory):
        from scipy.io import wavfile
        d = tmp_path_factory.mktemp('wavs')
        rng = np.random.RandomState(0)
        rate = 22050
        files = []
        for i, dur in enumerate((1000, 2000, 1500)):
            sig = (rng.randn(dur) * 0.2 * 32767).astype(np.int16)
            p = str(d / 'row{}.wav'.format(i))
            wavfile.write(p, rate, sig)
            files.append(p)
        # an IEEE-float32 wav too
        pf = str(d / 'float.wav')
        wavfile.write(pf, rate, (rng.randn(800) * 0.2).astype(np.float32))
        files.append(pf)
        return rate, files

    def test_loader_available(self):
        from text_to_speech_tpu.native import data_loader
        assert data_loader.available()

    def test_parity_with_python_reader(self, wav_dir):
        """No-resample decode + normalize must match `read_audio` (the
        scipy reader + `normalize_audio`) to float precision."""
        from text_to_speech_tpu.native import data_loader
        from text_to_speech_tpu.ops.audio_io import read_audio
        rate, files = wav_dir
        out = data_loader.load_audio_batch(files, normalize = True)
        assert len(out) == len(files)
        for path, (audio, r) in zip(files, out):
            r_py, a_py = read_audio(path, normalize = True)
            assert r == r_py == rate
            np.testing.assert_allclose(audio, a_py, atol = 1e-6)

    def test_resample_parity_with_native_sinc(self, wav_dir):
        """Resampling decode must match the Python chain built on the SAME
        sinc resampler (scale-invariant up to float assoc)."""
        from text_to_speech_tpu import native
        from text_to_speech_tpu.native import data_loader
        from scipy.io import wavfile
        rate, files = wav_dir
        target = 16000
        (audio, r), = data_loader.load_audio_batch(
            files[:1], target_rate = target, normalize = True)
        assert r == target
        _, raw = wavfile.read(files[0])
        ref = native.resample(raw.astype(np.float32), rate, target)
        ref = native.normalize(ref)
        assert audio.shape == ref.shape
        np.testing.assert_allclose(audio, ref, atol = 1e-5)

    def test_bad_rows_fall_back(self, wav_dir, tmp_path):
        """Missing files and non-wav rows resolve through the Python
        fallback (or surface an error status from the pool)."""
        from text_to_speech_tpu.native import data_loader
        rate, files = wav_dir
        with data_loader.AudioLoaderPool(n_workers = 2) as pool:
            pool.submit(7, str(tmp_path / 'missing.wav'))
            ticket, audio, r, status = pool.next()
            assert ticket == 7 and audio is None
            assert status == data_loader.ERR_OPEN

    def test_pool_tickets_and_order(self, wav_dir):
        from text_to_speech_tpu.native import data_loader
        rate, files = wav_dir
        with data_loader.AudioLoaderPool(n_workers = 3) as pool:
            for i, p in enumerate(files):
                pool.submit(i, p, normalize = False)
            got = {}
            for _ in files:
                ticket, audio, r, status = pool.next()
                assert status == data_loader.LOAD_OK
                got[ticket] = (audio, r)
        assert sorted(got) == list(range(len(files)))
        for i, p in enumerate(files):
            from scipy.io import wavfile
            _, raw = wavfile.read(p)
            assert len(got[i][0]) == len(raw)

    def test_dataset_native_preload_parity(self, wav_dir):
        """`Dataset(native_audio_rate=...)` must produce the same mapped
        items as the pure-Python pipeline."""
        from text_to_speech_tpu.train.datasets import Dataset
        from text_to_speech_tpu.ops.audio_io import load_audio
        rate, files = wav_dir
        rows = [{'filename': p, 'text': 't{}'.format(i)}
                for i, p in enumerate(files)]

        def map_fn(row):
            audio = load_audio(row, rate, normalize = True)
            return row['text'], np.asarray(audio, np.float32)

        plain = list(Dataset(rows, map_fn = map_fn, batch_size = 2,
                             prefetch = 0))
        fast = list(Dataset(rows, map_fn = map_fn, batch_size = 2,
                            prefetch = 0, native_audio_rate = rate,
                            num_parallel_calls = 2))
        assert len(plain) == len(fast)
        for pb, fb in zip(plain, fast):
            for (t1, a1), (t2, a2) in zip(pb, fb):
                assert t1 == t2
                np.testing.assert_allclose(a1, a2, atol = 1e-6)


# smoke tier: host-side/cheap-compile tests that gate every commit
# (<3 min cold on one core; see pytest.ini)
pytestmark = [pytest.mark.smoke]
