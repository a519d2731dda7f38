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
