"""Host-side audio DSP: resampling, normalization, silence trimming, noise
reduction.

Capability parity with ``/root/reference/utils/audio/audio_processing.py``
(`resample_audio:30`, `normalize_audio:51`, `reduce_noise:65`,
`trim_silence:86` with rms/window/simple methods, `remove_silence:373`) and
the vendored spectral-gating noise reducer (``noisereducev1.py``), both
re-implemented from scratch on numpy/scipy.
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)


def resample_audio(audio, rate, target_rate, method = 'fft'):
    """Resample `audio` to `target_rate`.

    - 'fft' (default): scipy FFT resampling, bit-matching the reference so
      cached datasets are interchangeable;
    - 'sinc': the native C++ Kaiser-windowed polyphase path (faster for the
      bulk data pipeline).
    """
    if rate == target_rate: return audio, rate
    if method == 'sinc':
        from .. import native
        return native.resample(np.asarray(audio, np.float32), rate, target_rate), target_rate
    from scipy.signal import resample
    audio = resample(audio, int(len(audio) / rate * target_rate))
    return audio, target_rate


def convert_audio_dtype(audio, dtype):
    """Convert between integer/float sample formats with max-value scaling."""
    dtype = np.dtype(dtype)
    if audio.dtype == dtype: return audio
    if np.issubdtype(audio.dtype, np.floating):
        if np.issubdtype(dtype, np.floating):
            return audio.astype(dtype)
        return (audio * np.iinfo(dtype).max).astype(dtype)
    if np.issubdtype(dtype, np.floating):
        return (audio / np.iinfo(audio.dtype).max).astype(dtype)
    return (audio / np.iinfo(audio.dtype).max * np.iinfo(dtype).max).astype(dtype)


def normalize_audio(audio, max_val = 1., dtype = None):
    """Remove DC offset and scale the peak to `max_val` (float32 output when
    `max_val <= 1`, int16-style otherwise)."""
    if dtype is None:
        dtype = np.float32 if max_val <= 1. else np.int16
    audio = audio - np.mean(audio)
    peak = np.max(np.abs(audio))
    if peak <= 1e-9: return audio.astype(dtype)
    return (audio * (max_val / peak)).astype(dtype)


# -- silence ------------------------------------------------------------------

def _frame_rms(audio, frame_length, hop_length):
    n_frames = max(1, 1 + (len(audio) - frame_length) // hop_length)
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    idx = np.minimum(idx, len(audio) - 1)
    frames = audio[idx]
    return np.sqrt(np.mean(frames ** 2, axis = 1))


def trim_silence(audio,
                 rate = 22050,
                 *,
                 method = 'rms',
                 threshold = 0.1,
                 frame_ms = 25.,
                 hop_ms = 10.,
                 margin_ms = 0.,
                 ** kwargs
                ):
    """Trim leading/trailing silence.

    Methods:
      - 'simple': threshold on absolute amplitude (relative to peak)
      - 'rms': threshold on frame RMS energy (relative to max frame RMS)
      - 'window': the reference's triangular-window energy trim (absolute
        threshold, adaptive edges, `add_end` padding — bit-exact vs the
        `audio_trim_silence-window.npy` golden); extra kwargs: `power`,
        `window_ms`, `mode`, `adaptive_threshold`, `add_start`, `add_end`,
        `max_trim_factor`
      - 'envelope': threshold on a moving-average envelope of |audio|
        (relative to peak)
    """
    if len(audio) == 0: return audio
    audio = np.asarray(audio)
    if np.max(np.abs(audio)) <= 1e-9: return audio[:0]  # pure silence
    margin = int(margin_ms * rate / 1000.)

    if method == 'simple':
        mask = np.abs(audio) >= threshold * np.max(np.abs(audio))
        keep = np.where(mask)[0]
    elif method == 'rms':
        frame_length = max(1, int(frame_ms * rate / 1000.))
        hop_length = max(1, int(hop_ms * rate / 1000.))
        from .. import native
        start, end = native.trim_bounds(
            np.asarray(audio, np.float32), frame_length, hop_length, threshold
        )
        if end <= start: return audio[:0]
        keep = np.array([start, end - 1])
    elif method == 'window':
        return _trim_silence_window(audio, rate, threshold = threshold, ** kwargs)
    elif method == 'envelope':
        win = max(1, int(frame_ms * rate / 1000.))
        envelope = np.convolve(np.abs(audio), np.ones(win) / win, mode = 'same')
        mask = envelope >= threshold * np.max(envelope)
        keep = np.where(mask)[0]
    else:
        raise ValueError('Unknown trim method: {}'.format(method))

    if len(keep) == 0: return audio[:0]
    start = max(0, int(keep[0]) - margin)
    end = min(len(audio), int(keep[-1]) + 1 + margin)
    return audio[start:end]


def _trim_silence_window(audio,
                         rate,
                         *,
                         threshold = 0.1,
                         power = 2,
                         window_ms = 200.,
                         mode = 'start_end',
                         adaptive_threshold = True,
                         add_start = 0.,
                         add_end = 1.5,
                         max_trim_factor = 5,
                         ** _):
    """Windowed energy trim, numerically matching the reference's default
    trim method (``audio_processing.py:275`` `trim_silence_window`, golden
    ``audio_trim_silence-window.npy``): a triangular window convolves
    `audio**power`; the kept span runs from the first above-threshold
    position to `add_end` windows past the last one.  `adaptive_threshold`
    lowers the threshold when the edges are already quiet, and the whole
    trim is discarded if it would keep less than 1/`max_trim_factor` of
    the input."""
    wl = int(window_ms * rate / 1000.) if window_ms else int(0.2 * rate)
    half = wl // 2
    window = np.concatenate([
        np.linspace(0., 1., half), np.linspace(1., 0., half)
    ]) / half
    conv = np.convolve(audio ** power, window, mode = 'valid')

    trimmed = audio
    if 'end' in mode:
        th = threshold
        if adaptive_threshold:
            th = min(threshold, max(np.mean(conv[-wl:]) * 5, threshold / 50))
        loud = np.where(conv > th)[0]
        if len(loud):
            trimmed = trimmed[:loud[-1] + int(wl * add_end)]
    if 'start' in mode:
        th = threshold
        if adaptive_threshold:
            th = min(threshold, max(np.mean(conv[:wl]) * 5, threshold / 50))
        loud = np.where(conv > th)[0]
        if len(loud):
            trimmed = trimmed[max(0, loud[0] - int(wl * add_start)):]
    return trimmed if len(trimmed) > len(audio) // max_trim_factor else audio


def remove_silence(audio,
                   rate = 22050,
                   *,
                   threshold = 0.1,
                   frame_ms = 25.,
                   hop_ms = 10.,
                   max_silence_ms = 150.,
                   ** kwargs
                  ):
    """Shorten *internal* silences longer than `max_silence_ms` (keeps a
    `max_silence_ms` gap so speech rhythm survives)."""
    frame_length = max(1, int(frame_ms * rate / 1000.))
    hop_length = max(1, int(hop_ms * rate / 1000.))
    rms = _frame_rms(audio, frame_length, hop_length)
    voiced = rms >= threshold * np.max(rms)

    max_gap = max(1, int(max_silence_ms / hop_ms))
    keep = np.zeros(len(audio), dtype = bool)
    silence_run = max_gap  # leading silence is trimmed entirely
    for i, v in enumerate(voiced):
        start = i * hop_length
        end = min(len(audio), start + hop_length)
        if v:
            silence_run = 0
            keep[start:end] = True
        else:
            silence_run += 1
            if silence_run <= max_gap:
                keep[start:end] = True
    return audio[keep]


# -- spectral-gating noise reduction ------------------------------------------

def reduce_noise(audio,
                 rate = 22050,
                 *,
                 noise = None,
                 noise_ms = 100.,
                 n_fft = 1024,
                 hop_length = 256,
                 n_std_thresh = 1.5,
                 prop_decrease = 1.0,
                 smooth_freq = 3,
                 smooth_time = 5,
                 ** kwargs
                ):
    """Spectral gating: estimate a per-frequency noise floor (from `noise`, or
    the first `noise_ms` of the clip), build a smoothed soft mask over the
    STFT, attenuate, and reconstruct."""
    from scipy.signal import stft as sp_stft, istft as sp_istft

    audio = np.asarray(audio, dtype = np.float32)
    if noise is None:
        noise = audio[: max(n_fft, int(noise_ms * rate / 1000.))]

    f, t, spec = sp_stft(audio, nperseg = n_fft, noverlap = n_fft - hop_length)
    _, _, noise_spec = sp_stft(noise, nperseg = n_fft, noverlap = n_fft - hop_length)

    db = 20. * np.log10(np.abs(spec) + 1e-10)
    noise_db = 20. * np.log10(np.abs(noise_spec) + 1e-10)

    thresh = (noise_db.mean(axis = 1) + n_std_thresh * noise_db.std(axis = 1))[:, None]
    mask = db < thresh

    # smooth the binary mask over freq/time, then soften
    if smooth_freq > 1 or smooth_time > 1:
        from scipy.ndimage import uniform_filter
        mask = uniform_filter(mask.astype(np.float32), size = (smooth_freq, smooth_time))
    else:
        mask = mask.astype(np.float32)

    gain = 1. - prop_decrease * mask
    _, rec = sp_istft(spec * gain, nperseg = n_fft, noverlap = n_fft - hop_length)
    return rec[: len(audio)].astype(np.float32)
