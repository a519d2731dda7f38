"""Audio file I/O with extension dispatch and a processing chain.

Capability parity with ``/root/reference/utils/audio/audio_io.py``
(`read_audio:186` dispatch, `write_audio:347`, `load_audio:100`,
`load_mel:129`, `play_audio`, `display_audio`, ffmpeg fallback for exotic
codecs).  Readers/writers are host-side; mel extraction happens on device via
`MelSTFT`.
"""

import os
import shutil
import logging
import subprocess

import numpy as np

from . import audio_processing

logger = logging.getLogger(__name__)

_read_fns = {}
_write_fns = {}


def register_reader(*exts):
    def deco(fn):
        for e in exts: _read_fns[e] = fn
        return fn
    return deco


def register_writer(*exts):
    def deco(fn):
        for e in exts: _write_fns[e] = fn
        return fn
    return deco


@register_reader('wav')
def read_wav(filename, ** kwargs):
    from scipy.io import wavfile
    rate, audio = wavfile.read(filename)
    return rate, audio


@register_writer('wav')
def write_wav(filename, audio, rate, ** kwargs):
    from scipy.io import wavfile
    wavfile.write(filename, rate, audio)


def _ffmpeg_available():
    return shutil.which('ffmpeg') is not None


@register_reader('mp3', 'm4a', 'ogg', 'flac', 'opus', 'mp4', 'avi', 'mkv', 'webm')
def read_ffmpeg(filename, rate = None, ** kwargs):
    """Decode any codec through ffmpeg to raw f32le on a pipe."""
    if not _ffmpeg_available():
        raise RuntimeError('ffmpeg is required to read {!r} but was not found'.format(filename))
    cmd = ['ffmpeg', '-v', 'quiet', '-i', filename]
    target = rate or 22050
    cmd += ['-f', 'f32le', '-acodec', 'pcm_f32le', '-ac', '1', '-ar', str(target), 'pipe:1']
    raw = subprocess.run(cmd, capture_output = True, check = True).stdout
    return target, np.frombuffer(raw, dtype = np.float32).copy()


@register_writer('mp3', 'm4a', 'ogg', 'flac', 'opus')
def write_ffmpeg(filename, audio, rate, ** kwargs):
    if not _ffmpeg_available():
        raise RuntimeError('ffmpeg is required to write {!r} but was not found'.format(filename))
    audio = audio_processing.convert_audio_dtype(np.asarray(audio), np.float32)
    subprocess.run(
        ['ffmpeg', '-y', '-v', 'quiet', '-f', 'f32le', '-ar', str(rate), '-ac', '1',
         '-i', 'pipe:0', filename],
        input = audio.astype('<f4').tobytes(), check = True,
    )


def read_audio(data,
               *,
               rate = None,
               target_rate = None,
               dtype = None,
               normalize = True,
               reduce_noise = False,
               trim_silence = False,
               read_method = None,
               ** kwargs
              ):
    """Read + process audio.  Returns ``(rate, audio)``.

    Processing chain (matching the reference order, ``audio_io.py:250-270``):
    resample → normalize → reduce_noise → trim_silence → dtype.
    """
    if isinstance(data, bytes): data = data.decode()
    if isinstance(data, str):
        ext = (read_method or data.split('.')[-1]).lower()
        if ext not in _read_fns:
            raise ValueError('Unsupported audio extension {!r} (known: {})'.format(
                ext, tuple(_read_fns)
            ))
        rate, audio = _read_fns[ext](data, rate = target_rate, ** kwargs)
    else:
        if rate is None:
            raise ValueError('`rate` is required when passing raw audio')
        audio = np.asarray(data)

    if target_rate and target_rate != rate:
        audio, rate = audio_processing.resample_audio(audio, rate, target_rate)

    if normalize:
        if normalize is True:
            audio = audio_processing.normalize_audio(audio, max_val = 1.)
        elif isinstance(normalize, (int, float)) and normalize > 1 \
                and np.issubdtype(audio.dtype, np.integer):
            audio = (audio / normalize).astype(np.float32)

    if reduce_noise:
        audio = audio_processing.reduce_noise(audio, rate = rate, ** kwargs)
        if normalize is True:
            audio = audio_processing.normalize_audio(audio, max_val = 1.)

    if trim_silence:
        audio = audio_processing.trim_silence(audio, rate = rate, ** kwargs)

    if dtype is not None:
        audio = audio_processing.convert_audio_dtype(audio, dtype)

    return rate, audio


def load_audio(data, rate, ** kwargs):
    """Load audio from a filename, raw array, or dataset row dict; returns the
    1-D waveform at `rate`."""
    if isinstance(data, dict):
        if 'audio' in data:
            key = 'audio'
        elif 'wavs_{}'.format(rate) in data:
            key = 'wavs_{}'.format(rate)
        else:
            key = 'filename' if 'filename' in data else 'audio_filename'
        if 'rate' in data: kwargs.setdefault('rate', data['rate'])
        data = data[key]
    kwargs.setdefault('rate', rate)
    return read_audio(data, target_rate = rate, ** kwargs)[1]


def load_mel(data, stft_fn, *, trim_mode = None, ** kwargs):
    """Load (or compute) a mel spectrogram: `.npy` mel file, raw mel array, or
    audio via `stft_fn`; returns (frames, n_mels)."""
    if isinstance(data, str) and data.endswith('.npy'):
        mel = np.load(data)
    elif isinstance(data, dict) and 'mel' in data:
        mel = data['mel']
        if isinstance(mel, str): mel = np.load(mel)
    elif isinstance(data, np.ndarray) and data.ndim == 2 \
            and data.shape[1] == stft_fn.n_mel_channels:
        mel = data
    else:
        audio = load_audio(data, stft_fn.rate, ** kwargs)
        mel = np.asarray(stft_fn(audio))[0]
    return mel


def write_audio(filename, audio, rate, *, normalize = False, makedirs = True, ** kwargs):
    ext = filename.split('.')[-1].lower()
    if ext not in _write_fns:
        raise ValueError('Unsupported audio extension {!r} (known: {})'.format(
            ext, tuple(_write_fns)
        ))
    if makedirs:
        d = os.path.dirname(filename)
        if d: os.makedirs(d, exist_ok = True)
    audio = np.asarray(audio)
    if normalize:
        audio = audio_processing.normalize_audio(audio, max_val = 1.)
    _write_fns[ext](filename, audio, rate, ** kwargs)
    return filename


def play_audio(audio, rate = 22050, *, blocking = True, ** kwargs):
    """Play audio through a host player (ffplay/aplay) when one exists."""
    import tempfile
    player = shutil.which('ffplay') or shutil.which('aplay')
    if player is None:
        logger.warning('No audio player available on this host (ffplay/aplay)')
        return False
    with tempfile.NamedTemporaryFile(suffix = '.wav', delete = False) as f:
        path = f.name
    try:
        write_audio(path, audio_processing.convert_audio_dtype(
            np.asarray(audio), np.int16
        ), rate)
        cmd = [player, '-nodisp', '-autoexit', path] if 'ffplay' in player else [player, path]
        proc = subprocess.Popen(cmd, stdout = subprocess.DEVNULL, stderr = subprocess.DEVNULL)
        if blocking: proc.wait()
        return True
    finally:
        if blocking and os.path.exists(path): os.remove(path)


def record_audio(seconds, rate = 16000, *, filename = None, ** kwargs):
    """Capture `seconds` of microphone audio (reference ``audio_io.py:76``).

    Uses the pyaudio-backed AudioRecorder when the package is present;
    optionally writes the capture to `filename`.
    """
    from .audio_stream import AudioRecorder
    audio = AudioRecorder(rate = rate, ** kwargs).record(seconds)
    if filename is not None:
        write_audio(filename, audio, rate)
    return audio


def display_audio(audio, rate = 22050, ** kwargs):
    """Render an IPython audio widget in notebooks, else fall back to playback."""
    try:
        from IPython.display import Audio, display
        display(Audio(np.asarray(audio), rate = rate))
        return True
    except Exception:
        return play_audio(audio, rate, ** kwargs)
