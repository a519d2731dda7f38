"""ctypes loader for the native audio DSP library (self-building).

Compiles ``audio_native.cpp`` with g++ on first use (cached next to the
source / in ``~/.cache``), exposes numpy-friendly wrappers, and degrades
gracefully to pure-numpy fallbacks when no compiler is available.
"""

import os
import ctypes
import logging
import hashlib
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'audio_native.cpp')

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def build_native_library(src, name, deps = ()):
    """Compile `src` (self-building, content-hash-cached) → .so path or
    None.  Shared by the DSP, data-loader and serving scheduler modules.
    `deps` = extra files whose content participates in the cache key
    (e.g. sources pulled in via #include)."""
    h = hashlib.sha256()
    for path in (src,) + tuple(deps):
        with open(path, 'rb') as f:
            h.update(f.read())
    digest = h.hexdigest()[:16]

    for cache_dir in (_HERE, os.path.expanduser('~/.cache/tts_tpu_native')):
        so_path = os.path.join(cache_dir, '{}-{}.so'.format(name, digest))
        if os.path.exists(so_path):
            return so_path
        try:
            os.makedirs(cache_dir, exist_ok = True)
            tmp = so_path + '.tmp'
            subprocess.run(
                ['g++', '-O3', '-march=native', '-shared', '-fPIC',
                 '-o', tmp, src],
                check = True, capture_output = True, timeout = 120,
            )
            os.replace(tmp, so_path)
            return so_path
        except (OSError, subprocess.SubprocessError) as e:
            logger.debug('native build failed in %s: %s', cache_dir, e)
            continue
    return None


def _build_library():
    return build_native_library(_SRC, 'audio_native')


def get_library():
    """The loaded ctypes library, or None when unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        so_path = _build_library()
        if so_path is None:
            logger.warning('native audio library unavailable; using numpy fallbacks')
            _build_failed = True
            return None
        lib = ctypes.CDLL(so_path)

        i64, i32, f32p, i16p, i64p = (
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int64),
        )
        lib.pcm16_to_f32.argtypes = [i16p, f32p, i64]
        lib.f32_to_pcm16.argtypes = [f32p, i16p, i64]
        lib.normalize_audio.argtypes = [f32p, i64, ctypes.c_float]
        lib.resample_sinc.restype = i64
        lib.resample_sinc.argtypes = [f32p, i64, f32p, i32, i32, i32]
        lib.frame_rms.restype = i64
        lib.frame_rms.argtypes = [f32p, i64, f32p, i32, i32]
        lib.trim_bounds.argtypes = [f32p, i64, i32, i32, ctypes.c_float, i64p, i64p]
        lib.overlap_stitch.restype = i64
        lib.overlap_stitch.argtypes = [f32p, i32, i64, i64p, f32p]
        _lib = lib
        return _lib


def available():
    return get_library() is not None


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# -- wrappers (numpy in / numpy out, with fallbacks) --------------------------

def pcm16_to_f32(data):
    data = np.ascontiguousarray(data, dtype = np.int16)
    lib = get_library()
    if lib is None:
        return data.astype(np.float32) / 32768.
    out = np.empty(data.shape, np.float32)
    lib.pcm16_to_f32(data.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                     _fptr(out), data.size)
    return out


def f32_to_pcm16(data):
    data = np.ascontiguousarray(data, dtype = np.float32)
    lib = get_library()
    if lib is None:
        return np.clip(data * 32767., -32768, 32767).astype(np.int16)
    out = np.empty(data.shape, np.int16)
    lib.f32_to_pcm16(_fptr(data),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                     data.size)
    return out


def normalize(data, max_val = 1.):
    data = np.ascontiguousarray(data, dtype = np.float32).copy()
    lib = get_library()
    if lib is None:
        data = data - data.mean()
        peak = np.abs(data).max()
        return data if peak <= 1e-9 else data * (max_val / peak)
    lib.normalize_audio(_fptr(data), data.size, ctypes.c_float(max_val))
    return data


def resample(data, in_rate, out_rate, half_taps = 32):
    """Kaiser-windowed sinc resampling (fast path for the data pipeline; the
    parity-exact FFT path stays in ``ops.audio_processing``)."""
    data = np.ascontiguousarray(data, dtype = np.float32)
    if in_rate == out_rate: return data
    lib = get_library()
    out_n = int(len(data) * out_rate / in_rate)
    if lib is None:
        from scipy.signal import resample_poly
        from math import gcd
        g = gcd(in_rate, out_rate)
        return resample_poly(data, out_rate // g, in_rate // g).astype(np.float32)[:out_n]
    out = np.empty(out_n + 8, np.float32)
    n = lib.resample_sinc(_fptr(data), len(data), _fptr(out),
                          in_rate, out_rate, half_taps)
    return out[:n]


def frame_rms(data, frame_length, hop_length):
    data = np.ascontiguousarray(data, dtype = np.float32)
    n_frames = max(1, 1 + (len(data) - frame_length) // hop_length)
    lib = get_library()
    if lib is None:
        idx = np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)
        idx = np.minimum(idx, len(data) - 1)
        return np.sqrt(np.mean(data[idx] ** 2, axis = 1)).astype(np.float32)
    out = np.empty(n_frames, np.float32)
    lib.frame_rms(_fptr(data), len(data), _fptr(out), frame_length, hop_length)
    return out


def trim_bounds(data, frame_length, hop_length, threshold = 0.1):
    """(start, end) sample bounds of the non-silent region."""
    data = np.ascontiguousarray(data, dtype = np.float32)
    lib = get_library()
    if lib is None:
        rms = frame_rms(data, frame_length, hop_length)
        if rms.max() <= 1e-9: return 0, 0
        frames = np.where(rms >= threshold * rms.max())[0]
        if len(frames) == 0: return 0, 0
        return int(frames[0] * hop_length), \
            int(min(len(data), frames[-1] * hop_length + frame_length))
    start = ctypes.c_int64()
    end = ctypes.c_int64()
    lib.trim_bounds(_fptr(data), len(data), frame_length, hop_length,
                    ctypes.c_float(threshold),
                    ctypes.byref(start), ctypes.byref(end))
    return start.value, end.value


def overlap_stitch(parts, overlaps):
    """Stitch windowed vocoder parts (n_parts, part_len) trimming half of
    each junction overlap."""
    parts = np.ascontiguousarray(parts, dtype = np.float32)
    overlaps = np.ascontiguousarray(overlaps, dtype = np.int64)
    n_parts, part_len = parts.shape
    lib = get_library()
    if lib is None:
        pieces = []
        for i in range(n_parts):
            lo = 0 if i == 0 else int(overlaps[i - 1]) // 2
            hi = part_len if i == n_parts - 1 else part_len - int(overlaps[i]) // 2
            pieces.append(parts[i, lo:hi])
        return np.concatenate(pieces)
    total = n_parts * part_len
    out = np.empty(total, np.float32)
    n = lib.overlap_stitch(_fptr(parts), n_parts, part_len,
                           overlaps.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                           _fptr(out))
    return out[:n]
