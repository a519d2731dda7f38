"""Native audio data loader: a C++ worker pool decoding WAV files below the
GIL (``dataloader_native.cpp``).

The reference's input pipeline reaches parallel file I/O through tf.data's
C++ runtime (``/root/reference/utils/datasets/builder.py:72-129``); this is
the framework's first-party counterpart.  Each worker parses the RIFF
container, converts PCM 16/24/32-bit or IEEE-float samples to float32,
optionally resamples (same Kaiser-sinc polyphase as ``native.resample``)
and peak-normalizes.  Anything the decoder does not handle (stereo,
compressed codecs, other containers) returns a status code and the caller
falls back to the Python readers (`ops.audio_io.read_audio`) per row.

Use `AudioLoaderPool` directly, or the `load_audio_batch` convenience which
preserves input order and applies the Python fallback transparently.
"""

import os
import ctypes
import logging
import threading

import numpy as np

from . import build_native_library

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'dataloader_native.cpp')
_DEP = os.path.join(_HERE, 'audio_native.cpp')

_lib = None
_lib_lock = threading.Lock()
_build_failed = False

#: status codes mirrored from dataloader_native.cpp
LOAD_OK, ERR_OPEN, ERR_FORMAT, ERR_DATA = 0, -1, -2, -3


def get_library():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        so_path = build_native_library(_SRC, 'dataloader_native',
                                       deps = (_DEP,))
        if so_path is None:
            logger.warning('native data loader unavailable; '
                           'audio loads stay on the python readers')
            _build_failed = True
            return None
        lib = ctypes.CDLL(so_path)
        i32, i64 = ctypes.c_int32, ctypes.c_int64
        f32pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [i32, i32]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.loader_submit.argtypes = [ctypes.c_void_p, i64, ctypes.c_char_p,
                                      i32, i32]
        lib.loader_next.restype = i64
        lib.loader_next.argtypes = [ctypes.c_void_p, f32pp,
                                    ctypes.POINTER(i64), ctypes.POINTER(i32),
                                    ctypes.POINTER(i32)]
        lib.loader_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def available():
    return get_library() is not None


class AudioLoaderPool:
    """Handle over the C++ worker pool.  `submit(ticket, path, ...)` then
    `next()` → ``(ticket, audio | None, rate, status)``; results arrive in
    completion order (re-key by ticket).  Thread-safe on both sides."""

    def __init__(self, n_workers = 2, capacity = 16):
        lib = get_library()
        if lib is None:
            raise RuntimeError('native data loader unavailable')
        self._lib = lib
        self._handle = lib.loader_create(int(n_workers), int(capacity))
        self._open = True

    def submit(self, ticket, path, *, target_rate = 0, normalize = True):
        self._lib.loader_submit(self._handle, int(ticket),
                                os.fspath(path).encode(),
                                int(target_rate or 0), int(bool(normalize)))

    def next(self):
        """Blocking pop of one finished decode."""
        data = ctypes.POINTER(ctypes.c_float)()
        n = ctypes.c_int64()
        rate = ctypes.c_int32()
        status = ctypes.c_int32()
        ticket = self._lib.loader_next(self._handle, ctypes.byref(data),
                                       ctypes.byref(n), ctypes.byref(rate),
                                       ctypes.byref(status))
        audio = None
        if status.value == LOAD_OK and bool(data):
            audio = np.ctypeslib.as_array(data, shape = (n.value,)).copy()
        if bool(data):
            self._lib.loader_free(data)
        return ticket, audio, rate.value, status.value

    def close(self):
        if self._open:
            self._open = False
            self._lib.loader_destroy(self._handle)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def load_audio_batch(paths, *, target_rate = None, normalize = True,
                     n_workers = None, pool = None):
    """Decode `paths` in parallel → ordered ``[(audio, rate), ...]``.

    WAV rows decode on the C++ pool; stereo / non-WAV / unreadable rows (and
    every row when the native library is unavailable) go through the Python
    readers with the same resample + normalize chain."""
    paths = list(paths)
    results = [None] * len(paths)
    own_pool = None
    if pool is None and available():
        own_pool = pool = AudioLoaderPool(
            n_workers = n_workers or min(4, max(1, os.cpu_count() or 1)))
    pending = 0
    try:
        if pool is not None:
            for i, p in enumerate(paths):
                if str(p).lower().endswith('.wav'):
                    pool.submit(i, p, target_rate = target_rate or 0,
                                normalize = normalize)
                    pending += 1
            for _ in range(pending):
                ticket, audio, rate, status = pool.next()
                if status == LOAD_OK:
                    results[ticket] = (audio, rate)
    finally:
        if own_pool is not None:
            own_pool.close()

    for i, p in enumerate(paths):
        if results[i] is None:      # python fallback / non-wav rows
            from ..ops.audio_io import read_audio
            rate, audio = read_audio(str(p), target_rate = target_rate,
                                     normalize = normalize)
            results[i] = (np.asarray(audio), rate)
    return results
