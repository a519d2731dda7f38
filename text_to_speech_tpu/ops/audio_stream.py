"""Streaming audio playback / capture.

Capability parity with ``/root/reference/utils/audio/audio_stream.py``,
``audio_player.py:18``, ``audio_recorder.py:16`` (pyaudio there) — here the
device boundary is an ffplay/aplay/arecord/ffmpeg subprocess fed over a
pipe, so chunks synthesized on the TPU stream to the speakers while the next
chunk computes.
"""

import queue
import shutil
import logging
import threading
import subprocess

import numpy as np

logger = logging.getLogger(__name__)


class AudioStream:
    """Queue-fed playback stream: `put(chunk)` float32/-int16 chunks; a
    writer thread feeds the player process."""

    def __init__(self, rate = 22050, *, player = None):
        self.rate = rate
        self._player_cmd = player
        self._queue = queue.Queue()
        self._proc = None
        self._thread = None
        self._stopped = threading.Event()

    def _resolve_player(self):
        if self._player_cmd: return self._player_cmd
        if shutil.which('ffplay'):
            return ['ffplay', '-v', 'quiet', '-nodisp', '-autoexit',
                    '-f', 's16le', '-ar', str(self.rate), '-i', 'pipe:0']
        if shutil.which('aplay'):
            return ['aplay', '-q', '-f', 'S16_LE', '-r', str(self.rate), '-']
        return None

    def start(self):
        cmd = self._resolve_player()
        if cmd is None:
            logger.warning('no audio player available; AudioStream is a no-op')
            return False
        self._proc = subprocess.Popen(
            cmd, stdin = subprocess.PIPE,
            stdout = subprocess.DEVNULL, stderr = subprocess.DEVNULL,
        )
        self._stopped.clear()
        self._thread = threading.Thread(target = self._writer, daemon = True)
        self._thread.start()
        return True

    def _writer(self):
        while not self._stopped.is_set():
            try:
                chunk = self._queue.get(timeout = 0.2)
            except queue.Empty:
                continue
            if chunk is None:
                break
            chunk = np.asarray(chunk)
            if chunk.dtype != np.int16:
                chunk = np.clip(chunk * 32767., -32768, 32767).astype(np.int16)
            try:
                self._proc.stdin.write(chunk.tobytes())
                self._proc.stdin.flush()
            except (BrokenPipeError, ValueError):
                break
        try:
            self._proc.stdin.close()
        except Exception:
            pass

    def put(self, chunk):
        self._queue.put(chunk)

    def stop(self, drain = True):
        if drain:
            self._queue.put(None)
        else:
            self._stopped.set()
        if self._thread: self._thread.join(timeout = 5)
        if self._proc:
            try:
                self._proc.wait(timeout = 10)
            except subprocess.TimeoutExpired:
                self._proc.kill()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()


class AudioPlayer(AudioStream):
    """One-shot playback of complete clips through the stream interface."""

    def play(self, audio, blocking = True):
        if not self.start(): return False
        self.put(np.asarray(audio))
        if blocking:
            self.stop(drain = True)
        return True


class AudioRecorder:
    """Microphone capture through arecord/ffmpeg (when a capture device
    exists); `record(seconds)` → float32 waveform."""

    def __init__(self, rate = 16000, *, recorder = None):
        self.rate = rate
        self._recorder_cmd = recorder

    def _resolve_recorder(self, seconds):
        if self._recorder_cmd: return self._recorder_cmd
        if shutil.which('arecord'):
            return ['arecord', '-q', '-f', 'S16_LE', '-r', str(self.rate),
                    '-d', str(int(np.ceil(seconds))), '-t', 'raw', '-']
        if shutil.which('ffmpeg'):
            return ['ffmpeg', '-v', 'quiet', '-f', 'alsa', '-i', 'default',
                    '-t', str(seconds), '-f', 's16le', '-ar', str(self.rate),
                    '-ac', '1', 'pipe:1']
        return None

    def record(self, seconds):
        cmd = self._resolve_recorder(seconds)
        if cmd is None:
            raise RuntimeError('no capture tool available (arecord/ffmpeg)')
        raw = subprocess.run(cmd, capture_output = True,
                             timeout = seconds + 10).stdout
        audio = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.
        return audio[: int(seconds * self.rate)]


def stream_audio(chunks, rate = 22050, ** kwargs):
    """Play an iterable of chunks as they arrive."""
    with AudioStream(rate, ** kwargs) as stream:
        for chunk in chunks:
            stream.put(chunk)
    return True
