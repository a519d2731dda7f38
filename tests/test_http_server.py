"""HTTP serving front-end: WAV encoding, routes, streaming, abort.

The oneshot/streaming tests drive a REAL tiny VITS model through
`ContinuousServingEngine` + `make_vits_stepper` over actual sockets;
abort/stats/error semantics use a controllable fake engine (the server is
engine-agnostic by contract)."""

import json
import time
import struct
import threading
import http.client

import numpy as np
import pytest

jax = pytest.importorskip('jax')

from text_to_speech_tpu.models import saving
from text_to_speech_tpu.models.interfaces import reset_instances
from text_to_speech_tpu.runtimes.http_server import (
    TTSServer, wav_header, pcm16, encode_wav)
from text_to_speech_tpu.utils.stream import AsyncResult

from test_vits import TINY_VITS


# -- wav encoding ------------------------------------------------------------

def parse_wav(data):
    assert data[:4] == b'RIFF' and data[8:12] == b'WAVE'
    assert data[12:16] == b'fmt '
    _, fmt, channels, rate, _, _, bits = struct.unpack('<IHHIIHH', data[16:36])
    assert data[36:40] == b'data'
    (size,) = struct.unpack('<I', data[40:44])
    pcm = np.frombuffer(data[44:], '<i2')
    return rate, bits, channels, size, pcm


def test_encode_wav_roundtrip():
    audio = np.sin(np.linspace(0, 40, 800)).astype(np.float32) * 0.5
    rate, bits, channels, size, pcm = parse_wav(encode_wav(audio, 8000))
    assert (rate, bits, channels) == (8000, 16, 1)
    assert size == 2 * len(audio) and len(pcm) == len(audio)
    assert np.allclose(pcm / 32767., audio, atol = 2e-4)


def test_streaming_header_has_unknown_length():
    header = wav_header(22050)
    assert len(header) == 44
    (size,) = struct.unpack('<I', header[40:44])
    assert size > 2 ** 31          # "read to EOF" sentinel


def test_pcm16_clips():
    out = np.frombuffer(pcm16(np.asarray([2., -2., 0.])), '<i2')
    assert list(out) == [32767, -32767, 0]


# -- fake-engine semantics -----------------------------------------------------

class FakeRequest:
    _next = iter(range(10 ** 6))

    def __init__(self, inputs, kwargs):
        self.inputs, self.kwargs = inputs, kwargs
        self.request_id = 'fake-{}'.format(next(self._next))
        self.result = AsyncResult()
        self.aborted = threading.Event()

    def abort(self):
        self.aborted.set()
        self.result.set_exception(RuntimeError('aborted'))


class FakeEngine:
    """Completes requests only when .release() is called."""

    def __init__(self):
        self.pending = []
        self.stats = {'requests': 0}

    def submit(self, inputs, ** kwargs):
        request = FakeRequest(inputs, kwargs)
        self.stats['requests'] += 1
        self.last_kwargs = kwargs
        self.pending.append(request)
        return request

    def release(self, audio = None):
        request = self.pending.pop(0)
        on_audio = request.kwargs.get('on_audio')
        audio = np.zeros(64, np.float32) if audio is None else audio
        if on_audio is not None:
            on_audio(audio[:32])
            on_audio(audio[32:])
        request.result.set_result({'audio': audio, 'rate': 8000})


@pytest.fixture
def fake_server():
    engine = FakeEngine()
    server = TTSServer(engine, rate = 8000, port = 0, timeout = 20.)
    with server:
        host, port = server._httpd.server_address[:2]
        yield engine, server, http.client.HTTPConnection(host, port, timeout = 20)


def _post(conn, path, payload):
    conn.request('POST', path, body = json.dumps(payload),
                 headers = {'Content-Type': 'application/json'})
    return conn.getresponse()


def test_health_and_stats(fake_server):
    engine, server, conn = fake_server
    conn.request('GET', '/health')
    resp = conn.getresponse()
    assert resp.status == 200
    assert json.loads(resp.read())['status'] == 'ok'
    conn.request('GET', '/stats')
    resp = conn.getresponse()
    assert json.loads(resp.read())['requests'] == 0


def test_oneshot_roundtrip_fake(fake_server):
    engine, server, conn = fake_server
    audio = np.linspace(-0.5, 0.5, 64).astype(np.float32)
    done = threading.Thread(
        target = lambda: (_wait_pending(engine), engine.release(audio)))
    done.start()
    resp = _post(conn, '/tts', {'text': 'hello'})
    done.join()
    assert resp.status == 200
    assert resp.getheader('Content-Type') == 'audio/wav'
    assert resp.getheader('X-Request-Id', '').startswith('fake-')
    rate, _, _, _, pcm = parse_wav(resp.read())
    assert rate == 8000
    assert np.allclose(pcm / 32767., audio, atol = 2e-4)


def _wait_pending(engine, n = 1, timeout = 10.):
    deadline = time.time() + timeout
    while len(engine.pending) < n:
        assert time.time() < deadline, 'request never reached the engine'
        time.sleep(0.005)


def test_missing_text_is_400(fake_server):
    _, _, conn = fake_server
    assert _post(conn, '/tts', {}).status == 400


def test_unknown_path_404(fake_server):
    _, _, conn = fake_server
    assert _post(conn, '/nope', {'text': 'x'}).status == 404


def test_abort_queued_request(fake_server):
    engine, server, conn = fake_server
    request = server.submit('queued text')
    conn.request('DELETE', '/requests/{}'.format(request.request_id))
    resp = conn.getresponse()
    assert resp.status == 200
    resp.read()                      # keep-alive: drain before reusing
    assert request.aborted.is_set()
    with pytest.raises(RuntimeError):
        request.result.get(timeout = 1)
    # second abort: already finished -> 404
    conn.request('DELETE', '/requests/{}'.format(request.request_id))
    resp = conn.getresponse()
    assert resp.status == 404
    resp.read()
    engine.pending.clear()


def test_abort_unknown_request_404(fake_server):
    _, _, conn = fake_server
    conn.request('DELETE', '/requests/nope')
    assert conn.getresponse().status == 404


def test_streaming_chunks_fake(fake_server):
    engine, server, conn = fake_server
    audio = np.linspace(-0.25, 0.25, 64).astype(np.float32)
    done = threading.Thread(
        target = lambda: (_wait_pending(engine), engine.release(audio)))
    done.start()
    resp = _post(conn, '/tts?stream=1', {'text': 'hello'})
    done.join()
    assert resp.status == 200
    assert resp.getheader('Transfer-Encoding') == 'chunked'
    data = resp.read()                      # http.client reassembles chunks
    rate, _, _, size, pcm = parse_wav(data)
    assert rate == 8000 and size > 2 ** 31  # streaming header
    assert np.allclose(pcm / 32767., audio, atol = 2e-4)


def test_keep_alive_survives_404_with_body(fake_server):
    """An unknown-path POST must drain its body, or the next request on
    the same keep-alive connection parses the leftover bytes as a request
    line (desync)."""
    _, _, conn = fake_server
    resp = _post(conn, '/nope', {'text': 'a body that must be drained'})
    assert resp.status == 404
    resp.read()
    conn.request('GET', '/health')           # same connection
    resp = conn.getresponse()
    assert resp.status == 200
    assert json.loads(resp.read())['status'] == 'ok'


def test_stream_query_is_parsed_not_substring_matched(fake_server):
    """?upstream=1 / ?stream=0 are oneshot; only a truthy 'stream' key
    streams.  The 'stream' body key must not leak into engine kwargs."""
    engine, server, conn = fake_server
    for path in ('/tts?upstream=1', '/tts?stream=0'):
        done = threading.Thread(
            target = lambda: (_wait_pending(engine), engine.release()))
        done.start()
        resp = _post(conn, path, {'text': 'hello'})
        done.join()
        assert resp.status == 200
        assert resp.getheader('Transfer-Encoding') is None
        assert 'stream' not in engine.last_kwargs
        assert 'on_audio' not in engine.last_kwargs
        resp.read()
    done = threading.Thread(
        target = lambda: (_wait_pending(engine), engine.release()))
    done.start()
    resp = _post(conn, '/tts?stream=1', {'text': 'hi', 'stream': 1})
    done.join()
    assert resp.getheader('Transfer-Encoding') == 'chunked'
    assert 'stream' not in engine.last_kwargs   # popped, not forwarded
    assert 'on_audio' in engine.last_kwargs
    resp.read()


def test_failed_stream_truncates_without_inline_500(fake_server):
    """A request failing mid-stream must truncate the chunked body (no
    terminating chunk, connection closed) — NOT write a 500 response into
    the middle of it."""
    engine, server, conn = fake_server

    def fail():
        _wait_pending(engine)
        request = engine.pending.pop(0)
        request.result.set_exception(RuntimeError('decode failed'))

    t = threading.Thread(target = fail)
    t.start()
    resp = _post(conn, '/tts?stream=1', {'text': 'hello'})
    t.join()
    assert resp.status == 200                   # headers were already out
    with pytest.raises(http.client.IncompleteRead) as exc:
        resp.read()
    got = exc.value.partial
    assert b'HTTP/1.1 500' not in got and b'error' not in got


def test_oneshot_timeout_aborts_engine_request():
    """A request that exceeds the server timeout returns 500 AND aborts
    engine-side so the slot frees (no orphaned decode)."""
    engine = FakeEngine()
    server = TTSServer(engine, rate = 8000, port = 0, timeout = 0.2)
    with server:
        host, port = server._httpd.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout = 20)
        resp = _post(conn, '/tts', {'text': 'never finishes'})
        assert resp.status == 500
        resp.read()
        assert engine.pending[0].aborted.is_set()
        engine.pending.clear()


def test_client_disconnect_aborts_stream():
    """A streaming client dropping the socket mid-utterance aborts the
    engine request at the next emitted chunk (frees the TPU slot)."""
    engine = FakeEngine()
    server = TTSServer(engine, rate = 8000, port = 0, timeout = 20.)
    with server:
        host, port = server._httpd.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout = 20)
        conn.request('POST', '/tts?stream=1',
                     body = json.dumps({'text': 'long utterance'}),
                     headers = {'Content-Type': 'application/json'})
        _wait_pending(engine)
        request = engine.pending[0]
        conn.close()                           # client gives up
        # keep emitting chunks (result NOT set): the handler's writes hit
        # the dead socket and it must abort the request
        deadline = time.time() + 10
        while not request.aborted.is_set():
            assert time.time() < deadline, 'disconnect never aborted'
            on_audio = request.kwargs.get('on_audio')
            on_audio(np.zeros(32, np.float32))
            time.sleep(0.02)
        engine.pending.clear()


# -- real model over real sockets ---------------------------------------------

@pytest.fixture
def vits_server(tmp_path, monkeypatch):
    monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
    reset_instances()
    from text_to_speech_tpu.models.tts import VITS
    from text_to_speech_tpu.ops.stft import TacotronSTFT
    from text_to_speech_tpu.runtimes.serving import (
        ContinuousServingEngine, make_vits_stepper)
    mel_fn = TacotronSTFT(sampling_rate = 8000, hop_length = 8,
                          filter_length = 16, win_length = 16)
    model = VITS(lang = 'en', name = 'http_vits', mel_fn = mel_fn,
                 ** TINY_VITS)
    engine = ContinuousServingEngine(
        * make_vits_stepper(model, window = 16, context = 4,
                            token_multiple = 8, min_duration = 2),
        max_batch_size = 2)
    server = TTSServer(engine, rate = model.rate, port = 0, timeout = 120.)
    with server:
        host, port = server._httpd.server_address[:2]
        yield model, http.client.HTTPConnection(host, port, timeout = 120)
    reset_instances()


def test_serve_facade(tmp_path, monkeypatch):
    """`text_to_speech_tpu.serve(model=..., block=False)` resolves the
    model, builds the right stepper and returns a live server."""
    monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
    reset_instances()
    from text_to_speech_tpu.models.tts import VITS, serve
    from text_to_speech_tpu.ops.stft import TacotronSTFT
    mel_fn = TacotronSTFT(sampling_rate = 8000, hop_length = 8,
                          filter_length = 16, win_length = 16)
    model = VITS(lang = 'en', name = 'serve_vits', mel_fn = mel_fn,
                 ** TINY_VITS)
    server = serve(model = model, port = 0, block = False, window = 16,
                   context = 4, token_multiple = 8, min_duration = 2)
    try:
        host, port = server._httpd.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout = 120)
        resp = _post(conn, '/tts', {'text': 'served'})
        assert resp.status == 200
        rate, _, _, _, pcm = parse_wav(resp.read())
        assert rate == model.rate and len(pcm) > 0
    finally:
        server.stop()
        reset_instances()


def test_vits_over_http(vits_server):
    model, conn = vits_server
    resp = _post(conn, '/tts', {'text': 'hello world'})
    assert resp.status == 200
    rate, bits, _, _, pcm = parse_wav(resp.read())
    assert rate == model.rate and bits == 16
    assert len(pcm) >= model.arch.upsample_rate  # >= 1 frame of audio
    # streaming endpoint over the same live engine
    resp = _post(conn, '/tts?stream=1', {'text': 'hello there'})
    assert resp.status == 200
    _, _, _, size, pcm_s = parse_wav(resp.read())
    assert size > 2 ** 31 and len(pcm_s) >= model.arch.upsample_rate
