"""Batched streaming inference server (host-side request engine).

Capability parity with the TRT-LLM runner surface the reference wraps
(``/root/reference/utils/keras/runtimes/custom_model_runner_cpp.py:26-40``,
``tensorrt_llm_runtime.py:36``): request queue, dynamic batching into the
compiled model, per-request streaming callbacks, request IDs and abort.

The device work is the framework's jitted functions; this engine packs
concurrent requests into padded batches (one jit bucket) so the chip stays
saturated while requests arrive asynchronously.
"""

import time
import logging
import threading
import itertools
import queue as _queue

import numpy as np

from ..utils.stream import AsyncResult
from ..utils.sequence_utils import pad_batch

logger = logging.getLogger(__name__)


class InferenceRequest:
    _ids = itertools.count()

    def __init__(self, inputs, *, callback = None, ** kwargs):
        self.request_id = next(InferenceRequest._ids)
        self.inputs = inputs
        self.callback = callback
        self.kwargs = kwargs
        self.result = AsyncResult()
        self.aborted = threading.Event()

    def abort(self):
        self.aborted.set()


class ServingEngine:
    """Dynamic-batching engine around a ``batch_fn``.

    ``batch_fn(list_of_inputs, **kwargs) -> list_of_outputs`` — typically a
    closure over a task model's `compiled_infer` with padded batching.

    - requests accumulate up to `max_batch_size` or `max_wait_ms`;
    - per-request callbacks stream results as they complete;
    - `submit` returns the request (with an AsyncResult); `abort()`able while
      queued.
    """

    def __init__(self, batch_fn, *, max_batch_size = 8, max_wait_ms = 10.,
                 name = 'serving'):
        self.batch_fn = batch_fn
        self.max_batch_size = max_batch_size
        self.max_wait_ms = max_wait_ms
        self.name = name
        self._queue = _queue.Queue()
        self._thread = None
        self._running = threading.Event()
        self.stats = {'requests': 0, 'batches': 0, 'aborted': 0}

    # -- lifecycle -------------------------------------------------------------

    def start(self):
        if self._running.is_set(): return self
        self._running.set()
        self._thread = threading.Thread(target = self._loop, daemon = True,
                                        name = self.name)
        self._thread.start()
        return self

    def stop(self):
        self._running.clear()
        if self._thread:
            self._thread.join(timeout = 10)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- API -------------------------------------------------------------------

    def submit(self, inputs, *, callback = None, ** kwargs):
        request = InferenceRequest(inputs, callback = callback, ** kwargs)
        self.stats['requests'] += 1
        self._queue.put(request)
        return request

    def infer(self, inputs, *, timeout = None, ** kwargs):
        """Blocking convenience wrapper."""
        return self.submit(inputs, ** kwargs).result.get(timeout = timeout)

    # -- engine loop -----------------------------------------------------------

    def _collect_batch(self):
        try:
            first = self._queue.get(timeout = 0.1)
        except _queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_ms / 1000.
        while len(batch) < self.max_batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0: break
            try:
                batch.append(self._queue.get(timeout = remaining))
            except _queue.Empty:
                break
        return batch

    def _loop(self):
        while self._running.is_set():
            batch = self._collect_batch()
            if not batch: continue
            live = []
            for request in batch:
                if request.aborted.is_set():
                    self.stats['aborted'] += 1
                    request.result.set_exception(
                        RuntimeError('request {} aborted'.format(request.request_id)))
                else:
                    live.append(request)
            if not live: continue

            self.stats['batches'] += 1
            try:
                outputs = self.batch_fn([r.inputs for r in live])
            except Exception as e:
                logger.exception('batch_fn failed')
                for request in live:
                    request.result.set_exception(e)
                continue

            for request, output in zip(live, outputs):
                if request.callback is not None:
                    try:
                        request.callback(output, request.request_id)
                    except Exception:
                        logger.exception('request callback failed')
                request.result.set_result(output)


def make_tts_batch_fn(model, *, vocoder = None, ** infer_kwargs):
    """batch_fn for a `Tacotron2` task model: encodes the texts, pads into
    one token batch, runs ONE compiled AR decode, optionally vocodes, and
    splits per-request outputs."""

    def batch_fn(texts):
        encoded = [model.encode_text(t) for t in texts]
        tokens = pad_batch(encoded, pad_value = model.blank_token_idx)
        outputs = model.compiled_infer(tokens, ** infer_kwargs)
        results = []
        for i in range(len(texts)):
            length = max(1, int(outputs.lengths[i]))
            mel = np.asarray(outputs.mel[i, :length])
            result = {'text': texts[i], 'mel': mel}
            if vocoder is not None:
                audio = np.asarray(vocoder(mel, ** infer_kwargs))
                result['audio'] = audio[0] if audio.ndim == 2 else audio
                result['rate'] = model.rate
            results.append(result)
        return results

    return batch_fn
