"""Multiprocessing pipeline wrapper.

Capability parity with ``/root/reference/utils/threading/process.py:70``
(`Process` abstraction with result-handler + finalizer threads and priority
buffering): run a function over inputs in a separate OS process — for
CPU-heavy host work (dataset preprocessing) that must not block the GIL of
the dispatch thread.
"""

import logging
import threading
import multiprocessing as mp

from .stream import AsyncResult

logger = logging.getLogger(__name__)

_STOP = '__process_stop__'


def _worker_main(fn, in_queue, out_queue):
    while True:
        item = in_queue.get()
        if item == _STOP:
            break
        task_id, args, kwargs = item
        try:
            out_queue.put((task_id, 'ok', fn(* args, ** kwargs)))
        except Exception as e:      # pragma: no cover - crosses process boundary
            out_queue.put((task_id, 'err', repr(e)))
    out_queue.put((None, 'done', None))


class Process:
    """Persistent worker process: ``submit`` returns an `AsyncResult`;
    ``map`` preserves order.  Results are drained by a handler thread."""

    def __init__(self, fn, *, start_method = None, daemon = True):
        self.fn = fn
        ctx = mp.get_context(start_method) if start_method else mp
        self._in = ctx.Queue()
        self._out = ctx.Queue()
        self._proc = ctx.Process(
            target = _worker_main, args = (fn, self._in, self._out),
            daemon = daemon,
        )
        self._results = {}
        self._lock = threading.Lock()
        self._counter = 0
        self._started = False
        self._handler = None

    def start(self):
        if self._started: return self
        self._proc.start()
        self._handler = threading.Thread(target = self._drain, daemon = True)
        self._handler.start()
        self._started = True
        return self

    def _drain(self):
        while True:
            task_id, status, payload = self._out.get()
            if status == 'done':
                break
            with self._lock:
                result = self._results.pop(task_id, None)
            if result is None: continue
            if status == 'ok':
                result.set_result(payload)
            else:
                result.set_exception(RuntimeError(payload))

    def submit(self, * args, ** kwargs):
        if not self._started: self.start()
        result = AsyncResult()
        with self._lock:
            task_id = self._counter
            self._counter += 1
            self._results[task_id] = result
        self._in.put((task_id, args, kwargs))
        return result

    def map(self, items, timeout = None):
        futures = [self.submit(item) for item in items]
        return [f.get(timeout = timeout) for f in futures]

    def __call__(self, * args, ** kwargs):
        return self.submit(* args, ** kwargs)

    def stop(self, join = True):
        if not self._started: return
        self._in.put(_STOP)
        if join:
            self._proc.join(timeout = 10)
            if self._proc.is_alive():
                self._proc.terminate()
        self._started = False

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
