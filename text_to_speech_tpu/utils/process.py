"""Multiprocessing pipeline wrapper.

Capability parity with ``/root/reference/utils/threading/process.py``
(`Process` abstraction :70 with result-handler + finalizer threads and
fifo/lifo/priority buffering :329, `run_in_thread` decorator :40): run a
function over inputs in a separate OS process — for CPU-heavy host work
(dataset preprocessing) that must not block the GIL of the dispatch thread.
"""

import queue
import logging
import functools
import threading
import multiprocessing as mp

from .stream import AsyncResult

logger = logging.getLogger(__name__)

_STOP = '__process_stop__'


def run_in_thread(fn = None, *, name = None, callback = None, daemon = True):
    """Decorator: calling the function starts it on a new thread and
    returns an `AsyncResult` immediately; `callback(result)` fires on
    completion."""
    if fn is None:
        return functools.partial(run_in_thread, name = name,
                                 callback = callback, daemon = daemon)

    @functools.wraps(fn)
    def inner(* args, ** kwargs):
        result = AsyncResult()

        def run():
            try:
                out = fn(* args, ** kwargs)
            except Exception as e:
                result.set_exception(e)
                return
            result.set_result(out)
            # callback failures must not turn the stored success into an error
            if callback is not None:
                try:
                    callback(out)
                except Exception:
                    logger.exception('run_in_thread callback failed')

        threading.Thread(target = run, daemon = daemon,
                         name = name or fn.__name__).start()
        return result

    return inner


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
    ``map`` preserves order.  Results are drained by a handler thread.

    `buffer` selects the admission order when the worker is busy:
    'fifo' (default) feeds the process directly; 'priority' routes
    submissions through a host-side priority buffer drained by a
    dispatcher thread, so a high-priority task submitted late overtakes
    queued low-priority work (lower `priority` value = served first).
    Per-task `callback`s fire from the result-handler thread; a
    `finalizer` runs once after the worker stops.
    """

    def __init__(self, fn, *, start_method = None, daemon = True,
                 buffer = 'fifo', finalizer = None):
        self.fn = fn
        ctx = mp.get_context(start_method) if start_method else mp
        # priority mode bounds the process queue to ONE queued item: the
        # dispatcher blocks on put(), so ordering decisions are made from
        # the host-side priority buffer as late as possible (a late
        # high-priority task overtakes everything not yet handed over)
        self._in = ctx.Queue(maxsize = 1 if buffer == 'priority' else 0)
        self._out = ctx.Queue()
        self._proc = ctx.Process(
            target = _worker_main, args = (fn, self._in, self._out),
            daemon = daemon,
        )
        self.buffer_type = buffer
        self.finalizer = finalizer
        self._buffer = queue.PriorityQueue() if buffer == 'priority' else None
        self._dispatcher = None
        self._results = {}
        self._callbacks = {}
        self._lock = threading.Lock()
        self._counter = 0
        self._started = False
        self._handler = None

    def start(self):
        if self._started: return self
        self._proc.start()
        self._handler = threading.Thread(target = self._drain, daemon = True)
        self._handler.start()
        if self._buffer is not None:
            self._dispatcher = threading.Thread(
                target = self._dispatch, daemon = True)
            self._dispatcher.start()
        self._started = True
        return self

    def _dispatch(self):
        """Priority-buffer → process queue, one in flight at a time so
        ordering decisions happen as late as possible."""
        while True:
            _, _, item = self._buffer.get()
            self._in.put(item)
            if item == _STOP:
                return

    def _drain(self):
        while True:
            task_id, status, payload = self._out.get()
            if status == 'done':
                break
            with self._lock:
                result = self._results.pop(task_id, None)
                callback = self._callbacks.pop(task_id, None)
            if result is None: continue
            if status == 'ok':
                result.set_result(payload)
                if callback is not None:
                    try:
                        callback(payload)
                    except Exception:
                        logger.exception('result callback failed')
            else:
                result.set_exception(RuntimeError(payload))
        if self.finalizer is not None:
            try:
                self.finalizer()
            except Exception:
                logger.exception('finalizer failed')

    def submit(self, * args, priority = 0, callback = None, ** kwargs):
        if not self._started: self.start()
        result = AsyncResult()
        with self._lock:
            task_id = self._counter
            self._counter += 1
            self._results[task_id] = result
            if callback is not None:
                self._callbacks[task_id] = callback
        item = (task_id, args, kwargs)
        if self._buffer is not None:
            self._buffer.put((priority, task_id, item))
        else:
            self._in.put(item)
        return result

    def map(self, items, timeout = None):
        futures = [self.submit(item) for item in items]
        return [f.get(timeout = timeout) for f in futures]

    def map_async(self, items, *, priority = 0, callback = None):
        """Submit all items; returns the list of `AsyncResult`s without
        blocking.  `callback` fires per completed item."""
        return [self.submit(item, priority = priority, callback = callback)
                for item in items]

    def clear(self):
        """Drop not-yet-dispatched buffered work (priority buffer only);
        their AsyncResults get a CancelledError-style exception."""
        if self._buffer is None:
            return 0
        dropped = 0
        while True:
            try:
                _, task_id, _ = self._buffer.get_nowait()
            except queue.Empty:
                break
            with self._lock:
                result = self._results.pop(task_id, None)
                self._callbacks.pop(task_id, None)
            if result is not None:
                result.set_exception(RuntimeError('cancelled'))
                dropped += 1
        return dropped

    def is_alive(self):
        return self._started and self._proc.is_alive()

    def __call__(self, * args, ** kwargs):
        return self.submit(* args, ** kwargs)

    def __repr__(self):
        return '<Process fn={} buffer={} alive={}>'.format(
            getattr(self.fn, '__name__', self.fn), self.buffer_type,
            self.is_alive())

    def stop(self, join = True):
        if not self._started: return
        if self._buffer is not None:
            self._buffer.put((float('inf'), -1, _STOP))
        else:
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
