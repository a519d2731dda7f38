"""Cross-process streaming request router.

Capability parity with ``/root/reference/utils/threading/stream_request_manager.py``
(`StreamRequestManager:23`, `ParentRequestManager:65`, `ChildRequestManager:112`):
a parent process opens logical *requests*, a child (worker) process streams
results tagged with the request id, and the parent routes each message into
that request's own buffer.  Control flows the other way: the parent can
abort or finalize a request mid-stream and the child observes it between
items — the host-side counterpart of the serving engine's in-flight request
admission/abort.

Messages are plain dicts ``{'id', 'type': 'output'|'status'|'action',
'content'}`` over a ``multiprocessing.Pipe`` (works across `fork`/`spawn`
processes and equally between threads of one process).
"""

import queue
import logging
import threading
import multiprocessing

logger = logging.getLogger(__name__)

#: end-of-stream sentinel placed in a request's buffer when it finishes
END_OF_STREAM = object()


def StreamRequestManager():
    """→ (parent, child) manager pair sharing a fresh duplex pipe."""
    parent_pipe, child_pipe = multiprocessing.Pipe()
    return ParentRequestManager(parent_pipe), ChildRequestManager(child_pipe)


class _PipeEnd:
    """Shared send-side locking + message helpers for both ends."""

    def __init__(self, pipe):
        self.pipe = pipe
        self._send_lock = threading.Lock()
        self._lock = threading.Lock()
        self._stopped = False

    def _send(self, request_id, mtype, content):
        with self._send_lock:
            self.pipe.send({'id': request_id, 'type': mtype, 'content': content})

    def stop(self):
        """Stop the background router thread (next message is dropped)."""
        self._stopped = True


class ParentRequestManager(_PipeEnd):
    """Consumer side: opens requests and reads their per-request buffers."""

    def __init__(self, pipe):
        super().__init__(pipe)
        self._buffers = {}
        self._finished = set()
        self._next_id = 0
        self._router = threading.Thread(target = self._route, daemon = True)
        self._router.start()

    def open_request(self, request_id = None):
        """Register a new stream → (request_id, buffer `queue.Queue`).

        The buffer receives each streamed item, then `END_OF_STREAM`.
        Re-opening an id that is still active raises.
        """
        with self._lock:
            if request_id is None:
                while self._next_id in self._buffers:
                    self._next_id += 1
                request_id = self._next_id
                self._next_id += 1
            elif request_id in self._buffers:
                raise ValueError('request {!r} is still active'.format(request_id))
            buffer = self._buffers[request_id] = queue.Queue()
        self._send(request_id, 'action', 'init')
        return request_id, buffer

    # reference-surface alias
    init_request = open_request

    def abort_request(self, request_id):
        """Ask the child to stop the request and end its stream locally —
        `results(request_id)` terminates even if the producer never
        acknowledges (its trailing outputs are dropped)."""
        self._send(request_id, 'action', 'stop')
        with self._lock:
            buffer = self._buffers.get(request_id)
            if buffer is not None and request_id not in self._finished:
                self._finished.add(request_id)
                buffer.put(END_OF_STREAM)

    def finalize_request(self, request_id):
        self._send(request_id, 'action', 'finalize')

    def results(self, request_id, timeout = None):
        """Generator over a request's streamed items until end-of-stream.
        Consuming the end-of-stream releases the request's buffer."""
        with self._lock:
            buffer = self._buffers.get(request_id)
        if buffer is None:
            return
        while True:
            item = buffer.get(timeout = timeout)
            if item is END_OF_STREAM:
                self.close_request(request_id)
                return
            yield item

    def close_request(self, request_id):
        """Drop a request's buffer (called automatically by `results`)."""
        with self._lock:
            self._buffers.pop(request_id, None)
            self._finished.discard(request_id)

    def _route(self):
        while not self._stopped:
            try:
                msg = self.pipe.recv()
            except (EOFError, OSError):
                return
            with self._lock:
                buffer = self._buffers.get(msg['id'])
                finished = msg['id'] in self._finished
            if finished:        # trailing output after a local abort — expected
                continue
            if buffer is None:
                logger.error('message for inactive request %s: %s', msg['id'], msg)
                continue
            if msg['type'] == 'status' and msg['content'] == 'finished':
                with self._lock:
                    self._finished.add(msg['id'])
                buffer.put(END_OF_STREAM)
            elif msg['type'] == 'output':
                buffer.put(msg['content'])


class ChildRequestManager(_PipeEnd):
    """Producer side: streams outputs and observes abort/finalize actions."""

    def __init__(self, pipe):
        super().__init__(pipe)
        self._stopped_ids = set()
        self._events = {}
        self._watcher = threading.Thread(target = self._watch, daemon = True)
        self._watcher.start()

    def __call__(self, content, request_id):
        """Stream one item to the parent → True while the request is active."""
        if request_id not in self._events:
            logger.error('request %s was never initialized by the parent',
                         request_id)
        self._send(request_id, 'output', content)
        return self.is_active(request_id)

    send_result = __call__

    def is_stopped(self, request_id):
        with self._lock:
            return request_id in self._stopped_ids

    def is_active(self, request_id):
        return not self.is_stopped(request_id)

    def finalize(self, request_id):
        """Signal end-of-stream for the request → True unless it was aborted."""
        self._send(request_id, 'status', 'finished')
        with self._lock:
            self._events.pop(request_id, None)
            return request_id not in self._stopped_ids

    def wait_finalize(self, request_id, timeout = None):
        """Block until the parent stops or finalizes the request → True if
        finalized, False if aborted or the wait timed out.  Safe to call
        before the parent's 'init' action arrives (the event is created
        eagerly on either side)."""
        with self._lock:
            event = self._events.setdefault(request_id, threading.Event())
        signaled = event.wait(timeout)
        return signaled and not self.is_stopped(request_id)

    def _watch(self):
        while not self._stopped:
            try:
                msg = self.pipe.recv()
            except (EOFError, OSError):
                return
            if msg['type'] != 'action':
                continue
            with self._lock:
                if msg['content'] == 'init':
                    self._events.setdefault(msg['id'], threading.Event())
                elif msg['id'] not in self._events:
                    logger.error('action for finalized request %s: %s',
                                 msg['id'], msg)
                elif msg['content'] == 'stop':
                    self._stopped_ids.add(msg['id'])
                    self._events[msg['id']].set()
                elif msg['content'] == 'finalize':
                    self._events[msg['id']].set()
