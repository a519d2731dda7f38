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

import numpy as np

from ..utils.stream import AsyncResult
from ..utils.sequence_utils import pad_batch
from ..native.scheduler import RequestScheduler

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
        self._on_abort = None

    def abort(self):
        self.aborted.set()
        if self._on_abort is not None:
            self._on_abort(self)


class _SchedulerMixin:
    """Shared request bookkeeping over the C++ `RequestScheduler`
    (`native/serving_native.cpp`; Python fallback with identical
    semantics).  Queue order, the dynamic-batching window, priorities,
    queued-abort and latency accounting run native-side; the id→request
    map stays here."""

    def _init_scheduler(self, force_python = False):
        self._sched = RequestScheduler(force_python = force_python)
        self._pending = {}                  # scheduler id -> request
        self._pending_cv = threading.Condition()

    def _enqueue(self, request, priority = 0):
        rid = self._sched.submit(priority)
        request.request_id = rid
        with self._pending_cv:
            self._pending[rid] = request
            self._pending_cv.notify_all()
        request._on_abort = self._abort_queued
        return request

    def _abort_queued(self, request):
        """Queued requests are removed scheduler-side and failed now; a
        collected request is handled by the engine loop."""
        if self._sched.abort(request.request_id):
            with self._pending_cv:
                self._pending.pop(request.request_id, None)
            self.stats['aborted'] += 1
            request.result.set_exception(
                RuntimeError('request {} aborted'.format(request.request_id)))

    def _resolve(self, ids):
        """id -> request.  A collected id may briefly precede its map entry
        (submit() makes the id collectable before the submitting thread
        registers the payload), so missing ids are awaited — the entry is
        guaranteed to arrive because only queued requests can be aborted."""
        out = []
        with self._pending_cv:
            for rid in ids:
                if self._pending_cv.wait_for(
                        lambda: rid in self._pending, timeout = 5.):
                    out.append(self._pending.pop(rid))
                else:                       # defensive: never expected
                    logger.error('collected id %s has no pending request', rid)
        return out

    def _finish(self, request, output = None, error = None):
        """Terminal bookkeeping for a COLLECTED request: latency stamp on
        every path (success, failure, late abort), then resolve the
        AsyncResult.  Idempotent: a second call (e.g. the async-finish
        guard error-finishing a batch whose leading rows already resolved)
        is a no-op, so a mid-batch failure never double-completes."""
        if request.result.done():
            return
        self._sched.complete(request.request_id)
        if error is not None:
            request.result.set_exception(error)
        else:
            request.result.set_result(output)

    @property
    def scheduler_stats(self):
        """Native-side counters: mean queue wait / end-to-end latency."""
        return self._sched.stats


class ServingEngine(_SchedulerMixin):
    """Dynamic-batching engine around a ``batch_fn``.

    ``batch_fn(list_of_inputs, **kwargs) -> list_of_outputs`` — typically a
    closure over a task model's `compiled_infer` with padded batching.

    - requests accumulate up to `max_batch_size` or `max_wait_ms` (the
      window is kept by the C++ scheduler core);
    - higher-``priority`` requests dequeue first (FIFO within a priority);
    - per-request callbacks stream results as they complete;
    - `submit` returns the request (with an AsyncResult); `abort()`able while
      queued.
    """

    def __init__(self, batch_fn, *, max_batch_size = 8, max_wait_ms = 10.,
                 name = 'serving', native_scheduler = True):
        self.batch_fn = batch_fn
        self.max_batch_size = max_batch_size
        self.max_wait_ms = max_wait_ms
        self.name = name
        self._init_scheduler(force_python = not native_scheduler)
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
        self._sched.wake()
        if self._thread:
            self._thread.join(timeout = 10)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- API -------------------------------------------------------------------

    def submit(self, inputs, *, callback = None, priority = 0, ** kwargs):
        request = InferenceRequest(inputs, callback = callback, ** kwargs)
        self.stats['requests'] += 1
        return self._enqueue(request, priority)

    def infer(self, inputs, *, timeout = None, ** kwargs):
        """Blocking convenience wrapper."""
        return self.submit(inputs, ** kwargs).result.get(timeout = timeout)

    def warmup(self, sample_inputs, *, batch_sizes = None):
        """Precompile `batch_fn` at representative batch sizes (default:
        pow2 buckets up to `max_batch_size`) before accepting traffic, so
        the first live requests do not pay XLA compiles.  Call BEFORE
        `start()`.  Returns elapsed seconds."""
        if self._running.is_set():
            raise RuntimeError('warmup() must run before start()')
        if not isinstance(sample_inputs, (list, tuple)):
            sample_inputs = [sample_inputs]
        if batch_sizes is None:
            batch_sizes = _pow2_buckets(self.max_batch_size)
        t0 = time.perf_counter()
        for sample in sample_inputs:
            for b in batch_sizes:
                self.batch_fn([sample] * b)
        return time.perf_counter() - t0

    # -- engine loop -----------------------------------------------------------

    def _collect_batch(self):
        ids = self._sched.collect(self.max_batch_size, first_timeout = 0.1,
                                  batch_wait = self.max_wait_ms / 1000.)
        return self._resolve(ids)

    def _loop(self):
        while self._running.is_set():
            batch = self._collect_batch()
            if not batch: continue
            live = []
            for request in batch:
                if request.aborted.is_set():
                    self.stats['aborted'] += 1
                    self._finish(request, error = RuntimeError(
                        'request {} aborted'.format(request.request_id)))
                else:
                    live.append(request)
            if not live: continue

            self.stats['batches'] += 1
            try:
                # pad the batch to a pow2 bucket (duplicating one row) so
                # batch_fn only ever sees the shapes warmup() precompiled —
                # a raw size-3 batch would retrace XLA mid-traffic
                inputs = [r.inputs for r in live]
                inputs += [inputs[0]] * (_pow2(len(inputs)) - len(inputs))
                outputs = self.batch_fn(inputs)
            except Exception as e:
                logger.exception('batch_fn failed')
                for request in live:
                    self._finish(request, error = e)
                continue

            for request, output in zip(live, outputs):
                if request.callback is not None:
                    try:
                        request.callback(output, request.request_id)
                    except Exception:
                        logger.exception('request callback failed')
                self._finish(request, output)


class ContinuousServingEngine(_SchedulerMixin):
    """In-flight (continuous) batching: the decode advances in bounded
    chunks, and NEW requests are admitted into free batch rows at every
    chunk boundary — a request submitted mid-decode does not wait for the
    whole prior batch to finish (the reference's TRT-LLM runner behavior,
    ``custom_model_runner_cpp.py:26-40``; plain `ServingEngine` only
    batches while queued).

    Contract (model-agnostic; see `make_tacotron_stepper` for the TTS one):
      - ``start_fn(inputs, **kwargs) -> state``  (admit: encode, init carry)
      - ``step_fn(states) -> (new_states, done_flags)``  (one chunk for the
        whole active batch)
      - ``finish_fn(state) -> output``  (collect result, e.g. postnet+vocode)

    Per-request wall-clock latency is recorded in ``stats['latencies']``
    (see docs/SERVING.md)."""

    def __init__(self, start_fn, step_fn, finish_fn = None, *,
                 max_batch_size = 8, name = 'serving-cb',
                 native_scheduler = True, async_admission = True,
                 async_finish = None, admit_ahead = None):
        self.start_fn = start_fn
        self.step_fn = step_fn
        self.finish_fn = finish_fn or (lambda state: state)
        self.max_batch_size = max_batch_size
        # admission PREFETCH: keep up to `admit_ahead` requests pre-admitted
        # (state built, latent stage done) BEYOND the batch, so a slot freed
        # by a completing row refills at the very next chunk boundary
        # instead of idling 1-2 chunks while the admission worker runs —
        # measured as the dominant occupancy loss at the 256-request
        # open-loop reading (0.757; every completion left its slot empty
        # for the admission latency).  Prefetched requests were already
        # dequeued, so a later higher-priority submit overtakes only the
        # still-queued tail — bounded priority inversion, the standard
        # continuous-batching trade.  0 disables (pre-r5 behavior).
        if admit_ahead is None:
            admit_ahead = max(1, max_batch_size // 2)
        self._admit_ahead = int(admit_ahead)
        # pacing: once the ready pool is non-empty and the batch can stay
        # full, top up only in bursts of >= half the prefetch depth — each
        # admission burst costs one latent launch on the same chip the
        # chunk loop runs on, so many 1-row top-ups steal more device time
        # than a few batched ones
        self._admit_burst = max(1, self._admit_ahead // 2)
        self.name = name
        self._init_scheduler(force_python = not native_scheduler)
        self._thread = None
        self._admit_pool = None
        self._finish_pool = None
        self._async_admission = bool(async_admission)
        # finish (postnet + vocode + fetch) on a worker thread, overlapped
        # with the decode loop: measured on the saturated AR engine the
        # serialized finish was 5.8 s of an 11.1 s run (52 %) — as large as
        # the decode itself.  None = auto: enabled when the stepper marks
        # its finish_fn thread-safe (`finish_fn.async_ok`; a finish that
        # shares mutable chunk state with step_fn, like the VITS stepper's
        # parked-fetch buffer, must NOT set it).
        self._async_finish = async_finish
        self._running = threading.Event()
        import collections
        # bounded: a long-running server must not grow per-request state.
        # step_s/admit_s/finish_s + rows_stepped expose the loop's time
        # split and batch occupancy for capacity planning
        # (benchmarks/serving_load.py --sweep).
        self.stats = {'requests': 0, 'chunks': 0, 'aborted': 0,
                      'step_s': 0., 'admit_s': 0., 'finish_s': 0.,
                      'rows_stepped': 0,
                      'latencies': collections.deque(maxlen = 10_000),
                      # (wall time, audio samples) per resolved request —
                      # the steady-state throughput protocol slices these
                      # events to exclude batch ramp/drain
                      # (benchmarks/serving_load.py)
                      'completions': collections.deque(maxlen = 10_000)}

    def start(self):
        if self._running.is_set(): return self
        self._running.set()
        if self._async_admission and self._admit_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            # ONE worker: admissions stay serialized with each other (the
            # stepper's latent stage shares device queues) but overlap the
            # loop thread's step_fn launches
            self._admit_pool = ThreadPoolExecutor(
                max_workers = 1, thread_name_prefix = self.name + '-admit')
        use_async_finish = self._async_finish
        if use_async_finish is None:
            use_async_finish = bool(getattr(self.finish_fn, 'async_ok',
                                            False))
        if use_async_finish and self._finish_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            # ONE worker: finishes stay ordered with each other but overlap
            # the loop thread's decode chunks
            self._finish_pool = ThreadPoolExecutor(
                max_workers = 1, thread_name_prefix = self.name + '-finish')
        self._thread = threading.Thread(target = self._loop, daemon = True,
                                        name = self.name)
        self._thread.start()
        return self

    def stop(self):
        self._running.clear()
        self._sched.wake()
        if self._thread:
            self._thread.join(timeout = 10)
            if self._thread.is_alive():
                # the loop thread outlived the timed join: tearing the pools
                # down now would race its next submit (RuntimeError on a
                # shut-down executor, unresolved request futures).  Leave the
                # pools up — the daemon thread still drains through them, and
                # _finish_completed falls back to sync finish if a submit
                # ever hits a closed pool.
                logger.warning('%s loop thread did not exit within 10s; '
                               'keeping worker pools alive', self.name)
                return
        if self._admit_pool is not None:
            self._admit_pool.shutdown(wait = True)
            self._admit_pool = None
        if self._finish_pool is not None:
            # drain queued finishes so every submitted request resolves
            self._finish_pool.shutdown(wait = True)
            self._finish_pool = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    def submit(self, inputs, *, callback = None, priority = 0, ** kwargs):
        request = InferenceRequest(inputs, callback = callback, ** kwargs)
        request.submitted_at = time.perf_counter()
        self.stats['requests'] += 1
        return self._enqueue(request, priority)

    def infer(self, inputs, *, timeout = None, ** kwargs):
        return self.submit(inputs, ** kwargs).result.get(timeout = timeout)

    def warmup(self, sample_inputs, *, batch_sizes = None, max_chunks = 1000,
               ** kwargs):
        """Precompile the chunk programs before accepting traffic: traces
        `start_fn`/`step_fn` at every pow2 active-batch bucket (and
        `finish_fn` once per bucket), so the first live requests do not pay
        XLA compiles — measured cold, the first load run's p99 latency was
        2.6x the warm one (benchmarks/serving_load.py, 1xv5e).

        Call BEFORE `start()`.  `sample_inputs` should cover the
        input-length buckets expected live (e.g. a short and a long text —
        the steppers pad tokens to `token_multiple`, so each distinct
        padded length is its own program).  Each bucket's batch runs to
        completion (no extra compiles, keeps the stepper's device caches
        clean).  Returns elapsed seconds."""
        if self._running.is_set():
            raise RuntimeError('warmup() must run before start()')
        if not isinstance(sample_inputs, (list, tuple)):
            sample_inputs = [sample_inputs]
        if batch_sizes is None:
            batch_sizes = _pow2_buckets(self.max_batch_size)
        start_many = getattr(self.start_fn, 'start_many', None)
        finish_many = getattr(self.finish_fn, 'finish_many', None)
        t0 = time.perf_counter()
        for sample in sample_inputs:
            for b in batch_sizes:
                if start_many is not None and b > 1:
                    # compiles the batched-admission bucket too
                    states = start_many([sample] * b, [kwargs] * b)
                else:
                    states = [self.start_fn(sample, ** kwargs)
                              for _ in range(b)]
                for _ in range(max_chunks):
                    states, done = self.step_fn(states)
                    if all(done):
                        break
                if finish_many is not None and b > 1:
                    # compiles the batched-finish bucket too
                    finish_many(states)
                else:
                    for st in states:
                        self.finish_fn(st)
        return time.perf_counter() - t0

    def _collect_live(self, free, block):
        """Pull up to `free` queued requests and drop already-aborted ones."""
        if block:
            ids = self._sched.collect(free, first_timeout = 0.05,
                                      batch_wait = 0.)
        else:
            ids = self._sched.collect_nowait(free)
        live = []
        for request in self._resolve(ids):
            if request.aborted.is_set():
                self.stats['aborted'] += 1
                self._finish(request, error = RuntimeError(
                    'request {} aborted'.format(request.request_id)))
                continue
            live.append(request)
        return live

    def _start_requests(self, live):
        """Admit a burst → [(request, state)] (failures resolved inline).

        Batched admission: one start_many launch for the whole burst when
        the stepper offers it (per-request start_fn serializes a device
        call + a blocking fetch per request — the dominant loop cost under
        load).  Requests with custom kwargs beyond the batchable ones keep
        the single path.  Runs on the admission worker thread when
        admissions overlap stepping (see `_loop`)."""
        start_many = getattr(self.start_fn, 'start_many', None)
        batchable_keys = getattr(self.start_fn, 'batchable_kwargs',
                                 ('on_audio',))
        batchable = [r for r in live
                     if set(r.kwargs) <= set(batchable_keys)] \
            if start_many is not None else []
        singles = [r for r in live if r not in batchable]

        admitted = []
        t0 = time.perf_counter()
        if len(batchable) > 1:
            try:
                states = start_many([r.inputs for r in batchable],
                                    [r.kwargs for r in batchable])
                if len(states) != len(batchable):
                    # zip() would silently drop the tail request — it
                    # would then never resolve; treat as a failed batch
                    raise RuntimeError(
                        'start_many returned {} states for {} requests'
                        .format(len(states), len(batchable)))
                admitted.extend(zip(batchable, states))
                batchable = []
            except Exception:
                logger.exception('start_many failed; falling back to '
                                 'per-request admission')
        for request in batchable + singles:
            try:
                state = self.start_fn(request.inputs, ** request.kwargs)
            except Exception as e:
                logger.exception('start_fn failed')
                self._finish(request, error = e)
                continue
            admitted.append((request, state))
        self.stats['admit_s'] += time.perf_counter() - t0
        return admitted

    def _loop(self):
        slots = []          # [(request, state)] — the active batch rows
        ready = []          # pre-admitted rows awaiting a free slot
        # admissions OVERLAP stepping: while the device runs chunk k, the
        # admission worker prepares the next burst's states (the start_fn
        # device call + blocking fetch otherwise serializes ~1-2 tunnel
        # RTTs per burst INTO the chunk loop — measured as the largest
        # non-step loop cost under load, benchmarks/serving_load.py)
        inflight = None     # (future, n_requests) on the admission worker
        while self._running.is_set():
            if inflight is not None and inflight[0].done():
                ready.extend(inflight[0].result())
                inflight = None
            # freed slots refill INSTANTLY from the ready pool (the
            # admission latency was already paid, overlapped with earlier
            # chunks) — the occupancy lever admit_ahead exists for
            while ready and len(slots) < self.max_batch_size:
                slots.append(ready.pop(0))
            reserved = inflight[1] if inflight is not None else 0
            short = self.max_batch_size - len(slots) - len(ready) - reserved
            # cap a single burst at max_batch: start_many pads to pow2 row
            # buckets and warmup() compiles them only up to max_batch — an
            # uncapped first burst (batch + prefetch depth) hit a COLD
            # bucket-64 compile mid-traffic (measured: first 256-request
            # rep 51 vs 143 audio-s/s, tpu_session5)
            want = min(short + self._admit_ahead, self.max_batch_size)
            # admit when the batch cannot stay full without it (short > 0)
            # or a paced top-up burst is due (see _admit_burst)
            if inflight is None and want > 0 and (
                    short > 0 or not ready or want >= self._admit_burst):
                live = self._collect_live(want, block = not slots)
                if live:
                    if self._admit_pool is not None and slots:
                        inflight = (self._admit_pool.submit(
                            self._start_requests, live), len(live))
                    else:
                        ready.extend(self._start_requests(live))
                        while ready and len(slots) < self.max_batch_size:
                            slots.append(ready.pop(0))
            if not slots:
                if inflight is not None:
                    ready.extend(inflight[0].result())
                    inflight = None
                    while ready and len(slots) < self.max_batch_size:
                        slots.append(ready.pop(0))
                continue
            live = [(r, s) for r, s in slots if not r.aborted.is_set()]
            for request, _ in slots:
                if request.aborted.is_set():
                    self.stats['aborted'] += 1
                    self._finish(request, error = RuntimeError(
                        'request {} aborted'.format(request.request_id)))
            if not live:
                slots = []
                continue
            self.stats['chunks'] += 1
            self.stats['rows_stepped'] += len(live)
            t0 = time.perf_counter()
            try:
                states, done = self.step_fn([s for _, s in live])
            except Exception as e:
                logger.exception('step_fn failed')
                for request, _ in live:
                    self._finish(request, error = e)
                slots = []
                continue
            finally:
                dt = time.perf_counter() - t0
                self.stats['step_s'] += dt
                # per-pow2-row-bucket chunk cost — attributes the
                # wide-batch chunk regression directly instead of the
                # whole-run ms/chunk average mixing ramp and saturation
                bucket = _pow2(len(live))
                by = self.stats.setdefault('chunk_s_by_rows', {})
                n, total = by.get(bucket, (0, 0.))
                by[bucket] = (n + 1, total + dt)
            slots = []
            completed = []
            for (request, _), state, is_done in zip(live, states, done):
                if not is_done:
                    slots.append((request, state))
                else:
                    completed.append((request, state))
            if completed:
                self._finish_completed(completed)

        # shutdown: requests whose admission was still in flight (or parked
        # in the ready pool) must not hang their callers
        if inflight is not None:
            try:
                ready.extend(inflight[0].result(timeout = 30))
            except Exception:
                logger.exception('in-flight admission failed at shutdown')
        for request, _ in ready:
            self._finish(request, error = RuntimeError(
                'engine stopped during admission'))

    def _finish_completed(self, completed):
        if self._finish_pool is not None:
            try:
                self._finish_pool.submit(self._finish_guarded, completed)
                return
            except RuntimeError:
                # pool already shut down (stop() raced the loop's last
                # chunk) — resolve inline so no request future hangs
                pass
        self._finish_completed_sync(completed)

    def _finish_guarded(self, completed):
        """Worker-thread wrapper: an unexpected error must resolve every
        request (an unobserved future would hang the callers)."""
        try:
            self._finish_completed_sync(completed)
        except Exception as e:
            logger.exception('async finish failed')
            for request, _ in completed:
                self._finish(request, error = e)

    def _finish_completed_sync(self, completed):
        """Resolve this chunk's finished rows.  When several rows complete
        at the same boundary and the stepper offers
        ``finish_fn.finish_many``, ONE batched finish call serves them all
        (measured: per-request finish — postnet + vocode device calls,
        serialized in the loop thread — dominated the saturated AR-family
        loop at 9.9 s of a 17 s run); a wrong-length or failing batch falls
        back to per-request finishes."""
        finish_many = getattr(self.finish_fn, 'finish_many', None)
        t0 = time.perf_counter()
        outputs = None
        if finish_many is not None and len(completed) > 1:
            try:
                outputs = finish_many([s for _, s in completed])
                if len(outputs) != len(completed):
                    raise RuntimeError(
                        'finish_many returned {} outputs for {} states'
                        .format(len(outputs), len(completed)))
            except Exception:
                logger.exception('finish_many failed; falling back to '
                                 'per-request finish')
                outputs = None
        for i, (request, state) in enumerate(completed):
            if outputs is not None:
                output = outputs[i]
            else:
                try:
                    output = self.finish_fn(state)
                except Exception as e:
                    logger.exception('finish_fn failed')
                    self._finish(request, error = e)
                    continue
            now = time.perf_counter()
            self.stats['latencies'].append(
                now - getattr(request, 'submitted_at', now))
            audio = output.get('audio') if isinstance(output, dict) else None
            self.stats['completions'].append(
                (now, 0 if audio is None else len(audio)))
            if request.callback is not None:
                try:
                    request.callback(output, request.request_id)
                except Exception:
                    logger.exception('request callback failed')
            self._finish(request, output)
        self.stats['finish_s'] += time.perf_counter() - t0


def _pow2_buckets(max_batch_size):
    """[1, 2, 4, ..., pow2 ≥ max_batch_size] — the batch shapes the
    engines' compiled programs actually trace at (see `_pow2`; both the
    steppers and `ServingEngine._loop` pad collected batches to pow2, so
    a non-pow2 `max_batch_size` still rounds up)."""
    buckets, b = [], 1
    while b < max_batch_size:
        buckets.append(b)
        b <<= 1
    buckets.append(b)
    return buckets


def _bucket(n, n_data = 1):
    """Padded ACTIVE-BATCH size for `n` rows on a mesh whose data axes hold
    `n_data` devices: ``n_data * pow2(ceil(n / n_data))`` — pow2 bucketing
    per data shard, always divisible by `n_data` so every bucket shards
    evenly (``max(_pow2(n), n_data)`` is NOT divisible when the device
    count is not a power of two — e.g. 6 devices, 5 live rows → bucket 8 —
    and `jax.device_put` would raise mid-serving)."""
    return n_data * _pow2(max(1, -(-n // n_data)))


def _mesh_data_setup(mesh, params):
    """Shared serving-stepper mesh setup: ``(n_data, repl_sh, batch_sh,
    params_srv)`` — data-axis device count, replicated/batch shardings, and
    the replicated param copy (None placeholders when `mesh` is None)."""
    if mesh is None:
        return 1, None, None, None
    import jax
    from ..parallel import batch_sharding, data_axes, replicated
    axes = data_axes(mesh)
    if not axes:
        raise ValueError('mesh has no data axis (dp/dcn): %s' % (mesh,))
    n_data = int(np.prod([mesh.shape[a] for a in axes]))
    repl_sh = replicated(mesh)
    batch_sh = batch_sharding(mesh, axes if len(axes) > 1 else axes[0])
    return n_data, repl_sh, batch_sh, jax.device_put(params, repl_sh)


def _pow2(n):
    """Next power of two ≥ n.  The steppers pad the ACTIVE BATCH dimension
    to pow2 buckets so the jitted chunk programs trace at most
    log2(max_batch)+1 batch shapes; without it every distinct active-set
    size compiles a fresh program, and under a live load that is a compile
    storm (measured: p50 latency 32 s at 8 req/s before bucketing).  Pad
    rows duplicate row 0 — valid compute, no NaN-prone empty masks — and
    exist only inside the stacked device batch; per-request results index
    real rows only."""
    p = 1
    while p < n:
        p <<= 1
    return p


def make_tacotron_stepper(model, *, chunk = 64, token_multiple = 64,
                          max_steps = None, vocoder = None,
                          stream_audio = False, stream_context = 32,
                          stream_lookahead = None, mesh = None,
                          transfer_dtype = 'float32',
                          ** infer_kwargs):
    """(start_fn, step_fn, finish_fn) driving a `Tacotron2` task model
    through `arch.decode_chunk`: per-request encode at admission, shared
    padded decode chunks, gate-based completion, postnet (+ optional
    vocoder) at finish.

    Rows pad to a common token bucket; a longer request admitted mid-flight
    re-buckets the running rows by zero-padding their memory/alignments
    (cumulative attention over padded positions is masked, so this is
    exact).

    ``stream_audio=True`` (requires ``vocoder``) emits AUDIO INCREMENTALLY:
    at every decode chunk boundary the newly completed mel frames are
    postnet-ed and vocoded with `stream_context` frames of left context
    (covering the postnet + WaveGlow receptive fields) and handed to the
    request's ``on_audio(chunk_ndarray)`` callback — time-to-first-audio is
    one encode + one decode chunk + one small vocode instead of the whole
    utterance.  Non-final emissions hold back `stream_lookahead` frames
    (default: the postnet half receptive field) so every emitted frame has
    full future context; the final flush emits the exact remainder.  The
    finished result carries ``audio`` (the concatenated stream) and
    ``first_audio_s`` (wall seconds from admission to first audio).
    Beyond the reference, whose streaming granularity is whole text chunks
    (``/root/reference/models/tts/tacotron2.py:103-209``).

    ``mesh`` (a `jax.sharding.Mesh` with a 'dp'/'dcn' data axis) runs the
    AR decode chunks ACROSS CHIPS: params replicate over the mesh, the
    device-resident active batch (frame, cell state, memory/alignment
    stacks) shards on the data axes, and buckets pad to >= the dp size —
    requests are independent so the decode scales embarrassingly on dp
    with zero collectives in the hot loop.  Per-request output is
    bit-identical to unsharded serving (`tests/test_serving.py`).
    Encode-at-admission and the emission postnet/vocoder stay on the
    default device (event-rate work, off the chunk loop)."""
    import jax
    import jax.numpy as jnp

    n_data, repl_sh, batch_sh, params_srv = _mesh_data_setup(mesh, model.params)
    # mesh serving pins the replicated param copy at creation; single-device
    # serving keeps the live model.params lookup (reload-friendly)
    _params = (lambda: params_srv) if mesh is not None \
        else (lambda: model.params)

    arch = model.arch
    n_mel = arch.hp.n_mel_channels
    # reduction factor r > 1: `decode_chunk` emits r mel frames per
    # sequential step (its projection is r x n_mel wide, its gate the
    # group's last subframe), so one serving chunk advances chunk x r
    # frames at chunk sequential steps — the 2x-decode-latency lever the
    # r-quality gate (benchmarks/r_quality_sweep.py: converged r=2 BEATS
    # r=1, MCD 5.32 vs 5.94) makes usable in production.  All frame
    # bookkeeping below (st['steps'], emission windows, finish buckets)
    # is in FRAMES; `limit` stays in decode steps.  Reference fixed this
    # hparam at 1 (architectures/tacotron2_arch.py:110-127).
    r = arch.hp.n_frames_per_step
    limit = max_steps or arch.hp.max_decoder_steps
    threshold = arch.hp.gate_threshold
    if stream_audio and vocoder is None:
        raise ValueError('stream_audio requires a vocoder')
    if stream_lookahead is None:
        # postnet half receptive field: each emitted frame must have its
        # full future context before its audio is finalized
        stream_lookahead = arch.hp.get('postnet_n_conv', 5) \
            * (arch.hp.get('postnet_kernel_size', 5) // 2)

    _decode_fn = lambda p, frame, cell, mem, pm, mask, off: arch.decode_chunk(
        p, frame, cell, mem, pm, mask, n_steps = chunk,
        step_offset = off, ** infer_kwargs)
    if mesh is None:
        decode = jax.jit(_decode_fn)
    else:
        # params replicated, every batch-leading leaf (incl. the cell-state
        # pytree) sharded on the data axes, the scalar PRNG offset
        # replicated — GSPMD partitions the chunk across every chip
        decode = jax.jit(
            _decode_fn,
            in_shardings = (repl_sh,) + (batch_sh,) * 5 + (repl_sh,),
            out_shardings = batch_sh)

    def _encode(p, s, tokens):
        enc_out, mask, _ = arch.encode(p, s, tokens, train = False)
        memory, pm = arch.process_memory(p['decoder'], enc_out, mask)
        return memory, pm, mask

    encode_jit = jax.jit(_encode)
    # ALL finish/emission postnet calls go through the MASKED variant:
    # per-row lengths keep padded frames exactly zero between layers, so
    # any padded batch postnets bit-identically to its unpadded runs
    # (multi-layer SAME convs are not pad-invariant otherwise)
    postnet_masked_jit = jax.jit(
        lambda p, s, dec, mask: arch.postnet(
            p, s, dec, train = False, mask = mask)[0])

    # The ACTIVE BATCH lives on device between chunks (frame, cell state,
    # memory/pm/mask stacks) and is restacked only on admission / removal /
    # re-bucket events — the steady-state chunk is ONE jitted decode call
    # plus two small device→host reads (frames, gates).  Keeping the
    # per-chunk path free of eager per-row ops matters doubly over remote
    # device transports where every eager op pays round-trip latency.
    batch = {'ids': (), 's': 0, 'frame': None, 'cell': None,
             'mem': None, 'pm': None, 'mask': None,
             # monotone PRNG offset: every chunk folds fresh key indices, so
             # no row ever re-consumes a prenet-dropout key from an earlier
             # chunk regardless of how far along its batch-mates are
             'rng_off': 0}
    # per-request identity for the device-batch cache: id(st) is unsafe
    # (CPython reuses freed dict addresses, so a new request could inherit
    # a finished one's rows) — a monotonic sequence number never is
    seq = itertools.count()

    def _encode_batch(texts):
        toks = [np.asarray(model.encode_text(t)) for t in texts]
        s = -(-max(len(t) for t in toks) // token_multiple) * token_multiple
        return np.stack([
            np.pad(t, (0, s - len(t)),
                   constant_values = model.blank_token_idx) for t in toks])

    def _admit_state(text, memory_row, pm_row, mask_row, on_audio):
        return {
            'text': text, '_seq': next(seq),
            'memory': memory_row, 'pm': pm_row, 'mask': mask_row,
            'frames': [], 'steps': 0,
            'on_audio': on_audio, 'emitted': 0, 'audio_parts': [],
            't_start': time.perf_counter(), 't_first_audio': None,
        }

    def start_fn(text, on_audio = None, ** kwargs):
        tokens = _encode_batch([text])
        memory, pm, mask = encode_jit(
            model.params, model.state, jnp.asarray(tokens))
        return _admit_state(text, memory[0], pm[0], mask[0], on_audio)

    def start_many(texts, kwargs_list):
        """Batched admission: one encoder launch per burst (see the VITS
        stepper's start_many — the same tunnel-RTT economics).  Token rows
        pad to a pow2 bucket so admission traces a bounded executable
        set."""
        tokens = _encode_batch(texts)
        n = tokens.shape[0]
        bucket = _bucket(n, 1)
        if bucket > n:
            tokens = np.concatenate(
                [tokens, np.broadcast_to(tokens[:1],
                                         (bucket - n,) + tokens.shape[1:])])
        memory, pm, mask = encode_jit(
            model.params, model.state, jnp.asarray(tokens))
        return [
            _admit_state(texts[i], memory[i], pm[i], mask[i],
                         kwargs_list[i].get('on_audio'))
            for i in range(n)
        ]

    start_fn.start_many = start_many

    def _postnet_mel(decoder_output):
        # window lengths bucket to ×chunk so postnet compiles a few
        # programs.  MASKED: multi-layer SAME convs are NOT pad-invariant
        # (layer-1 bias/BN offsets leak into layer 2's receptive field
        # through the pad region — measured 2.3 log-mel of tail corruption
        # on perturbed BN params), so the mask keeps padded frames exactly
        # zero between layers and pad-then-slice is bit-exact
        n = decoder_output.shape[0]
        b = -(-n // chunk) * chunk
        padded = np.pad(decoder_output, ((0, b - n), (0, 0)))
        mask = np.arange(b) < n
        post = postnet_masked_jit(model.params, model.state,
                                  jnp.asarray(padded[None]),
                                  jnp.asarray(mask[None]))
        return decoder_output + np.asarray(post)[0, :n]

    def _emit_window(st, final):
        """The (state, lo, hi) emission job for this chunk, or None (not
        streaming / not enough new frames yet).  [lo, hi) is the mel window
        to vocode: left context covers the postnet/vocoder receptive
        fields; a lookahead margin is held back until it has future
        context."""
        if not stream_audio:
            return None
        hi = st['steps'] if final else st['steps'] - stream_lookahead
        if hi <= st['emitted'] \
                or (not final and hi - st['emitted'] < chunk * r):
            return None
        return (st, max(0, st['emitted'] - stream_context), hi)

    def _emit_batch(jobs):
        """Vocode and hand out the completed mel frames for ALL emitting
        rows in ONE postnet + ONE vocoder call: rows pad to a shared
        ×chunk length bucket and a pow2 batch bucket (zero-pad + slice is
        exact for the SAME-padded conv stacks, and bucketing bounds the
        number of traced programs).  Per-row calls would cost
        O(active streams) device round-trips per chunk — ruinous over a
        remote transport."""
        if not jobs:
            return
        rate = getattr(vocoder, 'upsample_rate', 256)
        mels = [np.concatenate(st['frames'], axis = 0)[lo: hi]
                for st, lo, hi in jobs]
        b = -(-max(m.shape[0] for m in mels) // chunk) * chunk
        stack = [np.pad(m, ((0, b - m.shape[0]), (0, 0))) for m in mels]
        stack += stack[:1] * (_pow2(len(stack)) - len(stack))
        dec = np.stack(stack)
        # masked postnet: see _postnet_mel — mixed-length rows must not
        # leak pad energy into their valid tails
        mask = np.zeros((dec.shape[0], b), bool)
        for j, m in enumerate(mels):
            mask[j, :m.shape[0]] = True
        post = np.asarray(postnet_masked_jit(
            model.params, model.state, jnp.asarray(dec),
            jnp.asarray(mask)))
        mel = dec + post
        # rows beyond each job's real length must read as SILENCE for the
        # vocoder (its per-row path pads with pad_mel_value ≈ log-mel
        # silence); leaving dec+post(0) there would bleed pad energy into
        # the tail of the emitted slice through the upsampler's
        # receptive field
        pad_value = getattr(vocoder, 'pad_mel_value', -11.)
        for j, m in enumerate(mels):
            mel[j, m.shape[0]:] = pad_value
        mel[len(mels):] = pad_value
        audio = np.asarray(vocoder(mel))
        if audio.ndim == 1:
            audio = audio[None]
        now = time.perf_counter()
        for j, (st, lo, hi) in enumerate(jobs):
            part = audio[j, (st['emitted'] - lo) * rate: (hi - lo) * rate]
            st['audio_parts'].append(part)
            st['emitted'] = hi
            if st['t_first_audio'] is None:
                st['t_first_audio'] = now
            if st['on_audio'] is not None:
                try:
                    st['on_audio'](part)
                except Exception:
                    logger.exception('on_audio callback failed')

    def _pad_row(arr, s):
        pad = s - arr.shape[0]
        if pad == 0:
            return arr
        return jnp.pad(arr, ((0, pad),) + ((0, 0),) * (arr.ndim - 1))

    def _extract_cell(cell, i, s_old, s_new):
        """One row of a stacked cell state, alignment maps re-bucketed.

        Growth zero-pads; shrink (the batch's longest request finished)
        slices — exact either way, because positions beyond a row's real
        tokens carry zero attention under the masked softmax."""
        row = jax.tree_util.tree_map(lambda leaf: leaf[i], cell)
        if s_new == s_old:
            return row
        attn_rnn, dec_rnns, context, (prev, cum) = row
        if s_new > s_old:
            fit = lambda a: jnp.pad(a, ((0, s_new - s_old),))
        else:
            fit = lambda a: a[:s_new]
        return (attn_rnn, dec_rnns, context, (fit(prev), fit(cum)))

    def _rebuild(states, s):
        """Restack the device batch (admission / removal / re-bucket):
        surviving rows carry their post-step frame/cell out of the old
        stack; new rows start from zeros.  Event-rate cost only.  The
        batch dim pads to a pow2 bucket (`_pow2`) with copies of row 0 —
        decode programs trace per bucket, not per active-set size."""
        old = {sid: i for i, sid in enumerate(batch['ids'])}
        rows_f, rows_c = [], []
        for st in states:
            i = old.get(st['_seq'])
            if i is not None:
                rows_f.append(batch['frame'][i])
                rows_c.append(_extract_cell(batch['cell'], i, batch['s'], s))
            else:
                # feedback frame carries the whole r-frame group
                rows_f.append(jnp.zeros((n_mel * r,), jnp.float32))
                one = arch.init_cell_state(1, s)
                rows_c.append(jax.tree_util.tree_map(
                    lambda leaf: leaf[0], one))
        # batch dim pads to a multiple of the mesh's data-axis size so
        # every bucket shards evenly across the data axes
        n_pad = _bucket(len(states), n_data) - len(states)
        rows_f += rows_f[:1] * n_pad
        rows_c += rows_c[:1] * n_pad
        mems = [_pad_row(st['memory'], s) for st in states]
        pms = [_pad_row(st['pm'], s) for st in states]
        masks = [_pad_row(st['mask'], s) for st in states]
        batch['frame'] = jnp.stack([
            r.astype(jnp.float32) for r in rows_f])
        batch['cell'] = jax.tree_util.tree_map(
            lambda * rows: jnp.stack(rows), * rows_c)
        batch['mem'] = jnp.stack(mems + mems[:1] * n_pad)
        batch['pm'] = jnp.stack(pms + pms[:1] * n_pad)
        batch['mask'] = jnp.stack(masks + masks[:1] * n_pad)
        if mesh is not None:
            for key in ('frame', 'cell', 'mem', 'pm', 'mask'):
                batch[key] = jax.device_put(batch[key], batch_sh)
        batch['ids'] = tuple(st['_seq'] for st in states)
        batch['s'] = s

    def step_fn(states):
        s = max(int(st['memory'].shape[0]) for st in states)
        ids = tuple(st['_seq'] for st in states)
        if ids != batch['ids'] or s != batch['s']:
            _rebuild(states, s)

        off = batch['rng_off']
        batch['rng_off'] += chunk
        frames, gates, (frame, cell) = decode(
            _params(), batch['frame'], batch['cell'],
            batch['mem'], batch['pm'], batch['mask'],
            jnp.asarray(off, jnp.int32))
        batch['frame'] = frame
        batch['cell'] = cell
        frames_h = np.asarray(frames)        # one bulk d2h per chunk
        gates_h = np.asarray(gates)

        new_states, done, jobs = [], [], []
        for i, st in enumerate(states):
            fired = np.nonzero(gates_h[i] > threshold)[0]
            keep = int(fired[0]) + 1 if fired.size else chunk
            # unfold the kept groups to frame rate ((keep, r*n_mel) →
            # (keep*r, n_mel)); whole groups are kept on gate fire,
            # matching infer()'s lengths = steps * r
            st['frames'].append(frames_h[i, :keep].reshape(-1, n_mel))
            st['steps'] += keep * r
            is_done = bool(fired.size) or st['steps'] >= limit * r
            if not is_done:
                job = _emit_window(st, final = False)
                if job is not None:
                    jobs.append(job)
            new_states.append(st)
            done.append(is_done)
        _emit_batch(jobs)
        return new_states, done

    def finish_fn(st):
        decoder_output = np.concatenate(st['frames'], axis = 0)
        mel = _postnet_mel(decoder_output)
        result = {'text': st['text'], 'mel': mel, 'steps': st['steps']}
        if stream_audio:
            job = _emit_window(st, final = True)
            if job is not None:
                _emit_batch([job])
            result['audio'] = np.concatenate(st['audio_parts']) \
                if st['audio_parts'] else np.zeros((0,), np.float32)
            result['rate'] = model.rate
            if st['t_first_audio'] is not None:
                result['first_audio_s'] = st['t_first_audio'] - st['t_start']
        elif vocoder is not None:
            audio = np.asarray(vocoder(mel))
            result['audio'] = audio[0] if audio.ndim == 2 else audio
            result['rate'] = model.rate
        return result

    def finish_many(states):
        """Batched finish for rows completing at the same chunk boundary:
        ONE padded postnet launch + ONE batched vocoder launch for the
        whole group (the per-request finish serializes 2+ device calls per
        request in the loop thread — measured as the dominant saturated-
        loop cost for this stepper, benchmarks/serving_load.py)."""
        if stream_audio:
            jobs = [(_emit_window(st, final = True)) for st in states]
            real = [j for j in jobs if j is not None]
            if real:
                _emit_batch(real)
            out = []
            for st in states:
                result = {
                    'text': st['text'],
                    'mel': _postnet_mel(
                        np.concatenate(st['frames'], axis = 0)),
                    'steps': st['steps'],
                    'audio': (np.concatenate(st['audio_parts'])
                              if st['audio_parts']
                              else np.zeros((0,), np.float32)),
                    'rate': model.rate,
                }
                if st['t_first_audio'] is not None:
                    result['first_audio_s'] = \
                        st['t_first_audio'] - st['t_start']
                out.append(result)
            return out

        decs = [np.concatenate(st['frames'], axis = 0) for st in states]
        # FIXED shapes: frames pinned to the decode ceiling, rows to a pow2
        # bucket — a handful of executables total (one per pow2 group
        # size), all warmed by `warmup`.  Shape-per-group padding looked
        # cheaper but every fresh (rows, frames) combination paid a cold
        # XLA compile mid-traffic (measured: finish went 9.9 s -> 83.6 s).
        # ceiling covers a one-chunk overrun (the decode only checks the
        # step limit at chunk boundaries) — and is clamped to the longest
        # actual row as a safety net
        b = (-(-limit // chunk) + 1) * chunk * r
        b = max(b, -(-max(len(d) for d in decs) // chunk) * chunk)
        rows = _pow2(len(decs))             # pow2 batch bucket
        padded = np.zeros((rows, b, decs[0].shape[-1]), decs[0].dtype)
        mask = np.zeros((rows, b), bool)
        for i, d in enumerate(decs):
            padded[i, :len(d)] = d
            mask[i, :len(d)] = True
        # fetch only the live rows and a chunk-bucketed frame window: the
        # pinned (pow2 rows x decode-ceiling) output is mostly padding and
        # the tunnel charges per byte (one cheap device slice saves ~80 %
        # of the transfer at typical lengths)
        b_fetch = -(-max(len(d) for d in decs) // chunk) * chunk
        post_dev = postnet_masked_jit(
            model.params, model.state, jnp.asarray(padded),
            jnp.asarray(mask))
        post = np.asarray(post_dev[:len(decs), :b_fetch])
        mels = [decs[i] + post[i, :len(decs[i])] for i in range(len(decs))]

        results = [{'text': st['text'], 'mel': mel, 'steps': st['steps']}
                   for st, mel in zip(states, mels)]
        if vocoder is not None and hasattr(vocoder, 'vocode_windowed_batch'):
            # cross-request WINDOW batching (the long-document fast path):
            # bounded window shapes regardless of utterance lengths — a
            # full-length one-shot batch at the decode ceiling (e.g.
            # 8 x 1024 frames) exceeds the fused kernel's envelope
            audios = vocoder.vocode_windowed_batch(
                mels, win_len = min(b, 256), hop_len = -64,
                transfer_dtype = transfer_dtype)
            for result, audio in zip(results, audios):
                result['audio'] = audio
                result['rate'] = model.rate
        elif vocoder is not None:
            for result in results:
                a = np.asarray(vocoder(result['mel']))
                result['audio'] = a[0] if a.ndim == 2 else a
                result['rate'] = model.rate
        return results

    finish_fn.finish_many = finish_many
    # the non-streaming finish reads only per-row state the loop no longer
    # touches (done rows leave the slots before finishing) and stateless
    # jitted programs — safe to overlap with the decode loop on the
    # engine's finish worker.  Streaming finishes share the emission path
    # with step_fn's per-chunk _emit_batch bookkeeping; keep those inline.
    finish_fn.async_ok = not stream_audio
    step_fn._batch = batch      # introspection (tests assert shardings)
    return start_fn, step_fn, finish_fn


def make_vits_stepper(model, *, window = 64, context = 16,
                      token_multiple = 64, max_frames = None,
                      dtype = None, pipeline = True,
                      transfer_dtype = 'float32', mesh = None,
                      ** infer_kwargs):
    """(start_fn, step_fn, finish_fn) driving a `VITS` task model through
    WINDOWED waveform decode — incremental streaming for the end-to-end
    family.

    Admission runs the cheap latent stage once (`arch.infer_latent`: text
    encode → durations → expanded prior → reverse flow; ~1-2 % of the
    FLOPs), leaving a per-request latent buffer `z` (max_frames, C) on
    device.  Every engine chunk then decodes ONE `window` of frames for the
    whole active batch through the HiFi-GAN generator with `context` real
    frames of left/right overlap — the generator is fully convolutional, so
    windows with context ≥ its receptive field (~13 frames for the v1
    config) are EXACT: the concatenated stream bit-matches the one-shot
    decode (`tests/test_vits.py`).  First audio = one latent stage + one
    window decode instead of the whole utterance, and new requests are
    admitted at every window boundary (in-flight batching).

    The reference has no streaming below whole text chunks
    (``/root/reference/models/tts/tacotron2.py:103-209``); this is the VITS
    counterpart of `make_tacotron_stepper(stream_audio=True)`.

    ``pipeline=True`` (default) SOFTWARE-PIPELINES the chunk loop: chunk
    k's decode is dispatched (async, XLA queues it) BEFORE chunk k-1's
    audio is fetched, so the device computes k while the host drains
    k-1's device->host transfer.  Without it every chunk serializes
    dispatch -> compute -> fetch (two tunnel round-trips; measured 81.9 ms
    steady vs 40.3 ms device time at B=8 W=64,
    benchmarks/profile_vits_stepper.py).  Delivery of a chunk's audio
    (``audio_parts`` / ``on_audio`` / done flags' TIMING — the flags
    themselves are length-derived and exact) lags one chunk behind its
    compute; freshly admitted requests bypass the lag so time-to-first-
    audio is unchanged, and ``finish_fn`` flushes the tail, so the
    concatenated stream is bit-identical either way.

    ``transfer_dtype='int16'`` quantizes each chunk to 16-bit PCM ON
    DEVICE before the device->host transfer (4x fewer bytes; delivered
    parts are reconstructed float32, max abs error 1/32767 ~ 3e-5 — the
    same quantization a WAV container applies anyway).  Worth it when the
    link to the device is transfer-bound, e.g. a tunneled remote chip.

    ``mesh`` (a `jax.sharding.Mesh` with a 'dp'/'dcn' data axis) serves the
    active batch ACROSS CHIPS: params replicate over the mesh, the stacked
    latent batch + per-row chunk indices shard over the data axes, and each
    window decode pjits over all devices — requests are independent, so the
    decode scales embarrassingly on dp (no collectives in the hot loop; the
    reference's TRT-LLM runner is single-GPU per process).  The active
    bucket pads to at least the dp size; per-request results are
    bit-identical to unsharded serving (`tests/test_vits.py`)."""
    import jax
    import jax.numpy as jnp

    n_data, repl_sh, batch_sh, params_srv = _mesh_data_setup(mesh, model.params)
    # mesh serving pins the replicated param copy at creation; single-device
    # serving keeps the live model.params lookup (reload-friendly)
    _params = (lambda: params_srv) if mesh is not None \
        else (lambda: model.params)

    arch = model.arch
    rate = arch.upsample_rate
    max_frames = max_frames or arch.hp.max_frames
    quantize = np.dtype(transfer_dtype) == np.int16
    span = window + 2 * context
    if max_frames < span:
        raise ValueError('max_frames ({}) < window + 2*context ({})'.format(
            max_frames, span))

    latent = jax.jit(lambda p, tokens, rng: arch.infer_latent(
        p, tokens, rng = rng, max_frames = max_frames, dtype = dtype,
        ** infer_kwargs))

    def _decode(p, z_stack, starts, dev_offs, cond_stack):
        win = jax.vmap(lambda z, s: jax.lax.dynamic_slice(
            z, (s, 0), (span, z.shape[-1])))(z_stack, starts)
        audio = arch.decode_frames(p, win, cond_stack, dtype = dtype)
        # gather each row's emitted window ON DEVICE so the per-chunk
        # device->host transfer carries window*rate samples, not the full
        # span*rate (context frames are compute-only) — 1/3 fewer bytes at
        # the default 64+2*16, and the win over a remote transport is
        # proportional (the tunnel is transfer-bound, not compute-bound)
        out = jax.vmap(lambda row, o: jax.lax.dynamic_slice(
            row, (o * rate,), (window * rate,)))(audio, dev_offs)
        if quantize:
            out = jnp.round(jnp.clip(out, -1., 1.) * 32767.) \
                .astype(jnp.int16)
        return out

    if mesh is None:
        decode_cond = jax.jit(_decode)
        decode_nocond = jax.jit(lambda p, z, s, o: _decode(p, z, s, o, None))
    else:
        # params replicated, batch leaves sharded on the data axes — GSPMD
        # partitions the window decode across every chip, zero collectives
        decode_cond = jax.jit(
            _decode, in_shardings = (repl_sh,) + (batch_sh,) * 4,
            out_shardings = batch_sh)
        decode_nocond = jax.jit(
            lambda p, z, s, o: _decode(p, z, s, o, None),
            in_shardings = (repl_sh,) + (batch_sh,) * 3,
            out_shardings = batch_sh)

    # the active batch's stacked latents live on device between chunks;
    # restacked only when the active set changes (admission/removal)
    batch = {'ids': (), 'z': None, 'cond': None}
    # one in-flight chunk awaiting its device->host fetch (pipeline mode):
    # 'audio' is the un-fetched device array, 'deliveries' the
    # (state, row, frame_offset, frame_count) tuples it maps to
    pending = {'audio': None, 'deliveries': ()}

    def _deliver(st, part):
        st['audio_parts'].append(part)
        if st['t_first_audio'] is None:
            st['t_first_audio'] = time.perf_counter()
        if st['on_audio'] is not None:
            try:
                st['on_audio'](part)
            except Exception:
                logger.exception('on_audio callback failed')

    def _fetch_parts(audio, deliveries):
        audio_h = np.asarray(audio) if quantize \
            else np.asarray(audio, np.float32)
        for st, row, off, count in deliveries:
            part = audio_h[row, off * rate: (off + count) * rate]
            if quantize:
                part = part.astype(np.float32) / 32767.
            _deliver(st, part)

    def _flush():
        if pending['audio'] is None:
            return
        audio, deliveries = pending['audio'], pending['deliveries']
        pending['audio'], pending['deliveries'] = None, ()
        _fetch_parts(audio, deliveries)
    # monotonic per-request identity (id(st) is unsafe: CPython reuses
    # freed dict addresses, so a new request could inherit a finished
    # one's cached device rows)
    seq = itertools.count()

    def _encode_pad(texts):
        toks = [np.asarray(model.encode_text(t)) for t in texts]
        s = -(-max(len(t) for t in toks) // token_multiple) * token_multiple
        return np.stack([
            np.pad(t, (0, s - len(t)),
                   constant_values = model.blank_token_idx) for t in toks])

    def _make_state(text, z_row, cond_row, length, on_audio):
        return {
            'text': text, '_seq': next(seq),
            'z': z_row, 'cond': cond_row,
            'length': max(1, int(length)),
            'emitted': 0, 'audio_parts': [], 'on_audio': on_audio,
            't_start': time.perf_counter(), 't_first_audio': None,
        }

    def start_fn(text, on_audio = None, rng = None, ** kwargs):
        tokens = _encode_pad([text])
        if rng is None:
            rng = jax.random.PRNGKey(time.time_ns() % (2 ** 31))
        z, cond, lengths, _, _ = latent(_params(), jnp.asarray(tokens), rng)
        return _make_state(text, z[0],
                           None if cond is None else cond[0],
                           np.asarray(lengths)[0], on_audio)

    def start_many(texts, kwargs_list, rng = None):
        """Batched admission: ONE latent launch + ONE bulk lengths fetch
        for a whole admission burst.  The serialized per-request path costs
        a device call + a blocking scalar fetch (~2 tunnel RTTs) per
        request — measured as the DOMINANT loop cost under load (~55-60 %
        of saturated wall time, benchmarks/serving_load.py --sweep); this
        cuts an n-request burst to one call.  Token batches pad to a pow2
        row bucket (row-0 copies) so admission traces a bounded executable
        set."""
        tokens = _encode_pad(texts)
        n = tokens.shape[0]
        bucket = _bucket(n, 1)
        if bucket > n:
            tokens = np.concatenate(
                [tokens, np.broadcast_to(tokens[:1],
                                         (bucket - n,) + tokens.shape[1:])])
        if rng is None:
            rng = jax.random.PRNGKey(time.time_ns() % (2 ** 31))
        z, cond, lengths, _, _ = latent(_params(), jnp.asarray(tokens), rng)
        lengths = np.asarray(lengths)
        return [
            _make_state(texts[i], z[i],
                        None if cond is None else cond[i], lengths[i],
                        kwargs_list[i].get('on_audio'))
            for i in range(n)
        ]

    start_fn.start_many = start_many

    def step_fn(states):
        ids = tuple(st['_seq'] for st in states)
        if pending['deliveries']:
            # rows aborted since the chunk was parked must NOT be delivered
            # (the engine already resolved them with an error); requests
            # that finished normally were flushed by their finish_fn
            kept = tuple(d for d in pending['deliveries']
                         if d[0]['_seq'] in set(ids))
            if not kept:
                pending['audio'], pending['deliveries'] = None, ()
            else:
                pending['deliveries'] = kept
        if ids != batch['ids']:
            # batch dim pads to a pow2-per-data-shard bucket (multiple of
            # the mesh's data-axis size, so every bucket shards evenly)
            # with copies of row 0 so the decode program traces per
            # bucket, not per active-set size
            rows = [st['z'] for st in states]
            rows += rows[:1] * (_bucket(len(rows), n_data) - len(rows))
            batch['z'] = jnp.stack(rows)
            conds = [st['cond'] for st in states]
            if conds[0] is None:
                batch['cond'] = None
            else:
                conds += conds[:1] * (batch['z'].shape[0] - len(conds))
                batch['cond'] = jnp.stack(conds)
            if mesh is not None:
                batch['z'] = jax.device_put(batch['z'], batch_sh)
                if batch['cond'] is not None:
                    batch['cond'] = jax.device_put(batch['cond'], batch_sh)
            batch['ids'] = ids

        starts, dev, offs, counts = [], [], [], []
        for st in states:
            e = st['emitted']
            s0 = min(max(e - context, 0), max_frames - span)
            starts.append(s0)
            # device-gather start within the span; its window*rate slice
            # must stay in bounds, so clamp to span-window — the residual
            # (only ever nonzero for the clamped tail of a max_frames-long
            # request) becomes the host-side delivery offset
            dev.append(min(e - s0, span - window))
            offs.append((e - s0) - dev[-1])
            counts.append(max(1, min(window, st['length'] - e)))
        n_pad = batch['z'].shape[0] - len(starts)
        dev_offs = jnp.asarray(dev + dev[:1] * n_pad, jnp.int32)
        starts = jnp.asarray(starts + starts[:1] * n_pad, jnp.int32)
        if mesh is not None:
            dev_offs = jax.device_put(dev_offs, batch_sh)
            starts = jax.device_put(starts, batch_sh)
        # eager (synchronous) fetch exists to keep time-to-first-audio at
        # one window — only STREAMING rows care.  Gating it on `on_audio`
        # keeps the pipeline parked under sustained oneshot load: with
        # continuous admission nearly every chunk has a fresh row, and the
        # unconditional eager path degraded the 256-request open-loop run
        # to synchronous fetches (32-row chunks 67.8 → 133.8 ms, measured
        # 2026-08-21)
        fresh = any(st['emitted'] == 0 and st['on_audio'] is not None
                    for st in states)
        if batch['cond'] is None:
            audio = decode_nocond(_params(), batch['z'], starts, dev_offs)
        else:
            audio = decode_cond(_params(), batch['z'], starts, dev_offs,
                                batch['cond'])
        # the new chunk is now queued on device; fetching the PREVIOUS
        # chunk here overlaps its d2h transfer with this chunk's compute
        _flush()

        done = []
        for i, st in enumerate(states):
            st['emitted'] += counts[i]
            done.append(st['emitted'] >= st['length'])
        deliveries = tuple((st, i, offs[i], counts[i])
                           for i, st in enumerate(states))
        if pipeline and not fresh:
            # NOTE: pre-queueing the d2h here with copy_to_host_async()
            # was measured and REVERTED (2026-08-21): on the axon tunnel
            # it did not shrink the tail-flush waits (flush_s 4.7→6.0 s
            # at 256 requests) and the whole-run rate dropped 186→160
            # audio-s/s — the tunnel appears to serialize the async copy
            # with dispatches rather than overlapping it.
            pending['audio'] = audio
            pending['deliveries'] = deliveries
        else:
            # eager path: first chunk of a fresh request (keeps
            # time-to-first-audio at one window) or pipeline disabled
            _fetch_parts(audio, deliveries)
        return states, done

    # where the finish wall goes: tail-chunk flush (a device fetch that
    # blocks on everything queued ahead of it) vs pure host assembly —
    # serving_load prints this split so finish cost stays attributable
    stepper_stats = {'flush_s': 0., 'flushes': 0, 'assemble_s': 0.}

    def _assemble(st):
        t0 = time.perf_counter()
        audio = np.concatenate(st['audio_parts']) if st['audio_parts'] \
            else np.zeros((0,), np.float32)
        result = {'text': st['text'], 'audio': audio[: st['length'] * rate],
                  'rate': model.rate, 'frames': st['length']}
        if st['t_first_audio'] is not None:
            result['first_audio_s'] = st['t_first_audio'] - st['t_start']
        stepper_stats['assemble_s'] += time.perf_counter() - t0
        return result

    def _flush_for(states):
        if any(any(d[0] is st for d in pending['deliveries'])
               for st in states):
            t0 = time.perf_counter()
            _flush()                       # the tail chunk is still pending
            stepper_stats['flush_s'] += time.perf_counter() - t0
            stepper_stats['flushes'] += 1

    def finish_fn(st):
        _flush_for([st])
        return _assemble(st)

    def finish_many(states):
        """Group finish: ONE tail flush for the whole completing group,
        then pure host assembly (the per-request path re-scanned the
        pending buffer and re-entered the flush check per row)."""
        _flush_for(states)
        return [_assemble(st) for st in states]

    finish_fn.finish_many = finish_many
    step_fn._batch = batch      # introspection (tests assert shardings)
    step_fn.stats = stepper_stats
    return start_fn, step_fn, finish_fn


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
