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


class ContinuousServingEngine:
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
                 max_batch_size = 8, name = 'serving-cb'):
        self.start_fn = start_fn
        self.step_fn = step_fn
        self.finish_fn = finish_fn or (lambda state: state)
        self.max_batch_size = max_batch_size
        self.name = name
        self._queue = _queue.Queue()
        self._thread = None
        self._running = threading.Event()
        self.stats = {'requests': 0, 'chunks': 0, 'aborted': 0,
                      'latencies': []}

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

    def submit(self, inputs, *, callback = None, ** kwargs):
        request = InferenceRequest(inputs, callback = callback, ** kwargs)
        request.submitted_at = time.perf_counter()
        self.stats['requests'] += 1
        self._queue.put(request)
        return request

    def infer(self, inputs, *, timeout = None, ** kwargs):
        return self.submit(inputs, ** kwargs).result.get(timeout = timeout)

    def _admit(self, slots, block):
        """Fill free slots from the queue; blocks briefly only when idle."""
        while len(slots) < self.max_batch_size:
            try:
                request = self._queue.get(timeout = 0.05 if block else 0.)
            except _queue.Empty:
                return
            if request.aborted.is_set():
                self.stats['aborted'] += 1
                request.result.set_exception(
                    RuntimeError('request {} aborted'.format(request.request_id)))
                continue
            try:
                state = self.start_fn(request.inputs, ** request.kwargs)
            except Exception as e:
                logger.exception('start_fn failed')
                request.result.set_exception(e)
                continue
            slots.append((request, state))
            block = False

    def _loop(self):
        slots = []          # [(request, state)] — the active batch rows
        while self._running.is_set():
            self._admit(slots, block = not slots)
            if not slots:
                continue
            self.stats['chunks'] += 1
            live = [(r, s) for r, s in slots if not r.aborted.is_set()]
            for request, _ in slots:
                if request.aborted.is_set():
                    self.stats['aborted'] += 1
                    request.result.set_exception(
                        RuntimeError('request {} aborted'.format(request.request_id)))
            try:
                states, done = self.step_fn([s for _, s in live])
            except Exception as e:
                logger.exception('step_fn failed')
                for request, _ in live:
                    request.result.set_exception(e)
                slots = []
                continue
            slots = []
            for (request, _), state, is_done in zip(live, states, done):
                if not is_done:
                    slots.append((request, state))
                    continue
                try:
                    output = self.finish_fn(state)
                except Exception as e:
                    logger.exception('finish_fn failed')
                    request.result.set_exception(e)
                    continue
                self.stats['latencies'].append(
                    time.perf_counter() - getattr(request, 'submitted_at',
                                                  time.perf_counter()))
                if request.callback is not None:
                    try:
                        request.callback(output, request.request_id)
                    except Exception:
                        logger.exception('request callback failed')
                request.result.set_result(output)


def make_tacotron_stepper(model, *, chunk = 64, token_multiple = 64,
                          max_steps = None, vocoder = None, ** infer_kwargs):
    """(start_fn, step_fn, finish_fn) driving a `Tacotron2` task model
    through `arch.decode_chunk`: per-request encode at admission, shared
    padded decode chunks, gate-based completion, postnet (+ optional
    vocoder) at finish.

    Rows pad to a common token bucket; a longer request admitted mid-flight
    re-buckets the running rows by zero-padding their memory/alignments
    (cumulative attention over padded positions is masked, so this is
    exact)."""
    import jax
    import jax.numpy as jnp

    arch = model.arch
    n_mel = arch.hp.n_mel_channels
    limit = max_steps or arch.hp.max_decoder_steps
    threshold = arch.hp.gate_threshold

    decode = jax.jit(
        lambda p, frame, cell, mem, pm, mask, off: arch.decode_chunk(
            p, frame, cell, mem, pm, mask, n_steps = chunk,
            step_offset = off, ** infer_kwargs),
        static_argnums = (),
    )

    def start_fn(text, ** kwargs):
        tokens = np.asarray(model.encode_text(text))[None, :]
        s = -(-tokens.shape[1] // token_multiple) * token_multiple
        tokens = np.pad(tokens, ((0, 0), (0, s - tokens.shape[1])),
                        constant_values = model.blank_token_idx)
        enc_out, mask, _ = arch.encode(
            model.params, model.state, jnp.asarray(tokens), train = False)
        memory, pm = arch.process_memory(model.params['decoder'], enc_out, mask)
        return {
            'text': text,
            'memory': np.asarray(memory)[0], 'pm': np.asarray(pm)[0],
            'mask': np.asarray(mask)[0],
            'frame': np.zeros((n_mel,), np.float32),
            'cell': None,             # lazily built at the common bucket
            'frames': [], 'steps': 0,
        }

    def _pad_rows(arr, s):
        return np.pad(arr, ((0, s - arr.shape[0]),) + ((0, 0),) * (arr.ndim - 1))

    def _pad_cell(cell, s):
        """Zero-pad the (S,)-shaped alignment maps of a cell state."""
        attn_rnn, dec_rnns, context, (prev, cum) = cell
        pad = lambda a: np.pad(a, ((0, s - a.shape[0]),))
        return (attn_rnn, dec_rnns, context, (pad(prev), pad(cum)))

    def step_fn(states):
        s = max(st['memory'].shape[0] for st in states)
        b = len(states)
        memory = np.stack([_pad_rows(st['memory'], s) for st in states])
        pm = np.stack([_pad_rows(st['pm'], s) for st in states])
        mask = np.stack([_pad_rows(st['mask'], s) for st in states])
        frame = np.stack([st['frame'] for st in states])

        cells = []
        for st in states:
            if st['cell'] is None:
                one = arch.init_cell_state(1, s)
                cells.append(jax.tree_util.tree_map(
                    lambda leaf: np.asarray(leaf)[0], one))
            else:
                cells.append(_pad_cell(st['cell'], s))
        cell = jax.tree_util.tree_map(lambda * rows: np.stack(rows), * cells)

        off = min(st['steps'] for st in states)
        frames, gates, (frame, cell) = decode(
            model.params, jnp.asarray(frame), cell,
            jnp.asarray(memory), jnp.asarray(pm), jnp.asarray(mask),
            jnp.asarray(off, jnp.int32))
        frames = np.asarray(frames)
        gates = np.asarray(gates)
        frame = np.asarray(frame)
        cell = jax.tree_util.tree_map(np.asarray, cell)

        new_states, done = [], []
        for i, st in enumerate(states):
            fired = np.nonzero(gates[i] > threshold)[0]
            keep = int(fired[0]) + 1 if fired.size else chunk
            st['frames'].append(frames[i, :keep])
            st['steps'] += keep
            st['frame'] = frame[i]
            st['cell'] = jax.tree_util.tree_map(lambda leaf: leaf[i], cell)
            new_states.append(st)
            done.append(bool(fired.size) or st['steps'] >= limit)
        return new_states, done

    def finish_fn(st):
        decoder_output = np.concatenate(st['frames'], axis = 0)[None]
        post, _ = arch.postnet(model.params, model.state,
                               jnp.asarray(decoder_output), train = False)
        mel = np.asarray(decoder_output + np.asarray(post))[0]
        result = {'text': st['text'], 'mel': mel, 'steps': st['steps']}
        if vocoder is not None:
            audio = np.asarray(vocoder(mel))
            result['audio'] = audio[0] if audio.ndim == 2 else audio
            result['rate'] = model.rate
        return result

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
