"""Token-level LLM serving: continuous (in-flight) batching over KV caches.

Capability parity with the reference's TRT-LLM runner
(``/root/reference/utils/keras/runtimes/tensorrt_llm_runtime.py:36`` and
``custom_model_runner_cpp.py:26-40``): batched streaming autoregressive
generation with per-request stop conditions (eos / token budget / text
regex or callable), allowed-token masks, abort, and streamed incremental
detokenization — served through the same `ContinuousServingEngine` that
runs the TTS steppers (`runtimes/serving.py`).

TPU-native design (NOT a port of the TRT-LLM C++ runner):

- **Slot-based static batch.** The KV cache is ONE device-resident pytree
  of shape (max_batch, max_length, heads, head_dim) per layer; every
  request owns a row slot for its lifetime.  Every chunk steps ALL slots
  (inactive rows masked) — the whole serving life traces exactly ONE
  chunk program per sampling variant: no per-active-set recompiles, no
  cache reshuffles between chunks.  TRT-LLM compacts its batch instead;
  on TPU a fixed shape is the better trade — XLA compiles once and the
  masked rows ride along in the same MXU tiles.
- **Per-row cache index via `jax.vmap`.** Continuous batching needs rows
  at different decode positions in one batch.  The arch's KV cache keeps
  a scalar write index (`transformers/attention.py:45`); `vmap`-ing the
  single-token decode over the slot axis turns that scalar — and the
  causal mask, RoPE positions, and positional-embedding offset derived
  from it — into per-row values with zero arch changes.
- **Chunked scan.** Each engine chunk runs `chunk` decode steps in one
  `lax.scan` (one launch, one (B, chunk) token fetch): admission happens
  at chunk boundaries — `chunk=1` is exact token-boundary in-flight
  batching; the default 8 amortizes the host↔device round trip on a
  remote-tunnel link (every added eager dispatch ≈ 1 RTT here).
- **Right-padded prefill.** Admission prefills the prompt batch with the
  plain batched decode (scalar index 0), then re-indexes per row: row r's
  valid cache entries are [0, P_r) and its live index is P_r — pad
  positions beyond hold garbage KV that the causal mask `key <= index`
  never attends and the running decode progressively overwrites.

`mesh` (a `jax.sharding.Mesh` with a dp/dcn data axis) shards the slot
axis across chips — requests are independent, so decode scales on dp with
zero collectives in the hot loop (the reference's runner is single-GPU
per process).
"""

import time
import logging
import itertools
import threading

import numpy as np

from .serving import ContinuousServingEngine, _mesh_data_setup

logger = logging.getLogger(__name__)


def _compile_stop_condition(stop_condition):
    """str = regex searched in the decoded text; callable passes through."""
    if stop_condition is None:
        return None
    if callable(stop_condition):
        return stop_condition
    import re
    pattern = re.compile(stop_condition)
    return lambda text: pattern.search(text) is not None


def make_transformer_stepper(model, params, tokenizer = None, *,
                             max_batch = 8,
                             max_length = 512,
                             chunk = 8,
                             prompt_multiple = 32,
                             eos_token = None,
                             pad_token = 0,
                             temperature = 1.0,
                             top_k = None,
                             top_p = None,
                             max_new_tokens = None,
                             cache_dtype = None,
                             mesh = None,
                             seed = 0):
    """(start_fn, step_fn, finish_fn) serving a decoder-only `Transformer`
    (`models/transformers/transformer_arch.py`) through
    `ContinuousServingEngine` — token-level in-flight batching.

    Per-request kwargs (all optional): ``max_new_tokens``, ``eos_token``,
    ``temperature``, ``method`` ('greedy'|'sample'), ``stop_condition``
    (regex str or ``text -> bool``, checked on the decoded text at every
    chunk boundary), ``allowed_tokens`` (iterable of token ids the row may
    emit — the reference's LogitsProcessor mask), ``on_token(fragment,
    token_ids)`` streaming callback, ``rng`` (int seed).  Inputs may be
    raw text (requires `tokenizer`) or a token-id sequence.

    `top_k`/`top_p` are stepper-level (baked into the compiled sampler);
    temperature and greedy/sample are per-row vectors, so they vary per
    request inside one batch.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    if chunk < 1:
        raise ValueError('chunk must be >= 1')
    vocab = model.hp.vocab_size
    default_eos = eos_token if eos_token is not None else -1
    default_budget = max_new_tokens or max_length

    n_data, repl_sh, batch_sh, params_srv = _mesh_data_setup(mesh, params)
    if mesh is not None:
        if max_batch % n_data:
            raise ValueError('max_batch (%d) must divide over the %d-device '
                             'data axis' % (max_batch, n_data))
        params = params_srv
    _dtype = cache_dtype or jnp.float32

    # ---- jitted programs ---------------------------------------------------

    def _prefill(p, prompts, lengths):
        """Batched prompt prefill → per-row cache rows + next-token logits.

        Right-padded: row r's KV occupies cache [0, P_r); its next-token
        logits come from position P_r - 1 (NOT the padded tail)."""
        caches = model.init_caches(prompts.shape[0], max_length,
                                   dtype = _dtype)
        logits, caches = model.decode(p, prompts, caches = caches)
        rows = jnp.arange(prompts.shape[0])
        next_logits = logits[rows, lengths - 1].astype(jnp.float32)
        for c in caches:               # scalar shared index -> per-row index
            c['index'] = jnp.broadcast_to(
                lengths.astype(jnp.int32), (prompts.shape[0],))
        return caches, next_logits

    def _insert(caches, logits, target, fresh, fresh_logits, src):
        """Scatter an admission burst's prefilled rows into their slots
        (src selects burst rows; one launch per burst)."""
        new_caches = []
        for c, f in zip(caches, fresh):
            new_caches.append({
                'k': c['k'].at[target].set(f['k'][src].astype(c['k'].dtype)),
                'v': c['v'].at[target].set(f['v'][src].astype(c['v'].dtype)),
                'index': c['index'].at[target].set(f['index'][src]),
            })
        return new_caches, logits.at[target].set(fresh_logits[src])

    def _row_decode(p, row_caches, tok):
        """One token for ONE row — vmapped over the slot axis, so the
        scalar cache index (and the mask / RoPE positions / positional
        offset built from it) becomes per-row."""
        caches = [{'k': c['k'][None], 'v': c['v'][None], 'index': c['index']}
                  for c in row_caches]
        logits, new_caches = model.decode(p, tok[None, None], caches = caches)
        return logits[0, -1].astype(jnp.float32), [
            {'k': c['k'][0], 'v': c['v'][0], 'index': c['index']}
            for c in new_caches]

    def _sample(logits, temp, greedy, rng):
        scaled = logits / jnp.maximum(temp, 1e-6)[:, None]
        if top_k is not None:
            kth = jnp.sort(scaled, axis = -1)[..., -top_k][..., None]
            scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
        if top_p is not None:
            srt = jnp.sort(scaled, axis = -1)[..., ::-1]
            cum = jnp.cumsum(jax.nn.softmax(srt, axis = -1), axis = -1)
            cut_i = jnp.sum(cum < top_p, axis = -1, keepdims = True)
            cut = jnp.take_along_axis(srt, cut_i, axis = -1)
            scaled = jnp.where(scaled < cut, -jnp.inf, scaled)
        sampled = jax.random.categorical(rng, scaled, axis = -1)
        return jnp.where(greedy, jnp.argmax(scaled, axis = -1), sampled)

    def _chunk_body(p, caches, logits, active, finished, remaining, eos,
                    temp, greedy, rngs, logits_mask):
        """`chunk` decode steps for ALL slots in one lax.scan."""
        def body(carry, step_rng):
            caches, logits, finished, remaining, count = carry
            masked = logits if logits_mask is None \
                else jnp.where(logits_mask, logits, -jnp.inf)
            tok = _sample(masked, temp, greedy, step_rng).astype(jnp.int32)
            stepped = jnp.logical_and(active, jnp.logical_not(finished))
            tok = jnp.where(stepped, tok, pad_token)
            now_finished = jnp.where(
                stepped,
                jnp.logical_or(tok == eos, remaining <= 1),
                finished)
            remaining = jnp.where(stepped, remaining - 1, remaining)
            count = count + stepped.astype(jnp.int32)
            old_index = [c['index'] for c in caches]
            new_logits, caches = jax.vmap(
                _row_decode, in_axes = (None, 0, 0))(p, caches, tok)
            # frozen rows: park the cache index (their pad-KV write lands
            # at the old index and is re-overwritten next step — the row
            # is garbage until its slot is re-admitted anyway, but the
            # index must not run off the cache end)
            for c, old in zip(caches, old_index):
                c['index'] = jnp.where(stepped, c['index'], old)
            logits = jnp.where(stepped[:, None], new_logits, logits)
            return (caches, logits, now_finished, remaining, count), tok

        init = (caches, logits, finished, remaining,
                jnp.zeros((max_batch,), jnp.int32))
        (caches, logits, finished, remaining, count), toks = lax.scan(
            body, init, rngs)
        return caches, logits, finished, count, toks.T

    if mesh is None:
        prefill_fn = jax.jit(_prefill)
        insert_fn = jax.jit(_insert)
        chunk_fn = jax.jit(
            lambda p, c, l, a, f, r, e, t, g, k:
            _chunk_body(p, c, l, a, f, r, e, t, g, k, None))
        chunk_masked_fn = jax.jit(_chunk_body)
    else:
        # params replicated, every slot-axis leaf sharded on the data axes:
        # GSPMD partitions the chunk scan across chips, no collectives
        prefill_fn = jax.jit(_prefill, in_shardings = (repl_sh, None, None))
        insert_fn = jax.jit(_insert)
        chunk_fn = jax.jit(
            lambda p, c, l, a, f, r, e, t, g, k:
            _chunk_body(p, c, l, a, f, r, e, t, g, k, None),
            in_shardings = (repl_sh,) + (batch_sh,) * 8 + (None,))
        chunk_masked_fn = jax.jit(
            _chunk_body,
            in_shardings = (repl_sh,) + (batch_sh,) * 8 + (None, batch_sh))

    # ---- device-resident slot state ---------------------------------------

    dev = {'caches': None, 'logits': None}
    slot_of = {}                       # seq id -> row
    free_slots = list(range(max_batch))
    counter = itertools.count()
    step_counter = itertools.count()
    lock = threading.Lock()            # slot maps: engine loop + warmup

    def _ensure_dev():
        if dev['caches'] is None:
            caches = model.init_caches(max_batch, max_length, dtype = _dtype)
            for c in caches:
                c['index'] = jnp.zeros((max_batch,), jnp.int32)
            logits = jnp.zeros((max_batch, vocab), jnp.float32)
            if mesh is not None:
                caches = [
                    {k: jax.device_put(v, batch_sh) for k, v in c.items()}
                    for c in caches]
                logits = jax.device_put(logits, batch_sh)
            dev['caches'], dev['logits'] = caches, logits

    # ---- admission ---------------------------------------------------------

    def _encode(inputs):
        if isinstance(inputs, str):
            if tokenizer is None:
                raise ValueError('text inputs need a tokenizer')
            ids = np.asarray(tokenizer.encode(inputs), np.int32)
        else:
            ids = np.asarray(inputs, np.int32).reshape(-1)
        if ids.shape[0] > max_length - 1:
            raise ValueError('prompt length %d exceeds max_length - 1 = %d'
                             % (ids.shape[0], max_length - 1))
        if ids.shape[0] == 0:
            raise ValueError('empty prompt')
        return ids

    def _make_state(ids, kwargs):
        budget = int(kwargs.get('max_new_tokens') or default_budget)
        budget = max(1, min(budget, max_length - int(ids.shape[0])))
        eos = kwargs.get('eos_token', default_eos)
        allowed = kwargs.get('allowed_tokens')
        if allowed is not None:
            mask = np.zeros((vocab,), bool)
            mask[np.asarray(list(allowed), np.int64)] = True
            if eos is not None and eos >= 0:
                mask[eos] = True       # the row must stay able to stop
            allowed = mask
        return {
            '_seq': next(counter),
            'prompt': ids,
            'tokens': [],              # generated ids (host)
            'text': '',                # decoded-so-far (host)
            'budget': budget,
            'eos': int(eos) if eos is not None else -1,
            'temperature': float(kwargs.get('temperature', temperature)),
            'greedy': kwargs.get('method', 'greedy') != 'sample',
            'stop': _compile_stop_condition(kwargs.get('stop_condition')),
            'allowed': allowed,
            'on_token': kwargs.get('on_token'),
            'fresh': None,             # (burst caches, burst logits, row)
            'done': False,
            't_start': time.perf_counter(),
            't_first': None,
        }

    def _prefill_batch(ids_list):
        s = max(len(t) for t in ids_list)
        s = -(-s // prompt_multiple) * prompt_multiple
        prompts = np.stack([
            np.pad(t, (0, s - len(t)), constant_values = pad_token)
            for t in ids_list])
        lengths = np.asarray([len(t) for t in ids_list], np.int32)
        return prefill_fn(params, jnp.asarray(prompts), jnp.asarray(lengths))

    def start_fn(inputs, ** kwargs):
        ids = _encode(inputs)
        caches, next_logits = _prefill_batch([ids])
        st = _make_state(ids, kwargs)
        st['fresh'] = (caches, next_logits, 0)
        return st

    def start_many(inputs_list, kwargs_list):
        """ONE prefill launch for a whole admission burst."""
        ids_list = [_encode(x) for x in inputs_list]
        caches, next_logits = _prefill_batch(ids_list)
        states = []
        for i, ids in enumerate(ids_list):
            st = _make_state(ids, kwargs_list[i])
            st['fresh'] = (caches, next_logits, i)
            states.append(st)
        return states

    start_fn.start_many = start_many
    start_fn.batchable_kwargs = (
        'max_new_tokens', 'eos_token', 'temperature', 'method',
        'stop_condition', 'allowed_tokens', 'on_token', 'rng')

    # ---- stepping ----------------------------------------------------------

    def _admit_fresh(states):
        """Assign slots + ONE scatter launch per admission burst for every
        not-yet-inserted state."""
        pending = [st for st in states if st['fresh'] is not None]
        if not pending:
            return
        by_src = {}                    # one burst = one shared prefill tree
        for st in pending:
            if not free_slots:         # engine guarantees <= max_batch rows
                raise RuntimeError('no free slot (engine max_batch_size '
                                   'must be <= stepper max_batch)')
            row = free_slots.pop()
            slot_of[st['_seq']] = row
            caches, logits, i = st['fresh']
            by_src.setdefault(id(caches), (caches, logits, []))[2] \
                .append((row, i, st))
        for caches, logits, entries in by_src.values():
            target = jnp.asarray([r for r, _, _ in entries], jnp.int32)
            src = jnp.asarray([i for _, i, _ in entries], jnp.int32)
            dev['caches'], dev['logits'] = insert_fn(
                dev['caches'], dev['logits'], target, caches, logits, src)
            for _, _, st in entries:
                st['fresh'] = None

    def _detok(st, new_ids):
        """Incremental detokenization: decode-all + emit the new suffix
        (robust to BPE merges that rewrite the tail)."""
        st['tokens'].extend(int(t) for t in new_ids)
        fragment = ''
        if tokenizer is not None:
            full = tokenizer.decode(st['tokens'])
            if isinstance(full, (list, tuple)):
                full = ''.join(full)
            fragment = full[len(st['text']):] if full.startswith(st['text']) \
                else full
            st['text'] = full
        if st['t_first'] is None and len(new_ids):
            st['t_first'] = time.perf_counter()
        if st['on_token'] is not None and len(new_ids):
            try:
                st['on_token'](fragment, [int(t) for t in new_ids])
            except Exception:
                logger.exception('on_token callback failed')

    def step_fn(states):
        with lock:
            _ensure_dev()
            # release slots owned by requests no longer in the active set
            # (resolved or aborted rows the engine dropped); step_fn is the
            # ONLY freer so a row can never be double-freed
            seqs = {st['_seq'] for st in states}
            for seq in [s for s in slot_of if s not in seqs]:
                free_slots.append(slot_of.pop(seq))
            _admit_fresh(states)

            row_of = {st['_seq']: slot_of[st['_seq']] for st in states}
            active = np.zeros((max_batch,), bool)
            finished = np.ones((max_batch,), bool)
            remaining = np.zeros((max_batch,), np.int32)
            eos = np.full((max_batch,), -1, np.int32)
            temp = np.ones((max_batch,), np.float32)
            greedy = np.ones((max_batch,), bool)
            need_mask = any(st['allowed'] is not None for st in states)
            mask = np.ones((max_batch, vocab), bool) if need_mask else None
            for st in states:
                r = row_of[st['_seq']]
                active[r] = not st['done']
                finished[r] = st['done']
                remaining[r] = max(0, st['budget'] - len(st['tokens']))
                eos[r] = st['eos']
                temp[r] = st['temperature']
                greedy[r] = st['greedy']
                if need_mask and st['allowed'] is not None:
                    mask[r] = st['allowed']

            rngs = jax.random.split(
                jax.random.PRNGKey((seed + next(step_counter)) % (2 ** 31)),
                chunk)
            args = (params, dev['caches'], dev['logits'],
                    jnp.asarray(active), jnp.asarray(finished),
                    jnp.asarray(remaining), jnp.asarray(eos),
                    jnp.asarray(temp), jnp.asarray(greedy), rngs)
            if need_mask:
                out = chunk_masked_fn(* args, jnp.asarray(mask))
            else:
                out = chunk_fn(* args)
            dev['caches'], dev['logits'] = out[0], out[1]
            fin, counts, toks = (np.asarray(out[2]), np.asarray(out[3]),
                                 np.asarray(out[4]))

            done = []
            for st in states:
                r = row_of[st['_seq']]
                n = int(counts[r])
                if n and not st['done']:
                    new_ids = toks[r, :n]
                    # the eos itself is not part of the emitted stream
                    if fin[r] and st['eos'] >= 0 and new_ids[-1] == st['eos']:
                        new_ids = new_ids[:-1]
                    _detok(st, new_ids)
                    if fin[r]:
                        st['done'] = True
                    elif st['stop'] is not None and tokenizer is not None \
                            and st['stop'](st['text']):
                        st['done'] = True
                done.append(bool(st['done']))
            return states, done

    # ---- finish ------------------------------------------------------------

    def finish_fn(st):
        # slot release happens in step_fn's sweep (single-freer invariant)
        out = {'tokens': list(st['tokens']),
               'n_tokens': len(st['tokens']),
               'prompt_tokens': st['prompt'].tolist()}
        if tokenizer is not None:
            out['text'] = st['text']
        if st['t_first'] is not None:
            out['first_token_s'] = st['t_first'] - st['t_start']
        return out

    finish_fn.async_ok = True          # pure host work
    step_fn._dev = dev                 # introspection (tests assert shardings)
    step_fn._slots = slot_of
    return start_fn, step_fn, finish_fn


def make_llm_engine(model, params, tokenizer = None, *, max_batch = 8,
                    engine_name = 'llm-serving', ** stepper_kwargs):
    """`ContinuousServingEngine` wired with `make_transformer_stepper` —
    the one-call analog of the reference's
    ``TensorRTLLMRuntime.load_engine`` (`tensorrt_llm_runtime.py:189`)."""
    start_fn, step_fn, finish_fn = make_transformer_stepper(
        model, params, tokenizer, max_batch = max_batch, ** stepper_kwargs)
    return ContinuousServingEngine(
        start_fn, step_fn, finish_fn,
        max_batch_size = max_batch, name = engine_name)
