"""Autoregressive token generation over KV caches.

Capability parity with
``/root/reference/architectures/generation_utils.py`` (`infer:57-170` with
greedy `:171` and beam search `:302`, logits processing / temperature /
top-k / top-p filters `:484-551`, XLA state updates `:563-747`,
`InferenceConfig/Output` namedtuples) — TPU-native: ONE `lax.while_loop`
over preallocated buffers + per-layer KV caches; beam search keeps the beam
axis folded into the batch so every step stays a fixed-shape batched matmul.
"""

import collections

import jax
import jax.numpy as jnp
from jax import lax

InferenceOutput = collections.namedtuple(
    'InferenceOutput', ['tokens', 'lengths', 'scores'])


def process_logits(logits, *, temperature = 1.0, top_k = None, top_p = None,
                   forbidden_tokens = None, lengths = None,
                   length_temperature = None, logits_filter = None):
    """Temperature + top-k + nucleus filtering (masked entries → -inf).

    `length_temperature` scales logits by `(length + 1) ** t` given the
    current `lengths` — t > 0 favors longer outputs, t < 0 shorter
    (reference ``generation_utils.py:488-516``).  `logits_filter` is either
    a callable `logits -> logits` or a list of token ids to forbid.
    """
    if temperature != 1.0:
        logits = logits / temperature
    if length_temperature is not None and lengths is not None:
        scale = (jnp.asarray(lengths, logits.dtype) + 1.) ** length_temperature
        logits = logits * scale.reshape((-1,) + (1,) * (logits.ndim - 1))
    if logits_filter is not None:
        if callable(logits_filter):
            logits = logits_filter(logits)
        else:
            logits = logits.at[..., jnp.asarray(logits_filter)].set(-jnp.inf)
    if forbidden_tokens is not None:
        logits = logits.at[..., forbidden_tokens].set(-jnp.inf)
    if top_k is not None:
        kth = jnp.sort(logits, axis = -1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None:
        sorted_logits = jnp.sort(logits, axis = -1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis = -1)
        cum = jnp.cumsum(probs, axis = -1)
        cutoff_idx = jnp.sum(cum < top_p, axis = -1, keepdims = True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis = -1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


def generate(model,
             params,
             prompt_tokens,
             *,
             max_new_tokens = 64,
             eos_token = None,
             method = 'greedy',
             temperature = 1.0,
             top_k = None,
             top_p = None,
             num_beams = 4,
             length_penalty = 1.0,
             encoder_output = None,
             encoder_mask = None,
             rng = None):
    """Generate continuations of `prompt_tokens` (B, T0).

    method: 'greedy' | 'sample' | 'beam'.
    Returns InferenceOutput(tokens (B, T0+max_new), lengths, scores).
    """
    if method == 'beam':
        return beam_search(
            model, params, prompt_tokens, max_new_tokens = max_new_tokens,
            eos_token = eos_token, num_beams = num_beams,
            length_penalty = length_penalty, encoder_output = encoder_output,
            encoder_mask = encoder_mask,
        )

    if rng is None: rng = jax.random.PRNGKey(0)
    B, T0 = prompt_tokens.shape
    total = T0 + max_new_tokens

    caches = model.init_caches(B, total)
    logits, caches = model.decode(
        params, prompt_tokens, caches = caches,
        encoder_output = encoder_output, encoder_mask = encoder_mask,
    )
    next_logits = logits[:, -1]

    tokens = jnp.concatenate([
        prompt_tokens, jnp.zeros((B, max_new_tokens), prompt_tokens.dtype)
    ], axis = 1)

    def sample_token(logits, rng):
        logits = process_logits(logits, temperature = temperature,
                                top_k = top_k, top_p = top_p)
        if method == 'sample':
            return jax.random.categorical(rng, logits, axis = -1)
        return jnp.argmax(logits, axis = -1)

    init = dict(
        t = jnp.zeros((), jnp.int32),
        tokens = tokens,
        caches = caches,
        logits = next_logits,
        finished = jnp.zeros((B,), bool),
        lengths = jnp.zeros((B,), jnp.int32),
        scores = jnp.zeros((B,)),
        rng = rng,
    )

    def cond(s):
        return jnp.logical_and(s['t'] < max_new_tokens,
                               jnp.logical_not(jnp.all(s['finished'])))

    def body(s):
        step_rng = jax.random.fold_in(s['rng'], s['t'])
        tok = sample_token(s['logits'], step_rng)
        logp = jax.nn.log_softmax(s['logits'], axis = -1)
        tok_score = jnp.take_along_axis(logp, tok[:, None], axis = -1)[:, 0]

        if eos_token is not None:
            finished = jnp.logical_or(s['finished'], tok == eos_token)
        else:
            finished = s['finished']
        tok = jnp.where(s['finished'], 0, tok)

        tokens = lax.dynamic_update_slice(s['tokens'], tok[:, None], (0, T0 + s['t']))
        logits, caches = model.decode(params, tok[:, None], caches = s['caches'])

        return dict(
            t = s['t'] + 1,
            tokens = tokens,
            caches = caches,
            logits = logits[:, -1],
            finished = finished,
            lengths = s['lengths'] + (~s['finished']).astype(jnp.int32),
            scores = s['scores'] + jnp.where(s['finished'], 0., tok_score),
            rng = s['rng'],
        )

    final = lax.while_loop(cond, body, init)
    return InferenceOutput(tokens = final['tokens'],
                           lengths = T0 + final['lengths'],
                           scores = final['scores'])


def beam_search(model, params, prompt_tokens, *, max_new_tokens = 64,
                eos_token = None, num_beams = 4, length_penalty = 1.0,
                encoder_output = None, encoder_mask = None):
    """Batched beam search: beams folded into the batch axis (B*K rows)."""
    B, T0 = prompt_tokens.shape
    K = num_beams
    total = T0 + max_new_tokens

    # expand: (B, T0) -> (B*K, T0)
    flat = jnp.repeat(prompt_tokens, K, axis = 0)
    if encoder_output is not None:
        encoder_output = jnp.repeat(encoder_output, K, axis = 0)
        if encoder_mask is not None:
            encoder_mask = jnp.repeat(encoder_mask, K, axis = 0)

    caches = model.init_caches(B * K, total)
    logits, caches = model.decode(params, flat, caches = caches,
                                  encoder_output = encoder_output,
                                  encoder_mask = encoder_mask)
    next_logits = logits[:, -1]                         # (B*K, V)
    V = next_logits.shape[-1]

    tokens = jnp.concatenate([
        flat, jnp.zeros((B * K, max_new_tokens), flat.dtype)
    ], axis = 1)
    # beam 0 starts live, others at -inf so the first expansion seeds from it
    beam_scores = jnp.tile(jnp.array([0.] + [-1e9] * (K - 1)), (B,))
    finished = jnp.zeros((B * K,), bool)
    lengths = jnp.zeros((B * K,), jnp.int32)

    def gather_beams(tree, idx):
        """idx (B, K) of source beams (flat indices into B*K); scalar leaves
        (e.g. the shared cache index) pass through."""
        flat_idx = idx.reshape(-1)
        return jax.tree_util.tree_map(
            lambda x: x if jnp.ndim(x) == 0 else x[flat_idx], tree)

    state = dict(t = jnp.zeros((), jnp.int32), tokens = tokens, caches = caches,
                 logits = next_logits, scores = beam_scores,
                 finished = finished, lengths = lengths)

    def cond(s):
        return jnp.logical_and(s['t'] < max_new_tokens,
                               jnp.logical_not(jnp.all(s['finished'])))

    def body(s):
        logp = jax.nn.log_softmax(s['logits'], axis = -1)        # (B*K, V)
        # finished beams only extend with a pad at no cost
        logp = jnp.where(s['finished'][:, None],
                         jnp.full_like(logp, -1e9).at[:, 0].set(0.), logp)
        cand = s['scores'][:, None] + logp                        # (B*K, V)
        cand = cand.reshape(B, K * V)
        top_scores, top_idx = lax.top_k(cand, K)                  # (B, K)
        src_beam = top_idx // V + jnp.arange(B)[:, None] * K      # flat source row
        new_tok = (top_idx % V).reshape(-1)

        new_state = gather_beams(
            {k: s[k] for k in ('tokens', 'caches', 'finished', 'lengths')}, src_beam)
        tokens = lax.dynamic_update_slice(
            new_state['tokens'], new_tok[:, None], (0, T0 + s['t']))

        if eos_token is not None:
            now_finished = jnp.logical_or(new_state['finished'], new_tok == eos_token)
        else:
            now_finished = new_state['finished']
        lengths = new_state['lengths'] + (~new_state['finished']).astype(jnp.int32)

        logits, caches = model.decode(params, new_tok[:, None],
                                      caches = new_state['caches'],
                                      encoder_output = encoder_output,
                                      encoder_mask = encoder_mask)
        return dict(t = s['t'] + 1, tokens = tokens, caches = caches,
                    logits = logits[:, -1], scores = top_scores.reshape(-1),
                    finished = now_finished, lengths = lengths)

    final = lax.while_loop(cond, body, state)

    # pick the best beam per batch row (length-penalized)
    scores = final['scores'].reshape(B, K)
    lengths = final['lengths'].reshape(B, K)
    norm = scores / jnp.maximum(lengths.astype(jnp.float32), 1.) ** length_penalty
    best = jnp.argmax(norm, axis = -1)
    flat_best = best + jnp.arange(B) * K
    return InferenceOutput(
        tokens = final['tokens'][flat_best],
        lengths = T0 + lengths[jnp.arange(B), best],
        scores = scores[jnp.arange(B), best],
    )
