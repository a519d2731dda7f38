"""Token-level utilities: logits masking (jittable) and batch text filtering.

Capability parity with ``/root/reference/utils/text/tokens_processing.py``
(`mask_tokens:41`, `mask_batch_tokens:50`, `mask_slice_tokens:62`,
`filter_texts:83`, `process_model_output:20`).  Masking runs as jnp scatter
updates (`.at[].set`) so it composes under `jax.jit`; filtering is host-side
numpy (it shapes ragged batches *before* device dispatch).
"""

import numpy as np

from ..utils.sequence_utils import pad_batch


def mask_tokens(logits, indices, value = float('-inf')):
    """Set `logits[b, t] = value` for each (b, t) row of `indices` (N, 2).
    Jittable scatter equivalent of ``logits[indices] = value``."""
    import jax.numpy as jnp

    indices = jnp.asarray(indices)
    return jnp.asarray(logits).at[indices[:, 0], indices[:, 1]].set(value)


def mask_batch_tokens(logits, token_ids, value = float('-inf')):
    """Set `logits[:, token_ids] = value` for every batch row (jittable)."""
    import jax.numpy as jnp

    return jnp.asarray(logits).at[:, jnp.asarray(token_ids)].set(value)


def mask_slice_tokens(logits, index, remove_after, value = float('-inf')):
    """Mask `logits[:, :index]` (`remove_after=False`) or `logits[:, index:]`
    (`remove_after=True`).  `index` may be traced: the mask is built by
    comparing a static iota against it, so the op stays jittable with
    dynamic cut points."""
    import jax.numpy as jnp

    logits = jnp.asarray(logits)
    positions = jnp.arange(logits.shape[-1])
    keep = positions < index if remove_after else positions >= index
    return jnp.where(keep[None, :], logits, jnp.asarray(value, logits.dtype))


def process_model_output(output, offset = None, lengths = None):
    """Strip padding from model outputs: slice each row to
    `[offset:length]` and return numpy (lists of rows for batched input).
    Accepts an output object carrying `.tokens` / `.lengths` / `.offset`."""
    if hasattr(output, 'lengths') or hasattr(output, 'offset'):
        lengths = np.asarray(output.lengths)
        if hasattr(output, 'offset'):
            offset = np.asarray(output.offset)
            if lengths.ndim == 2 and offset.ndim == 1:
                offset = np.tile(offset[:, None], [1, lengths.shape[1]])
        else:
            offset = np.zeros_like(lengths)
        output = output.tokens
    elif lengths is None:
        return getattr(output, 'tokens', output)
    lengths = np.asarray(lengths)
    if offset is None:
        offset = np.zeros_like(lengths)

    if lengths.ndim:
        return [process_model_output(out, off, length)
                for out, off, length in zip(output, np.asarray(offset), lengths)]
    return np.asarray(output)[int(offset):int(lengths)]


def filter_texts(encoded_texts,
                 lengths,
                 *,
                 min_text_length = -1,
                 max_text_length = -1,
                 max_sentences = -1,
                 max_sentence_length = -1,
                 max_total_length = -1,
                 sort_by_length = False,
                 max_texts = -1,
                 select_mode = 'start',
                 required_idx = -1,
                 flatten = True,
                 return_indices = False,
                 rng = None,
                 ** _):
    """Filter a ragged batch of encoded texts by per-text / total length
    budgets and count limits.

    `lengths` is (N,) or (N, S) for multi-sentence rows (filtered on total,
    per-sentence max, and sentence count).  `max_total_length` drops texts
    (shortest-first when `sort_by_length`) once the running total exceeds
    the budget; `max_texts` keeps at most that many ('start'/'end'/'random'
    `select_mode`).  `required_idx` pins one text: it is always counted
    first, and if IT gets filtered everything is dropped.  2-D batches are
    flattened to (total_sentences, T) unless `flatten=False`.
    """
    required_idx = int(required_idx)
    lengths = pad_batch(lengths, dtype = np.int32, pad_value = 0) \
        if not isinstance(lengths, np.ndarray) else lengths
    is_multi = lengths.ndim == 2
    text_lengths = lengths.sum(axis = -1) if is_multi else lengths

    valid = np.ones((len(text_lengths),), dtype = bool)
    if min_text_length > -1:
        valid[text_lengths < min_text_length] = False
    if max_text_length > -1:
        valid[text_lengths > max_text_length] = False
    if is_multi:
        if max_sentences > 0:
            valid[(lengths > 0).sum(axis = -1) > max_sentences] = False
        if max_sentence_length > -1:
            valid[lengths.max(axis = -1) > max_sentence_length] = False

    if max_total_length > 0 and text_lengths[valid].sum() > max_total_length:
        if sort_by_length:
            order = np.argsort(text_lengths)
            order = order[valid[order]]
        else:
            order = np.where(valid)[0]
        if required_idx != -1:
            order = np.concatenate([[required_idx], order[order != required_idx]])
        over = np.cumsum(text_lengths[order]) > max_total_length
        valid[order[over]] = False

    if max_texts > 0:
        budget = max_texts - (1 if required_idx != -1 else 0)
        if valid.sum() > budget:
            order = np.where(valid)[0]
            if required_idx != -1:
                order = order[order != required_idx]
            if select_mode == 'random':
                drop = (rng or np.random.default_rng()).choice(
                    order, size = max(0, len(order) - budget), replace = False)
            elif select_mode == 'start':
                drop = order[budget:]
            elif select_mode == 'end':
                drop = order[:-budget] if budget else order
            else:
                raise ValueError('Unknown select_mode {!r}'.format(select_mode))
            valid[drop] = False

    if required_idx != -1 and not valid[required_idx]:
        valid[:] = False

    lengths = lengths[valid]
    if isinstance(encoded_texts, list):
        encoded_texts = [t for t, ok in zip(encoded_texts, valid) if ok]
    else:
        encoded_texts = encoded_texts[valid]
        if is_multi and flatten:
            encoded_texts = encoded_texts.reshape(-1, encoded_texts.shape[-1])
            lengths = lengths.reshape(-1)
            encoded_texts = encoded_texts[lengths > 0]
            lengths = lengths[lengths > 0]
        if len(encoded_texts) > 0:
            encoded_texts = encoded_texts[..., :lengths.max()]
            if is_multi and not flatten:
                encoded_texts = encoded_texts[:, :(lengths > 0).sum(axis = -1).max(), :]

    if return_indices:
        return encoded_texts, lengths, np.where(valid)[0]
    return encoded_texts, lengths
