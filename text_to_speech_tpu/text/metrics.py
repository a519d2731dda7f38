"""Text distance / similarity metrics with a dispatching registry.

Capability parity with ``/root/reference/utils/text/metrics.py``
(`text_distance:27` registry + batch/matrix wrapper, weighted
`edit_distance:86` with partial alignment, `hamming_distance:162`,
`exact_match:184`, `text_f1:189`).  Scalar metrics also live in
``train/metrics.py`` for the training loop; this module is the generic
text-comparison surface (per-pair weights, distance matrices, alignment
matrices).
"""

import numpy as np

from .cleaners import lowercase, remove_punctuation, remove_tokens, collapse_whitespace

_TEXT_DISTANCES = {}        # name -> (fn, is_similarity)


def register_text_distance(name, is_similarity = False):
    def deco(fn):
        _TEXT_DISTANCES[name] = (fn, is_similarity)
        return fn
    return deco


def list_text_distances():
    return sorted(_TEXT_DISTANCES)


def _to_text(x):
    if isinstance(x, bytes):
        return x.decode()
    if isinstance(x, np.ndarray):
        x = x.tolist()
    if isinstance(x, (list, tuple)) and x and isinstance(x[0], (int, np.integer)):
        return ' '.join(str(v) for v in x)
    return x


def text_distance(y_true, y_pred, method, *, mode = None, as_matrix = False,
                  ** kwargs):
    """Compare texts with the registered `method`.

    - scalars → scalar; two equal-length lists → elementwise vector;
      `as_matrix=True` (or one side scalar) → full (len_true, len_pred) grid.
    - `mode='distance'` / `'similarity'` sign-flips metrics registered with
      the opposite polarity so callers can always minimise / maximise.
    """
    if method not in _TEXT_DISTANCES:
        raise ValueError('Unknown text distance {!r} (known: {})'.format(
            method, list_text_distances()))
    fn, is_similarity = _TEXT_DISTANCES[method]

    def _one(a, b):
        res = fn(_to_text(a), _to_text(b), ** kwargs)
        if ((mode == 'similarity' and not is_similarity)
                or (mode == 'distance' and is_similarity)):
            # sign-flip only scalar results — multi-output metrics
            # (f1's 4-tuple, return_matrix) pass through untouched
            if np.isscalar(res) or (isinstance(res, np.ndarray) and res.ndim == 0):
                res = -res
        return res

    def _stack(results):
        """np.array when every element is scalar, plain list otherwise
        (ragged matrices / multi-output tuples)."""
        if all(np.isscalar(r) or (isinstance(r, np.ndarray) and r.ndim == 0)
               for r in results):
            return np.array(results)
        return results

    y_true, y_pred = _to_text(y_true), _to_text(y_pred)
    t_list = isinstance(y_true, (list, tuple))
    p_list = isinstance(y_pred, (list, tuple))
    if t_list and p_list:
        if as_matrix:
            rows = [_stack([_one(t, p) for p in y_pred]) for t in y_true]
            return np.array(rows) if all(
                isinstance(r, np.ndarray) for r in rows) else rows
        if len(y_true) != len(y_pred):
            raise ValueError('len(y_true) {} != len(y_pred) {}'.format(
                len(y_true), len(y_pred)))
        return _stack([_one(t, p) for t, p in zip(y_true, y_pred)])
    if t_list:
        return _stack([_one(t, y_pred) for t in y_true])
    if p_list:
        return _stack([_one(y_true, p) for p in y_pred])
    return _one(y_true, y_pred)


@register_text_distance('edit')
def edit_distance(hypothesis,
                  truth,
                  *,
                  partial = False,
                  deletion_cost = None,
                  insertion_cost = None,
                  replacement_cost = None,
                  default_deletion_cost = 1,
                  default_insertion_cost = 1,
                  default_replacement_cost = 1,
                  normalize = True,
                  return_matrix = False,
                  ** _):
    """Weighted Levenshtein distance between two sequences (str or list).

    Per-symbol cost dicts override the defaults (`replacement_cost` is
    nested: {from: {to: cost}}, directional).  `partial=True` computes the
    best partial alignment of `hypothesis` inside `truth` (min over end
    positions, free leading insertions).  `normalize` divides by the truth
    length (hypothesis length when partial).  DP rows are vectorized over
    the truth axis.
    """
    deletion_cost = deletion_cost or {}
    insertion_cost = insertion_cost or {}
    replacement_cost = replacement_cost or {}

    n, m = len(hypothesis), len(truth)
    del_costs = np.array(
        [0] + [deletion_cost.get(h, default_deletion_cost) for h in hypothesis],
        dtype = np.float64)
    ins_costs = np.array(
        [insertion_cost.get(t, default_insertion_cost) for t in truth],
        dtype = np.float64)
    truth_arr = np.array(list(truth), dtype = object)

    matrix = np.zeros((n + 1, m + 1))
    matrix[:, 0] = np.cumsum(del_costs)
    if not partial:
        matrix[0, 1:] = np.cumsum(ins_costs)

    for i in range(1, n + 1):
        h = hypothesis[i - 1]
        sub = np.array([replacement_cost.get(h, {}).get(t, default_replacement_cost)
                        for t in truth], dtype = np.float64)
        sub = matrix[i - 1, :-1] + sub * (truth_arr != h)
        dele = matrix[i - 1, 1:] + del_costs[i]
        best = np.minimum(dele, sub)
        # insertions chain along the row — sequential min
        prev = matrix[i, 0]
        row = matrix[i]
        for j in range(1, m + 1):
            prev = min(best[j - 1], prev + ins_costs[j - 1])
            row[j] = prev

    distance = float(matrix[-1, -1]) if not partial else float(np.min(matrix[-1, 1:]))
    if normalize:
        distance /= max(1, len(hypothesis) if partial else len(truth))
    return (distance, matrix) if return_matrix else distance


@register_text_distance('hamming')
def hamming_distance(hypothesis, truth, *, replacement_matrix = None,
                     normalize = True, ** _):
    """Weighted positional mismatch count; -1 when lengths differ."""
    if len(hypothesis) != len(truth):
        return -1
    replacement_matrix = replacement_matrix or {}
    distance = sum(
        replacement_matrix.get(a, {}).get(b, 1)
        for a, b in zip(hypothesis, truth) if a != b
    )
    return distance / len(truth) if normalize and truth else distance


def _normalize_f1(text, exclude = None):
    return collapse_whitespace(remove_tokens(
        remove_punctuation(lowercase(text)), exclude or ())).strip()


@register_text_distance('exact_match', is_similarity = True)
def exact_match(y_true, y_pred, normalize = True, exclude = None, ** _):
    if normalize:
        y_true, y_pred = _normalize_f1(y_true, exclude), _normalize_f1(y_pred, exclude)
    return int(y_true == y_pred)


@register_text_distance('f1', is_similarity = True)
def text_f1(y_true, y_pred, normalize = True, exclude = None, ** _):
    """→ (exact_match, f1, precision, recall) on whitespace tokens."""
    import collections

    if normalize:
        y_true, y_pred = _normalize_f1(y_true, exclude), _normalize_f1(y_pred, exclude)
    elif exclude:
        y_true = collapse_whitespace(remove_tokens(y_true, exclude))
        y_pred = collapse_whitespace(remove_tokens(y_pred, exclude))

    true_tokens, pred_tokens = y_true.split(), y_pred.split()
    em = int(y_true == y_pred)
    if not true_tokens or not pred_tokens:
        f1 = int(true_tokens == pred_tokens)
        return em, f1, f1, f1
    common = collections.Counter(true_tokens) & collections.Counter(pred_tokens)
    n_same = sum(common.values())
    if n_same == 0:
        return 0, 0, 0, 0
    precision = n_same / len(pred_tokens)
    recall = n_same / len(true_tokens)
    return em, 2 * precision * recall / (precision + recall), precision, recall
