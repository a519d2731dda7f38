"""Deep, tolerance-aware equality for nested structures and tensors.

Capability parity with ``/root/reference/utils/comparison_utils.py`` — the
backbone of the test assertions (`is_equal` / `is_diff`).
"""

import numpy as np


def is_equal(a, b, *, max_err = 1e-6, raise_error = False, path = ''):
    """Return (equal, message).  Tensors compare within `max_err` (absolute);
    dicts/lists/tuples recurse; other types use ==."""
    eq, msg = _compare(a, b, max_err, path)
    if not eq and raise_error:
        raise AssertionError(msg)
    return eq, msg


def is_diff(a, b, ** kwargs):
    eq, msg = is_equal(a, b, ** kwargs)
    return not eq, msg


def _is_arraylike(x):
    return isinstance(x, np.ndarray) or type(x).__module__.startswith(('jax', 'torch')) \
        or np.isscalar(x) and isinstance(x, (int, float, complex, np.number))


def _compare(a, b, max_err, path):
    where = ' at {}'.format(path) if path else ''

    if isinstance(a, dict) or isinstance(b, dict):
        if not (isinstance(a, dict) and isinstance(b, dict)):
            return False, 'type mismatch{}: {} vs {}'.format(where, type(a), type(b))
        if set(a.keys()) != set(b.keys()):
            return False, 'key mismatch{}: {} vs {}'.format(where, sorted(map(str, a)), sorted(map(str, b)))
        for k in a:
            eq, msg = _compare(a[k], b[k], max_err, '{}.{}'.format(path, k))
            if not eq: return eq, msg
        return True, ''

    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)) \
       and not (_np_able(a) and _np_able(b)):
        if len(a) != len(b):
            return False, 'length mismatch{}: {} vs {}'.format(where, len(a), len(b))
        for i, (ai, bi) in enumerate(zip(a, b)):
            eq, msg = _compare(ai, bi, max_err, '{}[{}]'.format(path, i))
            if not eq: return eq, msg
        return True, ''

    if isinstance(a, str) or isinstance(b, str):
        return (a == b), ('' if a == b else 'string mismatch{}: {!r} vs {!r}'.format(where, a, b))

    # numeric / tensor comparison
    try:
        a_np = np.asarray(a)
        b_np = np.asarray(b)
    except Exception:
        ok = a == b
        return bool(ok), '' if ok else 'value mismatch{}: {!r} vs {!r}'.format(where, a, b)

    if a_np.shape != b_np.shape:
        return False, 'shape mismatch{}: {} vs {}'.format(where, a_np.shape, b_np.shape)
    if a_np.dtype.kind in 'OUS' or b_np.dtype.kind in 'OUS':
        ok = np.array_equal(a_np, b_np)
        return bool(ok), '' if ok else 'array mismatch{}'.format(where)
    if a_np.dtype.kind == 'b':
        ok = np.array_equal(a_np, b_np)
        return bool(ok), '' if ok else 'bool array mismatch{}'.format(where)

    diff = np.abs(a_np.astype(np.float64) - b_np.astype(np.float64))
    err = float(np.max(diff)) if diff.size else 0.0
    if err <= max_err:
        return True, ''
    return False, 'max abs error {} > {}{} (shape {})'.format(err, max_err, where, a_np.shape)


def _np_able(x):
    """True when a list/tuple is a homogeneous numeric nest convertible to ndarray."""
    try:
        arr = np.asarray(x)
        return arr.dtype.kind in 'ifub'
    except Exception:
        return False
