"""Distance / similarity metric registry.

Capability parity with ``/root/reference/utils/distances.py:39``:
cosine/euclidean/manhattan/dot metrics with pairwise `as_matrix` mode —
used by embedding selection, centroid computation and GE2E-style training.
Operates on numpy or jax arrays (jnp used when any input is a jax array).
"""

import numpy as np

_METRICS = {}


def register_metric(name):
    def deco(fn):
        _METRICS[name] = fn
        return fn
    return deco


def _xp(*arrays):
    if any(type(a).__module__.startswith('jax') for a in arrays):
        import jax.numpy as jnp
        return jnp
    return np


def _prepare(x, y, as_matrix):
    xp = _xp(x, y)
    x, y = xp.asarray(x), xp.asarray(y)
    if x.ndim == 1: x = x[None, :]
    if y.ndim == 1: y = y[None, :]
    if as_matrix:
        x = x[:, None, :]
        y = y[None, :, :]
    return xp, x, y


@register_metric('euclidean')
def euclidean_distance(x, y, as_matrix = False, ** kwargs):
    xp, x, y = _prepare(x, y, as_matrix)
    return xp.sqrt(xp.sum(xp.square(x - y), axis = -1))


@register_metric('manhattan')
def manhattan_distance(x, y, as_matrix = False, ** kwargs):
    xp, x, y = _prepare(x, y, as_matrix)
    return xp.sum(xp.abs(x - y), axis = -1)


@register_metric('dot')
def dot_product(x, y, as_matrix = False, ** kwargs):
    xp, x, y = _prepare(x, y, as_matrix)
    return xp.sum(x * y, axis = -1)


@register_metric('cosine')
def cosine_similarity(x, y, as_matrix = False, epsilon = 1e-9, ** kwargs):
    xp, x, y = _prepare(x, y, as_matrix)
    num = xp.sum(x * y, axis = -1)
    den = xp.sqrt(xp.sum(x * x, axis = -1)) * xp.sqrt(xp.sum(y * y, axis = -1))
    return num / (den + epsilon)


@register_metric('cosine_distance')
def cosine_distance(x, y, ** kwargs):
    return 1. - cosine_similarity(x, y, ** kwargs)


def distance(x, y, method = 'euclidean', ** kwargs):
    """Compute a registered metric.  `as_matrix=True` → pairwise (N, M)."""
    if method not in _METRICS:
        raise ValueError('Unknown distance {!r} (known: {})'.format(
            method, sorted(_METRICS)
        ))
    return _METRICS[method](x, y, ** kwargs)


def list_metrics():
    return sorted(_METRICS)
