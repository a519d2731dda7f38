"""Batching / padding helpers used throughout the data and XLA-bucketing paths.

Capability parity with ``/root/reference/utils/sequence_utils.py`` (`pad_batch`,
`pad_to_multiple`).  `pad_to_multiple` is the backbone of shape bucketing:
XLA compiles one program per padded-shape bucket instead of one per length.
"""

import numpy as np


def pad_batch(batch, pad_value = 0, max_length = None, dtype = None):
    """Stack a list of variable-length arrays into one padded array.

    Arrays may differ in any axis; the result shape is the per-axis max
    (or `max_length` for axis 0 when given).
    """
    if len(batch) == 0: return np.array([])
    batch = [np.asarray(b) for b in batch]
    if dtype is None: dtype = batch[0].dtype

    ndim = batch[0].ndim
    if any(b.ndim != ndim for b in batch):
        raise ValueError('All batch items must have the same rank')

    if ndim == 0:
        return np.array(batch, dtype = dtype)

    max_shape = [max(b.shape[i] for b in batch) for i in range(ndim)]
    if max_length is not None:
        max_shape[0] = max(max_shape[0], max_length)

    out = np.full([len(batch)] + max_shape, pad_value, dtype = dtype)
    for i, b in enumerate(batch):
        out[(i,) + tuple(slice(0, s) for s in b.shape)] = b
    return out


def pad_to_multiple(data, multiple, axis = 0, constant_values = 0):
    """Pad `data` along `axis` so its length is a multiple of `multiple`."""
    xp = _array_module(data)
    length = data.shape[axis]
    rem = length % multiple
    if rem == 0: return data
    pad_len = multiple - rem
    pads = [(0, 0)] * data.ndim
    pads[axis] = (0, pad_len)
    return xp.pad(data, pads, mode = 'constant', constant_values = constant_values)


def truncate(data, max_length, axis = 0):
    if data.shape[axis] <= max_length: return data
    slices = [slice(None)] * data.ndim
    slices[axis] = slice(0, max_length)
    return data[tuple(slices)]


def _array_module(data):
    if type(data).__module__.startswith('jax'):
        import jax.numpy as jnp
        return jnp
    return np
