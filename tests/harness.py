"""Test harness mechanisms mirroring the reference's strategy
(/root/reference/tests/__init__.py:69-162):

- `assert_reproducible(value, name)` — write-once golden files: the first
  run records the value under `tests/__reproduction/`, later runs compare
  within `max_err` (the reference's `assertReproductible`, used there for
  audio-processing and per-STFT-class mel outputs);
- `assert_jit_compatible(fn, *args)` — run a function eagerly and under
  `jax.jit` and compare outputs (the reference's `assertGraphCompatible`
  tf.function harness, re-based on XLA).
"""

import os

import numpy as np

REPRODUCTION_DIR = os.path.join(os.path.dirname(__file__), '__reproduction')


def assert_reproducible(value, name, max_err = 1e-6):
    """Golden-file reproducibility: first call records, later calls compare."""
    value = np.asarray(value)
    os.makedirs(REPRODUCTION_DIR, exist_ok = True)
    path = os.path.join(REPRODUCTION_DIR, name + '.npy')
    if not os.path.exists(path):
        np.save(path, value)
        return
    golden = np.load(path)
    assert golden.shape == value.shape, (golden.shape, value.shape)
    err = np.abs(value.astype(np.float64) - golden.astype(np.float64)).max()
    assert err <= max_err, 'reproducibility drift for %s: %.3g > %.3g' % (
        name, err, max_err)


def assert_jit_compatible(fn, * args, max_err = 1e-5, static_argnums = ()):
    """`fn(*args)` must produce the same outputs eagerly and under jit."""
    import jax

    eager = fn(* args)
    jitted = jax.jit(fn, static_argnums = static_argnums)(* args)
    flat_e, _ = jax.tree_util.tree_flatten(eager)
    flat_j, _ = jax.tree_util.tree_flatten(jitted)
    assert len(flat_e) == len(flat_j)
    for e, j in zip(flat_e, flat_j):
        err = np.abs(np.asarray(e, np.float64)
                     - np.asarray(j, np.float64)).max()
        assert err <= max_err, 'jit/eager divergence: %.3g > %.3g' % (
            err, max_err)
    return jitted
