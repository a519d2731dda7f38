"""Lazy numpy/JAX ops dispatcher.

Capability parity with the reference's backend-portable ``ops`` namespace
(``/root/reference/utils/keras/ops/builder.py:26`` — per-call resolution to
numpy for eager non-tensor inputs vs the accelerated backend): ``xp.foo(x)``
runs ``jnp.foo`` when any argument is a JAX array (or inside a trace) and
``np.foo`` otherwise, so utility code works on host data without device
round-trips yet composes with jit.

Usage::

    from text_to_speech_tpu import xp
    y = xp.matmul(a, b)          # numpy or jnp depending on inputs
    xp.convert_to_tensor(x)      # force onto the device
    xp.convert_to_numpy(x)       # force onto the host
"""

import sys
import types

import numpy as np


def _is_jax(value):
    return type(value).__module__.split('.')[0] in ('jax', 'jaxlib')


def _any_jax(args, kwargs):
    import itertools
    for value in itertools.chain(args, kwargs.values()):
        if _is_jax(value):
            return True
        if isinstance(value, (list, tuple)) and any(_is_jax(v) for v in value):
            return True
    return False


def _in_trace():
    try:
        import jax.core
        return isinstance(
            jax.numpy.zeros(()) + 0, jax.core.Tracer
        )
    except Exception:
        return False


class _Dispatcher(types.ModuleType):
    """Module-level __getattr__ resolving ops per call."""

    def __getattr__(self, name):
        if name.startswith('__'):
            raise AttributeError(name)

        if name == 'convert_to_tensor':
            def convert_to_tensor(x, dtype = None):
                import jax.numpy as jnp
                return jnp.asarray(x, dtype = dtype)
            return convert_to_tensor
        if name == 'convert_to_numpy':
            def convert_to_numpy(x):
                return np.asarray(x)
            return convert_to_numpy
        if name == 'is_tensor':
            return _is_jax

        def dispatched(* args, ** kwargs):
            if _any_jax(args, kwargs):
                import jax.numpy as jnp
                return getattr(jnp, name)(* args, ** kwargs)
            np_fn = getattr(np, name, None)
            if np_fn is not None:
                return np_fn(* args, ** kwargs)
            import jax.numpy as jnp
            return getattr(jnp, name)(* args, ** kwargs)

        dispatched.__name__ = name
        return dispatched


sys.modules[__name__].__class__ = _Dispatcher
