"""Universal compilation decorator + execution contexts.

Capability parity with ``/root/reference/utils/keras/compile.py:45,167`` and
``utils/keras/ops/execution_contexts.py:21-113``:

  - `TensorSpec` annotations drive argument casting and static-argument
    detection (``static=True`` args become jit static_argnames);
  - `graph_compile` wraps a function with a per-mode cache: XLA (jit),
    or eager (bypass) selected by thread-local execution contexts
    `XLAExecution` / `EagerExecution`;
  - `prepare_for_xla` hooks implement shape bucketing (pad-to-multiple)
    before entering the compiled path, so jit compiles once per bucket;
  - `execute_eagerly` runs a host-side python function from inside a jitted
    computation (``jax.pure_callback``) — the `tf.py_function` analog that
    lets file I/O live inside device pipelines.
"""

import logging
import threading
import functools
import inspect

import numpy as np

logger = logging.getLogger(__name__)

_context = threading.local()


class TensorSpec:
    """Argument annotation: expected shape/dtype, or `static=True` for
    compile-time constants."""

    def __init__(self, shape = None, dtype = 'float32', static = False):
        self.shape = shape
        self.dtype = dtype
        self.static = static

    def cast(self, value):
        if value is None or self.static:
            return value
        import jax.numpy as jnp
        return jnp.asarray(value, dtype = self.dtype)

    def __repr__(self):
        return 'TensorSpec(shape={}, dtype={}, static={})'.format(
            self.shape, self.dtype, self.static)


class XLAExecution:
    """Context manager forcing the XLA (jit) path on this thread."""

    def __init__(self, force = True):
        self.mode = 'xla' if force else None

    def __enter__(self):
        self._prev = getattr(_context, 'mode', None)
        _context.mode = self.mode
        return self

    def __exit__(self, *exc):
        _context.mode = self._prev
        return False


class EagerExecution(XLAExecution):
    """Context manager forcing eager (uncompiled) execution on this thread."""

    def __init__(self):
        self.mode = 'eager'


def is_eager():
    return getattr(_context, 'mode', None) == 'eager'


def graph_compile(fn = None, *, static_args = (), prepare_for_xla = None,
                  cast_kwargs = True, jit_options = None):
    """Decorator: compile `fn` with jax.jit, honoring TensorSpec annotations.

    - annotated ``static=True`` params (and `static_args` names) become
      static_argnames;
    - other annotated params are cast to their spec dtype;
    - `prepare_for_xla(bound_arguments) -> dict` may rewrite arguments
      (shape bucketing) before the compiled call;
    - under `EagerExecution`, the raw python function runs instead.
    """
    def decorate(func):
        import jax

        signature = inspect.signature(func)
        specs = {
            name: param.annotation
            for name, param in signature.parameters.items()
            if isinstance(param.annotation, TensorSpec)
        }
        static_names = tuple(
            name for name, spec in specs.items() if spec.static
        ) + tuple(static_args)

        compiled = jax.jit(
            func, static_argnames = static_names or None,
            ** (jit_options or {}),
        )

        @functools.wraps(func)
        def wrapper(* args, ** kwargs):
            bound = signature.bind_partial(* args, ** kwargs)
            bound.apply_defaults()
            arguments = dict(bound.arguments)

            if prepare_for_xla is not None and not is_eager():
                arguments.update(prepare_for_xla(arguments) or {})

            if cast_kwargs and not is_eager():
                for name, spec in specs.items():
                    if name in arguments:
                        arguments[name] = spec.cast(arguments[name])

            if is_eager():
                return func(** arguments)
            return compiled(** arguments)

        wrapper.eager_fn = func
        wrapper.compiled_fn = compiled
        wrapper.static_argnames = static_names
        return wrapper

    if fn is not None:
        return decorate(fn)
    return decorate


def execute_eagerly(fn = None, *, output_shape = None, output_dtype = 'float32'):
    """Wrap a host-side python function so it is callable from inside jit
    (``jax.pure_callback``) — the `tf.numpy_function` analog.

    `output_shape` may contain None for dims resolved from the first input's
    leading dims; prefer fully-static shapes on TPU.
    """
    def decorate(func):
        import jax
        import jax.numpy as jnp

        @functools.wraps(func)
        def wrapper(* args, ** kwargs):
            shape = output_shape
            if shape is None or any(s is None for s in (shape or ())):
                # eager fallback: call directly (host side)
                return jnp.asarray(func(* [np.asarray(a) for a in args], ** kwargs),
                                   dtype = output_dtype)
            result_spec = jax.ShapeDtypeStruct(tuple(shape), np.dtype(output_dtype))
            return jax.pure_callback(
                lambda * a: np.asarray(func(* a, ** kwargs), dtype = output_dtype),
                result_spec, * args,
            )

        wrapper.python_fn = func
        return wrapper

    if fn is not None:
        return decorate(fn)
    return decorate


def pad_to_multiple_hook(arg_name, multiple, axis = 1, value = 0):
    """Build a `prepare_for_xla` hook bucketing one argument's shape."""
    from .utils.sequence_utils import pad_to_multiple

    def hook(arguments):
        if arg_name in arguments and arguments[arg_name] is not None:
            arguments[arg_name] = pad_to_multiple(
                np.asarray(arguments[arg_name]), multiple, axis = axis,
                constant_values = value,
            )
        return arguments

    return hook
