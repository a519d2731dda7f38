"""Class / function decoration helpers.

Capability parity with ``/root/reference/utils/wrappers.py``
(`copy_methods:15` attribute-delegation class decorator, signature-updating
`partial:26`, `dispatch_wrapper:109` extension-dispatch registries).
"""

import functools
import inspect


def copy_methods(attr_name, ** methods):
    """Class decorator delegating methods/properties to an attribute.

    ``@copy_methods('tokenizer', encode='encode', vocab_size='vocab_size')``
    adds ``self.encode(...) -> self.tokenizer.encode(...)`` (callables) and
    ``self.vocab_size -> self.tokenizer.vocab_size`` (non-callables become
    properties).
    """
    def decorator(cls):
        for new_name, target_name in methods.items():
            def make_delegate(target):
                def method(self, * args, ** kwargs):
                    return getattr(getattr(self, attr_name), target)(* args, ** kwargs)
                method.__name__ = target
                return method

            def make_property(target):
                return property(lambda self: getattr(getattr(self, attr_name), target))

            # decide callable vs property lazily at first access when possible
            class _Descriptor:
                def __init__(self, target):
                    self.target = target

                def __get__(self, obj, objtype = None):
                    if obj is None: return self
                    value = getattr(getattr(obj, attr_name), self.target)
                    if callable(value):
                        return value
                    return value

            setattr(cls, new_name, _Descriptor(target_name))
        return cls
    return decorator


def partial(fn = None, * partial_args, ** partial_kwargs):
    """`functools.partial` that also rewrites the visible signature and
    docstring (introspection-friendly)."""
    if fn is None:
        return lambda f: partial(f, * partial_args, ** partial_kwargs)

    wrapped = functools.partial(fn, * partial_args, ** partial_kwargs)
    functools.update_wrapper(wrapped, fn)
    try:
        sig = inspect.signature(fn)
        params = list(sig.parameters.values())[len(partial_args):]
        params = [
            p.replace(default = partial_kwargs.get(p.name, p.default))
            if p.name in partial_kwargs else p
            for p in params
        ]
        wrapped.__signature__ = sig.replace(parameters = params)
    except (TypeError, ValueError):
        pass
    return wrapped


def dispatch_wrapper(registry, name, default = None):
    """Build an extension/key-dispatched function with a `dispatch` decorator
    for registering handlers.

    ``load = dispatch_wrapper(_loaders, 'extension')(generic_load)`` then
    ``@load.dispatch('wav')`` (or ``@load.dispatch`` using fn-name suffix).
    """
    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(* args, ** kwargs):
            return fn(* args, ** kwargs)

        def dispatch(handler = None, * keys):
            def register(h, hkeys):
                if not hkeys:
                    # derive key from function name suffix: read_wav -> wav
                    hkeys = (h.__name__.split('_')[-1],)
                for key in hkeys:
                    registry[key] = h
                return h
            if handler is None:
                return lambda h: register(h, keys)
            if isinstance(handler, str):
                return lambda h: register(h, (handler,) + keys)
            return register(handler, keys)

        wrapper.dispatch = dispatch
        wrapper.methods = registry
        wrapper.dispatch_arg = name
        return wrapper
    return decorator
