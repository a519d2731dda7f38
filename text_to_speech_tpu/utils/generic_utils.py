"""Small generic helpers (time formatting, iterables, signatures).

Capability parity with ``/root/reference/utils/generic_utils.py:31,106``.
"""

import inspect
import queue


def convert_to_str(x):
    """Normalize bytes / 0-d arrays / nested containers to plain `str`
    (reference ``generic_utils.py:53``).  Numeric arrays pass through."""
    if isinstance(x, str) or x is None:
        return x
    import numpy as np
    if isinstance(x, np.ndarray):
        if np.issubdtype(x.dtype, np.number):
            return x
        if x.ndim == 0:
            x = x.item()
        else:
            return [convert_to_str(xi) for xi in x]
    if isinstance(x, bytes):
        return x.decode('utf-8')
    if isinstance(x, (list, tuple, set)):
        return [convert_to_str(xi) for xi in x]
    if isinstance(x, dict):
        return {convert_to_str(k): convert_to_str(v) for k, v in x.items()}
    return x


def get_enum_item(value, enum, upper_names = True):
    """Resolve `value` (member / name / value) to an `enum` member
    (reference ``generic_utils.py:194``)."""
    if isinstance(value, enum):
        return value
    if isinstance(value, str):
        name = value.upper() if upper_names else value
        if name in enum.__members__:
            return enum[name]
        for member in enum:                     # fall back to value match
            if member.value == value:
                return member
        raise KeyError('{!r} is not a valid {} : {}'.format(
            value, enum.__name__, tuple(enum.__members__)))
    return enum(value)


def time_to_string(seconds):
    """Human-readable duration: '123 ms', '12.345 s', '2 min 03.1 s', '1h 02min'."""
    if seconds < 0.001: return '{:.3f} ms'.format(seconds * 1000.)
    if seconds < 1.: return '{} ms'.format(int(seconds * 1000))
    if seconds < 60.: return '{:.3f} s'.format(seconds)
    m, s = divmod(seconds, 60.)
    if m < 60: return '{} min {:05.2f} s'.format(int(m), s)
    h, m = divmod(m, 60.)
    return '{}h {:02d}min'.format(int(h), int(m))


def create_iterable(generator, timeout = None):
    """Normalize `generator` into an iterable.

    Accepts: iterables, callables returning iterables, and queue.Queue-like
    objects (drained until a `None` sentinel, with optional `timeout`).
    """
    if isinstance(generator, queue.Queue) or (hasattr(generator, 'get') and not isinstance(generator, dict)):
        def _queue_iterator():
            while True:
                try:
                    item = generator.get(timeout = timeout)
                except queue.Empty:
                    return
                if item is None:
                    return
                yield item
        return _queue_iterator()
    if callable(generator) and not hasattr(generator, '__iter__'):
        return generator()
    return generator


def get_fn_name(fn):
    if hasattr(fn, '__name__'): return fn.__name__
    return fn.__class__.__name__


def get_args(fn):
    """Names of the positional/keyword parameters of `fn`."""
    return [
        name for name, p in inspect.signature(fn).parameters.items()
        if p.kind in (p.POSITIONAL_OR_KEYWORD, p.POSITIONAL_ONLY, p.KEYWORD_ONLY)
    ]


def get_kwargs(fn):
    """Dict of parameters of `fn` that have defaults."""
    return {
        name: p.default for name, p in inspect.signature(fn).parameters.items()
        if p.default is not inspect.Parameter.empty
    }


def has_kwargs(fn):
    return any(
        p.kind == p.VAR_KEYWORD for p in inspect.signature(fn).parameters.values()
    )


def signature_to_str(fn):
    return '{}{}'.format(get_fn_name(fn), inspect.signature(fn))


def filter_kwargs(fn, kwargs):
    """Keep only entries of `kwargs` accepted by `fn`'s signature."""
    if has_kwargs(fn): return kwargs
    accepted = set(get_args(fn))
    return {k: v for k, v in kwargs.items() if k in accepted}


def filter_df(df, ** conditions):
    """Filter a DataFrame by column conditions: value, list of values, or
    callable predicate (``utils/generic_utils.py:231-335`` analog)."""
    mask = None
    for column, cond in conditions.items():
        if callable(cond):
            col_mask = df[column].map(cond)
        elif isinstance(cond, (list, tuple, set)):
            col_mask = df[column].isin(list(cond))
        else:
            col_mask = df[column] == cond
        mask = col_mask if mask is None else (mask & col_mask)
    return df[mask] if mask is not None else df


def sample_df(df, n = None, n_sample = None, on = None, random_state = 0):
    """Sample rows; with `on` (a column), sample up to `n_sample` rows per
    unique value (balanced sampling)."""
    if on is not None:
        parts = [
            group.sample(n = min(n_sample or len(group), len(group)),
                         random_state = random_state)
            for _, group in df.groupby(on)
        ]
        import pandas as pd
        out = pd.concat(parts)
        return out if n is None else out.sample(n = min(n, len(out)),
                                                random_state = random_state)
    return df.sample(n = min(n or len(df), len(df)), random_state = random_state)


def aggregate_df(df, group_by, ** aggregations):
    """Group + aggregate: ``aggregate_df(df, 'speaker', time=('duration','sum'))``."""
    grouped = df.groupby(group_by)
    if not aggregations:
        return grouped.size().reset_index(name = 'count')
    out = grouped.agg(** {
        name: spec if isinstance(spec, tuple) else (spec, 'sum')
        for name, spec in aggregations.items()
    })
    return out.reset_index()


def to_json_serializable(data):
    """Recursively convert numpy scalars/arrays to plain python."""
    import numpy as np
    if isinstance(data, dict):
        return {k: to_json_serializable(v) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return [to_json_serializable(v) for v in data]
    if isinstance(data, np.integer): return int(data)
    if isinstance(data, np.floating): return float(data)
    if isinstance(data, np.ndarray): return data.tolist()
    if hasattr(data, 'item') and getattr(data, 'ndim', None) == 0: return data.item()
    return data
