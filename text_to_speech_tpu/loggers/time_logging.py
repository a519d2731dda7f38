"""Hierarchical wall-clock tracing.

Capability parity with the reference's span tree
(``/root/reference/loggers/time_logging.py:27-178``): a ``@timer`` decorator
and a ``Timer`` context manager push named spans into a per-thread tree that
can be printed as an indented report.  Designed host-side; device work is
timed around dispatch (JAX device timings come from ``jax.profiler`` — see
``start_profiler_trace``).
"""

import time
import logging
import functools
import threading

logger = logging.getLogger(__name__)

TIME_LEVEL = 15          # between DEBUG (10) and INFO (20)
TIME_DEBUG_LEVEL = 13


class TimerSpan:
    __slots__ = ('name', 'total', 'count', 'children', 'parent', '_start')

    def __init__(self, name, parent = None):
        self.name = name
        self.total = 0.0
        self.count = 0
        self.children = {}
        self.parent = parent
        self._start = None

    def child(self, name):
        if name not in self.children:
            self.children[name] = TimerSpan(name, parent = self)
        return self.children[name]

    def start(self):
        self._start = time.perf_counter()

    def stop(self):
        if self._start is not None:
            self.total += time.perf_counter() - self._start
            self.count += 1
            self._start = None

    def report(self, indent = 0):
        lines = []
        if self.name is not None:
            lines.append('{}- {} : {:.3f}s ({} exec{})'.format(
                '  ' * indent, self.name, self.total, self.count,
                's' if self.count > 1 else ''
            ))
        for c in self.children.values():
            lines.extend(c.report(indent + (self.name is not None)))
        return lines


class RootTimer:
    """Thread-aware span tree: each thread gets its own root, so concurrent
    pipelines (e.g. the `Stream` workers) never contend or interleave."""

    def __init__(self):
        self._local = threading.local()
        self._roots = {}
        self._lock = threading.Lock()

    def _root(self):
        if not hasattr(self._local, 'root'):
            root = TimerSpan(None)
            self._local.root = root
            self._local.current = root
            with self._lock:
                self._roots[threading.current_thread().name] = root
        return self._local.root

    def push(self, name):
        self._root()
        span = self._local.current.child(name)
        span.start()
        self._local.current = span
        return span

    def pop(self):
        span = self._local.current
        span.stop()
        if span.parent is not None:
            self._local.current = span.parent
        return span

    def report(self):
        lines = []
        with self._lock:
            for thread_name, root in self._roots.items():
                if root.children:
                    lines.append('Timers (thread {}):'.format(thread_name))
                    lines.extend(root.report())
        return '\n'.join(lines)

    def reset(self):
        with self._lock:
            self._roots.clear()
        self._local = threading.local()


ROOT_TIMER = RootTimer()


class Timer:
    """Context manager measuring a named span: ``with Timer('encode'): ...``"""

    def __init__(self, name, root = None, log_level = TIME_DEBUG_LEVEL):
        self.name = name
        self.root = root if root is not None else ROOT_TIMER
        self.log_level = log_level
        self._span = None

    def __enter__(self):
        self._span = self.root.push(self.name)
        return self

    def __exit__(self, *exc):
        span = self.root.pop()
        if logger.isEnabledFor(self.log_level):
            logger.log(self.log_level, '%s took %.3fs', self.name, span.total)
        return False


def timer(fn = None, *, name = None):
    """Decorator timing each call of `fn` under span `name` (default: fn name)."""
    def wrapper(func):
        span_name = name if name is not None else func.__name__

        @functools.wraps(func)
        def inner(*args, **kwargs):
            with Timer(span_name):
                return func(*args, **kwargs)
        inner.timer_name = span_name
        return inner

    if fn is not None:
        return wrapper(fn)
    return wrapper


def timer_report():
    return ROOT_TIMER.report()


def reset_timers():
    ROOT_TIMER.reset()


def start_profiler_trace(log_dir = '/tmp/jax_trace'):
    """Start a JAX device profiler trace (TensorBoard-compatible)."""
    import jax
    jax.profiler.start_trace(log_dir)
    return log_dir


def stop_profiler_trace():
    import jax
    jax.profiler.stop_trace()
