"""Alternative inference runtimes.

Capability parity with ``/root/reference/utils/keras/runtimes/``
(`Runtime` ABC + path-keyed engine cache + `build_runtime` factory
``runtime.py:19``, ``__init__.py:23-45``; engine wrappers for
SavedModel/ONNX/TensorRT/TRT-LLM/HF) — TPU-native equivalents:

  - `JAXRuntime` — the default in-process jit path;
  - `ExportRuntime` — serialized StableHLO artifacts via ``jax.export``
    (the SavedModel/ONNX interchange analog: save once, load and run
    anywhere a compatible XLA is available);
  - `AOTRuntime` — ahead-of-time compiled executables cached on disk by
    (function, shapes) key (the TensorRT engine-cache analog);
  - `HFRuntime` — HuggingFace transformers wrapper (torch CPU).
"""

import os
import logging

logger = logging.getLogger(__name__)

_RUNTIMES = {}
_ENGINE_CACHE = {}


def register_runtime(name):
    def deco(cls):
        _RUNTIMES[name] = cls
        return cls
    return deco


class Runtime:
    """Base runtime: wraps an engine addressed by `path`."""

    def __init__(self, path, ** kwargs):
        self.path = path
        self.kwargs = kwargs
        self.engine = self.load_engine(path, ** kwargs)

    @classmethod
    def load_engine(cls, path, ** kwargs):
        raise NotImplementedError()

    def __call__(self, * args, ** kwargs):
        raise NotImplementedError()

    def __repr__(self):
        return '{}(path={!r})'.format(self.__class__.__name__, self.path)


def build_runtime(runtime, path = None, ** kwargs):
    """Factory with path-keyed engine caching."""
    if isinstance(runtime, Runtime): return runtime
    if runtime not in _RUNTIMES:
        raise ValueError('Unknown runtime {!r} (known: {})'.format(
            runtime, sorted(_RUNTIMES)))
    cache_key = (runtime, path)
    if cache_key not in _ENGINE_CACHE:
        _ENGINE_CACHE[cache_key] = _RUNTIMES[runtime](path, ** kwargs)
    return _ENGINE_CACHE[cache_key]


def list_runtimes():
    return sorted(_RUNTIMES)


@register_runtime('jax')
class JAXRuntime(Runtime):
    """In-process jit execution of a callable (the default path)."""

    def __init__(self, fn, static_argnames = None, ** kwargs):
        import jax
        self.path = getattr(fn, '__name__', 'fn')
        self.kwargs = kwargs
        self.engine = jax.jit(fn, static_argnames = static_argnames)

    @classmethod
    def load_engine(cls, path, ** kwargs):
        return path

    def __call__(self, * args, ** kwargs):
        return self.engine(* args, ** kwargs)


@register_runtime('export')
class ExportRuntime(Runtime):
    """Serialized StableHLO artifact (``jax.export``): portable exported
    function with embedded shapes/dtypes — the interchange-format analog of
    ONNX / SavedModel."""

    @classmethod
    def load_engine(cls, path, ** kwargs):
        from jax import export
        with open(path, 'rb') as f:
            return export.deserialize(f.read())

    def __call__(self, * args):
        return self.engine.call(* args)

    @staticmethod
    def export_function(fn, example_args, path, *, static_argnames = None,
                        platforms = ('cpu', 'tpu')):
        """Trace + serialize `fn` at the example shapes into `path`.

        Multi-platform by default so one artifact serves both the TPU chip
        and CPU fallbacks."""
        import jax
        from jax import export
        exported = export.export(
            jax.jit(fn, static_argnames = static_argnames),
            platforms = list(platforms),
        )(* example_args)
        data = exported.serialize()
        d = os.path.dirname(path)
        if d: os.makedirs(d, exist_ok = True)
        with open(path, 'wb') as f:
            f.write(data)
        return path


@register_runtime('aot')
class AOTRuntime(Runtime):
    """Ahead-of-time compiled executable, built from a function + example
    shapes and kept in an in-memory cache (XLA persists the compiled binary
    in its own compilation cache directory when enabled) — the engine-build
    analog of a TensorRT plan."""

    def __init__(self, fn, example_args, *, donate_argnums = (), ** kwargs):
        import jax
        self.path = getattr(fn, '__name__', 'fn')
        self.kwargs = kwargs
        lowered = jax.jit(fn, donate_argnums = donate_argnums).lower(* example_args)
        self.engine = lowered.compile()

    @classmethod
    def load_engine(cls, path, ** kwargs):
        return path

    @property
    def flops(self):
        analysis = self.engine.cost_analysis()
        if isinstance(analysis, list): analysis = analysis[0]
        return analysis.get('flops') if analysis else None

    @property
    def memory_analysis(self):
        return self.engine.memory_analysis()

    def __call__(self, * args):
        return self.engine(* args)


@register_runtime('hf')
class HFRuntime(Runtime):
    """HuggingFace transformers AutoModel wrapper (torch CPU)."""

    @classmethod
    def load_engine(cls, path, task = 'auto', ** kwargs):
        import transformers
        auto_cls = {
            'auto': transformers.AutoModel,
            'causal-lm': transformers.AutoModelForCausalLM,
            'seq2seq': transformers.AutoModelForSeq2SeqLM,
        }.get(task, transformers.AutoModel)
        model = auto_cls.from_pretrained(path, ** kwargs)
        model.eval()
        return model

    def __call__(self, * args, ** kwargs):
        import torch
        with torch.no_grad():
            return self.engine(* args, ** kwargs)


def enable_persistent_compilation_cache(directory = None):
    """Turn on XLA's on-disk compiled-executable cache so AOT/jit compiles
    survive process restarts (the TRT engine-file analog)."""
    import jax
    directory = directory or os.path.expanduser('~/.cache/tts_tpu_xla')
    os.makedirs(directory, exist_ok = True)
    jax.config.update('jax_compilation_cache_dir', directory)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    return directory
