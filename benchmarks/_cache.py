"""Shared persistent-executable-cache setup for the TPU benchmarks.

Import and call `enable()` at the top of a benchmark's main(): repeat runs
skip the multi-minute TPU compiles (measured on bench.py: 202 s -> 137 s
wall for an identical RTF result).  BENCH_NO_CACHE=1 opts out for
cold-compile measurements."""

import os


def enable():
    if os.environ.get('BENCH_NO_CACHE') == '1':
        return
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_CACHE_DIR',
                                     '/tmp/jax_bench_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.)
