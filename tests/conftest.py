"""Test configuration: force JAX onto a virtual 8-device CPU platform so
sharding/pjit paths are exercised without TPU hardware (the driver separately
dry-runs the multi-chip path)."""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var (its register() call
# forces jax_platforms="axon,cpu" through jax.config), so any jax.devices()
# call — even jax.devices('cpu') — would initialize the TPU client and hang
# if the tunnel is down.  Re-override through jax.config BEFORE any backend
# init: the suite is CPU-only by design (TPU tests opt in via TTS_TEST_TPU,
# which skips this pin through tests that manage their own devices).
if os.environ.get('TTS_TEST_TPU') != '1':
    jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_device', jax.devices('cpu')[0])

# The suite is XLA-compile-dominated on this 1-core host; the persistent
# compilation cache makes warm re-runs skip every unchanged compile.
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/tmp/jax_test_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

REFERENCE_DIR = '/root/reference'


def reference_path(*parts):
    return os.path.join(REFERENCE_DIR, *parts)


def has_reference():
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture
def tmp_model_dir(tmp_path, monkeypatch):
    """Redirect the pretrained-models root to a temp dir."""
    from text_to_speech_tpu.models import saving
    monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
    return str(tmp_path)
