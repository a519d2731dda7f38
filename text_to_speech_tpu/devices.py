"""Device configuration + introspection.

Capability parity with ``/root/reference/utils/keras/gpu.py:21-122``
(backend select, mixed precision, memory limit/usage introspection) — the
TPU-native equivalents: platform/device selection, default matmul precision,
HBM memory stats, and host-platform device-count control.
"""

import os
import logging

logger = logging.getLogger(__name__)


def set_device_config(*, platform = None, default_device = None,
                      precision = None, preallocate = None,
                      host_device_count = None):
    """Configure the JAX runtime (call before heavy work).

    - `platform`: 'tpu' / 'cpu' preference (best-effort; some plugins pin
      themselves as default — use `default_device` then);
    - `default_device`: a device or index onto which un-annotated
      computations land;
    - `precision`: default matmul precision ('default'|'high'|'highest' or
      'bfloat16'/'float32' style names);
    - `preallocate`: False disables XLA memory preallocation (GPU-style envs);
    - `host_device_count`: number of virtual CPU devices (set before first
      jax import to take effect).
    """
    if host_device_count is not None:
        flags = os.environ.get('XLA_FLAGS', '')
        if 'xla_force_host_platform_device_count' not in flags:
            os.environ['XLA_FLAGS'] = (
                flags + ' --xla_force_host_platform_device_count={}'.format(
                    host_device_count)
            ).strip()
    if preallocate is False:
        os.environ['XLA_PYTHON_CLIENT_PREALLOCATE'] = 'false'
    if platform is not None:
        os.environ['JAX_PLATFORMS'] = platform

    import jax
    if default_device is not None:
        if isinstance(default_device, int):
            default_device = jax.devices()[default_device]
        elif isinstance(default_device, str):
            default_device = jax.devices(default_device)[0]
        jax.config.update('jax_default_device', default_device)
    if precision is not None:
        from .train.precision import set_global_policy
        if str(precision) in ('mixed_bfloat16', 'mixed_float16'):
            # a training dtype POLICY (the reference installs a keras
            # mixed-precision policy here: params f32, compute bf16 —
            # utils/keras/gpu.py:32-34); mixed_float16 maps to the TPU's
            # native bf16 (no loss scaling needed)
            set_global_policy('mixed_bfloat16')
        else:
            if str(precision) == 'float32':
                set_global_policy('float32')
            mapping = {'bfloat16': 'default', 'float32': 'highest',
                       'tensorfloat32': 'high'}
            jax.config.update('jax_default_matmul_precision',
                              mapping.get(precision, precision))
    return jax.devices()


def set_default_precision(precision):
    """The reference's ``gpu.py`` `set_default_precision` surface.

    'mixed_bfloat16' / 'mixed_float16' install the global *training*
    precision policy (bf16 compute / f32 master params — every
    `fit`/`fit_gan` train step built afterwards picks it up, exactly like
    `keras.mixed_precision.set_global_policy`); matmul-precision names
    ('float32', 'tensorfloat32', 'bfloat16', 'default', 'high', 'highest')
    remap XLA's default matmul precision for f32 programs."""
    return set_device_config(precision = precision)


def get_memory_stats(device = None):
    """HBM usage for one device (bytes): {'bytes_in_use', 'bytes_limit', ...}."""
    import jax
    if device is None:
        device = jax.devices()[0]
    try:
        return device.memory_stats() or {}
    except Exception as e:
        logger.debug('memory_stats unavailable: %s', e)
        return {}


def print_memory_usage():
    import jax
    for device in jax.devices():
        stats = get_memory_stats(device)
        in_use = stats.get('bytes_in_use', 0) / 1024 ** 3
        limit = stats.get('bytes_limit', 0) / 1024 ** 3
        print('{}: {:.2f} / {:.2f} GiB'.format(device, in_use, limit))


def list_devices(platform = None):
    import jax
    try:
        return jax.devices(platform) if platform else jax.devices()
    except RuntimeError:
        return []


def default_backend():
    import jax
    return jax.default_backend()
