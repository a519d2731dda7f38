"""Activation registry.

Capability parity with ``/root/reference/architectures/layers/custom_activations.py:17-77``
(`l2_norm`, `glu`, `gelu_new`, `quick_gelu`, `get_activation`).
"""

import math

import jax
import jax.numpy as jnp


def l2_norm(x, axis = -1, epsilon = 1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis = axis, keepdims = True), epsilon)


def glu(x, axis = -1):
    a, b = jnp.split(x, 2, axis = axis)
    return a * jax.nn.sigmoid(b)


def gelu_new(x):
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3))
    ))


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTIVATIONS = {
    None: None,
    'linear': None,
    'relu': jax.nn.relu,
    'relu6': jax.nn.relu6,
    'tanh': jnp.tanh,
    'sigmoid': jax.nn.sigmoid,
    'softmax': jax.nn.softmax,
    'softplus': jax.nn.softplus,
    'silu': jax.nn.silu,
    'swish': jax.nn.silu,
    'gelu': jax.nn.gelu,
    'gelu_exact': lambda x: jax.nn.gelu(x, approximate = False),
    'gelu_new': gelu_new,
    'quick_gelu': quick_gelu,
    'glu': glu,
    'elu': jax.nn.elu,
    'leaky_relu': jax.nn.leaky_relu,
    'l2_norm': l2_norm,
    'mish': lambda x: x * jnp.tanh(jax.nn.softplus(x)),
}


def get_activation(name):
    """Resolve an activation by name (callables pass through)."""
    if callable(name): return name
    if isinstance(name, str): name = name.lower()
    if name in _ACTIVATIONS: return _ACTIVATIONS[name]
    raise ValueError('Unknown activation: {!r} (known: {})'.format(
        name, [k for k in _ACTIVATIONS if k]
    ))
