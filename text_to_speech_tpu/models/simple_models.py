"""Declarative small-model builders.

Capability parity with ``/root/reference/architectures/simple_models.py``
(`perceptron:101`, `simple_cnn:154`, `comparator:296`, `classifier:351`) and
the block builders of ``current_blocks.py`` — here each builder returns a
``(init, apply)`` pair over pytree params (the functional idiom), so the
same declarative configs compose with jit/grad/pjit.
"""

import jax
import jax.numpy as jnp

from ..nn import layers as nn
from ..nn.activations import get_activation


def _as_list(value, n):
    if isinstance(value, (list, tuple)):
        assert len(value) == n, 'expected {} values, got {}'.format(n, len(value))
        return list(value)
    return [value] * n


def perceptron(input_dim, units = (64, 32), output_dim = 1, *,
               activation = 'relu', final_activation = None,
               use_bias = True, drop_rate = 0.):
    """MLP builder → (init(key) → params, apply(params, x, train, rng) → y)."""
    units = list(units)
    dims = [input_dim] + units + [output_dim]
    acts = _as_list(activation, len(units)) + [final_activation]

    def init(key):
        params = {}
        keys = nn.split_keys(key, len(dims) - 1)
        for i in range(len(dims) - 1):
            params['dense_{}'.format(i)] = nn.init_dense(
                next(keys), dims[i], dims[i + 1], use_bias = use_bias)
        return params

    def apply(params, x, *, train = False, rng = None):
        for i in range(len(dims) - 1):
            x = nn.dense(params['dense_{}'.format(i)], x)
            act = get_activation(acts[i])
            if act is not None: x = act(x)
            if train and drop_rate > 0 and rng is not None and i < len(dims) - 2:
                rng, sub = jax.random.split(rng)
                x = nn.dropout(sub, x, drop_rate, train = True)
        return x

    return init, apply


def simple_cnn(input_channels, filters = (32, 64), output_dim = None, *,
               kernel_size = 3, strides = 2, activation = 'relu',
               use_batch_norm = True, pooling = 'mean',
               final_activation = None):
    """1-D conv stack builder (the Tacotron-encoder/postnet shape family):
    conv→(BN)→act per stage, optional global pooling + dense head.

    Returns (init(key) → (params, state), apply(params, state, x, train, rng)
    → (y, new_state))."""
    n = len(filters)
    kernels = _as_list(kernel_size, n)
    all_strides = _as_list(strides, n)
    acts = _as_list(activation, n)

    def init(key):
        params, state = {}, {}
        keys = nn.split_keys(key, n + 2)
        ch = input_channels
        for i, out_ch in enumerate(filters):
            params['conv_{}'.format(i)] = {
                'conv': nn.init_conv1d(next(keys), kernels[i], ch, out_ch)}
            if use_batch_norm:
                bn, bn_state = nn.init_batch_norm(out_ch)
                params['conv_{}'.format(i)]['bn'] = bn
                state['conv_{}'.format(i)] = {'bn': bn_state}
            ch = out_ch
        if output_dim:
            params['head'] = nn.init_dense(next(keys), ch, output_dim)
        return params, state

    def apply(params, state, x, *, train = False, rng = None):
        new_state = dict(state)
        for i in range(n):
            name = 'conv_{}'.format(i)
            x = nn.conv1d(params[name]['conv'], x, stride = all_strides[i],
                          padding = 'SAME')
            if use_batch_norm:
                x, bn_state = nn.batch_norm(
                    params[name]['bn'], state[name]['bn'], x, train = train)
                new_state[name] = {'bn': bn_state}
            act = get_activation(acts[i])
            if act is not None: x = act(x)
        if 'head' in params:
            if pooling == 'mean':
                x = jnp.mean(x, axis = 1)
            elif pooling == 'max':
                x = jnp.max(x, axis = 1)
            x = nn.dense(params['head'], x)
            act = get_activation(final_activation)
            if act is not None: x = act(x)
        return x, new_state

    return init, apply


def classifier(input_channels, nb_class, ** kwargs):
    """conv stack + softmax-logit head."""
    return simple_cnn(input_channels, output_dim = nb_class, ** kwargs)


def comparator(encoder_init_apply, *, distance_metric = 'euclidean'):
    """Siamese comparator: shared encoder + distance head → similarity in
    [0, 1] (the reference's `comparator:296` shape)."""
    enc_init, enc_apply = encoder_init_apply

    def init(key):
        return enc_init(key)

    def apply(params, state, x1, x2, ** kwargs):
        e1, state = enc_apply(params, state, x1, ** kwargs)
        e2, state = enc_apply(params, state, x2, ** kwargs)
        if distance_metric == 'cosine':
            num = jnp.sum(e1 * e2, axis = -1)
            den = jnp.linalg.norm(e1, axis = -1) * jnp.linalg.norm(e2, axis = -1)
            sim = (num / (den + 1e-9) + 1.) / 2.
        else:
            dist = jnp.linalg.norm(e1 - e2, axis = -1)
            sim = jnp.exp(-dist)
        return sim, state

    return init, apply
