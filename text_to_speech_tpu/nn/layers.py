"""Pure-functional neural-net layers over pytree parameters.

The TPU-native replacement for the reference's Keras layer usage
(``/root/reference/architectures/current_blocks.py``, custom layers in
``architectures/layers/``): every layer is an ``init_*`` returning a plain
dict of arrays plus an ``apply`` that is a pure function — jit/pjit/grad
compose directly, and the flat param paths double as the namespace for the
name-based weights converter.

Layout conventions (chosen for MXU-friendliness and easy weight import):
  - activations: ``(batch, time, channels)`` (NWC)
  - conv kernels: ``(width, in_channels, out_channels)`` (WIO)
  - dense kernels: ``(in, out)``
  - LSTM kernels: ``(in, 4*units)`` with gate order i, f, g, o
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def split_keys(key, n):
    """Generator over `n` fresh PRNG keys using on-device indexing.

    Iterating a jax array directly (``iter(jax.random.split(...))``) unstacks
    it through device→host transfers — pathological over remote-device
    tunnels; indexing stays on device.
    """
    keys = jax.random.split(key, n)
    return (keys[i] for i in range(n))


def glorot_uniform(key, shape, in_axis = -2, out_axis = -1, dtype = jnp.float32):
    fan_in = shape[in_axis] * int(np.prod([s for i, s in enumerate(shape)
                                           if i not in (in_axis % len(shape), out_axis % len(shape))]))
    fan_out = shape[out_axis] * int(np.prod([s for i, s in enumerate(shape)
                                             if i not in (in_axis % len(shape), out_axis % len(shape))]))
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def orthogonal(key, shape, dtype = jnp.float32):
    n_rows, n_cols = shape
    big = max(n_rows, n_cols)
    a = jax.random.normal(key, (big, big), dtype)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diag(r))[None, :]
    return q[:n_rows, :n_cols]


def zeros(key, shape, dtype = jnp.float32):
    return jnp.zeros(shape, dtype)


# ---------------------------------------------------------------------------
# dense / embedding
# ---------------------------------------------------------------------------

def init_dense(key, in_dim, out_dim, use_bias = True, kernel_init = glorot_uniform):
    params = {'kernel': kernel_init(key, (in_dim, out_dim))}
    if use_bias: params['bias'] = jnp.zeros((out_dim,))
    return params


def dense(params, x, activation = None):
    y = x @ params['kernel']
    if 'bias' in params: y = y + params['bias']
    if activation is not None: y = activation(y)
    return y


def init_embedding(key, vocab_size, dim, scale = 0.05):
    return {'embeddings': jax.random.uniform(key, (vocab_size, dim), jnp.float32, -scale, scale)}


def embedding(params, ids):
    return params['embeddings'][ids]


# ---------------------------------------------------------------------------
# convolutions
# ---------------------------------------------------------------------------

def init_conv1d(key, width, in_ch, out_ch, use_bias = True, kernel_init = glorot_uniform):
    params = {'kernel': kernel_init(key, (width, in_ch, out_ch), in_axis = 1, out_axis = 2)}
    if use_bias: params['bias'] = jnp.zeros((out_ch,))
    return params


def conv1d(params, x, *, stride = 1, padding = 'SAME', dilation = 1):
    """x: (B, T, C_in) → (B, T', C_out).  `padding` ∈ {'SAME','VALID',[(lo,hi)]}."""
    y = lax.conv_general_dilated(
        x, params['kernel'],
        window_strides = (stride,),
        padding = padding if not isinstance(padding, str) else padding.upper(),
        rhs_dilation = (dilation,),
        dimension_numbers = ('NWC', 'WIO', 'NWC'),
    )
    if 'bias' in params: y = y + params['bias']
    return y


def conv1d_shifted(params, x, *, dilation = 1):
    """SAME odd-width dilated conv as `width` SHIFTED MATMULS — pure
    dot_generals instead of one `conv_general_dilated` with a large
    ``rhs_dilation``.  Each tap is a (B*T, C_in) x (C_in, C_out) dot the
    MXU runs at full tilt regardless of dilation, and the backward is
    again shifted dots; the conv lowering is the alternative this A/Bs
    against (`benchmarks/train_throughput.py --conv-mode`).  Numerically
    the same contraction as `conv1d(padding='SAME')` up to f.p.
    reassociation (parity test: tests/test_waveglow.py)."""
    k = params['kernel']                        # (W, C_in, C_out)
    width = k.shape[0]
    if width == 1:
        y = x @ k[0]
    else:
        if width % 2 == 0:
            raise ValueError('conv1d_shifted needs an odd width, got %d'
                             % width)
        half_pad = (width // 2) * dilation
        xp = jnp.pad(x, ((0, 0), (half_pad, half_pad), (0, 0)))
        T = x.shape[1]
        y = None
        for t in range(width):
            tap = xp[:, t * dilation: t * dilation + T] @ k[t]
            y = tap if y is None else y + tap
    if 'bias' in params: y = y + params['bias']
    return y


def init_conv1d_transpose(key, width, in_ch, out_ch, use_bias = True):
    return init_conv1d(key, width, in_ch, out_ch, use_bias)


def conv1d_transpose(params, x, *, stride, padding = 'VALID'):
    """Transposed conv (upsampling): (B, T, C_in) → (B, (T-1)*stride + width, C_out)
    for VALID padding — matching Keras `Conv1DTranspose` output length."""
    y = lax.conv_transpose(
        x, params['kernel'],
        strides = (stride,),
        padding = padding,
        dimension_numbers = ('NWC', 'WIO', 'NWC'),
    )
    if 'bias' in params: y = y + params['bias']
    return y


# ---------------------------------------------------------------------------
# batch norm (split trainable params / running state)
# ---------------------------------------------------------------------------

def init_batch_norm(dim):
    params = {'gamma': jnp.ones((dim,)), 'beta': jnp.zeros((dim,))}
    state = {'moving_mean': jnp.zeros((dim,)), 'moving_var': jnp.ones((dim,))}
    return params, state


def batch_norm(params, state, x, *, train = False, momentum = 0.1,
               epsilon = 1e-5, mask = None):
    """Normalize over all but the channel axis.  Returns (y, new_state).

    `momentum` follows the torch/reference convention: new = (1-m)*old + m*batch.
    `mask` (B, T) restricts the statistics to valid frames.

    Statistics are an f32 island: under the mixed-precision policy the
    activations arrive bf16, but the mean/variance reductions (and the
    moving-stat state) accumulate float32 — bf16's 8-bit mantissa cannot
    sum a batch of squares — and the normalized output casts back to the
    input dtype.
    """
    x32 = x.astype(jnp.float32)
    if train:
        if mask is not None:
            m = mask[..., None].astype(jnp.float32)
            count = jnp.maximum(jnp.sum(m), 1.)
            mean = jnp.sum(x32 * m, axis = (0, 1)) / count
            var = jnp.sum(jnp.square(x32 - mean) * m, axis = (0, 1)) / count
        else:
            mean = jnp.mean(x32, axis = tuple(range(x.ndim - 1)))
            var = jnp.var(x32, axis = tuple(range(x.ndim - 1)))
        new_state = {
            'moving_mean': (1. - momentum) * state['moving_mean'] + momentum * mean,
            'moving_var': (1. - momentum) * state['moving_var'] + momentum * var,
        }
    else:
        mean, var = state['moving_mean'], state['moving_var']
        new_state = state
    inv = lax.rsqrt(var + epsilon) * params['gamma'].astype(jnp.float32)
    y = (x32 - mean) * inv + params['beta'].astype(jnp.float32)
    return y.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------

def init_lstm_cell(key, in_dim, units, unit_forget_bias = True):
    k1, k2 = jax.random.split(key)
    bias = jnp.zeros((4 * units,))
    if unit_forget_bias:
        bias = bias.at[units: 2 * units].set(1.)
    return {
        'kernel': glorot_uniform(k1, (in_dim, 4 * units)),
        'recurrent_kernel': orthogonal(k2, (units, 4 * units)),
        'bias': bias,
    }


def lstm_cell(params, x, carry):
    """One LSTM step.  carry = (h, c); gates ordered i, f, g, o."""
    h, c = carry
    units = h.shape[-1]
    z = x @ params['kernel'] + h @ params['recurrent_kernel'] + params['bias']
    i = jax.nn.sigmoid(z[..., :units])
    f = jax.nn.sigmoid(z[..., units: 2 * units])
    g = jnp.tanh(z[..., 2 * units: 3 * units])
    o = jax.nn.sigmoid(z[..., 3 * units:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, (h_new, c_new)


def lstm_init_carry(batch_size, units, dtype = jnp.float32):
    return (jnp.zeros((batch_size, units), dtype), jnp.zeros((batch_size, units), dtype))


def lstm(params, xs, *, mask = None, reverse = False, initial_carry = None):
    """Run an LSTM over time with `lax.scan`.

    xs: (B, T, C);  mask: (B, T) — masked steps carry state through unchanged
    (Keras masking semantics, needed for padded batches).
    Returns (outputs (B, T, units), final_carry).
    """
    batch = xs.shape[0]
    units = params['recurrent_kernel'].shape[0]
    carry = initial_carry if initial_carry is not None else lstm_init_carry(batch, units, xs.dtype)

    def step(carry, inp):
        if mask is not None:
            x_t, m_t = inp
        else:
            x_t, m_t = inp, None
        h_new, new_carry = lstm_cell(params, x_t, carry)
        if m_t is not None:
            m = m_t[:, None].astype(h_new.dtype)
            new_carry = (
                m * new_carry[0] + (1. - m) * carry[0],
                m * new_carry[1] + (1. - m) * carry[1],
            )
            h_new = m * h_new  # zero output on padded steps
        return new_carry, h_new

    seq = (jnp.swapaxes(xs, 0, 1),)
    if mask is not None:
        seq = seq + (jnp.swapaxes(mask, 0, 1),)
    xs_t = seq if mask is not None else seq[0]

    final_carry, ys = lax.scan(step, carry, xs_t, reverse = reverse)
    return jnp.swapaxes(ys, 0, 1), final_carry


def init_bilstm(key, in_dim, units):
    kf, kb = jax.random.split(key)
    return {'forward': init_lstm_cell(kf, in_dim, units),
            'backward': init_lstm_cell(kb, in_dim, units)}


def bilstm(params, xs, *, mask = None):
    """Bidirectional LSTM, concatenated outputs (B, T, 2*units)."""
    fw, _ = lstm(params['forward'], xs, mask = mask)
    bw, _ = lstm(params['backward'], xs, mask = mask, reverse = True)
    return jnp.concatenate([fw, bw], axis = -1)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def dropout(key, x, rate, *, train = True):
    if not train or rate <= 0.: return x
    keep = jax.random.bernoulli(key, 1. - rate, x.shape)
    return jnp.where(keep, x / (1. - rate), 0.)


def layer_norm(params, x, epsilon = 1e-5):
    mean = jnp.mean(x, axis = -1, keepdims = True)
    var = jnp.var(x, axis = -1, keepdims = True)
    return (x - mean) * lax.rsqrt(var + epsilon) * params['gamma'] + params['beta']


def init_layer_norm(dim):
    return {'gamma': jnp.ones((dim,)), 'beta': jnp.zeros((dim,))}


def rms_norm(params, x, epsilon = 1e-6):
    var = jnp.mean(jnp.square(x), axis = -1, keepdims = True)
    return x * lax.rsqrt(var + epsilon) * params['gamma']


def init_rms_norm(dim):
    return {'gamma': jnp.ones((dim,))}
