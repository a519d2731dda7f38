"""Multi-head attention with KV cache and rotary embeddings.

Capability parity with the reference's transformer building blocks
(``/root/reference/architectures/layers/residual_multi_head_attention.py:47``,
``rotary_multi_head_attention.py:18``, ``rms_norm.py:16``) — pure-functional,
with a preallocated KV cache updated by ``dynamic_update_slice`` so the
decode loop stays jittable at static shapes.
"""

import math

import jax
import jax.numpy as jnp
from jax import lax

from ...nn import layers as nn


def init_mha(key, dim, n_heads, *, kv_dim = None, n_kv_heads = None,
             use_bias = True, out_dim = None):
    kv_dim = kv_dim or dim
    n_kv_heads = n_kv_heads or n_heads
    head_dim = dim // n_heads
    keys = jax.random.split(key, 4)
    return {
        'query': nn.init_dense(keys[0], dim, n_heads * head_dim, use_bias = use_bias),
        'key': nn.init_dense(keys[1], kv_dim, n_kv_heads * head_dim, use_bias = use_bias),
        'value': nn.init_dense(keys[2], kv_dim, n_kv_heads * head_dim, use_bias = use_bias),
        'output': nn.init_dense(keys[3], n_heads * head_dim, out_dim or dim, use_bias = use_bias),
    }


def rope(x, positions, *, base = 10000.0):
    """Rotary position embedding: x (B, T, H, D), positions (B, T)."""
    d = x.shape[-1]
    inv_freq = 1.0 / (base ** (jnp.arange(0, d, 2) / d))
    angles = positions[..., None].astype(jnp.float32) * inv_freq   # (B, T, D/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., ::2], x[..., 1::2]
    rotated = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis = -1)
    return rotated.reshape(x.shape)


def init_kv_cache(batch, max_length, n_kv_heads, head_dim, dtype = jnp.float32):
    return {
        'k': jnp.zeros((batch, max_length, n_kv_heads, head_dim), dtype),
        'v': jnp.zeros((batch, max_length, n_kv_heads, head_dim), dtype),
        'index': jnp.zeros((), jnp.int32),
    }


def mha(params,
        query,
        key_value = None,
        *,
        n_heads,
        mask = None,
        cache = None,
        positions = None,
        use_rope = False,
        rope_base = 10000.0,
        rel_bias = None,
        scale = None):
    """Attention.  query (B, Tq, D); key_value defaults to query (self-attn).

    - `mask`: broadcastable to (B, heads, Tq, Tk); True = attend.
    - `cache`: KV cache dict — new keys/values written at cache['index'],
      attention runs over the whole (static-size) cache; returns updated
      cache.  Combine with a validity mask for correctness.
    - `rel_bias`: additive (heads, Tq, Tk) bias (T5-style).
    Returns (output, new_cache).
    """
    kv = key_value if key_value is not None else query
    B, Tq, _ = query.shape

    q = nn.dense(params['query'], query)
    k = nn.dense(params['key'], kv)
    v = nn.dense(params['value'], kv)

    head_dim = q.shape[-1] // n_heads
    q = q.reshape(B, Tq, n_heads, head_dim)
    n_kv = k.shape[-1] // head_dim
    k = k.reshape(B, kv.shape[1], n_kv, head_dim)
    v = v.reshape(B, kv.shape[1], n_kv, head_dim)

    if use_rope:
        if positions is None:
            start = cache['index'] if cache is not None else 0
            positions = start + jnp.arange(Tq)[None, :]
            positions = jnp.broadcast_to(positions, (B, Tq))
        q = rope(q, positions, base = rope_base)
        kv_positions = positions if key_value is None else jnp.broadcast_to(
            jnp.arange(kv.shape[1])[None, :], (B, kv.shape[1]))
        k = rope(k, kv_positions, base = rope_base)

    new_cache = None
    if cache is not None:
        idx = cache['index']
        k_all = lax.dynamic_update_slice(cache['k'], k, (0, idx, 0, 0))
        v_all = lax.dynamic_update_slice(cache['v'], v, (0, idx, 0, 0))
        new_cache = {'k': k_all, 'v': v_all, 'index': idx + Tq}
        k, v = k_all, v_all

    if n_kv != n_heads:                       # grouped-query attention
        rep = n_heads // n_kv
        k = jnp.repeat(k, rep, axis = 2)
        v = jnp.repeat(v, rep, axis = 2)

    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)

    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k) * scale
    if rel_bias is not None:
        logits = logits + rel_bias
    if mask is not None:
        logits = jnp.where(mask, logits, -1e9)
    weights = jax.nn.softmax(logits, axis = -1)
    out = jnp.einsum('bhqk,bkhd->bqhd', weights, v).reshape(B, Tq, -1)
    return nn.dense(params['output'], out), new_cache


def build_padding_mask(lengths = None, tokens = None, pad_token = 0, max_length = None):
    """(B, 1, 1, T) boolean mask, True = valid."""
    if lengths is not None:
        T = max_length if max_length is not None else int(jnp.max(lengths))
        valid = jnp.arange(T)[None, :] < lengths[:, None]
    else:
        valid = tokens != pad_token
    return valid[:, None, None, :]


def build_look_ahead_mask(T, dtype = bool):
    """(1, 1, T, T) causal mask, True = attend (lower triangle)."""
    return jnp.tril(jnp.ones((T, T), dtype))[None, None]


def combine_masks(* masks):
    out = None
    for m in masks:
        if m is None: continue
        out = m if out is None else jnp.logical_and(out, m)
    return out
