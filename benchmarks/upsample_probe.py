"""Probe the WaveGlow upsample_mel cost + alternatives at the bench shape
(the last non-kernel item worth anything — profile_int8 puts ALL non-kernel
at ~1.6%, upsample standalone at ~10 ms).

Variants:
  1. current conv_general_dilated formulation (bf16)
  2. im2col matmul (explicit windows @ (taps*cin, s*n_mel))
  3. int8 weights x int8 per-row activations, int32 accumulation
  4. full int8 infer with spect PRECOMPUTED (bounds total upsample saving)

Usage: python benchmarks/upsample_probe.py [--batch 64] [--frames 256]
"""

import os
import sys
import time
import json
import argparse

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x))


def timeit(fn, iters, *args):
    out = fn(*args)
    sync(out)
    for _ in range(2):
        out = fn(*args)
    sync(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - start) / iters


def main():
    import _cache
    _cache.enable()
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type = int, default = 64)
    parser.add_argument('--frames', type = int, default = 256)
    parser.add_argument('--iters', type = int, default = 6)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from text_to_speech_tpu.models.waveglow_arch import WaveGlow

    B, F = args.batch, args.frames
    audio_s = B * F * 256 / 22050.
    results = {}

    arch = WaveGlow(use_pallas = True)
    hp = arch.hp
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        raw = arch.fuse_params(arch.init(jax.random.PRNGKey(0)))
        key = jax.random.PRNGKey(7)
        for name, v in raw.items():
            if name.startswith('flow_'):
                key, sub = jax.random.split(key)
                end = v['block']['end']
                v['block']['end'] = {
                    'kernel': 0.02 * jax.random.normal(sub, end['kernel'].shape),
                    'bias': end['bias']}
        params = arch.quantize_pallas_params(arch.pack_pallas_params(raw))
        mel = jax.random.normal(jax.random.PRNGKey(1), (B, F, 80)) * 2. - 6.
    tpu = jax.devices()[0]
    params = jax.device_put(params, tpu)
    mel = jax.device_put(mel, tpu)
    rng = jax.random.PRNGKey(2)

    up_bf16 = jax.tree_util.tree_map(
        lambda l: l.astype(jnp.bfloat16), params['upsample'])
    print('setup done', flush = True)

    # 1. current conv formulation
    cur = jax.jit(lambda p, m: arch.upsample_mel(
        {'upsample': p}, m.astype(jnp.bfloat16)))
    t = timeit(cur, args.iters, up_bf16, mel)
    results['conv_ms'] = t * 1e3
    print('conv formulation:   {:.2f} ms'.format(t * 1e3), flush = True)

    # 2. im2col matmul
    w, s, g = hp.upsample_width, hp.upsample_stride, hp.n_group
    n_mel = hp.n_mel_channels
    taps = w // s

    def matmul_form(p, m):
        m = m.astype(jnp.bfloat16)
        kernel = p['kernel']                    # (w, cin, cout=n_mel)
        wk = kernel.reshape(taps, s // g, g, kernel.shape[1], n_mel)
        wk = wk[:, ::-1, ::-1]
        wk = jnp.transpose(wk, (0, 3, 1, 4, 2)).reshape(
            taps * kernel.shape[1], s * n_mel)
        pad = jnp.pad(m, ((0, 0), (taps - 1, 0), (0, 0)))
        windows = jnp.concatenate(
            [pad[:, i: i + m.shape[1]] for i in range(taps)], axis = -1)
        out = windows @ wk                      # (B, F, s*n_mel)
        out = out + jnp.tile(jnp.repeat(p['bias'], g), s // g) \
            .astype(out.dtype)
        return out.reshape(m.shape[0], m.shape[1] * (s // g), n_mel * g)
    mm = jax.jit(matmul_form)
    t = timeit(mm, args.iters, up_bf16, mel)
    results['matmul_ms'] = t * 1e3
    print('im2col matmul:      {:.2f} ms'.format(t * 1e3), flush = True)
    # numeric check vs current
    ref = cur(up_bf16, mel)
    got = mm(up_bf16, mel)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print('matmul max err vs conv: {:.2e}'.format(err), flush = True)

    # 3. int8 x int8 -> int32 matmul (weights per-out-channel, acts per-row)
    with jax.default_device(cpu):
        kernel = params['upsample']['kernel']
        wk = kernel.reshape(taps, s // g, g, kernel.shape[1], n_mel)
        wk = wk[:, ::-1, ::-1]
        wk2d = jnp.transpose(wk, (0, 3, 1, 4, 2)).reshape(
            taps * kernel.shape[1], s * n_mel)
        w_scale = jnp.max(jnp.abs(wk2d), axis = 0) / 127.
        wq = jnp.round(wk2d / w_scale).astype(jnp.int8)
        bias_full = jnp.tile(jnp.repeat(params['upsample']['bias'], g), s // g)
    wq, w_scale, bias_full = jax.device_put((wq, w_scale, bias_full), tpu)

    def int8_form(wq, w_scale, bias, m):
        pad = jnp.pad(m, ((0, 0), (taps - 1, 0), (0, 0)))
        windows = jnp.concatenate(
            [pad[:, i: i + m.shape[1]] for i in range(taps)], axis = -1)
        a_scale = jnp.max(jnp.abs(windows), axis = -1, keepdims = True) / 127.
        aq = jnp.round(windows / a_scale).astype(jnp.int8)
        acc = jax.lax.dot_general(
            aq, wq, (((2,), (0,)), ((), ())),
            preferred_element_type = jnp.int32)
        out = acc.astype(jnp.float32) * a_scale * w_scale[None, None] + bias
        return out.astype(jnp.bfloat16).reshape(
            m.shape[0], m.shape[1] * (s // g), n_mel * g)
    i8 = jax.jit(int8_form)
    t = timeit(i8, args.iters, wq, w_scale, bias_full, mel)
    results['int8_ms'] = t * 1e3
    got = i8(wq, w_scale, bias_full, mel)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print('int8 matmul:        {:.2f} ms  (max err {:.2e}, rel {:.1e})'
          .format(t * 1e3, err, rel), flush = True)

    # 4. full infer vs spect-precomputed infer
    full = jax.jit(lambda p, m, r: arch.infer(
        p, m, rng = r, dtype = jnp.bfloat16))
    t_full = timeit(full, args.iters, params, mel, rng)
    results['full_ms'] = t_full * 1e3
    results['full_rtf'] = audio_s / t_full
    print('full infer:         {:.2f} ms ({:.1f}x RT)'.format(
        t_full * 1e3, audio_s / t_full), flush = True)

    spect = cur(up_bf16, mel)

    def infer_pre(p, spect, r):
        return arch.infer(p, spect, rng = r, dtype = jnp.bfloat16,
                          spect_precomputed = True) \
            if hasattr(arch, 'supports_precomputed_spect') else None
    # measure by monkey-patching upsample_mel to identity on the grouped spect
    orig = arch.upsample_mel
    arch.upsample_mel = lambda p, m: m
    try:
        pre = jax.jit(lambda p, sp, r: arch.infer(
            p, sp, rng = r, dtype = jnp.bfloat16))
        t_pre = timeit(pre, args.iters, params, spect, rng)
    finally:
        arch.upsample_mel = orig
    results['pre_ms'] = t_pre * 1e3
    results['upsample_in_graph_ms'] = (t_full - t_pre) * 1e3
    print('spect precomputed:  {:.2f} ms  (upsample in-graph cost {:.2f} ms)'
          .format(t_pre * 1e3, (t_full - t_pre) * 1e3), flush = True)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
