"""Phase-level profile of the VITS serving stepper on real hardware.

`benchmarks/serving_load.py` measures the end product; this script breaks
a chunk step into its phases so optimization effort lands on the actual
bottleneck instead of a guess:

  - ``latent_ms``       admission cost (jitted infer_latent + length sync)
  - ``steady_ms``       step_fn with a STABLE active set (no restack):
                        decode dispatch + one bulk device->host audio fetch
  - ``churn_ms``        step_fn with the active set changing every chunk
                        (restack path: device-side jnp.stack per chunk)
  - ``fetch_ms``        the device->host audio transfer alone (the chunk's
                        d2h payload at the same shape)
  - ``device_ms``       the decode program alone, host sync excluded
                        (scalar-transfer barrier)

Usage:
    python benchmarks/profile_vits_stepper.py [--window 64] [--context 16]
        [--batch 8] [--iters 20]

Prints one JSON line.  On the axon tunnel expect host-side phases to be
dominated by per-transfer round-trip latency (~30 ms) — a locally
attached TPU pays microseconds for the same dispatches.
"""

import os
import sys
import json
import time
import argparse

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))


def main():
    import _cache
    _cache.enable()
    parser = argparse.ArgumentParser()
    parser.add_argument('--window', type = int, default = 64)
    parser.add_argument('--context', type = int, default = 16)
    parser.add_argument('--batch', type = int, default = 8)
    parser.add_argument('--iters', type = int, default = 20)
    parser.add_argument('--int16', action = 'store_true',
                        help = 'on-device int16 PCM quantization before '
                               'the per-chunk d2h transfer (4x fewer bytes)')
    args = parser.parse_args()

    os.environ.setdefault('TTS_PRETRAINED_DIR', '/tmp/bench_models')
    import numpy as np
    import jax
    import jax.numpy as jnp

    from text_to_speech_tpu.models.tts import VITS
    from text_to_speech_tpu.runtimes.serving import make_vits_stepper

    model = VITS(lang = 'en', name = 'bench_vits')
    td = 'int16' if args.int16 else 'float32'
    start_fn, step_fn, finish_fn = make_vits_stepper(
        model, window = args.window, context = args.context,
        transfer_dtype = td)
    _, step_np, _ = make_vits_stepper(
        model, window = args.window, context = args.context,
        pipeline = False, transfer_dtype = td)
    # (state dicts are stepper-agnostic: the no-pipeline leg reuses
    # start_fn so both legs share the latent program cache)

    text = ('It was the best of times, it was the worst of times, it was '
            'the age of wisdom, it was the age of foolishness.')

    # -- admission (latent stage) ------------------------------------------
    st = start_fn(text)                               # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        st = start_fn(text)
    latent_ms = (time.perf_counter() - t0) / args.iters * 1e3

    def _steady(step):
        # steady-state chunk: stable active set, no restack
        states = [start_fn(text) for _ in range(args.batch)]
        states, _ = step(states)                      # compile + restack
        states, _ = step(states)                      # fill the pipeline
        t0 = time.perf_counter()
        for _ in range(args.iters):
            for s in states:
                s['emitted'] = 1                      # never finish
                s['audio_parts'].clear()
            states, _ = step(states)
        return (time.perf_counter() - t0) / args.iters * 1e3, states

    # interleaved A/B so tunnel drift hits both modes equally
    s1, states = _steady(step_fn)
    n1, _ = _steady(step_np)
    s2, _ = _steady(step_fn)
    n2, _ = _steady(step_np)
    steady_ms, steady_nopipe_ms = min(s1, s2), min(n1, n2)

    # -- churn chunk (active set changes every step → restack) -------------
    spare = start_fn(text)
    t0 = time.perf_counter()
    for i in range(args.iters):
        for s in states:
            s['emitted'] = 1
        states[i % args.batch], spare = spare, states[i % args.batch]
        states, _ = step_fn(states)
    churn_ms = (time.perf_counter() - t0) / args.iters * 1e3

    # -- the d2h payload alone (the stepper's on-device window gather makes
    # it window*rate per row).  DISTINCT arrays per iteration: np.asarray
    # on the same jax.Array returns its cached host copy after the first
    # transfer, which silently measures nothing.
    base = jnp.zeros((args.batch, args.window * model.arch.upsample_rate),
                     jnp.int16 if args.int16 else jnp.float32)
    payloads = [base + i for i in range(args.iters)]
    float(payloads[-1][0, 0])                         # all computed
    t0 = time.perf_counter()
    for p in payloads:
        np.asarray(p)
    fetch_ms = (time.perf_counter() - t0) / args.iters * 1e3
    span = args.window + 2 * args.context

    # -- decode program device time (scalar-transfer barrier) --------------
    z = jnp.stack([states[i]['z'] for i in range(args.batch)])
    starts = jnp.zeros((args.batch,), jnp.int32)
    dec = jax.jit(lambda p, zz, ss: model.arch.decode_frames(
        p, jax.vmap(lambda row, s: jax.lax.dynamic_slice(
            row, (s, 0), (span, row.shape[-1])))(zz, ss), None))
    out = dec(model.params, z, starts)
    float(out[0, 0])                                  # compile + sync
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = dec(model.params, z, starts)
        float(out[0, 0])                              # scalar barrier
    device_ms = (time.perf_counter() - t0) / args.iters * 1e3

    audio_s_per_chunk = args.batch * args.window * \
        model.arch.upsample_rate / float(model.rate)
    print(json.dumps({
        'metric': 'vits_stepper_profile',
        'transfer_dtype': td,
        'window': args.window, 'context': args.context,
        'batch': args.batch, 'iters': args.iters,
        'latent_ms': round(latent_ms, 2),
        'steady_ms': round(steady_ms, 2),
        'steady_nopipe_ms': round(steady_nopipe_ms, 2),
        'churn_ms': round(churn_ms, 2),
        'fetch_ms': round(fetch_ms, 2),
        'device_ms': round(device_ms, 2),
        'audio_s_per_chunk': round(audio_s_per_chunk, 3),
        'steady_rtf': round(audio_s_per_chunk / (steady_ms / 1e3), 1),
    }))


if __name__ == '__main__':
    main()
