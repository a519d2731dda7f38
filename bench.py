"""Benchmark: WaveGlow synthesis real-time factor per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- metric: waveglow real-time factor (audio seconds generated per wall second)
  on one chip, batched windows (the MXU-saturating serving mode).
- vs_baseline: ratio vs the reference's headline end-to-end 10x real-time on
  an RTX 3090 Ti (text_to_speech.ipynb cell 0); the driver north-star for
  this metric is 200x per TPU v5e chip (BASELINE.json).

The measurement runs in a child process with a watchdog because the axon
tunnel intermittently hangs device-to-host transfers; timing uses
block_until_ready only (no transfers on the hot path).
"""

import os
import sys
import json
import subprocess

BATCH = int(os.environ.get('BENCH_BATCH', 32))
FRAMES = int(os.environ.get('BENCH_FRAMES', 256))
ITERS = int(os.environ.get('BENCH_ITERS', 6))
DTYPE = os.environ.get('BENCH_DTYPE', 'bfloat16')
BASELINE_RTF = 10.0


def worker():
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from text_to_speech_tpu.models.waveglow_arch import WaveGlow

    # full-size: 12 flows x 8 layers x 512 channels; use_pallas routes the
    # WN coupling blocks through the fused whole-block Pallas kernel
    arch = WaveGlow(use_pallas = True)
    params = arch.pack_pallas_params(
        arch.fuse_params(arch.init(jax.random.PRNGKey(0))))

    mel = jax.random.normal(jax.random.PRNGKey(1), (BATCH, FRAMES, 80)) * 2. - 6.
    rng = jax.random.PRNGKey(2)
    dtype = getattr(jnp, DTYPE)

    # reduce on device so the sync transfer is one scalar
    infer = jax.jit(lambda p, m, r: jnp.sum(arch.infer(p, m, rng = r, dtype = dtype)))

    def sync(x):
        # block_until_ready() silently no-ops on some axon sessions; a scalar
        # device->host transfer is the only reliable barrier
        return float(x)

    # compile + warm to steady state (the first post-compile iterations run
    # ~15% slow while the chip ramps)
    sync(infer(params, mel, rng))
    for i in range(3):
        out = infer(params, mel, jax.random.fold_in(rng, 100 + i))
    sync(out)

    start = time.perf_counter()
    for i in range(ITERS):
        out = infer(params, mel, jax.random.fold_in(rng, i))
    sync(out)
    elapsed = time.perf_counter() - start

    audio_seconds = ITERS * BATCH * FRAMES * 256 / 22050.
    rtf = audio_seconds / elapsed

    # plausibility guard: WaveGlow costs ~1.45 TFLOP per audio second; reject
    # timings that would exceed the chip's int8 peak (v5e: 197 TFLOP/s bf16,
    # 394 TOPS int8) — a sign of non-blocking contamination
    implied_tflops = audio_seconds * 1.45 / max(elapsed, 1e-9)
    if implied_tflops > 450.:
        raise RuntimeError('implausible timing: {:.0f} TFLOP/s'.format(implied_tflops))

    print(json.dumps({'rtf': rtf, 'elapsed_s': elapsed,
                      'audio_s': audio_seconds,
                      'implied_tflops': implied_tflops}), flush = True)


def main():
    for attempt in range(3):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), '--worker'],
                capture_output = True, text = True, timeout = 900,
            )
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    result = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
            else:
                raise RuntimeError('no result line:\n' + proc.stdout[-2000:]
                                   + proc.stderr[-2000:])
            rtf = result['rtf']
            print(json.dumps({
                'metric': 'waveglow_rtf_per_chip',
                'value': round(rtf, 2),
                'unit': 'x_realtime',
                'vs_baseline': round(rtf / BASELINE_RTF, 2),
            }))
            return
        except (subprocess.TimeoutExpired, RuntimeError, KeyError) as e:
            sys.stderr.write('bench attempt {} failed: {}\n'.format(attempt + 1, e))
    print(json.dumps({'metric': 'waveglow_rtf_per_chip', 'value': 0.0,
                      'unit': 'x_realtime', 'vs_baseline': 0.0}))


if __name__ == '__main__':
    if '--worker' in sys.argv:
        worker()
    else:
        main()
