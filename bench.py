"""Benchmark: WaveGlow synthesis real-time factor per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- metric: waveglow real-time factor (audio seconds generated per wall second)
  on one chip, batched windows (the MXU-saturating serving mode).
- vs_baseline: ratio vs the reference's headline end-to-end 10x real-time on
  an RTX 3090 Ti (text_to_speech.ipynb cell 0); the driver north-star for
  this metric is 200x per TPU v5e chip (BASELINE.json).

Default path: the fused int8 whole-coupling-block Pallas kernel (per-row
dynamic activation quant, per-channel weight scales — see
ops/pallas_kernels.fused_wn_block_int8), guarded by an inline quality gate:
the int8 waveform must reach >= 25 dB SNR vs the f32 XLA chain on the same
weights/noise.  **Gate-failure fallback is the f32/XLA chain** (~70x RT of
correct audio) — NEVER the bf16 kernel path: this repo's trained-weights
measurement (docs/PERFORMANCE.md) shows bf16 kernels produce −3 dB noise in
exactly the regime where the gate trips.

The headline is the MEDIAN of >=3 timed repetitions (one compile, repeated
timing loops) so axon-tunnel session scatter cannot flip the driver gate.

The measurement runs in a child process with a watchdog because the axon
tunnel intermittently hangs device-to-host transfers; timing uses a scalar
device->host transfer as the barrier (block_until_ready silently no-ops on
some axon sessions).
"""

import os
import sys
import json
import subprocess

BATCH = int(os.environ.get('BENCH_BATCH', 96))   # 96 probed 2026-08-20:
                                                 # 203.72x vs 203.0 at 64
                                                 # (further non-kernel
                                                 # amortization; 128 blows
                                                 # the worker budget)
FRAMES = int(os.environ.get('BENCH_FRAMES', 256))
ITERS = int(os.environ.get('BENCH_ITERS', 6))
REPS = int(os.environ.get('BENCH_REPS', 3))        # timed repetitions (median)
DTYPE = os.environ.get('BENCH_DTYPE', 'int8')      # int8 | bfloat16 | float32
SNR_GATE_DB = float(os.environ.get('BENCH_SNR_GATE', 25.))
BASELINE_RTF = 10.0


def worker():
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp

    # persistent executable cache: repeat bench runs skip the multi-minute
    # TPU compiles (ONE policy, shared with benchmarks/: _cache.enable;
    # BENCH_NO_CACHE=1 opts out for cold-compile measurements)
    root = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, 'benchmarks'))
    import _cache
    _cache.enable()
    from text_to_speech_tpu.models.waveglow_arch import WaveGlow

    # full-size model: 12 flows x 8 layers x 512 channels.  The zero-init
    # 'end' convs are randomized so the WN stack actually drives the audio —
    # otherwise the quality gate would compare flows that ignore the kernels.
    # end-conv scale 0.02 keeps the random flows in the stable (contractive)
    # regime trained checkpoints live in; larger scales make the inverse flow
    # chaotic and ANY precision scores badly (bf16 hits -14 dB there).
    # ALL setup runs on CPU (hundreds of eager ops over the axon tunnel pay
    # ~30 ms each — many minutes), then one bulk device_put.
    arch = WaveGlow(use_pallas = True)
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
        mel = jax.random.normal(jax.random.PRNGKey(1), (BATCH, FRAMES, 80)) * 2. - 6.
    tpu = jax.devices()[0]
    mel = jax.device_put(mel, tpu)
    rng = jax.random.PRNGKey(2)

    def sync(x):
        # block_until_ready() silently no-ops on some axon sessions; a scalar
        # device->host transfer is the only reliable barrier
        return float(x)

    mode = DTYPE
    if mode == 'int8':
        with jax.default_device(cpu):
            params = arch.quantize_pallas_params(arch.pack_pallas_params(raw))
        params = jax.device_put(params, tpu)
        # quality gate: int8 kernels vs the f32 XLA chain, same noise
        base = WaveGlow(use_pallas = False)
        small = mel[:2]
        # gate the exact configuration the timed loop runs: int8 kernels with
        # bf16 non-kernel ops (start/end/upsample convs, activations)
        w_f = jax.jit(lambda p, m: base.infer(p, m, rng = rng))(raw, small)
        w_q = jax.jit(lambda p, m: arch.infer(
            p, m, rng = rng, dtype = jnp.bfloat16))(params, small)
        noise = float(jnp.mean((w_f - w_q) ** 2))
        snr = 10 * np.log10(float(jnp.mean(w_f ** 2)) / max(noise, 1e-20))
        if snr < SNR_GATE_DB:
            # gate-failure policy (VERDICT r2 weak #2): the safe fallback is
            # the f32/XLA chain.  bf16 KERNELS are the one mode the repo's
            # trained-weights measurement shows producing −3 dB garbage in
            # exactly this regime — never fall back to them.
            sys.stderr.write('int8 SNR gate failed: %.1f dB < %.1f; '
                             'falling back to the f32/XLA chain\n'
                             % (snr, SNR_GATE_DB))
            mode = 'float32_xla'
        else:
            sys.stderr.write('int8 SNR gate: %.1f dB\n' % snr)
    if mode == 'float32_xla':
        arch = WaveGlow(use_pallas = False)
        params = jax.device_put(raw, tpu)
        dtype = None
    else:
        if mode != 'int8':
            with jax.default_device(cpu):
                params = arch.pack_pallas_params(raw)
            params = jax.device_put(params, tpu)
        dtype = jnp.bfloat16 if mode != 'float32' else jnp.float32

    # the per-iteration key derivation lives INSIDE the jitted program (the
    # iteration index is the traced argument): a bare `fold_in` between
    # launches would be a separate eager dispatch riding the axon tunnel
    # (~30 ms round-trip) inside the timed loop — host artifact, not chip time
    infer = jax.jit(lambda p, m, i: jnp.sum(arch.infer(
        p, m, rng = jax.random.fold_in(rng, i), dtype = dtype)))

    # compile + warm to steady state (the first post-compile iterations run
    # ~15% slow while the chip ramps)
    sync(infer(params, mel, np.int32(1000)))
    for i in range(3):
        out = infer(params, mel, np.int32(100 + i))
    sync(out)

    # median of REPS timed repetitions (single compile, repeated timing
    # loops): one noisy tunnel hiccup cannot flip the driver gate
    times = []
    for rep in range(max(1, REPS)):
        start = time.perf_counter()
        for i in range(ITERS):
            out = infer(params, mel, np.int32(rep * ITERS + i))
        sync(out)
        times.append(time.perf_counter() - start)
    elapsed = float(np.median(times))

    audio_seconds = ITERS * BATCH * FRAMES * 256 / 22050.
    rtf = audio_seconds / elapsed

    # plausibility guard: WaveGlow costs ~1.45 TFLOP per audio second; reject
    # timings that would exceed the chip's int8 peak (v5e: 197 TFLOP/s bf16,
    # 394 TOPS int8) — a sign of non-blocking contamination
    implied_tflops = audio_seconds * 1.45 / max(elapsed, 1e-9)
    if implied_tflops > 450.:
        raise RuntimeError('implausible timing: {:.0f} TFLOP/s'.format(implied_tflops))

    print(json.dumps({'rtf': rtf, 'elapsed_s': elapsed,
                      'rep_times_s': [round(t, 4) for t in times],
                      'audio_s': audio_seconds, 'mode': mode,
                      'implied_tflops': implied_tflops}), flush = True)


def tunnel_up(timeout = 120):
    """Fast probe: the axon tunnel being down manifests as an indefinite
    hang in backend init (rc=124 under timeout); probe in a subprocess so
    the main process never dials a dead relay."""
    try:
        probe = subprocess.run(
            [sys.executable, '-c', 'import jax; jax.devices()'],
            capture_output = True, timeout = timeout,
        )
        return probe.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import time
    for attempt in range(3):
        if not tunnel_up():
            sys.stderr.write('bench attempt {}: TPU tunnel unreachable '
                             '(probe timed out)\n'.format(attempt + 1))
            if attempt < 2:
                time.sleep(60)
            continue
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
                'metric': 'waveglow_rtf_per_chip_' + result.get('mode', DTYPE),
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
