#!/bin/sh
# One-shot TPU perf session (round 4): regression-assert the bench headline,
# probe B=96, measure bf16 mixed-precision training speedups, the one-launch
# single-sentence e2e, and the steady-state serving protocol (VITS + AR,
# r=1 vs r=2).  Logs to /tmp/tpu_session.log; each stage bounded so a tunnel
# drop cannot wedge the session.  Keep the tunnel free of other clients.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== bench.py headline + regression assert ($(date)) ==="
  timeout 1800 python bench.py | tee /tmp/bench_line.json
  # drift guard (VERDICT r4 #6): fail LOUDLY here, before the driver sees a
  # flipped gate — the margin over 200x is only ~1.5%
  python - <<'EOF'
import json
line = open('/tmp/bench_line.json').read().strip().splitlines()[-1]
v = json.loads(line)['value']
assert v >= 202.0, 'HEADLINE REGRESSION: %.2f < 202' % v
print('headline ok: %.2f' % v)
EOF

  echo "=== B=96 probe (headline margin, VERDICT #6) ($(date)) ==="
  timeout 1800 env BENCH_BATCH=96 python bench.py

  # persistent XLA executable cache for everything after the (pristine)
  # bench stages
  export JAX_COMPILATION_CACHE_DIR=/root/.cache/tts_tpu_xla
  export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
  mkdir -p "$JAX_COMPILATION_CACHE_DIR"

  echo "=== train throughput f32 (ledger baseline) ($(date)) ==="
  timeout 2400 python benchmarks/train_throughput.py --model waveglow
  timeout 1800 python benchmarks/train_throughput.py --model hifigan
  timeout 2400 python benchmarks/train_throughput.py --model vits
  echo "=== train throughput mixed_bfloat16 ($(date)) ==="
  timeout 2400 python benchmarks/train_throughput.py --model waveglow --precision mixed_bfloat16
  timeout 1800 python benchmarks/train_throughput.py --model hifigan --precision mixed_bfloat16
  timeout 2400 python benchmarks/train_throughput.py --model vits --precision mixed_bfloat16
  timeout 1800 python benchmarks/train_throughput.py --model tacotron2 --precision mixed_bfloat16

  echo "=== e2e single-sentence (one-launch path) ($(date)) ==="
  timeout 1800 python benchmarks/e2e_tts.py --int8-vocoder
  echo "=== e2e single-sentence, fixed length (variance floor) ($(date)) ==="
  timeout 1800 python benchmarks/e2e_tts.py --int8-vocoder --fixed-length

  echo "=== serving sweep: vits, median-of-3 + steady-state ($(date)) ==="
  timeout 3600 python benchmarks/serving_load.py --sweep --requests 64 \
      --max-batches 16,32 --rates 32,0
  echo "=== serving: vits 256-request open-loop (occupancy ceiling) ($(date)) ==="
  timeout 3600 python benchmarks/serving_load.py --requests 256 --rate 0 \
      --max-batch 32 --reps 3

  echo "=== serving: AR family r=1 vs r=2 ($(date)) ==="
  timeout 2400 python benchmarks/serving_load.py --model tacotron2 \
      --requests 32 --rate 0 --max-batch 8 --reps 3
  timeout 2400 python benchmarks/serving_load.py --model tacotron2 \
      --reduction 2 --requests 32 --rate 0 --max-batch 8 --reps 3

  echo "=== done ($(date)) rc=$? ==="
} > /tmp/tpu_session.log 2>&1
