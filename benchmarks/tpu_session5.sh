#!/bin/sh
# One-shot TPU perf session (round 5): headline assert, WaveGlow training
# conv/remat A/B matrix (VERDICT r4 #2), Tacotron scan-native bf16
# (VERDICT #3), serving occupancy with admission prefetch + window sweep
# (VERDICT #1), AR r=1 max-batch attack (VERDICT #5), and the token-LLM
# serving throughput note (VERDICT #4).  Logs to /tmp/tpu_session5.log;
# every stage bounded so a tunnel drop cannot wedge the session.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== bench.py headline + regression assert ($(date)) ==="
  timeout 1800 python bench.py | tee /tmp/bench_line.json
  python - <<'EOF'
import json
line = open('/tmp/bench_line.json').read().strip().splitlines()[-1]
v = json.loads(line)['value']
assert v >= 202.0, 'HEADLINE REGRESSION: %.2f < 202' % v
print('headline ok: %.2f' % v)
EOF

  export JAX_COMPILATION_CACHE_DIR=/root/.cache/tts_tpu_xla
  export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
  mkdir -p "$JAX_COMPILATION_CACHE_DIR"

  echo "=== WaveGlow train A/B: mixed baseline (dilated conv, full remat) ($(date)) ==="
  timeout 2400 python benchmarks/train_throughput.py --model waveglow --precision mixed_bfloat16
  echo "=== WaveGlow train: shifted conv ($(date)) ==="
  timeout 2400 python benchmarks/train_throughput.py --model waveglow --precision mixed_bfloat16 --conv-mode shifted
  echo "=== WaveGlow train: shifted conv + acts remat ($(date)) ==="
  timeout 2400 python benchmarks/train_throughput.py --model waveglow --precision mixed_bfloat16 --conv-mode shifted --remat-policy acts
  echo "=== WaveGlow train: dilated conv + acts remat ($(date)) ==="
  timeout 2400 python benchmarks/train_throughput.py --model waveglow --precision mixed_bfloat16 --remat-policy acts
  echo "=== WaveGlow train: f32 + shifted (does the formulation help f32 too?) ($(date)) ==="
  timeout 2400 python benchmarks/train_throughput.py --model waveglow --conv-mode shifted

  echo "=== Tacotron scan-native bf16 (expect <= 311 ms; r4 islands gave 2307) ($(date)) ==="
  timeout 1800 python benchmarks/train_throughput.py --model tacotron2 --precision mixed_bfloat16
  echo "=== Tacotron f32 baseline re-pin ($(date)) ==="
  timeout 1800 python benchmarks/train_throughput.py --model tacotron2
  echo "=== Tacotron bf16 WITHOUT native scan (the r4 regression shape, re-pin) ($(date)) ==="
  timeout 1800 python benchmarks/train_throughput.py --model tacotron2 --precision mixed_bfloat16 --no-native-scan

  echo "=== serving: vits 256-request open-loop, admission prefetch ON (auto depth) ($(date)) ==="
  timeout 3600 python benchmarks/serving_load.py --requests 256 --rate 0 \
      --max-batch 32 --reps 3
  echo "=== serving: vits 256-request, prefetch OFF (r4 baseline shape) ($(date)) ==="
  timeout 2400 python benchmarks/serving_load.py --requests 256 --rate 0 \
      --max-batch 32 --reps 1 --admit-ahead 0
  echo "=== serving: window sweep at max_batch 32 (wide-batch chunk cost) ($(date)) ==="
  timeout 2400 python benchmarks/serving_load.py --requests 128 --rate 0 \
      --max-batch 32 --reps 1 --window 96
  timeout 2400 python benchmarks/serving_load.py --requests 128 --rate 0 \
      --max-batch 32 --reps 1 --window 128

  echo "=== serving: AR r=1 max-batch attack (8 -> 16 -> 32) ($(date)) ==="
  timeout 2400 python benchmarks/serving_load.py --model tacotron2 \
      --requests 32 --rate 0 --max-batch 8 --reps 3
  timeout 2400 python benchmarks/serving_load.py --model tacotron2 \
      --requests 48 --rate 0 --max-batch 16 --reps 3
  timeout 2400 python benchmarks/serving_load.py --model tacotron2 \
      --requests 64 --rate 0 --max-batch 32 --reps 1

  echo "=== token-LLM serving throughput (gpt2-small shape, random weights) ($(date)) ==="
  timeout 2400 python benchmarks/llm_serving_load.py --requests 64 \
      --max-batch 16 --chunk 8 --gen-tokens 96 --reps 3
  timeout 1800 python benchmarks/llm_serving_load.py --requests 64 \
      --max-batch 32 --chunk 8 --gen-tokens 96 --reps 1

  echo "=== done ($(date)) rc=$? ==="
} > /tmp/tpu_session5.log 2>&1
