#!/bin/sh
# Follow-up TPU session (round 4, part 2): the SINGLE-sentence e2e protocol
# (the first session's e2e stage ran the 4-sentence default), mixed-precision
# probes (no-remat, 2x batch), and the mixed-vs-f32 quality-parity gate.
set -x
cd "$(dirname "$0")/.."
{
  export JAX_COMPILATION_CACHE_DIR=/root/.cache/tts_tpu_xla
  export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
  mkdir -p "$JAX_COMPILATION_CACHE_DIR"

  echo "=== e2e SINGLE sentence, one-launch (median-of-7) ($(date)) ==="
  timeout 1800 python benchmarks/e2e_tts.py --int8-vocoder --sentences 1 --runs 7
  echo "=== e2e single sentence, OLD multi-launch path (fused decoder) ($(date)) ==="
  timeout 1800 python benchmarks/e2e_tts.py --int8-vocoder --sentences 1 --runs 7 --fused-decoder
  echo "=== e2e single sentence, fastspeech2 one-launch + hifigan ($(date)) ==="
  timeout 1800 python benchmarks/e2e_tts.py --synthesizer fastspeech2 --vocoder hifigan --sentences 1 --runs 7

  echo "=== waveglow mixed probes: no-remat / 2x batch ($(date)) ==="
  timeout 2400 python benchmarks/train_throughput.py --model waveglow --precision mixed_bfloat16 --no-remat
  timeout 2400 python benchmarks/train_throughput.py --model waveglow --precision mixed_bfloat16 --batch 64
  timeout 2400 python benchmarks/train_throughput.py --model waveglow --precision mixed_bfloat16 --batch 64 --no-remat

  echo "=== serving re-runs with overlapped finish + pinned pipeline ($(date)) ==="
  echo "--- vits 256-request open-loop (was steady 117.5 with the eager-fetch bug) ---"
  timeout 3600 python benchmarks/serving_load.py --requests 256 --rate 0 \
      --max-batch 32 --reps 3
  echo "--- vits 64-request capacity cell (steady protocol sanity) ---"
  timeout 1800 python benchmarks/serving_load.py --requests 64 --rate 0 \
      --max-batch 32 --reps 3
  echo "--- AR r=1 vs r=2, pinned length (fair A/B; async finish live) ---"
  timeout 3000 python benchmarks/serving_load.py --model tacotron2 \
      --pin-length --requests 32 --rate 0 --max-batch 8 --reps 3
  timeout 3000 python benchmarks/serving_load.py --model tacotron2 \
      --pin-length --reduction 2 --requests 32 --rate 0 --max-batch 8 --reps 3

  echo "=== mixed-precision quality-parity gate (300 steps x 2) ($(date)) ==="
  timeout 3600 python benchmarks/mixed_precision_parity.py --steps 300

  echo "=== done ($(date)) rc=$? ==="
} > /tmp/tpu_session2.log 2>&1
