#!/bin/sh
# One-shot TPU perf session: run as soon as the axon tunnel is up.
#   1. bench.py            — confirm the headline int8 rtf (writes JSON line)
#   2. ab_int8_kernel.py   — fori vs static-unroll chunk loop at T=8192
# Logs to /tmp/tpu_session.log; each stage bounded so a tunnel drop cannot
# wedge the session.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== bench.py ($(date)) ==="
  timeout 1800 python bench.py
  # persistent XLA executable cache for everything after the (pristine)
  # bench stage: repeat compiles of the same full-size programs drop from
  # 3-5 min to seconds across these stages and future sessions
  export JAX_COMPILATION_CACHE_DIR=/root/.cache/tts_tpu_xla
  export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
  mkdir -p "$JAX_COMPILATION_CACHE_DIR"
  echo "=== unroll A/B ($(date)) ==="
  SWEEP_CONFIGS=fori_c512,fori_c2048,unroll_c2048,unroll_c4096 \
    timeout 2400 python benchmarks/ab_int8_kernel.py
  echo "=== hifigan rtf ($(date)) ==="
  timeout 1200 python benchmarks/hifigan_rtf.py --batch 32 --frames 256
  echo "=== e2e waveglow-int8 single + batched ($(date)) ==="
  timeout 1800 python benchmarks/e2e_tts.py --sentences 1 --runs 3 \
    --dtype bfloat16 --fused-decoder --int8-vocoder
  timeout 1800 python benchmarks/e2e_tts.py --sentences 16 --runs 3 \
    --dtype bfloat16 --int8-vocoder --batch 16
  echo "=== e2e hifigan single + batched ($(date)) ==="
  timeout 1800 python benchmarks/e2e_tts.py --sentences 1 --runs 3 \
    --dtype bfloat16 --fused-decoder --vocoder hifigan
  timeout 1800 python benchmarks/e2e_tts.py --sentences 16 --runs 3 \
    --dtype bfloat16 --vocoder hifigan --batch 16
  echo "=== reduction-factor decode (r=1/2/3, B=1 latency) ($(date)) ==="
  for R in 1 2 3; do
    timeout 900 python benchmarks/tacotron_decode.py \
      --batch 1 --steps 256 --tokens 64 --dtype bfloat16 --r "$R"
  done
  echo "=== e2e non-AR synthesizers, matched audio length ($(date)) ==="
  timeout 1800 python benchmarks/e2e_tts.py --sentences 1 --runs 3 \
    --dtype bfloat16 --synthesizer vits --min-duration 13
  timeout 1800 python benchmarks/e2e_tts.py --sentences 16 --runs 3 \
    --dtype bfloat16 --synthesizer vits --batch 16 --min-duration 13
  timeout 1800 python benchmarks/e2e_tts.py --sentences 16 --runs 3 \
    --dtype bfloat16 --synthesizer fastspeech2 --vocoder hifigan \
    --batch 16 --min-duration 13
  echo "=== streaming latency ($(date)) ==="
  timeout 1200 python benchmarks/streaming_latency.py
  echo "=== done ($(date)) rc=$? ==="
} > /tmp/tpu_session.log 2>&1
