#!/bin/sh
# One-shot TPU perf session (2026-08-19): measure the pipelined/int16 VITS
# stepper and serving under load; confirm the bench headline at HEAD.
# Logs to /tmp/tpu_session.log; each stage bounded so a tunnel drop cannot
# wedge the session.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== bench.py ($(date)) ==="
  timeout 1800 python bench.py
  # persistent XLA executable cache for everything after the (pristine)
  # bench stage
  export JAX_COMPILATION_CACHE_DIR=/root/.cache/tts_tpu_xla
  export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
  mkdir -p "$JAX_COMPILATION_CACHE_DIR"
  echo "=== vits stepper profile: pipeline A/B, f32 ($(date)) ==="
  timeout 1800 python benchmarks/profile_vits_stepper.py
  echo "=== vits stepper profile: int16 transfer ($(date)) ==="
  timeout 1800 python benchmarks/profile_vits_stepper.py --int16
  echo "=== serving load: vits oneshot ($(date)) ==="
  timeout 1800 python benchmarks/serving_load.py --requests 64 --rate 8
  echo "=== serving load: vits streaming ($(date)) ==="
  timeout 1800 python benchmarks/serving_load.py --requests 64 --rate 8 --stream
  echo "=== serving load: rate sweep for the knee ($(date)) ==="
  timeout 1800 python benchmarks/serving_load.py --requests 64 --rate 16
  timeout 1800 python benchmarks/serving_load.py --requests 96 --rate 24
  echo "=== done ($(date)) rc=$? ==="
} > /tmp/tpu_session.log 2>&1
