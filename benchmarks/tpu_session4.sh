#!/bin/sh
# Round-4 session 4: same-session A/B of the one-launch vs multi-launch
# single-sentence paths (tunnel RTT drifts between sessions, so only
# same-session pairs are comparable), with the async-prefetch fetch order.
set -x
cd "$(dirname "$0")/.."
{
  export JAX_COMPILATION_CACHE_DIR=/root/.cache/tts_tpu_xla
  export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
  mkdir -p "$JAX_COMPILATION_CACHE_DIR"

  echo "=== A/B: one-launch (async-prefetch) vs multi-launch, fixed length ($(date)) ==="
  timeout 1800 python benchmarks/e2e_tts.py --int8-vocoder --sentences 1 --runs 7 --fixed-length
  timeout 1800 python benchmarks/e2e_tts.py --int8-vocoder --sentences 1 --runs 7 --fixed-length --no-one-launch
  echo "=== profile with the async-prefetch fetch order ($(date)) ==="
  timeout 1800 python benchmarks/profile_one_launch.py --fixed-length
  echo "=== done ($(date)) rc=$? ==="
} > /tmp/tpu_session4.log 2>&1
