#!/bin/sh
# Round-4 session 3: the one-launch single-sentence path with the FUSED
# Pallas decoder inside the program (commit ccdadb2+), plus the host/device
# split profile and the r=2 one-launch variant.
set -x
cd "$(dirname "$0")/.."
{
  export JAX_COMPILATION_CACHE_DIR=/root/.cache/tts_tpu_xla
  export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
  mkdir -p "$JAX_COMPILATION_CACHE_DIR"

  echo "=== one-launch profile: device vs facade split, r=1 ($(date)) ==="
  timeout 1800 python benchmarks/profile_one_launch.py --fixed-length
  echo "=== one-launch profile, r=2 fixed-length ($(date)) ==="
  timeout 1800 python benchmarks/profile_one_launch.py --reduction 2 --fixed-length

  echo "=== e2e single sentence, one-launch + fused decoder ($(date)) ==="
  timeout 1800 python benchmarks/e2e_tts.py --int8-vocoder --sentences 1 --runs 7
  echo "=== e2e single sentence, fixed-length r=1 / r=2 ($(date)) ==="
  timeout 1800 python benchmarks/e2e_tts.py --int8-vocoder --sentences 1 --runs 7 --fixed-length
  timeout 1800 python benchmarks/e2e_tts.py --int8-vocoder --sentences 1 --runs 7 --fixed-length --reduction 2

  echo "=== done ($(date)) rc=$? ==="
} > /tmp/tpu_session3.log 2>&1
