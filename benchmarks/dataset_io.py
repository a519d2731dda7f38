"""Input-pipeline throughput: Python readers vs the native C++ loader pool.

Writes a small synthetic WAV corpus to a temp dir, then measures the
first-epoch materialization rate (file read + decode + resample +
normalize per row) of `train.datasets.Dataset` in three configurations:

  - python 1 thread      (the default map path)
  - python N threads     (num_parallel_calls, GIL-bound for the WAV parse)
  - native pool          (native_audio_rate=..., C++ decode below the GIL)

Host-side only (no device work): run anywhere, results are per-core.
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))


def make_corpus(root, n_files, seconds, rate):
    from scipy.io import wavfile
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n_files):
        p = os.path.join(root, 'utt{:04d}.wav'.format(i))
        sig = (rng.randn(int(seconds * rate)) * 0.2 * 32767).astype(np.int16)
        wavfile.write(p, rate, sig)
        paths.append(p)
    return paths


def run(rows, map_fn, label, **ds_kwargs):
    from text_to_speech_tpu.train.datasets import Dataset
    # warm the lazy imports / native build / OS file cache out of the
    # timed region so configs compare fairly
    warm = Dataset(rows[:4], map_fn = map_fn, batch_size = 4, prefetch = 0,
                   cache = False, ** ds_kwargs)
    for _ in warm: pass
    ds = Dataset(rows, map_fn = map_fn, batch_size = 8, prefetch = 0,
                 cache = False, ** ds_kwargs)
    t0 = time.perf_counter()
    n = sum(len(b) for b in ds)
    dt = time.perf_counter() - t0
    print('{:<18} {:5d} rows in {:6.2f}s = {:8.1f} rows/s'.format(
        label, n, dt, n / dt))
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--files', type = int, default = 256)
    ap.add_argument('--seconds', type = float, default = 4.0)
    ap.add_argument('--rate', type = int, default = 22050)
    ap.add_argument('--target-rate', type = int, default = 16000,
                    help = 'decode-time resample target (the expensive part)')
    ap.add_argument('--workers', type = int, default = 4)
    args = ap.parse_args()

    from text_to_speech_tpu.ops.audio_io import load_audio

    with tempfile.TemporaryDirectory() as root:
        paths = make_corpus(root, args.files, args.seconds, args.rate)
        rows = [{'filename': p} for p in paths]

        def map_fn(row):
            audio = load_audio(row, args.target_rate, normalize = True)
            return np.asarray(audio, np.float32)

        run(rows, map_fn, 'python x1')
        run(rows, map_fn, 'python x{}'.format(args.workers),
            num_parallel_calls = args.workers)
        from text_to_speech_tpu.native import data_loader
        if data_loader.available():
            run(rows, map_fn, 'native pool x{}'.format(args.workers),
                native_audio_rate = args.target_rate,
                num_parallel_calls = args.workers)
        else:
            print('native pool unavailable (no compiler)')


if __name__ == '__main__':
    main()
