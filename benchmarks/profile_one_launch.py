"""Where does the single-sentence `tts()` wall time go?

The 2026-08-21 session measured the one-launch path at 0.19 s median
(spread 4 %) — but a degenerate run (fused decoder gating at step 1, ~zero
device work) still took 0.12 s, so a large fixed HOST cost rides every
call.  This probe splits the call:

  1. device path: `compiled_tts` dispatch + the blocking audio+lengths
     fetch, nothing else (pre-encoded tokens, warm executable);
  2. facade path: the full `model.infer(text, vocoder=...)` (text clean +
     split + encode, callbacks, result assembly);
  3. the facade's own pieces, timed separately (encode_text, dict work).

Usage: python benchmarks/profile_one_launch.py [--runs 7] [--reduction 1]
       [--fixed-length]
"""

import os
import sys
import json
import time
import argparse

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

SENTENCE = 'The quick brown fox jumps over the lazy dog number 0.'


def main():
    import _cache
    _cache.enable()
    parser = argparse.ArgumentParser()
    parser.add_argument('--runs', type = int, default = 7)
    parser.add_argument('--reduction', type = int, default = 1)
    parser.add_argument('--fixed-length', action = 'store_true')
    args = parser.parse_args()

    os.environ.setdefault('TTS_PRETRAINED_DIR', '/tmp/bench_models')
    import numpy as np
    import jax
    from text_to_speech_tpu.models.tts import Tacotron2, WaveGlow

    name = 'bench_tacotron2' if args.reduction == 1 \
        else 'bench_tacotron2_r{}'.format(args.reduction)
    model = Tacotron2(lang = 'en', name = name,
                      n_frames_per_step = args.reduction)
    vocoder = WaveGlow(name = 'bench_waveglow')
    vocoder.quantize_for_serving()

    extra = {}
    if args.fixed_length:
        extra['early_stopping'] = False

    encoded = np.asarray(model.encode_text(SENTENCE))
    rng = jax.random.PRNGKey(0)

    def device_call():
        a16, lengths, mel, attn = model.compiled_tts(
            encoded, vocoder, max_length = 10., rng = rng, ** extra)
        n = int(np.asarray(lengths)[0])
        a = np.asarray(a16)
        return n, a

    # warm
    n_frames, _ = device_call()
    audio_s = n_frames * 256 / 22050.

    def med(fn, reps):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return float(np.median(times)), times

    dev_med, dev_times = med(device_call, args.runs)

    # facade pieces
    enc_med, _ = med(lambda: model.encode_text(SENTENCE), args.runs)

    def facade_call():
        model.infer(SENTENCE, vocoder = vocoder, max_trial = 1,
                    max_length = 10., min_fpt_ratio = -1.,
                    max_fpt_ratio = float('inf'), save = False,
                    display = False, overwrite = True, ** extra)
    facade_call()                                   # warm facade buckets
    fac_med, fac_times = med(facade_call, args.runs)

    print(json.dumps({
        'metric': 'one_launch_profile',
        'unit': 's',
        'audio_s': round(audio_s, 2),
        'frames': n_frames,
        'reduction': args.reduction,
        'device_median_s': round(dev_med, 4),
        'device_times': [round(t, 4) for t in dev_times],
        'device_rtf': round(audio_s / dev_med, 1),
        'encode_text_s': round(enc_med, 4),
        'facade_median_s': round(fac_med, 4),
        'facade_times': [round(t, 4) for t in fac_times],
        'facade_rtf': round(audio_s / fac_med, 1),
        'facade_overhead_s': round(fac_med - dev_med, 4),
    }), flush = True)


if __name__ == '__main__':
    main()
