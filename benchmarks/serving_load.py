"""Sustained-load benchmark for the continuous-batching serving engine.

Drives `ContinuousServingEngine` (in-flight admission at window boundaries,
the TRT-LLM-runner-style behavior the reference wraps at
``utils/keras/runtimes/custom_model_runner_cpp.py:26-40``) with a Poisson
arrival process of TTS requests and reports what a capacity planner needs:

  - sustained throughput (requests/s and audio-seconds/s),
  - per-request latency p50 / p95 / p99 (submit -> full audio),
  - time-to-first-audio p50 (streaming requests hear audio long before
    the request completes),
  - scheduler-core counters (mean queue wait, batches formed).

Default model is the end-to-end VITS family through `make_vits_stepper`
(cheap latent stage at admission + windowed HiFi-GAN decode per chunk);
`--model tacotron2` exercises `make_tacotron_stepper` (AR decode in chunks
+ int8 WaveGlow vocode at finish) instead.

Usage:
    python benchmarks/serving_load.py [--requests 64] [--rate 8]
        [--max-batch 8] [--window 64] [--model vits|tacotron2]

Offered load vs capacity: at `--rate` below capacity the p99 tracks the
per-request service time; above it the queue grows and p99 explodes —
sweep `--rate` to find the knee.
"""

import os
import sys
import json
import time
import random
import argparse

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

TEXTS = [
    'The quick brown fox jumps over the lazy dog.',
    'A journey of a thousand miles begins with a single step.',
    'It was the best of times, it was the worst of times, it was the age '
    'of wisdom, it was the age of foolishness.',
    'To be or not to be, that is the question.',
    'All that glitters is not gold; all who wander are not lost.',
    'The report is ready and the meeting starts in ten minutes.',
]


def percentile(values, q):
    if not values: return float('nan')
    return float(np.percentile(values, q))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model', default = 'vits',
                        choices = ('vits', 'tacotron2'))
    parser.add_argument('--requests', type = int, default = 64)
    parser.add_argument('--rate', type = float, default = 8.,
                        help = 'mean arrival rate (requests/s); 0 = all at once')
    parser.add_argument('--max-batch', type = int, default = 8)
    parser.add_argument('--window', type = int, default = 64,
                        help = 'decode window frames (vits) / chunk (tacotron2)')
    parser.add_argument('--seed', type = int, default = 0)
    parser.add_argument('--stream', action = 'store_true',
                        help = 'submit streaming requests (per-request '
                               'on_audio) and report time-to-first-audio '
                               'percentiles under load')
    parser.add_argument('--transfer-dtype', default = 'int16',
                        choices = ('int16', 'float32'),
                        help = 'device->host chunk transfer dtype for the '
                               'vits stepper (int16 = 4x fewer bytes, '
                               'matches the serve() default)')
    args = parser.parse_args()

    os.environ.setdefault('TTS_PRETRAINED_DIR', '/tmp/bench_models')
    import numpy as np
    from text_to_speech_tpu.runtimes.serving import (
        ContinuousServingEngine, make_vits_stepper, make_tacotron_stepper)

    if args.model == 'vits':
        from text_to_speech_tpu.models.tts import VITS
        model = VITS(lang = 'en', name = 'bench_vits')
        rate_hz = model.rate
        start_fn, step_fn, finish_fn = make_vits_stepper(
            model, window = args.window, min_duration = 6,
            transfer_dtype = args.transfer_dtype)
    else:
        from text_to_speech_tpu.models.tts import Tacotron2, WaveGlow
        model = Tacotron2(lang = 'en', name = 'bench_tacotron2')
        vocoder = WaveGlow(name = 'bench_waveglow')
        vocoder.quantize_for_serving()
        rate_hz = 22050
        start_fn, step_fn, finish_fn = make_tacotron_stepper(
            model, chunk = args.window, vocoder = vocoder,
            stream_audio = args.stream)

    engine = ContinuousServingEngine(
        start_fn, step_fn, finish_fn, max_batch_size = args.max_batch,
        name = 'load-bench')

    rng = random.Random(args.seed)
    # streaming requests attach a sink callback so the steppers emit (and
    # timestamp) incremental audio; oneshot requests decode whole
    sub_kwargs = {'on_audio': (lambda part: None)} if args.stream else {}
    # compile outside the measurement: every token bucket the load will
    # hit x every pow2 batch bucket, through the engine's warmup API
    warmup_s = engine.warmup(sorted(set(TEXTS), key = len), ** sub_kwargs)
    with engine:
        engine.stats['latencies'].clear()

        t0 = time.perf_counter()
        requests = []
        for i in range(args.requests):
            requests.append(engine.submit(TEXTS[i % len(TEXTS)],
                                          ** sub_kwargs))
            if args.rate > 0:
                time.sleep(rng.expovariate(args.rate))
        outputs = [r.result.get(timeout = 600) for r in requests]
        elapsed = time.perf_counter() - t0

    latencies = list(engine.stats['latencies'])
    audio_s = sum(len(o['audio']) for o in outputs
                  if isinstance(o, dict) and 'audio' in o) / float(rate_hz)
    first_audio = [o['first_audio_s'] for o in outputs
                   if isinstance(o, dict) and 'first_audio_s' in o]

    result = {
        'metric': 'serving_load_{}'.format(args.model),
        'value': round(args.requests / elapsed, 2),
        'unit': 'requests/s',
        'offered_rate': args.rate,
        'stream': bool(args.stream),
        'transfer_dtype': args.transfer_dtype if args.model == 'vits' else None,
        'warmup_s': round(warmup_s, 2),
        'max_batch': args.max_batch,
        'requests': args.requests,
        'elapsed_s': round(elapsed, 2),
        'audio_s_per_s': round(audio_s / elapsed, 1),
        'latency_p50_s': round(percentile(latencies, 50), 3),
        'latency_p95_s': round(percentile(latencies, 95), 3),
        'latency_p99_s': round(percentile(latencies, 99), 3),
        'scheduler': {k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in dict(engine.scheduler_stats).items()},
    }
    if first_audio:
        result['first_audio_p50_s'] = round(percentile(first_audio, 50), 3)
        result['first_audio_p95_s'] = round(percentile(first_audio, 95), 3)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
