"""Time-to-first-audio for incremental streaming TTS (full-size models,
random weights — compute cost is weight-independent).

The ContinuousServingEngine with ``stream_audio=True`` vocodes newly
completed mel frames at every decode chunk boundary, so first audio lands
after one encode + one chunk decode + one small vocode, independent of the
utterance length.  This script measures that against the non-streaming
latency (full decode + full vocode) on the same text.

Usage: python benchmarks/streaming_latency.py [--chunk 32] [--runs 3]
"""

import os
import sys
import time
import argparse

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))


def main():
    import _cache
    _cache.enable()
    parser = argparse.ArgumentParser()
    parser.add_argument('--chunk', type = int, default = 32)
    parser.add_argument('--runs', type = int, default = 3)
    parser.add_argument('--int8-vocoder', action = 'store_true')
    parser.add_argument('--synthesizer', default = 'tacotron2',
                        choices = ('tacotron2', 'vits'),
                        help = 'vits: windowed end-to-end decode over '
                               'precomputed latents (make_vits_stepper) — '
                               'no separate vocoder')
    args = parser.parse_args()

    os.environ.setdefault('TTS_PRETRAINED_DIR', '/tmp/bench_models')
    from text_to_speech_tpu import Tacotron2, WaveGlow
    from text_to_speech_tpu.runtimes.serving import (
        ContinuousServingEngine, make_tacotron_stepper, make_vits_stepper)

    text = ('The quick brown fox jumps over the lazy dog while the rain in '
            'Spain stays mainly in the plain, and the five boxing wizards '
            'jump quickly over everything else in sight.')

    if args.synthesizer == 'vits':
        if args.int8_vocoder:
            parser.error('--int8-vocoder applies to the tacotron2 path only')
        from text_to_speech_tpu.models.tts import VITS
        model = VITS(lang = 'en', name = 'bench_vits')
        # random weights predict ~0 durations: floor them so the stream
        # covers multiple windows (~natural speech rate)
        stepper = make_vits_stepper(model, window = args.chunk,
                                    min_duration = 6)
    else:
        model = Tacotron2(lang = 'en', name = 'bench_tacotron2')
        vocoder = WaveGlow(name = 'bench_waveglow')
        if args.int8_vocoder:
            vocoder.quantize_for_serving()
        # random weights gate immediately; force a fixed-length decode so the
        # measurement covers real multi-chunk streaming
        model.arch.hp.gate_threshold = 1.1

        stepper = make_tacotron_stepper(
            model, chunk = args.chunk, vocoder = vocoder,
            stream_audio = True, max_steps = 512)

    with ContinuousServingEngine(*stepper, max_batch_size = 4) as engine:
        # warm-up: compiles encode / chunk-decode / windowed-vocode buckets
        engine.submit(text, on_audio = lambda a: None).result.get(timeout = 1800)

        firsts, totals, audio_s = [], [], 0.
        for _ in range(args.runs):
            t0 = time.perf_counter()
            req = engine.submit(text, on_audio = lambda a: None)
            out = req.result.get(timeout = 600)
            totals.append(time.perf_counter() - t0)
            firsts.append(out['first_audio_s'])
            audio_s = len(out['audio']) / float(out['rate'])

    print('audio length     : {:.2f}s'.format(audio_s))
    print('first audio      : {:.0f} ms (best of {}: {:.0f} ms)'.format(
        1000 * sum(firsts) / len(firsts), args.runs, 1000 * min(firsts)))
    print('full utterance   : {:.0f} ms  ({:.1f}x real-time)'.format(
        1000 * min(totals), audio_s / min(totals)))
    print('streaming advantage: first audio {:.1f}x earlier than full-utterance '
          'completion'.format(min(totals) / max(min(firsts), 1e-9)))


if __name__ == '__main__':
    main()
