"""End-to-end text→waveform throughput through the public `tts()` API
(full-size models, random weights — compute cost is weight-independent).

Usage: python benchmarks/e2e_tts.py [--sentences 4] [--runs 3]
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
    parser.add_argument('--sentences', type = int, default = 4)
    parser.add_argument('--runs', type = int, default = 3)
    parser.add_argument('--dtype', default = None,
                        help = 'bfloat16 runs both models at MXU precision')
    parser.add_argument('--fused-decoder', action = 'store_true',
                        help = 'fused decoder-step Pallas kernel (B<=8)')
    parser.add_argument('--int8-vocoder', action = 'store_true',
                        help = 'int8 fused-block WaveGlow serving path')
    parser.add_argument('--vocoder', default = 'waveglow',
                        choices = ('waveglow', 'hifigan', 'vocos'),
                        help = 'hifigan: full-size v1 generator (~100x '
                               'cheaper per audio-second); vocos: '
                               'frame-rate ConvNeXt + iSTFT (~600x)')
    parser.add_argument('--synthesizer', default = 'tacotron2',
                        choices = ('tacotron2', 'fastspeech2', 'vits'),
                        help = 'fastspeech2: parallel (non-AR) text->mel — '
                               'one forward per bucketed batch; vits: '
                               'end-to-end text->waveform (no vocoder)')
    parser.add_argument('--min-duration', type = int, default = 6,
                        help = 'fastspeech2 only: floor frames/token — random '
                               'weights predict ~0 durations, so without a '
                               'floor the benchmark synthesizes ~no audio '
                               '(6 ~= natural speech rate at 86 frames/s)')
    parser.add_argument('--sdp', action = 'store_true',
                        help = 'vits only: stochastic duration predictor '
                               '(spline-flow sampling) instead of the '
                               'deterministic conv stack')
    parser.add_argument('--long-doc', type = int, default = 0, metavar = 'N',
                        help = 'synthesize ONE document of N sentences through '
                               'the chunked long-document path (max_text_length '
                               '120, sliding attention window, windowed '
                               'vocoding win 256 hop -64)')
    parser.add_argument('--batch', type = int, default = None,
                        help = 'cross-text batched synthesis (predict_batched)')
    parser.add_argument('--reduction', type = int, default = 1,
                        help = 'tacotron2 n_frames_per_step (r): r frames '
                               'per sequential decode step — the decode '
                               'latency axis divides by r.  r=2 passes the '
                               'MCD quality gate at convergence '
                               '(docs/PERFORMANCE.md r-sweep)')
    parser.add_argument('--fixed-length', action = 'store_true',
                        help = 'decode to max_length without gate early-stop '
                               '(random r>1 weights stop at the first step '
                               'otherwise — this pins the decode length so '
                               'r configurations time the same audio)')
    parser.add_argument('--no-one-launch', action = 'store_true',
                        help = 'disable the fused single-launch tts path '
                               '(A/B against the multi-launch pipeline in '
                               'the SAME session -- tunnel RTT drifts '
                               'between sessions)')
    parser.add_argument('--gate', action = 'store_true',
                        help = 'keep the frames/token retry gate (default off: '
                               'random weights always fail it, so the gate '
                               'would double-decode and measure retry logic '
                               'instead of the pipeline)')
    args = parser.parse_args()
    if args.sdp and args.synthesizer != 'vits':
        parser.error('--sdp applies to the vits synthesizer only')

    os.environ.setdefault('TTS_PRETRAINED_DIR', '/tmp/bench_models')
    from text_to_speech_tpu import tts, Tacotron2, WaveGlow
    extra = {}
    if args.dtype:
        import jax.numpy as jnp
        extra['dtype'] = getattr(jnp, args.dtype)
    if args.fused_decoder:
        extra['use_fused_decoder'] = True
    if args.batch:
        extra['batch_size'] = args.batch
    if not args.gate:
        extra['min_fpt_ratio'] = -1.
        extra['max_fpt_ratio'] = float('inf')
    if args.fixed_length:
        extra['early_stopping'] = False

    if args.synthesizer == 'fastspeech2':
        if args.fused_decoder:
            parser.error('--fused-decoder applies to the Tacotron-2 AR path only')
        from text_to_speech_tpu.models.tts import FastSpeech2
        model = FastSpeech2(lang = 'en', name = 'bench_fastspeech2')
        extra['min_duration'] = args.min_duration
    elif args.synthesizer == 'vits':
        if args.fused_decoder or args.int8_vocoder:
            parser.error('--fused-decoder/--int8-vocoder do not apply to vits')
        from text_to_speech_tpu.models.tts import VITS
        model = VITS(lang = 'en',
                     name = 'bench_vits_sdp' if args.sdp else 'bench_vits',
                     use_sdp = args.sdp)
        extra['min_duration'] = args.min_duration
    else:
        name = 'bench_tacotron2' if args.reduction == 1 \
            else 'bench_tacotron2_r{}'.format(args.reduction)
        model = Tacotron2(lang = 'en', name = name,
                          n_frames_per_step = args.reduction)
    if getattr(model, 'is_end_to_end', False):
        vocoder = None          # the facade resolves the model as its vocoder
    elif args.vocoder in ('hifigan', 'vocos'):
        if args.int8_vocoder:
            parser.error('--int8-vocoder applies to the WaveGlow path only')
        if args.vocoder == 'vocos':
            from text_to_speech_tpu.models.tts import Vocos
            vocoder = Vocos(name = 'bench_vocos')
        else:
            from text_to_speech_tpu.models.tts import HiFiGAN
            vocoder = HiFiGAN(name = 'bench_hifigan')
    else:
        vocoder = WaveGlow(name = 'bench_waveglow')
        if args.int8_vocoder:
            vocoder.quantize_for_serving()

    if args.long_doc:
        # one long document: recursive chunking + sliding attention window +
        # windowed vocoding (the docs/PERFORMANCE.md "long document" row)
        texts = [' '.join(
            'This is sentence number {} of a long document about text to '
            'speech synthesis on tensor processing units.'.format(i)
            for i in range(args.long_doc)
        )]
        extra.update(
            max_text_length = 120,
            attn_mask_win_len = 32,
            vocoder_config = {'win_len': 256, 'hop_len': -64},
        )
        warm = ' '.join(texts[0].split(' ')[:40])
    else:
        texts = [
            'The quick brown fox jumps over the lazy dog number {}.'.format(i)
            for i in range(args.sentences)
        ]
        warm = texts[0]

    if args.no_one_launch:
        # instance attribute shadows the class default: the override stays
        # scoped to the benchmarked model, not every instance of the class
        model.one_launch_tts = False

    # warm-up (compiles the padding buckets)
    tts(warm, model = model, vocoder = vocoder, max_trial = 1, save = False, display = False, ** extra)

    # median ± spread over runs: the axon tunnel adds ~30 ms/RTT of session
    # noise, so single numbers can't distinguish rig variance from
    # regression (VERDICT r2 weak #5) — report the distribution
    times = []
    audio_s = 0.
    for _ in range(args.runs):
        start = time.perf_counter()
        results = tts(texts, model = model, vocoder = vocoder,
                      max_trial = 1, save = False, display = False, overwrite = True, ** extra)
        times.append(time.perf_counter() - start)
        audio_s = sum(r.get('time', 0.) for r in results)

    import numpy as np
    med = float(np.median(times))
    spread = (max(times) - min(times)) / med
    what = ('1 document ({} sentences)'.format(args.long_doc) if args.long_doc
            else '{} sentences'.format(args.sentences))
    print('{} -> {:.2f}s audio; wall median {:.2f}s over {} runs '
          '(min {:.2f} / max {:.2f}, spread {:.0f}%) = '
          '{:.1f}x real-time end-to-end ({:.1f}x best-run)'.format(
              what, audio_s, med, len(times), min(times), max(times),
              100 * spread, audio_s / med, audio_s / min(times)))


if __name__ == '__main__':
    main()
