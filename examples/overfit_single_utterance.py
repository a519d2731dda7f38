"""Overfit a small Tacotron-2 on ONE real utterance, then synthesize it back
with the TRAINED weights (autoregressive decode) and Griffin-Lim vocoding.

Published pretrained checkpoints cannot be downloaded in this environment
(zero egress), so this is the stand-in for a listen test: it proves real
*learned* weights flow end-to-end through the full public pipeline —
dataset rows → ``fit()`` (mel extraction, bucketed batching, checkpoints,
history) → autoregressive ``predict()`` with gate early-stop → mel →
waveform — not just random initializations.  The reference validates its
models the same empirical way (listen tests in ``text_to_speech.ipynb``;
SURVEY.md §4 "Model validation is manual/empirical").

The utterance's true transcript is unknown; the text below acts as its
label.  Single-utterance overfitting learns a monotonic text→mel alignment
and a near-exact mel reconstruction either way, which is what the numbers
printed at the end measure.

Usage:  python examples/overfit_single_utterance.py [epochs] [out_dir] [r]
        (CPU-friendly: ~2-3 min at the default 50 epochs on one core;
        r > 1 trains with the reduction factor — r mel frames per
        sequential decoder step, so the AR decode runs in 1/r the steps)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np

TEXT = 'the birch canoe slid on the smooth planks of the lake.'
WAV_CANDIDATES = (
    os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                 'tests', 'data', 'audio_test.wav'),
    '/root/reference/tests/data/audio_test.wav',
)

MODEL_HP = dict(
    encoder_embedding_dim = 64, encoder_n_conv = 2, encoder_kernel_size = 5,
    prenet_sizes = (64, 64), lsa_attention_dim = 32, lsa_attention_filters = 8,
    lsa_attention_kernel_size = 15, attention_rnn_dim = 128,
    decoder_rnn_dim = 128, postnet_n_conv = 3, postnet_filters = 128,
    postnet_kernel_size = 5, max_decoder_steps = 400,
)


def load_utterance(max_seconds = 3.0):
    from text_to_speech_tpu.ops.audio_io import read_audio
    from text_to_speech_tpu.ops.audio_processing import trim_silence
    for path in WAV_CANDIDATES:
        if os.path.isfile(path):
            rate, audio = read_audio(path)
            audio = trim_silence(audio, rate = rate, method = 'rms')
            return rate, audio[:int(max_seconds * rate)]
    raise FileNotFoundError('no test utterance found in ' + str(WAV_CANDIDATES))


def main(epochs = 50, out_path = None, r = 1):
    from text_to_speech_tpu.models.tts import Tacotron2
    from text_to_speech_tpu.ops.audio_io import write_audio

    rate, audio = load_utterance()
    print('utterance: %.2fs @ %d Hz' % (len(audio) / rate, rate))

    name = 'overfit_demo' if r == 1 else 'overfit_demo_r{}'.format(r)
    model = Tacotron2(lang = 'en', name = name, n_frames_per_step = r,
                      ** MODEL_HP)
    gt_mel = np.asarray(model.get_audio({'audio': audio, 'rate': rate}))
    print('ground-truth mel: %s frames x %s' % gt_mel.shape)

    # 16 copies per epoch at batch 2 → 8 optimizer steps per epoch;
    # the pipeline caches the extracted mel after the first pass.
    rows = [{'text': TEXT, 'audio': audio, 'rate': rate}] * 16
    history = model.fit(rows, epochs = epochs, batch_size = 2,
                        valid_size = 0., lr = 1e-3,
                        frame_multiple = 16, token_multiple = 8)
    losses = history.get_metric('loss')
    print('loss: %.3f -> %.3f over %d epochs' %
          (losses[0], losses[-1], len(losses)))

    # autoregressive synthesis with the trained weights (no teacher forcing)
    out = model.predict(TEXT, max_trial = 3, save = False)[0]
    mel = np.asarray(out['mel'][0])
    print('AR decode: %d frames in %d sequential steps (ground truth %d)' %
          (len(mel), -(-len(mel) // r), len(gt_mel)))

    n = min(len(mel), len(gt_mel))
    mae = float(np.abs(mel[:n] - gt_mel[:n]).mean())
    print('mel MAE vs ground truth (first %d frames): %.3f' % (n, mae))

    # objective quality: mel-cepstral distortion, DTW-aligned (AR timing
    # drifts a few frames) — the standard TTS copy-synthesis measure
    from text_to_speech_tpu.train.metrics import get_metric
    mcd = get_metric('mcd')(gt_mel, mel, align = 'dtw')
    snr = get_metric('mel_snr')(gt_mel, mel)
    print('MCD vs ground truth: %.2f dB (dtw-aligned); mel SNR %.1f dB'
          % (mcd, snr))

    # Griffin-Lim: the weights-free vocoder fallback.  Also invert the
    # ground-truth mel — the quality ceiling of this vocoding path.
    wave = np.asarray(model.mel_fn.inverse(mel, n_iters = 48))[0]
    ceiling = np.asarray(model.mel_fn.inverse(gt_mel, n_iters = 48))[0]

    out_dir = out_path or os.path.join(model.pred_dir, 'overfit')
    os.makedirs(out_dir, exist_ok = True)
    synth_path = os.path.join(out_dir, 'synthesized.wav')
    write_audio(synth_path, wave, rate = model.rate)
    write_audio(os.path.join(out_dir, 'griffin_lim_ceiling.wav'),
                ceiling, rate = model.rate)
    print('wrote', synth_path)

    result = {'loss_first': float(losses[0]), 'loss_last': float(losses[-1]),
              'mel_mae': mae, 'mcd_db': float(mcd),
              'mel_snr_db': float(snr), 'frames': len(mel),
              'gt_frames': len(gt_mel), 'r': r}
    import json
    print('METRICS ' + json.dumps(result))
    return result


if __name__ == '__main__':
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    out = sys.argv[2] if len(sys.argv) > 2 else None
    r = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    main(epochs, out, r)
