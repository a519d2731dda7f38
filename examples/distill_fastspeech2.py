"""Distil a parallel FastSpeech-2 student from an autoregressive Tacotron-2
teacher on ONE real utterance, end to end and with real learned weights:

  1. overfit a small Tacotron-2 on the utterance (``fit()``),
  2. run its AR ``predict()`` and keep the attention map,
  3. distil per-token durations from that alignment
     (``ops/pitch.durations_from_attention`` — the standard FastSpeech
     recipe), with pitch/energy targets extracted from the waveform,
  4. train a small FastSpeech-2 on those targets (``fit()`` again),
  5. synthesize with the student: ONE parallel forward instead of the
     teacher's ~hundreds of sequential decoder steps.

This is the complete knowledge-distillation value chain of the FastSpeech-2
family (beyond the reference, whose synthesizers are all autoregressive —
``/root/reference/models/tts/tacotron2.py``), exercised with trained
weights through the public API only.

Usage:  python examples/distill_fastspeech2.py [teacher_epochs] [student_epochs] [out_dir]
        (CPU-friendly: ~4-5 min at the defaults on one core)
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, '..'))
sys.path.insert(0, _HERE)

import numpy as np

from overfit_single_utterance import TEXT, MODEL_HP, load_utterance

STUDENT_HP = dict(
    dim = 64, n_heads = 2, encoder_layers = 2, decoder_layers = 2,
    ffn_dim = 128, variance_filters = 64, postnet_n_conv = 2,
    postnet_filters = 64, max_position = 512, max_frames = 320,
)


def train_teacher(audio, rate, epochs):
    from text_to_speech_tpu.models.tts import Tacotron2

    teacher = Tacotron2(lang = 'en', name = 'distill_teacher', ** MODEL_HP)
    rows = [{'text': TEXT, 'audio': audio, 'rate': rate}] * 16
    history = teacher.fit(rows, epochs = epochs, batch_size = 2,
                          valid_size = 0., lr = 1e-3,
                          frame_multiple = 16, token_multiple = 8)
    losses = history.get_metric('loss')
    print('teacher loss: %.3f -> %.3f' % (losses[0], losses[-1]))
    return teacher


def main(teacher_epochs = 50, student_epochs = 120, out_path = None):
    from text_to_speech_tpu.models.tts import FastSpeech2
    from text_to_speech_tpu.ops.audio_io import write_audio
    from text_to_speech_tpu.ops.pitch import durations_from_attention

    rate, audio = load_utterance()
    print('utterance: %.2fs @ %d Hz' % (len(audio) / rate, rate))

    # 1-2. the AR teacher + its learned alignment
    teacher = train_teacher(audio, rate, teacher_epochs)
    out = teacher.predict(TEXT, max_trial = 3, save = False)[0]
    attention = np.asarray(out['attention'][0])     # (T_mel, T_text)
    teacher_mel = np.asarray(out['mel'][0])
    print('teacher AR decode: %d frames, attention %s'
          % (len(teacher_mel), attention.shape))

    # 3. duration targets from the alignment (diagnostic print; the student's
    # data pipeline re-derives them from data['alignment'] and re-tiles them
    # to the ground-truth mel length)
    durations = durations_from_attention(attention)
    print('distilled durations: sum=%d, nonzero=%d/%d'
          % (durations.sum(), (durations > 0).sum(), len(durations)))

    # 4. the parallel student, trained on (durations, pitch, energy) targets
    student = FastSpeech2(lang = 'en', name = 'distill_student', ** STUDENT_HP)
    rows = [{'text': TEXT, 'audio': audio, 'rate': rate,
             'alignment': attention}] * 16
    history = student.fit(rows, epochs = student_epochs, batch_size = 2,
                          valid_size = 0., lr = 1e-3,
                          frame_multiple = 16, token_multiple = 8)
    losses = history.get_metric('loss')
    print('student loss: %.3f -> %.3f' % (losses[0], losses[-1]))

    # 5. parallel synthesis: one forward, no sequential decode
    s_out = student.predict(TEXT, max_trial = 1, save = False)[0]
    mel = np.asarray(s_out['mel'][0])
    gt_mel = np.asarray(student.get_audio({'audio': audio, 'rate': rate}))
    n = min(len(mel), len(gt_mel))
    mae = float(np.abs(mel[:n] - gt_mel[:n]).mean())
    print('student parallel synthesis: %d frames in ONE forward '
          '(teacher: %d sequential steps); mel MAE vs ground truth: %.3f'
          % (len(mel), len(teacher_mel), mae))

    wave = np.asarray(student.mel_fn.inverse(mel, n_iters = 48))[0]
    out_dir = out_path or os.path.join(student.pred_dir, 'distill')
    os.makedirs(out_dir, exist_ok = True)
    wav_path = os.path.join(out_dir, 'student_synthesized.wav')
    write_audio(wav_path, wave, rate = student.rate)
    print('wrote', wav_path)

    return {'teacher_frames': len(teacher_mel), 'student_frames': len(mel),
            'student_loss_last': float(losses[-1]), 'mel_mae': mae}


if __name__ == '__main__':
    t_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    s_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    out = sys.argv[3] if len(sys.argv) > 3 else None
    main(t_epochs, s_epochs, out)
