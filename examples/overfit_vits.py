"""Overfit a small VITS end-to-end on ONE real utterance — adversarial
training from characters straight to the waveform, no mel hand-off.

The VITS analog of ``examples/overfit_single_utterance.py`` (see its
docstring for why overfitting one utterance is this environment's stand-in
for a pretrained listen test).  What this run proves with *learned*
weights:

  - monotonic alignment search discovers a duration map on its own (total
    learned frames ≈ ground-truth frames, no aligner, no attention);
  - the KL between the WaveNet posterior (over the real linear
    spectrogram) and the flow-mapped text prior shrinks;
  - the generator's output spectrum moves toward the target (mel L1 ↓);
  - trained inference synthesizes the utterance from text alone.

Usage:  python examples/overfit_vits.py [steps] [out_dir]
        (CPU-friendly at the default 200 steps: ~5 min on one core; a few
        thousand steps start to sound voiced — GANs want wall-clock)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np

from overfit_single_utterance import TEXT, load_utterance

MODEL_HP = dict(
    inter_channels = 48, hidden_channels = 48, filter_channels = 96,
    n_heads = 2, n_text_layers = 2, posterior_layers = 4, flow_layers = 2,
    flow_wn_layers = 2, duration_filters = 48,
    upsample_rates = (8, 8, 2, 2), upsample_kernel_sizes = (16, 16, 4, 4),
    upsample_initial_channel = 64, resblock_kernel_sizes = (3, 7),
    resblock_dilation_sizes = ((1, 3), (1, 3)), mpd_periods = (2, 3),
    msd_scales = 2, segment_frames = 24, max_frames = 512,
)


def main(steps = 200, out_path = None):
    import jax
    import jax.numpy as jnp
    import optax
    from text_to_speech_tpu.models.tts import VITS
    from text_to_speech_tpu.train.gan import (
        make_vits_train_step, init_vits_train_state, mel_fn_from_stft,
    )
    from text_to_speech_tpu.ops.audio_io import write_audio

    rate, audio = load_utterance()
    print('utterance: %.2fs @ %d Hz' % (len(audio) / rate, rate))

    model = VITS(lang = 'en', name = 'overfit_vits', ** MODEL_HP)
    tokens, spec, n_frames, wave = model.prepare_data(
        {'text': TEXT, 'audio': audio, 'rate': rate})
    print('linear spec: %d frames x %d bins; %d tokens'
          % (spec.shape[0], spec.shape[1], len(tokens)))

    batch = (tokens[None], spec[None].astype(np.float32),
             np.asarray([n_frames], np.int32), wave[None])

    arch = model.arch
    tx_g = optax.adam(2e-4, b1 = 0.8, b2 = 0.99)
    tx_d = optax.adam(2e-4, b1 = 0.8, b2 = 0.99)
    state = init_vits_train_state(arch, jax.random.PRNGKey(0), tx_g, tx_d)
    state['gen'] = model.params             # keep the task model's init
    state['gen_opt'] = tx_g.init(state['gen'])
    step = make_vits_train_step(arch, tx_g, tx_d,
                                mel_fn = mel_fn_from_stft(model.mel_fn))

    first = last = None
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        last = {k: float(v) for k, v in metrics.items()}
        if first is None:
            first = last
        if i % max(1, steps // 10) == 0:
            print('step %4d  gen %.2f  disc %.2f  mel %.3f  kl %.3f  dur %.3f'
                  % (i, last['gen_loss'], last['disc_loss'], last['mel'],
                     last['kl'], last['duration']))

    print('mel L1: %.3f -> %.3f | kl: %.3f -> %.3f | duration: %.3f -> %.3f'
          % (first['mel'], last['mel'], first['kl'], last['kl'],
             first['duration'], last['duration']))

    # inference from TEXT alone with the trained weights
    model.set_weights(state['gen'])
    out = model.infer(TEXT, max_trial = 1, fetch_attention = True)
    synth = np.asarray(out['audio'])
    learned_frames = len(synth) // model.upsample_rate
    print('learned durations: %d frames total (ground truth %d)'
          % (learned_frames, n_frames))

    gt_mel = np.asarray(model.mel_fn(wave))[0]
    sy_mel = np.asarray(model.mel_fn(synth))[0]
    n = min(len(gt_mel), len(sy_mel))
    mel_mae = float(np.abs(sy_mel[:n] - gt_mel[:n]).mean())
    print('mel MAE (synthesized vs ground truth, first %d frames): %.3f'
          % (n, mel_mae))

    out_dir = out_path or os.path.join(model.pred_dir, 'overfit')
    os.makedirs(out_dir, exist_ok = True)
    synth_path = os.path.join(out_dir, 'vits_synthesized.wav')
    write_audio(synth_path, synth, rate = model.rate)
    print('wrote', synth_path)

    return {'mel_first': first['mel'], 'mel_last': last['mel'],
            'kl_first': first['kl'], 'kl_last': last['kl'],
            'frames': learned_frames, 'gt_frames': int(n_frames),
            'mel_mae': mel_mae}


if __name__ == '__main__':
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out = sys.argv[2] if len(sys.argv) > 2 else None
    main(steps, out)
