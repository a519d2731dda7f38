"""int8 kernel fidelity on TRAINED WaveGlow weights.

PLAN.md's standing caveat (VERDICT r1 weak #7): the bench's int8 SNR gate
was calibrated on synthetic (random, contractively-scaled) weights because
published checkpoints cannot be downloaded here (zero egress).  This script
closes the gap as far as the environment allows: it trains a FULL-SIZE
WaveGlow (12 flows x 8 layers x 512 channels — the exact serving config)
from scratch on the real reference utterance with the NLL flow loss
(reference envelope: ``/root/reference/architectures/waveglow_arch.py:159-306``),
then measures the int8 Pallas path against the f32 XLA chain on REAL mel
conditioning from that utterance.

Trained weights differ from synthetic calibration in exactly the ways that
stress quantization: end convs grow from zero-init to data-fitted scales,
per-channel weight distributions become heavy-tailed, and the gated
activations saturate where the data demands it.  An overfit model is not a
production checkpoint, but its weight statistics are *learned*, which is
the property the synthetic gate could not cover.

Usage:
    python benchmarks/int8_trained_snr.py [--steps 500] [--batch 4]
        [--frames 64] [--gate-frames 8192] [--lr 1e-4] [--small]
        [--out /tmp/int8_trained]

On 1x v5e the default (500 steps, B=4 x 64 frames) takes ~3-4 minutes.
Prints one JSON line with the trained-weight SNRs (int8 and bf16 paths)
plus the final NLL, and optionally writes f32/int8 wavs for listening.
"""

import os
import sys
import json
import time
import argparse

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))


def load_utterance(rate_out = 22050, max_seconds = 8.0):
    from text_to_speech_tpu.ops.audio_io import read_audio
    candidates = (
        os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                     'tests', 'data', 'audio_test.wav'),
        '/root/reference/tests/data/audio_test.wav',
    )
    for path in candidates:
        if os.path.isfile(path):
            _, audio = read_audio(path, target_rate = rate_out,
                                  trim_silence = True)
            return audio[:int(max_seconds * rate_out)]
    raise FileNotFoundError('no test utterance found in ' + str(candidates))


def main():
    import _cache
    _cache.enable()
    parser = argparse.ArgumentParser()
    parser.add_argument('--steps', type = int, default = 500,
                        help = 'NLL training steps (>= 1)')
    parser.add_argument('--batch', type = int, default = 4)
    parser.add_argument('--frames', type = int, default = 64,
                        help = 'mel frames per training segment '
                               '(x256 samples each)')
    parser.add_argument('--lr', type = float, default = 1e-4)
    parser.add_argument('--gate-frames', type = int, default = 256,
                        help = 'mel frames for the SNR measurement')
    parser.add_argument('--out', default = None,
                        help = 'write f32/int8/bf16 wavs here')
    parser.add_argument('--small', action = 'store_true',
                        help = 'CPU smoke config (8 flows x 128 ch); the '
                               'fused kernels need 512 ch so this only '
                               'exercises the training/gate plumbing')
    args = parser.parse_args()
    if args.steps < 1:
        parser.error('--steps must be >= 1 (the gate needs trained weights)')

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from text_to_speech_tpu.models.waveglow_arch import WaveGlow
    from text_to_speech_tpu.ops.stft import TacotronSTFT

    hp = {}
    if args.small:
        hp = dict(n_flows = 4, wn_layers = 4, wn_channels = 128)
    arch = WaveGlow(use_pallas = True, ** hp)
    base = WaveGlow(use_pallas = False, ** hp)

    hop = 256
    seg = args.frames * hop

    # ---- data: real utterance -> normalized waveform + Tacotron mel -------
    audio = np.asarray(load_utterance(), dtype = np.float32)
    audio = audio / max(1e-6, np.abs(audio).max()) * 0.95
    if len(audio) < seg + hop:
        audio = np.tile(audio, int(np.ceil((seg + hop) / len(audio))))
    mel_fn = TacotronSTFT()
    # full-utterance mel once; training crops are aligned (frame, sample)
    # windows of it, exactly how the published WaveGlow recipe feeds segments
    full_mel = np.asarray(mel_fn(audio), dtype = np.float32)[0]  # (F, 80)
    n_frames_total = min(full_mel.shape[0], len(audio) // hop)

    rng = np.random.RandomState(0)
    max_start = n_frames_total - args.frames - 1

    def sample_batch():
        starts = rng.randint(0, max_start + 1, size = args.batch)
        mels = np.stack([full_mel[s : s + args.frames] for s in starts])
        auds = np.stack([audio[s * hop : s * hop + seg] for s in starts])
        return jnp.asarray(mels), jnp.asarray(auds)

    # ---- train: NLL flow loss, full-size, remat -----------------------------
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        params = arch.init(jax.random.PRNGKey(0))
    tx = optax.adam(args.lr)
    device = jax.devices()[0]
    params = jax.device_put(params, device)
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def step(params, opt_state, mel, aud):
        # differentiable XLA chain (the Pallas kernels define no VJP)
        loss, grads = jax.value_and_grad(
            lambda p: base.loss(p, mel, aud, remat = True))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    loss0 = None
    for i in range(args.steps):
        mel_b, aud_b = sample_batch()
        params, opt_state, loss = step(params, opt_state, mel_b, aud_b)
        if i == 0:
            loss0 = float(loss)
        if i % 100 == 0 or i == args.steps - 1:
            print('step %4d  nll/elt %.4f  (%.1fs)' % (
                i, float(loss), time.perf_counter() - t0), file = sys.stderr)
    final_nll = float(loss)

    # ---- gate: int8 + bf16 kernel paths vs the f32 XLA chain ---------------
    gate_frames = min(args.gate_frames, (n_frames_total // 256) * 256)
    if gate_frames == 0:
        gate_frames = (n_frames_total // 64) * 64
    mel_gate = jnp.asarray(full_mel[None, :gate_frames])
    key = jax.random.PRNGKey(2)

    with jax.default_device(cpu):
        raw = arch.fuse_params(jax.device_get(params))
        packed = arch.pack_pallas_params(raw)
        quant = arch.quantize_pallas_params(packed)
    raw_d = jax.device_put(raw, device)

    w_f = np.asarray(jax.jit(
        lambda p, m: base.infer(p, m, rng = key))(raw_d, mel_gate))

    def snr_of(wave):
        noise = float(np.mean((w_f - np.asarray(wave)) ** 2))
        return 10 * np.log10(float(np.mean(w_f ** 2)) / max(noise, 1e-20))

    results = {'metric': 'int8_snr_trained_weights', 'unit': 'dB',
               'final_nll': round(final_nll, 4),
               'initial_nll': round(loss0, 4), 'steps': args.steps,
               'config': 'small' if args.small else 'full'}
    if not args.small:
        q_d = jax.device_put(quant, device)
        w_q = jax.jit(lambda p, m: arch.infer(
            p, m, rng = key, dtype = jnp.bfloat16))(q_d, mel_gate)
        results['value'] = round(snr_of(w_q), 2)
        p_d = jax.device_put(packed, device)
        w_b = jax.jit(lambda p, m: arch.infer(
            p, m, rng = key, dtype = jnp.bfloat16))(p_d, mel_gate)
        results['bf16_snr_db'] = round(snr_of(w_b), 2)
    else:
        # channels < 128: the fused kernels don't engage; measure the XLA
        # int8 fallback instead so the plumbing is still exercised
        with jax.default_device(cpu):
            q_xla = arch.quantize_params(raw)
        w_q = jax.jit(lambda p, m: arch.infer(
            p, m, rng = key))(jax.device_put(q_xla, device), mel_gate)
        results['value'] = round(snr_of(w_q), 2)

    if args.out:
        from text_to_speech_tpu.ops.audio_io import write_audio
        os.makedirs(args.out, exist_ok = True)
        write_audio(os.path.join(args.out, 'trained_f32.wav'),
                    np.asarray(w_f[0]), rate = 22050)
        write_audio(os.path.join(args.out, 'trained_quant.wav'),
                    np.asarray(w_q[0]), rate = 22050)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
