"""Quality-parity gate for mixed-precision training (VERDICT r3 #1).

Trains the SAME WaveGlow twice — float32 vs mixed_bfloat16 (bf16 compute /
f32 masters, train/precision.py) — with identical seeds, init, and batch
order on the real reference utterance, then reports:

  - the per-step NLL curves (sampled) and their divergence,
  - final NLLs,
  - mel-domain reconstruction quality of EACH trained model (f32 XLA
    inference for both — inference precision is a separate, already-gated
    axis): vocode the utterance's mel, re-analyze the audio, mel SNR vs
    the ground-truth mel.

Pass = the curves track (final NLLs within tolerance of the f32 descent)
and the mixed model's reconstruction quality is within noise of f32's —
the same discipline the int8 serving path was admitted under
(benchmarks/int8_trained_snr.py).

Usage:
    python benchmarks/mixed_precision_parity.py [--steps 300] [--batch 4]
        [--frames 64] [--lr 1e-4] [--small]

On 1x v5e the default (300 steps x 2 runs) takes ~5 minutes.  Prints one
JSON line.
"""

import os
import sys
import json
import time
import argparse

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

from int8_trained_snr import load_utterance          # noqa: E402


def main():
    import _cache
    _cache.enable()
    parser = argparse.ArgumentParser()
    parser.add_argument('--steps', type = int, default = 300)
    parser.add_argument('--batch', type = int, default = 4)
    parser.add_argument('--frames', type = int, default = 64)
    parser.add_argument('--lr', type = float, default = 1e-4)
    parser.add_argument('--small', action = 'store_true',
                        help = 'CPU smoke config (4 flows x 128 ch)')
    parser.add_argument('--family', default = 'waveglow',
                        choices = ('waveglow', 'tacotron2'),
                        help = 'tacotron2 = scan-native bf16 parity '
                               '(hp.scan_native_bf16, r5)')
    args = parser.parse_args()
    if args.family == 'tacotron2':
        return tacotron_parity(args)

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from text_to_speech_tpu.models.waveglow_arch import WaveGlow
    from text_to_speech_tpu.ops.stft import TacotronSTFT

    hp = dict(n_flows = 4, wn_layers = 4, wn_channels = 128) \
        if args.small else {}
    base = WaveGlow(use_pallas = False, ** hp)

    hop = 256
    seg = args.frames * hop
    audio = np.asarray(load_utterance(), dtype = np.float32)
    audio = audio / max(1e-6, np.abs(audio).max()) * 0.95
    if len(audio) < seg + hop:
        audio = np.tile(audio, int(np.ceil((seg + hop) / len(audio))))
    mel_fn = TacotronSTFT()
    full_mel = np.asarray(mel_fn(audio), dtype = np.float32)[0]
    n_frames_total = min(full_mel.shape[0], len(audio) // hop)
    max_start = n_frames_total - args.frames - 1

    def batches(n):
        # ONE shared batch schedule: both precisions see identical data
        rng = np.random.RandomState(0)
        for _ in range(n):
            starts = rng.randint(0, max_start + 1, size = args.batch)
            yield (jnp.asarray(np.stack(
                       [full_mel[s: s + args.frames] for s in starts])),
                   jnp.asarray(np.stack(
                       [audio[s * hop: s * hop + seg] for s in starts])))

    device = jax.devices()[0]
    cpu = jax.devices('cpu')[0]

    def train(compute_dtype):
        with jax.default_device(cpu):
            params = base.init(jax.random.PRNGKey(0))
        params = jax.device_put(params, device)
        tx = optax.adam(args.lr)
        opt_state = jax.jit(tx.init)(params)

        @jax.jit
        def step(params, opt_state, mel, aud):
            loss, grads = jax.value_and_grad(
                lambda p: base.loss(p, mel, aud, remat = True,
                                    compute_dtype = compute_dtype))(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        curve, wall, t0 = [], None, None
        for i, (mel_b, aud_b) in enumerate(batches(args.steps)):
            params, opt_state, loss = step(params, opt_state, mel_b, aud_b)
            if i == 0:
                # exclude the first step's XLA compile from the step-time
                # column (the 2026-08-21 run showed a cached-f32 vs
                # fresh-mixed compile skewing it: the clean speedup ledger
                # is benchmarks/train_throughput.py)
                float(loss)
                t0 = time.perf_counter()
            if i % 20 == 0 or i == args.steps - 1:
                curve.append((i, float(loss)))
        wall = time.perf_counter() - t0
        name = 'mixed_bfloat16' if compute_dtype is not None else 'float32'
        print('%s: final nll/elt %.4f (%.1fs)' % (name, curve[-1][1], wall),
              file = sys.stderr)
        return params, curve, wall

    p32, c32, w32 = train(None)
    p16, c16, w16 = train(jnp.bfloat16)

    # -- reconstruction quality of each trained model (f32 inference) --------
    gate_frames = max(64, (min(n_frames_total, 512) // 64) * 64)
    mel_gate = jnp.asarray(full_mel[None, :gate_frames])
    key = jax.random.PRNGKey(2)
    infer = jax.jit(lambda p, m: base.infer(p, m, rng = key))

    def mel_snr(params):
        wave = np.asarray(infer(params, mel_gate))[0]
        re_mel = np.asarray(mel_fn(wave), dtype = np.float32)[0]
        n = min(re_mel.shape[0], gate_frames)
        ref = full_mel[:n]
        noise = float(np.mean((ref - re_mel[:n]) ** 2))
        return 10 * np.log10(float(np.mean(ref ** 2)) / max(noise, 1e-20))

    snr32, snr16 = mel_snr(p32), mel_snr(p16)

    descent = c32[0][1] - c32[-1][1]
    final_gap = abs(c16[-1][1] - c32[-1][1])
    result = {
        'metric': 'mixed_precision_training_parity',
        'unit': 'nll_gap',
        'value': round(final_gap, 4),
        'final_nll_f32': round(c32[-1][1], 4),
        'final_nll_mixed': round(c16[-1][1], 4),
        'descent_f32': round(descent, 4),
        'gap_pct_of_descent': round(100. * final_gap / max(descent, 1e-9), 2),
        'mel_snr_db_f32': round(snr32, 2),
        'mel_snr_db_mixed': round(snr16, 2),
        'step_wall_s_f32': round(w32 / max(args.steps - 1, 1), 4),
        'step_wall_s_mixed': round(w16 / max(args.steps - 1, 1), 4),
        'speedup': round(w32 / max(w16, 1e-9), 2),
        'steps': args.steps,
        'curve_f32': [[i, round(v, 4)] for i, v in c32],
        'curve_mixed': [[i, round(v, 4)] for i, v in c16],
        'config': 'small' if args.small else 'full',
        'pass': bool(final_gap <= 0.1 * max(descent, 1e-9)
                     and snr16 >= snr32 - 1.0),
    }
    print(json.dumps(result), flush = True)


def tacotron_parity(args):
    """Scan-native bf16 parity for the Tacotron-2 teacher-forced step:
    trains the SAME model twice — f32 vs boundary-cast bf16 with the
    whole-scan-bf16 carry (`tacotron2_arch.py hp.scan_native_bf16`) —
    identical seeds/init/batch order on the reference utterance's mel,
    then gates on the loss-curve gap AND the final teacher-forced
    postnet-mel MSE of each trained model (both evaluated in f32).

    The cum-attention absorption risk (bf16's 8-bit mantissa summing T
    alignment rows) is exactly what this gate arbitrates."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
    from text_to_speech_tpu.ops.stft import TacotronSTFT
    from text_to_speech_tpu.train.losses import TacotronLoss
    from text_to_speech_tpu.train.precision import cast_floating

    hp = dict(encoder_embedding_dim = 64, encoder_n_conv = 1,
              prenet_sizes = (32, 32), lsa_attention_dim = 16,
              lsa_attention_filters = 4, lsa_attention_kernel_size = 7,
              attention_rnn_dim = 64, decoder_rnn_dim = 64,
              postnet_n_conv = 2, postnet_filters = 32,
              postnet_kernel_size = 5) if args.small else {}
    arch = Tacotron2(scan_native_bf16 = True, ** hp)
    loss_fn = TacotronLoss()

    hop = 256
    audio = np.asarray(load_utterance(), dtype = np.float32)
    audio = audio / max(1e-6, np.abs(audio).max()) * 0.95
    mel_fn = TacotronSTFT()
    full_mel = np.asarray(mel_fn(audio), dtype = np.float32)[0]
    if full_mel.shape[0] < args.frames + 2:
        reps = int(np.ceil((args.frames + 2) / full_mel.shape[0]))
        full_mel = np.tile(full_mel, (reps, 1))
    max_start = full_mel.shape[0] - args.frames - 1

    S = 48                              # fixed synthetic transcript: the A/B
    tok_rng = np.random.RandomState(7)  # needs identical data, not true text
    tokens_row = tok_rng.randint(1, arch.hp.vocab_size, size = S)

    def batches(n):
        rng = np.random.RandomState(0)
        tokens = jnp.asarray(np.tile(tokens_row, (args.batch, 1)), jnp.int32)
        lengths = jnp.full((args.batch,), args.frames, jnp.int32)
        for _ in range(n):
            starts = rng.randint(0, max_start + 1, size = args.batch)
            tgt = np.stack([full_mel[s: s + args.frames] for s in starts])
            mel_in = np.concatenate(
                [np.zeros_like(tgt[:, :1]), tgt[:, :-1]], axis = 1)
            gate = np.zeros((args.batch, args.frames), np.float32)
            gate[:, -1] = 1.
            yield (tokens, jnp.asarray(mel_in), lengths,
                   jnp.asarray(tgt), jnp.asarray(gate))

    device = jax.devices()[0]
    cpu = jax.devices('cpu')[0]

    def train(compute_dtype):
        with jax.default_device(cpu):
            params, state0 = arch.init(jax.random.PRNGKey(0))
        params = jax.device_put(params, device)
        state0 = jax.device_put(state0, device)
        tx = optax.adam(args.lr)
        opt_state = jax.jit(tx.init)(params)

        @jax.jit
        def step(params, state, opt_state, rng, tokens, mel_in, lengths,
                 tgt, gate):
            def loss_of(p):
                pc, mi = p, mel_in
                if compute_dtype is not None:
                    pc = cast_floating(pc, compute_dtype)
                    mi = mel_in.astype(compute_dtype)
                (dec, post, g), new_state = arch(
                    pc, state, tokens, mi, mel_lengths = lengths,
                    train = True, rng = rng)
                preds = tuple(t.astype(jnp.float32) for t in (dec, post, g))
                losses = loss_fn((tgt, gate), preds)
                return jnp.mean(losses['loss']), new_state
            (loss, new_state), grads = jax.value_and_grad(
                loss_of, has_aux = True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_state,
                    opt_state, loss)

        curve, t0, state = [], None, state0
        for i, batch in enumerate(batches(args.steps)):
            params, state, opt_state, loss = step(
                params, state, opt_state, jax.random.fold_in(
                    jax.random.PRNGKey(3), i), * batch)
            if i == 0:
                float(loss)
                t0 = time.perf_counter()
            if i % 20 == 0 or i == args.steps - 1:
                curve.append((i, float(loss)))
        wall = time.perf_counter() - t0
        name = 'mixed_bfloat16' if compute_dtype is not None else 'float32'
        print('%s: final loss %.4f (%.1fs)' % (name, curve[-1][1], wall),
              file = sys.stderr)
        return params, state, curve, wall

    p32, s32, c32, w32 = train(None)
    p16, s16, c16, w16 = train(jnp.bfloat16)

    # quality of each trained model: teacher-forced postnet-mel MSE on one
    # held-out window, both evaluated in f32
    tokens, mel_in, lengths, tgt, gate = next(iter(batches(1)))
    ev = jax.jit(lambda p, s: arch(p, s, tokens, mel_in,
                                   mel_lengths = lengths, train = False,
                                   rng = jax.random.PRNGKey(9))[0][1])

    def mel_mse(params, state):
        return float(jnp.mean((ev(params, state) - tgt) ** 2))

    mse32, mse16 = mel_mse(p32, s32), mel_mse(p16, s16)

    descent = c32[0][1] - c32[-1][1]
    final_gap = abs(c16[-1][1] - c32[-1][1])
    result = {
        'metric': 'tacotron_scan_native_bf16_parity',
        'unit': 'loss_gap',
        'value': round(final_gap, 4),
        'final_loss_f32': round(c32[-1][1], 4),
        'final_loss_mixed': round(c16[-1][1], 4),
        'descent_f32': round(descent, 4),
        'gap_pct_of_descent': round(100. * final_gap / max(descent, 1e-9), 2),
        'mel_mse_f32': round(mse32, 5),
        'mel_mse_mixed': round(mse16, 5),
        'step_wall_s_f32': round(w32 / max(args.steps - 1, 1), 4),
        'step_wall_s_mixed': round(w16 / max(args.steps - 1, 1), 4),
        'speedup': round(w32 / max(w16, 1e-9), 2),
        'steps': args.steps,
        'curve_f32': [[i, round(v, 4)] for i, v in c32],
        'curve_mixed': [[i, round(v, 4)] for i, v in c16],
        'config': 'small' if args.small else 'full',
        'pass': bool(final_gap <= 0.1 * max(descent, 1e-9)
                     and mse16 <= mse32 * 1.25 + 1e-4),
    }
    print(json.dumps(result), flush = True)


if __name__ == '__main__':
    main()
