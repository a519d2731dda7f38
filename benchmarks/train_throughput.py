"""Training-step throughput on one chip: Tacotron-2 (teacher-forced,
TacotronLoss) and WaveGlow (flow NLL), full-size models, synthetic batches.

Usage: python benchmarks/train_throughput.py [--model tacotron2|waveglow|both]
       [--batch 32] [--frames 384] [--tokens 128] [--iters 5]
       [--precision float32|mixed_bfloat16]

``--precision mixed_bfloat16`` runs the steps under the train/precision.py
policy (bf16 compute / f32 masters) — the headline claim is the measured
speedup over the f32 rows in docs/PERFORMANCE.md's training ledger.

Reference context: the reference trains on a single RTX 3090 through Keras
`fit` (no published step times); the speaker-encoder headline is ~99%
accuracy in 2-3 h (README.md:142).  This measures the raw jitted train-step
rate the `fit` path replays.
"""

import os
import sys
import time
import argparse

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))


def sync(x):
    return float(x)


PEAK_BF16 = 197e12          # 1x v5e


def aot_with_flops(step, *args):
    """AOT-compile the jitted step ONCE and read XLA's own flop count
    (executable.cost_analysis()) — the basis of the MFU column in
    docs/PERFORMANCE.md's training ledger.  The TIMED callable stays the
    plain jitted step (its own dispatch path; the separately compiled AOT
    executable is only read for cost analysis — the flops of the same
    program).  Set BENCH_TIME_AOT=1 to time the AOT object instead."""
    flops = None
    if os.environ.get('BENCH_NO_AOT') == '1':
        # skip the cost-analysis compile entirely (probe knob: the AOT
        # lowering shares nothing with the timed jit path, but compiling a
        # second donated-buffer executable is a variable worth isolating)
        return step, flops
    try:
        compiled = step.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        if ca:
            flops = float(ca.get('flops', 0.)) or None
        if os.environ.get('BENCH_TIME_AOT') == '1':
            return compiled, flops
    except Exception:
        pass
    return step, flops


def median_time(iters, run_and_sync):
    """Time EVERY iteration behind a scalar-transfer barrier; return the
    MEDIAN.  The tunnel injects multi-second stalls (measured: 10.8 s on
    the first post-warmup dispatch, benchmarks/tacotron_stall_probe.py)
    that poisoned averaged loops — the r4 'bf16 scan 311→2307 ms
    regression' was exactly this artifact (true per-iter medians: f32
    130 ms, bf16 85 ms — bf16 1.5x FASTER)."""
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        run_and_sync(i)
        times.append(time.perf_counter() - t0)
    s = sorted(times)
    med = s[len(s) // 2]
    if s[-1] > 3 * med:
        print('  (stall filtered: per-iter ms %s)' %
              [round(t * 1e3) for t in times], flush = True)
    return med


def mfu_str(flops, el):
    if not flops:
        return ''
    tf = flops / el / 1e12
    return ', %.1f TFLOP/s = %.0f%%%% of bf16 peak' % (tf, 100. * flops / el / PEAK_BF16)


def bench_tacotron(batch, tokens, frames, iters, precision = 'float32',
                   native_scan = True):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
    from text_to_speech_tpu.train.losses import TacotronLoss
    from text_to_speech_tpu.train.optimizers import get_optimizer

    # native_scan=False restores the r4 per-step f32 attention islands —
    # the A/B that measured 311 -> 2307 ms under mixed_bfloat16
    arch = Tacotron2(scan_native_bf16 = native_scan)
    params, state = arch.init(jax.random.PRNGKey(0))
    loss = TacotronLoss()
    opt = get_optimizer('adam', lr = 1e-3)
    opt_state = opt.init(params)

    from text_to_speech_tpu.train.precision import get_policy, cast_floating
    policy = get_policy(precision)
    cd = jnp.dtype(policy.compute_dtype) if policy.is_mixed else None

    tok = jnp.ones((batch, tokens), jnp.int32)
    mel_in = jnp.zeros((batch, frames, 80))
    mel_out = jnp.zeros((batch, frames, 80))
    gate = jnp.zeros((batch, frames))
    lengths = jnp.full((batch,), frames, jnp.int32)
    rng = jax.random.PRNGKey(1)

    def step(params, state, opt_state, rng):
        import optax
        def loss_of(p):
            mi = mel_in
            if cd is not None:           # the trainer's generic boundary cast
                p, mi = cast_floating(p, cd), mel_in.astype(cd)
            (dec, post, g), new_state = arch(
                p, state, tok, mi, mel_lengths = lengths,
                train = True, rng = rng)
            preds = tuple(t.astype(jnp.float32) for t in (dec, post, g))
            losses = loss((mel_out, gate), preds)
            return jnp.mean(losses['loss']), new_state
        (l, new_state), grads = jax.value_and_grad(loss_of, has_aux = True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, l

    step, flops = aot_with_flops(
        jax.jit(step, donate_argnums = (0, 2)), params, state, opt_state, rng)
    params, state, opt_state, l = step(params, state, opt_state, rng)
    sync(l)
    box = [params, state, opt_state]

    def run(i):
        box[0], box[1], box[2], l = step(box[0], box[1], box[2],
                                         jax.random.fold_in(rng, i))
        sync(l)
    el = median_time(iters, run)
    audio_s = batch * frames * 256 / 22050.
    print(('tacotron2 train step B=%d T=%d: %.0f ms (%.1f steps/s, '
           '%.1fx realtime-audio/step-throughput' + mfu_str(flops, el) + ')') % (
              batch, frames, el * 1e3, 1. / el, audio_s / el))


def bench_waveglow(batch, frames, iters, precision = 'float32',
                   remat = True, conv_mode = 'dilated',
                   train_fused = False):
    import jax
    import jax.numpy as jnp
    import optax
    from text_to_speech_tpu.models.waveglow_arch import WaveGlow
    from text_to_speech_tpu.train.optimizers import get_optimizer

    arch = WaveGlow(wn_train_conv = conv_mode,
                    wn_train_fused = train_fused)
    params = arch.fuse_params(arch.init(jax.random.PRNGKey(0)))
    opt = get_optimizer('adam', lr = 1e-4)
    opt_state = opt.init(params)

    mel = jax.random.normal(jax.random.PRNGKey(1), (batch, frames, 80))
    audio = jax.random.normal(jax.random.PRNGKey(2),
                              (batch, frames * 256)) * 0.1

    from text_to_speech_tpu.train.precision import get_policy
    policy = get_policy(precision)
    cd = jnp.bfloat16 if policy.is_mixed else None

    def step(params, opt_state):
        def loss_of(p):
            # per-flow remat: large-batch f32 flow training does not compile
            # without it (the 12-flow fused backward overwhelms the
            # compiler); bf16 halves activation memory, so --no-remat probes
            # whether the mixed step can drop the ~1.3x recompute
            return arch.loss(p, mel, audio, remat = remat,
                             compute_dtype = cd)
        l, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    step, flops = aot_with_flops(
        jax.jit(step, donate_argnums = (0, 1)), params, opt_state)
    params, opt_state, l = step(params, opt_state)
    sync(l)
    box = [params, opt_state]

    def run(i):
        box[0], box[1], l = step(box[0], box[1])
        sync(l)
    el = median_time(iters, run)
    audio_s = batch * frames * 256 / 22050.
    print(('waveglow train step B=%d T=%d: %.0f ms (%.1f steps/s, '
           '%.1fx realtime-audio/step-throughput' + mfu_str(flops, el) + ')') % (
              batch, frames, el * 1e3, 1. / el, audio_s / el))


def bench_speaker_encoder(iters, n_speakers = 32, n_utt = 10, frames = 160,
                          precision = 'float32'):
    """GE2E step at the reference's recipe shape (N speakers x M utterances;
    the reference reaches ~99% accuracy in 2-3h of these on one RTX 3090)."""
    import jax
    import jax.numpy as jnp
    import optax
    from text_to_speech_tpu.models.encoder_arch import AudioEncoder
    from text_to_speech_tpu.train.losses import GE2ELoss
    from text_to_speech_tpu.train.optimizers import get_optimizer
    from text_to_speech_tpu.train.precision import get_policy, cast_floating

    arch = AudioEncoder()
    params, state = arch.init(jax.random.PRNGKey(0))
    loss_fn = GE2ELoss()
    opt = get_optimizer('adam', lr = 1e-3)
    opt_state = opt.init(params)
    policy = get_policy(precision)
    cd = jnp.dtype(policy.compute_dtype) if policy.is_mixed else None

    B = n_speakers * n_utt
    mel = jax.random.normal(jax.random.PRNGKey(1), (B, frames, 80))
    lengths = jnp.full((B,), frames, jnp.int32)

    def step(params, state, opt_state, rng):
        def loss_of(p):
            m = mel
            if cd is not None:
                p, m = cast_floating(p, cd), mel.astype(cd)
            emb, new_state = arch(p, state, m, lengths = lengths,
                                  train = True, rng = rng)
            emb = emb.astype(jnp.float32).reshape(n_speakers, n_utt, -1)
            losses = loss_fn(None, (emb,
                                    p['ge2e']['w'].astype(jnp.float32),
                                    p['ge2e']['b'].astype(jnp.float32)))
            return jnp.mean(losses['loss']), new_state
        (l, new_state), grads = jax.value_and_grad(loss_of, has_aux = True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, l

    rng = jax.random.PRNGKey(2)
    step, flops = aot_with_flops(
        jax.jit(step, donate_argnums = (0, 2)), params, state, opt_state, rng)
    params, state, opt_state, l = step(params, state, opt_state, rng)
    sync(l)
    box = [params, state, opt_state]

    def run(i):
        box[0], box[1], box[2], l = step(box[0], box[1], box[2],
                                         jax.random.fold_in(rng, i))
        sync(l)
    el = median_time(iters, run)
    print(('speaker-encoder GE2E step N=%d M=%d T=%d: %.1f ms (%.0f steps/s, '
           '%.0f utterances/s' + mfu_str(flops, el) + ')') % (
              n_speakers, n_utt, frames, el * 1e3, 1. / el, B / el))


def bench_vits(batch, tokens, frames, iters, precision = 'float32'):
    """Full-size VITS adversarial step (VAE + MAS + GAN, windowed decode)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from text_to_speech_tpu.models.vits_arch import VITS
    from text_to_speech_tpu.ops.stft import TacotronSTFT
    from text_to_speech_tpu.train.gan import (
        make_vits_train_step, init_vits_train_state, mel_fn_from_stft)
    from text_to_speech_tpu.train.optimizers import get_optimizer

    arch = VITS()                       # published LJSpeech config
    mel = TacotronSTFT()
    tx_g = get_optimizer('adamw', lr = 2e-4)
    tx_d = get_optimizer('adamw', lr = 2e-4)
    state = init_vits_train_state(arch, jax.random.PRNGKey(0), tx_g, tx_d)
    step = make_vits_train_step(arch, tx_g, tx_d, mel_fn_from_stft(mel),
                                precision = precision)

    hop = arch.upsample_rate
    rs = np.random.RandomState(0)
    tok = jnp.asarray(
        rs.randint(1, arch.hp.vocab_size, (batch, tokens)), jnp.int32)
    spec = jnp.asarray(
        np.abs(rs.randn(batch, frames, arch.hp.spec_channels)), jnp.float32)
    lengths = jnp.full((batch,), frames, jnp.int32)
    audio = jnp.asarray(
        rs.randn(batch, frames * hop) * 0.1, jnp.float32)
    rng = jax.random.PRNGKey(1)

    step, flops = aot_with_flops(step, state, (tok, spec, lengths, audio),
                                 rng)
    state, metrics = step(state, (tok, spec, lengths, audio), rng)
    sync(metrics['gen_loss'])
    box = [state]

    def run(i):
        box[0], metrics = step(box[0], (tok, spec, lengths, audio),
                               jax.random.fold_in(rng, i))
        sync(metrics['gen_loss'])
    el = median_time(iters, run)
    audio_s = batch * frames * hop / 22050.
    print(('VITS GAN step B=%d L=%d T=%d: %.0f ms (%.2f steps/s, %.0fx '
           'realtime-audio' + mfu_str(flops, el) + ')') % (
              batch, tokens, frames, el * 1e3, 1. / el, audio_s / el))


def bench_hifigan(batch, frames, iters, precision = 'float32'):
    """Full-size HiFi-GAN v1 adversarial step (MPD+MSD, mel+FM terms)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from text_to_speech_tpu.models.hifigan_arch import HiFiGAN
    from text_to_speech_tpu.ops.stft import TacotronSTFT
    from text_to_speech_tpu.train.gan import (
        make_hifigan_train_step, init_hifigan_train_state, mel_fn_from_stft)
    from text_to_speech_tpu.train.optimizers import get_optimizer

    arch = HiFiGAN()
    mel_stft = TacotronSTFT()
    tx_g = get_optimizer('adamw', lr = 2e-4)
    tx_d = get_optimizer('adamw', lr = 2e-4)
    state = init_hifigan_train_state(arch, jax.random.PRNGKey(0), tx_g, tx_d)
    step = make_hifigan_train_step(arch, tx_g, tx_d,
                                   mel_fn_from_stft(mel_stft),
                                   precision = precision)

    hop = arch.total_upsampling
    rs = np.random.RandomState(0)
    mel = jnp.asarray(rs.randn(batch, frames, 80), jnp.float32)
    audio = jnp.asarray(rs.randn(batch, frames * hop) * 0.1, jnp.float32)

    step, flops = aot_with_flops(step, state, mel, audio)
    state, metrics = step(state, mel, audio)
    sync(metrics['gen_loss'])
    box = [state]

    def run(i):
        box[0], metrics = step(box[0], mel, audio)
        sync(metrics['gen_loss'])
    el = median_time(iters, run)
    audio_s = batch * frames * hop / 22050.
    print(('HiFi-GAN GAN step B=%d T=%d: %.0f ms (%.2f steps/s, %.0fx '
           'realtime-audio' + mfu_str(flops, el) + ')') % (
              batch, frames, el * 1e3, 1. / el, audio_s / el))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model', default = 'both')
    parser.add_argument('--batch', type = int, default = 32)
    parser.add_argument('--frames', type = int, default = 384)
    parser.add_argument('--tokens', type = int, default = 128)
    parser.add_argument('--iters', type = int, default = 5)
    parser.add_argument('--precision', default = 'float32',
                        choices = ('float32', 'mixed_bfloat16'))
    parser.add_argument('--no-remat', action = 'store_true',
                        help = 'waveglow: disable per-flow remat (probe — '
                               'bf16 activations may fit without it)')
    parser.add_argument('--conv-mode', default = 'dilated',
                        choices = ('dilated', 'shifted'),
                        help = 'WaveGlow WN conv formulation on the '
                               'differentiable path: conv_general_dilated '
                               'vs shifted matmuls (A/B)')
    parser.add_argument('--remat-policy', default = 'full',
                        choices = ('full', 'acts'),
                        help = "WaveGlow flow remat: 'full' recomputes the "
                               "flow forward in backward; 'acts' saves "
                               "per-layer acts + residual stream so the "
                               "backward recomputes only elementwise gates")
    parser.add_argument('--train-fused', action = 'store_true',
                        help = 'WaveGlow forward through the fused Pallas '
                               'WN-block kernel with an XLA custom_vjp '
                               'backward (hp.wn_train_fused)')
    parser.add_argument('--no-native-scan', action = 'store_true',
                        help = 'tacotron2: restore the per-step f32 '
                               'attention islands under mixed_bfloat16 '
                               '(the r4 mechanism that regressed 7x)')
    args = parser.parse_args()

    # the MFU accounting AOT-compiles each step once for cost_analysis and
    # times the plain jit path; the persistent cache dedupes the second
    # compile of the same program
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_CACHE_DIR', '/tmp/jax_bench_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.)

    if args.model in ('tacotron2', 'both'):
        bench_tacotron(args.batch, args.tokens, args.frames, args.iters,
                       precision = args.precision,
                       native_scan = not args.no_native_scan)
    if args.model in ('waveglow', 'both'):
        # flow NLL is memory-heavy: halve the batch at full frame count
        remat = (False if args.no_remat
                 else ('acts' if args.remat_policy == 'acts' else True))
        bench_waveglow(max(args.batch // 4, 1), args.frames // 2, args.iters,
                       precision = args.precision,
                       remat = remat, conv_mode = args.conv_mode,
                       train_fused = args.train_fused)
    if args.model in ('encoder', 'both'):
        bench_speaker_encoder(args.iters, precision = args.precision)
    if args.model == 'vits':
        # memory-heavy (posterior WN over T frames + GAN): small batch
        bench_vits(max(args.batch // 4, 1), args.tokens // 2,
                   args.frames // 2, args.iters,
                   precision = args.precision)
    if args.model == 'hifigan':
        # GAN training windows are short in practice (8192-sample segments)
        bench_hifigan(max(args.batch // 2, 1), 32, args.iters,
                      precision = args.precision)


if __name__ == '__main__':
    main()
