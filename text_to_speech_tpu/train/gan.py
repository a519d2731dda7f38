"""Adversarial (GAN) training step for the HiFi-GAN vocoder.

Beyond-reference capability (the reference trains WaveGlow by maximum
likelihood only).  One jitted step performs the standard alternating
update — discriminator on detached generator audio, then generator with
adversarial + feature-matching + L1-mel terms — so the whole thing is a
single device program per batch.  Composes with the dp mesh exactly like
`trainer.fit`'s step (shard the batch, optimizer states replicate).
"""

import functools

import jax
import jax.numpy as jnp


def mel_fn_from_stft(mel_stft):
    """→ a jit-safe, differentiable waveform→mel callable for the L1 mel
    term, from any `ops.stft.MelSTFT` (its `mel_spectrogram` is pure jnp:
    conv-basis STFT → filterbank matmul → log)."""
    def fn(wave):
        return mel_stft.mel_spectrogram(wave)
    return fn


def make_hifigan_train_step(arch, gen_optimizer, disc_optimizer,
                            mel_fn = None, *, lambda_mel = 45.,
                            lambda_fm = 2., donate = True):
    """→ `step(state, mel, audio) -> (state, metrics)` (jitted).

    `state` = {'gen', 'disc', 'gen_opt', 'disc_opt'}; build it with
    `init_hifigan_train_state`.  `mel_fn` (a jit-safe callable waveform →
    mel) enables the L1 mel term; None disables it.
    """

    def step(state, mel, audio):
        # -- discriminator update (generator detached) ----------------------
        disc_loss, disc_grads = jax.value_and_grad(
            arch.discriminator_step_loss)(state['disc'], state['gen'],
                                          mel, audio)
        disc_updates, disc_opt = disc_optimizer.update(
            disc_grads, state['disc_opt'], state['disc'])
        import optax
        new_disc = optax.apply_updates(state['disc'], disc_updates)

        # -- generator update (against the UPDATED discriminator) -----------
        (gen_loss, comps), gen_grads = jax.value_and_grad(
            arch.generator_loss, has_aux = True)(
                state['gen'], new_disc, mel_fn, mel, audio,
                lambda_mel = lambda_mel, lambda_fm = lambda_fm)
        gen_updates, gen_opt = gen_optimizer.update(
            gen_grads, state['gen_opt'], state['gen'])
        new_gen = optax.apply_updates(state['gen'], gen_updates)

        metrics = {'disc_loss': disc_loss, 'gen_loss': gen_loss, ** comps}
        return ({'gen': new_gen, 'disc': new_disc,
                 'gen_opt': gen_opt, 'disc_opt': disc_opt}, metrics)

    return jax.jit(step, donate_argnums = (0,) if donate else ())


def init_hifigan_train_state(arch, key, gen_optimizer, disc_optimizer):
    """Initialise generator/discriminator params + optimizer states."""
    k_gen, k_mpd, k_msd = jax.random.split(key, 3)
    gen = arch.init(k_gen)
    disc = {'mpd': arch.init_mpd(k_mpd), 'msd': arch.init_msd(k_msd)}
    return {
        'gen': gen,
        'disc': disc,
        'gen_opt': gen_optimizer.init(gen),
        'disc_opt': disc_optimizer.init(disc),
    }
