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


# -- VITS (end-to-end conditional-VAE + GAN) ---------------------------------

def make_vits_train_step(arch, gen_optimizer, disc_optimizer, mel_fn = None,
                         *, lambda_mel = 45., lambda_fm = 2., lambda_kl = 1.,
                         lambda_dur = 1., donate = True):
    """→ `step(state, batch, rng) -> (state, metrics)` (jitted).

    `batch` = (tokens, spec, spec_lengths, audio[, speaker]) where `spec`
    is the linear-magnitude spectrogram aligned to `audio` at the
    generator's hop.  One device program per batch: discriminator update on
    detached windowed generator audio, then the generator/VAE side
    (adversarial + feature-matching + mel + KL + duration) — both passes
    share the same rng so MAS alignments and segment windows match.
    """
    import optax
    hifigan = arch.generator

    def forward(params, batch, rng):
        tokens, spec, spec_lengths, audio = batch[:4]
        speaker = batch[4] if len(batch) > 4 else None
        kwargs = {}
        if speaker is not None:
            if speaker.ndim == 1:
                kwargs['speaker_ids'] = speaker
            else:
                kwargs['speaker_embedding'] = speaker
        return arch.train_forward(params, tokens, spec, spec_lengths, audio,
                                  rng, ** kwargs)

    def disc_loss_fn(disc_params, gen_params, batch, rng):
        out = forward(gen_params, batch, rng)
        fake = jax.lax.stop_gradient(out['audio_hat'])
        real = out['audio_seg']
        return (hifigan.discriminator_loss(
                    hifigan.apply_mpd(disc_params['mpd'], real),
                    hifigan.apply_mpd(disc_params['mpd'], fake))
                + hifigan.discriminator_loss(
                    hifigan.apply_msd(disc_params['msd'], real),
                    hifigan.apply_msd(disc_params['msd'], fake)))

    def gen_loss_fn(gen_params, disc_params, batch, rng):
        out = forward(gen_params, batch, rng)
        fake, real = out['audio_hat'], out['audio_seg']

        mpd_real = hifigan.apply_mpd(disc_params['mpd'], real)
        mpd_fake = hifigan.apply_mpd(disc_params['mpd'], fake)
        msd_real = hifigan.apply_msd(disc_params['msd'], real)
        msd_fake = hifigan.apply_msd(disc_params['msd'], fake)

        adv = (hifigan.generator_adversarial_loss(mpd_fake)
               + hifigan.generator_adversarial_loss(msd_fake))
        fm = (hifigan.feature_matching_loss(mpd_real, mpd_fake)
              + hifigan.feature_matching_loss(msd_real, msd_fake))
        mel_l1 = jnp.mean(jnp.abs(mel_fn(fake) - mel_fn(real))) \
            if mel_fn is not None else 0.
        kl = arch.kl_loss(out['z_p'], out['logs_q'], out['m_p'],
                          out['logs_p'], out['frame_mask'])
        if out.get('duration_nll') is not None:     # stochastic DP (use_sdp)
            dur = out['duration_nll']
        else:
            dur = arch.duration_loss(out['log_durations_hat'],
                                     out['durations'], out['token_mask'])
        loss = (adv + lambda_fm * fm + lambda_mel * mel_l1
                + lambda_kl * kl + lambda_dur * dur)
        return loss, {'adv': adv, 'fm': fm, 'mel': mel_l1, 'kl': kl,
                      'duration': dur}

    def step(state, batch, rng):
        disc_loss, disc_grads = jax.value_and_grad(disc_loss_fn)(
            state['disc'], state['gen'], batch, rng)
        disc_updates, disc_opt = disc_optimizer.update(
            disc_grads, state['disc_opt'], state['disc'])
        new_disc = optax.apply_updates(state['disc'], disc_updates)

        (gen_loss, comps), gen_grads = jax.value_and_grad(
            gen_loss_fn, has_aux = True)(state['gen'], new_disc, batch, rng)
        gen_updates, gen_opt = gen_optimizer.update(
            gen_grads, state['gen_opt'], state['gen'])
        new_gen = optax.apply_updates(state['gen'], gen_updates)

        metrics = {'disc_loss': disc_loss, 'gen_loss': gen_loss, ** comps}
        return ({'gen': new_gen, 'disc': new_disc,
                 'gen_opt': gen_opt, 'disc_opt': disc_opt}, metrics)

    return jax.jit(step, donate_argnums = (0,) if donate else ())


def init_vits_train_state(arch, key, gen_optimizer, disc_optimizer):
    """Initialise VITS params (the whole VAE+decoder is the 'generator'
    side) + MPD/MSD discriminators + optimizer states."""
    k_gen, k_mpd, k_msd = jax.random.split(key, 3)
    gen, _ = arch.init(k_gen)
    disc = {'mpd': arch.generator.init_mpd(k_mpd),
            'msd': arch.generator.init_msd(k_msd)}
    return {
        'gen': gen,
        'disc': disc,
        'gen_opt': gen_optimizer.init(gen),
        'disc_opt': disc_optimizer.init(disc),
    }
