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
                            lambda_fm = 2., donate = True, precision = None):
    """→ `step(state, mel, audio) -> (state, metrics)` (jitted).

    `state` = {'gen', 'disc', 'gen_opt', 'disc_opt'}; build it with
    `init_hifigan_train_state`.  `mel_fn` (a jit-safe callable waveform →
    mel) enables the L1 mel term; None disables it.  `precision`
    ('mixed_bfloat16' — see train/precision.py) runs the generator +
    discriminator convs in bf16 against f32 master params; losses stay f32.
    """
    from .precision import get_policy

    policy = get_policy(precision)
    cd = jnp.dtype(policy.compute_dtype) if policy.is_mixed else None

    def step(state, mel, audio):
        # -- discriminator update (generator detached) ----------------------
        disc_loss, disc_grads = jax.value_and_grad(
            lambda d: arch.discriminator_step_loss(
                d, state['gen'], mel, audio, compute_dtype = cd)
        )(state['disc'])
        disc_updates, disc_opt = disc_optimizer.update(
            disc_grads, state['disc_opt'], state['disc'])
        import optax
        new_disc = optax.apply_updates(state['disc'], disc_updates)

        # -- generator update (against the UPDATED discriminator) -----------
        (gen_loss, comps), gen_grads = jax.value_and_grad(
            lambda g: arch.generator_loss(
                g, new_disc, mel_fn, mel, audio,
                lambda_mel = lambda_mel, lambda_fm = lambda_fm,
                compute_dtype = cd),
            has_aux = True)(state['gen'])
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
                         lambda_dur = 1., donate = True, precision = None):
    """→ `step(state, batch, rng) -> (state, metrics)` (jitted).

    `batch` = (tokens, spec, spec_lengths, audio[, speaker]) where `spec`
    is the linear-magnitude spectrogram aligned to `audio` at the
    generator's hop.  One device program per batch: discriminator update on
    detached windowed generator audio, then the generator/VAE side
    (adversarial + feature-matching + mel + KL + duration) — both passes
    share the same rng so MAS alignments and segment windows match.

    Under ``precision='mixed_bfloat16'`` the encoder/posterior/flow/decoder
    + discriminator convs run bf16 against f32 masters.  The waveform
    target stays f32 (segments slice from it losslessly), the SDP keeps
    its own f32 island (`vits_arch.sdp_nll`), and the KL/duration/score
    reductions are f32 (`kl_loss` / the LSGAN losses cast internally).
    """
    import optax

    from .precision import get_policy, cast_floating

    policy = get_policy(precision)
    cd = jnp.dtype(policy.compute_dtype) if policy.is_mixed else None
    hifigan = arch.generator

    def forward(params, batch, rng):
        tokens, spec, spec_lengths, audio = batch[:4]
        speaker = batch[4] if len(batch) > 4 else None
        if cd is not None:
            params = cast_floating(params, cd)
            spec = spec.astype(cd)
            if speaker is not None and speaker.ndim > 1:
                speaker = speaker.astype(cd)
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
        if cd is not None:
            # the generator emits f32 waveforms by contract; the
            # discriminators run in the compute dtype
            fake, real = fake.astype(cd), real.astype(cd)
            disc_params = cast_floating(disc_params, cd)
        return (hifigan.discriminator_loss(
                    hifigan.apply_mpd(disc_params['mpd'], real),
                    hifigan.apply_mpd(disc_params['mpd'], fake))
                + hifigan.discriminator_loss(
                    hifigan.apply_msd(disc_params['msd'], real),
                    hifigan.apply_msd(disc_params['msd'], fake)))

    def gen_loss_fn(gen_params, disc_params, batch, rng):
        out = forward(gen_params, batch, rng)
        fake, real = out['audio_hat'], out['audio_seg']
        # discriminator operands in the compute dtype (the generator emits
        # f32 waveforms by contract); the mel term keeps the f32 streams
        fake_c = fake if cd is None else fake.astype(cd)
        real_c = real.astype(fake_c.dtype)
        dp = cast_floating(disc_params, cd) if cd is not None else disc_params

        mpd_real = hifigan.apply_mpd(dp['mpd'], real_c)
        mpd_fake = hifigan.apply_mpd(dp['mpd'], fake_c)
        msd_real = hifigan.apply_msd(dp['msd'], real_c)
        msd_fake = hifigan.apply_msd(dp['msd'], fake_c)

        adv = (hifigan.generator_adversarial_loss(mpd_fake)
               + hifigan.generator_adversarial_loss(msd_fake))
        fm = (hifigan.feature_matching_loss(mpd_real, mpd_fake)
              + hifigan.feature_matching_loss(msd_real, msd_fake))
        mel_l1 = jnp.mean(jnp.abs(mel_fn(fake.astype(jnp.float32))
                                  - mel_fn(real.astype(jnp.float32)))) \
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


def fit_gan(model,
            data,
            *,
            epochs = 1,
            batch_size = 8,
            optimizer = 'adam',
            lr = 2e-4,
            betas = (0.8, 0.99),
            mesh = None,
            shuffle = True,
            lambda_mel = 45.,
            lambda_fm = 2.,
            lambda_kl = 1.,
            lambda_dur = 1.,
            use_mel_loss = True,
            token_multiple = 16,
            frame_multiple = 32,
            terminate_on_nan = True,
            precision = None,
            seed = 0,
            verbose = True,
            ** kwargs
           ):
    """`fit()`-style adversarial training for the GAN families (HiFi-GAN
    vocoder, VITS end-to-end): History + rotating checkpoints + resume from
    `model.epochs`, over the model's own `prepare_data`/`collate` pipeline.

    The generator side lives in `model.params` (persisted by `model.save`
    like any other family); the discriminators + both optimizer states are
    checkpointed alongside in `<model dir>/saving/gan_state.npz` so an
    interrupted adversarial run resumes exactly.
    """
    import os
    import time
    import logging

    import numpy as np
    import jax

    from .datasets import prepare_dataset
    from .optimizers import get_optimizer
    from ..models import saving as saving_utils
    from ..utils import pad_to_multiple
    from ..parallel import shard_batch, data_axes, replicated, \
        pad_batch_to_devices

    logger = logging.getLogger(__name__)
    arch = model.arch
    is_vits = hasattr(arch, 'train_forward')
    hifigan = arch.generator if is_vits else arch

    tx_g = get_optimizer(optimizer, lr = lr, b1 = betas[0], b2 = betas[1])
    tx_d = get_optimizer(optimizer, lr = lr, b1 = betas[0], b2 = betas[1])
    mel_fn = mel_fn_from_stft(model.mel_fn) if use_mel_loss else None

    if is_vits:
        step = make_vits_train_step(
            arch, tx_g, tx_d, mel_fn = mel_fn, lambda_mel = lambda_mel,
            lambda_fm = lambda_fm, lambda_kl = lambda_kl,
            lambda_dur = lambda_dur, donate = True, precision = precision)
    else:
        base = make_hifigan_train_step(
            arch, tx_g, tx_d, mel_fn = mel_fn, lambda_mel = lambda_mel,
            lambda_fm = lambda_fm, donate = True, precision = precision)
        step = lambda state, batch, rng: base(state, * batch)

    train_ds = prepare_dataset(
        data, prepare_fn = model.prepare_data,
        filter_fn = getattr(model, 'filter_data', None),
        collate_fn = getattr(model, 'collate', None),
        batch_size = batch_size, shuffle = shuffle,
    )

    def pad_batch_shapes(batch):
        """Bucket the time/token axes so XLA compiles a bounded number of
        executables (VITS keeps spec frames × hop == audio samples)."""
        if is_vits:
            tokens, spec, lengths, audio = batch
            tokens = pad_to_multiple(np.asarray(tokens), token_multiple,
                                     axis = 1,
                                     constant_values = model.blank_token_idx)
            spec = pad_to_multiple(np.asarray(spec), frame_multiple, axis = 1)
            audio = pad_to_multiple(np.asarray(audio),
                                    frame_multiple * arch.upsample_rate,
                                    axis = 1)
            return tokens, spec, np.asarray(lengths, np.int32), audio
        mel, audio = batch
        mel = pad_to_multiple(np.asarray(mel), frame_multiple, axis = 1,
                              constant_values = model.pad_mel_value)
        audio = pad_to_multiple(np.asarray(audio),
                                frame_multiple * arch.total_upsampling,
                                axis = 1)
        return mel, audio

    # -- state: fresh or resumed -------------------------------------------------
    gan_path = saving_utils.get_model_dir(model.name, 'saving',
                                          'gan_state.npz')
    key = jax.random.PRNGKey(seed)
    if is_vits:
        state = init_vits_train_state(arch, key, tx_g, tx_d)
        state['gen'] = model.params
    else:
        state = init_hifigan_train_state(arch, key, tx_g, tx_d)
        if model.params:
            state['gen'] = model.params
    state['gen_opt'] = tx_g.init(state['gen'])

    _SIDE = ('disc', 'gen_opt', 'disc_opt')

    def save_side(path):
        # optax states are namedtuples → serialize leaves against the live
        # treedef (restored below with the identical arch/optimizer config)
        leaves = jax.tree_util.tree_leaves(
            jax.device_get({k: state[k] for k in _SIDE}))
        os.makedirs(os.path.dirname(path), exist_ok = True)
        np.savez(path, ** {'leaf_{:05d}'.format(i): np.asarray(v)
                           for i, v in enumerate(leaves)})

    if os.path.exists(gan_path):
        sub = {k: state[k] for k in _SIDE}
        treedef = jax.tree_util.tree_structure(sub)
        with np.load(gan_path) as d:
            loaded = [d[k] for k in sorted(d.files)]
        if len(loaded) == treedef.num_leaves:
            logger.info('resuming discriminator/optimizer state from %s',
                        gan_path)
            state.update(jax.tree_util.tree_unflatten(treedef, loaded))
        else:
            logger.warning('%s does not match the current GAN state '
                           '(%d vs %d leaves); starting discriminators fresh',
                           gan_path, len(loaded), treedef.num_leaves)

    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))

    from .precision import get_policy
    history = model.history
    history.set_config({
        'epochs': epochs, 'batch_size': batch_size, 'optimizer': 'gan-' + str(
            optimizer), 'lr': lr, 'loss': 'vits_gan' if is_vits else
        'hifigan_gan', 'precision': get_policy(precision).name,
        'mesh': str(mesh.shape) if mesh is not None else None,
    })

    rng = jax.random.PRNGKey(seed + 1 + model.epochs)
    initial_epoch = model.epochs
    interrupted = False
    try:
        for epoch in range(initial_epoch, initial_epoch + epochs):
            history.on_epoch_begin(epoch)
            epoch_metrics, n_batches = {}, 0
            start = time.time()
            for batch in train_ds:
                batch = pad_batch_shapes(batch)
                if mesh is not None:
                    batch = pad_batch_to_devices(batch, mesh)
                    batch = shard_batch(batch, mesh, axis = data_axes(mesh))
                rng, step_rng = jax.random.split(rng)
                state, metrics = step(state, batch, step_rng)
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics['loss'] = metrics['gen_loss']
                if terminate_on_nan and not np.isfinite(metrics['loss']):
                    logger.error('NaN gen loss at epoch %d; stopping', epoch)
                    raise FloatingPointError('NaN loss')
                history.on_batch_end(metrics)
                for k, v in metrics.items():
                    epoch_metrics[k] = epoch_metrics.get(k, 0.) + v
                n_batches += 1
            epoch_metrics = {k: v / max(n_batches, 1)
                             for k, v in epoch_metrics.items()}
            history.on_epoch_end(epoch_metrics, epoch = epoch)
            if verbose:
                logger.info('epoch %d: %s (%.1fs)', epoch,
                            {k: round(v, 4) for k, v in epoch_metrics.items()},
                            time.time() - start)
            model.set_weights(state['gen'])
            model.save(epoch = epoch + 1,
                       metric = epoch_metrics.get('loss'))
            save_side(gan_path)
    except KeyboardInterrupt:
        interrupted = True
        logger.warning('adversarial training interrupted; saving state')
    except FloatingPointError:
        interrupted = True

    model.set_weights(state['gen'])
    if interrupted:
        model.save(epoch = model.epochs, metric = None)
        save_side(gan_path)
    return history


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
