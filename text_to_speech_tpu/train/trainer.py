"""Training loop: jitted (optionally mesh-sharded) train step + epoch driver.

Capability parity with the reference training path
(``/root/reference/models/interfaces/base_model.py:406-481`` loss/optimizer
wiring with per-component metrics, ``:532-643`` prepare_for_training with
train/valid split + EarlyStopping/TerminateOnNaN/Checkpoint callbacks,
``:645-671`` fit with resume + KeyboardInterrupt state save) — re-designed
TPU-first:

  - the train step is ONE jitted pure function (params, state, opt_state,
    batch) → (params', state', opt_state', metrics) with donated buffers;
  - data parallelism comes from a `Mesh`: batches sharded on ``dp``, params
    replicated (or TP-sharded via spec trees), XLA inserts the psum for
    gradient reduction — no hand-written collectives;
  - batches are padded into shape buckets so only a handful of executables
    compile.
"""

import time
import logging

import numpy as np

from .losses import get_loss
from .optimizers import get_optimizer
from ..utils.sequence_utils import pad_to_multiple
from ..parallel import (
    shard_batch, pad_batch_to_devices, replicated, data_axes)

logger = logging.getLogger(__name__)


def model_forward(model, params, state, inputs, *, rng, train = True,
                  targets = None, compute_dtype = None):
    """Dispatch a padded batch to the model's architecture forward pass.

    `targets` is only consulted for static shape information (e.g. the
    FastSpeech-2 expansion buffer must match the padded mel target length).
    `compute_dtype` (train/precision.py mixed policy) runs the matmul path
    in that dtype: WaveGlow routes it to its own f32-island forward; every
    other family casts params + float inputs at this boundary and returns
    f32 predictions for the loss (losses + norm statistics keep their own
    f32 islands).  Returns (y_pred, new_state)."""
    from ..models.tts.tacotron2 import Tacotron2 as TacoTask
    from ..models.tts.fastspeech2 import FastSpeech2 as FS2Task
    from ..models.tts.waveglow import WaveGlow as WGTask
    from ..models.encoder.speaker_encoder import SpeakerEncoder
    from .precision import cast_floating

    arch = model.arch
    if compute_dtype is not None and not isinstance(model, WGTask):
        if not getattr(model, 'mixed_precision_ok', True):
            # sequential-scan families (Tacotron-2 teacher forcing, GE2E):
            # their steps are latency-bound chains of SMALL matmuls where
            # the boundary casts + per-step f32 islands dominate — measured
            # 311 → 2307 ms on the full-size Tacotron step (v5e,
            # 2026-08-20).  The policy no-ops for them; bf16 belongs to
            # the FLOP-bound families (WaveGlow/HiFi-GAN/FS2).
            compute_dtype = None
        else:
            import jax.numpy as jnp
            params = cast_floating(
                params, compute_dtype,
                exempt = tuple(getattr(model, 'precision_exempt', ())))
            inputs = cast_floating(inputs, compute_dtype)
            preds, new_state = model_forward(model, params, state, inputs,
                                             rng = rng, train = train,
                                             targets = targets)
            return cast_floating(preds, jnp.float32), new_state
    if isinstance(model, FS2Task):      # subclasses TacoTask: dispatch first
        if len(inputs) == 5:
            tokens, embeddings, durations, pitch, energy = inputs
        else:
            tokens, durations, pitch, energy = inputs
            embeddings = None
        max_frames = targets[0].shape[1] if targets is not None else None
        preds, new_state = arch(
            params, state, tokens, durations = durations, pitch = pitch,
            energy = energy, speaker_embedding = embeddings,
            max_frames = max_frames, train = train, rng = rng,
        )
        return preds, new_state
    if isinstance(model, WGTask):
        mel, audio = inputs
        # per-flow remat: 12x less activation memory, and the compiler
        # cannot digest the un-checkpointed 12-flow backward at real batches
        return arch.forward(params, mel, audio,
                            remat = getattr(model, 'train_remat', True),
                            compute_dtype = compute_dtype), state
    if isinstance(model, SpeakerEncoder):
        mels, lengths = inputs
        n_speakers, n_utt = model.ge2e_shape      # static at trace time
        emb, new_state = arch(params, state, mels, lengths = lengths,
                              train = train, rng = rng)
        emb = emb.reshape(n_speakers, n_utt, -1)
        return (emb, params['ge2e']['w'], params['ge2e']['b']), new_state
    if isinstance(model, TacoTask):
        if len(inputs) == 4:
            tokens, embeddings, mel_in, lengths = inputs
        else:
            tokens, mel_in, lengths = inputs
            embeddings = None
        preds, new_state = arch(
            params, state, tokens, mel_in, mel_lengths = lengths,
            speaker_embedding = embeddings, train = train, rng = rng,
        )
        return preds, new_state
    raise ValueError('No forward dispatch for {}'.format(type(model).__name__))


def make_train_step(model, loss_fn, optimizer, *, mesh = None,
                    pp_microbatches = None, precision = None):
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.tts.waveglow import WaveGlow as WGTask
    from .losses import WaveGlowLoss
    from .precision import get_policy

    policy = get_policy(precision)
    compute_dtype = jnp.dtype(policy.compute_dtype) if policy.is_mixed \
        else None
    use_pp = mesh is not None and 'pp' in mesh.shape and isinstance(model, WGTask)
    if use_pp and not isinstance(loss_fn, WaveGlowLoss):
        # the pipelined path computes the NLL itself — a custom loss cannot
        # ride it; fall back to the standard (replicated) step rather than
        # silently training a different objective
        logger.warning('pp mesh requested with a non-WaveGlowLoss loss (%s); '
                       'falling back to the unpipelined train step',
                       type(loss_fn).__name__)
        use_pp = False
    if use_pp:
        # pipeline-parallel flow training: GPipe microbatch schedule over
        # the pp axis (parallel/pipeline.py), composing with dp batch shards
        from ..parallel.pipeline import WaveGlowPipeline
        pipe = WaveGlowPipeline(
            model.arch, mesh,
            dp_axis = 'dp' if 'dp' in mesh.shape else None,
            n_micro = pp_microbatches or 2 * mesh.shape['pp'],
        )
        sigma = getattr(loss_fn, 'sigma', None)

        def pp_train_step(params, state, opt_state, rng, inputs, targets):
            mel, audio = inputs
            loss, grads = jax.value_and_grad(
                lambda p: pipe.loss(p, mel, audio, sigma = sigma,
                                    compute_dtype = compute_dtype))(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = {'loss': loss, 'grad_norm': optax.global_norm(grads)}
            return params, state, opt_state, metrics

        return jax.jit(pp_train_step, donate_argnums = (0, 2))

    def train_step(params, state, opt_state, rng, inputs, targets):
        def loss_of(p):
            preds, new_state = model_forward(model, p, state, inputs,
                                             rng = rng, train = True,
                                             targets = targets,
                                             compute_dtype = compute_dtype)
            losses = loss_fn(targets, preds)
            return jnp.mean(losses['loss']), (losses, new_state)

        (_, (losses, new_state)), grads = jax.value_and_grad(
            loss_of, has_aux = True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {k: jnp.mean(v) for k, v in losses.items()}
        metrics['grad_norm'] = optax.global_norm(grads)
        return params, new_state, opt_state, metrics

    # sharding comes from the *arguments*: the caller device_puts params
    # (replicated or TP-spec'd) and dp-shards the batch; XLA propagates and
    # inserts the collectives (grad psum, TP all-reduces).
    return jax.jit(train_step, donate_argnums = (0, 2))


def make_eval_step(model, loss_fn, *, mesh = None, precision = None):
    import jax
    import jax.numpy as jnp

    from .precision import get_policy

    policy = get_policy(precision)
    compute_dtype = jnp.dtype(policy.compute_dtype) if policy.is_mixed \
        else None

    def eval_step(params, state, rng, inputs, targets):
        preds, _ = model_forward(model, params, state, inputs,
                                 rng = rng, train = False, targets = targets,
                                 compute_dtype = compute_dtype)
        losses = loss_fn(targets, preds)
        return {k: jnp.mean(v) for k, v in losses.items()}

    return jax.jit(eval_step)


def bucket_pad(batch, model, *, token_multiple = 32, frame_multiple = 64):
    """Pad a collated batch into shape buckets to bound jit variants."""
    from ..models.tts.waveglow import WaveGlow as WGTask
    inputs, targets = batch

    if hasattr(model, 'collate_ge2e'):
        return inputs, targets            # GE2E batches are pre-bucketed

    if hasattr(model, 'bucket_pad'):      # task-specific bucketing override
        return model.bucket_pad(batch, token_multiple = token_multiple,
                                frame_multiple = frame_multiple)

    if isinstance(model, WGTask):
        mel, audio = inputs if isinstance(inputs, tuple) else (inputs, targets)
        mel = pad_to_multiple(np.asarray(mel), frame_multiple, axis = 1,
                              constant_values = model.pad_mel_value)
        samples = mel.shape[1] * model.upsample_rate
        audio = np.asarray(audio)
        if audio.shape[1] < samples:
            audio = np.pad(audio, [(0, 0), (0, samples - audio.shape[1])])
        return (mel, audio[:, :samples]), targets

    pad_in, pad_out = model.get_padding_values()
    parts = list(inputs)
    parts[0] = pad_to_multiple(np.asarray(parts[0]), token_multiple, axis = 1,
                               constant_values = pad_in[0])
    mel_idx = len(parts) - 2
    parts[mel_idx] = pad_to_multiple(np.asarray(parts[mel_idx]), frame_multiple,
                                     axis = 1, constant_values = pad_in[1])
    # targets must be exactly r x the (padded) input step count: with a
    # reduction factor the decoder inputs are group-rate and emit r frames
    # per step (identical to frame_multiple padding at r=1)
    hp = getattr(getattr(model, 'arch', None), 'hp', None)
    r = getattr(hp, 'n_frames_per_step', 1) if hp is not None else 1
    out_len = parts[mel_idx].shape[1] * r
    mel_out = pad_to_multiple(np.asarray(targets[0]), out_len, axis = 1,
                              constant_values = pad_out[0])
    gate = pad_to_multiple(np.asarray(targets[1]), out_len, axis = 1,
                           constant_values = pad_out[1])
    return tuple(parts), (mel_out, gate)


def fit(model,
        data,
        *,
        valid_data = None,
        valid_size = 0.1,
        epochs = 1,
        batch_size = 8,
        loss = None,
        optimizer = 'adam',
        lr = 1e-3,
        mesh = None,
        shuffle = True,
        early_stopping_patience = None,
        monitor = 'loss',
        terminate_on_nan = True,
        token_multiple = 32,
        frame_multiple = 64,
        precision = None,
        seed = 0,
        verbose = True,
        async_checkpointing = True,
        ** kwargs
       ):
    """Train `model` on `data` (rows consumable by `model.prepare_data`).

    Resumes from `model.epochs`; saves a rotating checkpoint per epoch; the
    best (by `monitor` on valid, else train) is tracked by the manager.
    With `async_checkpointing` (default) the per-epoch weight save runs on a
    background writer thread (`AsyncCheckpointSaver`) so the next epoch's
    dispatch is not blocked by the device→host fetch + disk write.
    """
    import jax
    from .datasets import prepare_dataset, train_test_split

    from .datasets import Dataset, GE2EDataset

    loss_fn = get_loss(loss or model._default_loss)
    tx = get_optimizer(optimizer, lr = lr, ** {
        k: v for k, v in kwargs.items()
        if k in ('clip_norm', 'weight_decay', 'lr_scheduler')
    })

    prebuilt = isinstance(data, (Dataset, GE2EDataset))
    if not prebuilt and valid_data is None and valid_size:
        data, valid_data = train_test_split(data, valid_size = valid_size,
                                            random_state = seed)

    # native_audio=True routes the rows' WAV decode through the C++ loader
    # pool (decode + resample to the model rate below the GIL) — the
    # tf.data parallel-file-read analog
    native_rate = getattr(model, 'rate', None) \
        if kwargs.get('native_audio') else None
    train_ds = data if prebuilt else prepare_dataset(
        data, prepare_fn = model.prepare_data,
        filter_fn = getattr(model, 'filter_data', None),
        collate_fn = getattr(model, 'collate', None),
        batch_size = batch_size, shuffle = shuffle,
        length_bucket_fn = lambda item: _item_length(item),
        num_parallel_calls = kwargs.get('num_parallel_calls'),
        native_audio_rate = native_rate,
    )
    valid_ds = valid_data if isinstance(valid_data, (Dataset, GE2EDataset)) \
        else prepare_dataset(
        valid_data, prepare_fn = model.prepare_data,
        filter_fn = getattr(model, 'filter_data', None),
        collate_fn = getattr(model, 'collate', None),
        batch_size = batch_size, shuffle = False,
        native_audio_rate = native_rate,
    ) if valid_data else None

    pp_microbatches = None
    batch_multiple = None
    if mesh is not None:
        # data-parallel divisor spans all data axes (('dcn', 'dp') on
        # multi-slice hybrid meshes)
        batch_multiple = int(np.prod(
            [mesh.shape[a] for a in data_axes(mesh)] or [1]))
        if 'pp' in mesh.shape:
            pp_microbatches = kwargs.get('pp_microbatches') \
                or 2 * mesh.shape['pp']
            batch_multiple *= pp_microbatches

    train_step = make_train_step(
        model, loss_fn, tx, mesh = mesh, pp_microbatches = pp_microbatches,
        precision = precision)
    eval_step = make_eval_step(model, loss_fn, mesh = mesh,
                               precision = precision)

    params, state = model.params, model.state
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(seed + model.epochs)

    # the saved moments are only valid under the optimizer config that
    # produced them — fingerprint it so a changed lr/scheduler/optimizer
    # starts fresh instead of silently applying stale moments + a
    # fast-forwarded schedule step count
    _opt_fp = repr((optimizer, lr, sorted(
        (k, kwargs[k]) for k in ('clip_norm', 'weight_decay', 'lr_scheduler')
        if k in kwargs)))

    def _opt_leaves(opt):
        # optax states are namedtuple chains: serialize leaves against the
        # live treedef (restored below with the identical optimizer config)
        leaves = jax.tree_util.tree_leaves(opt)
        out = {'leaf_{:05d}'.format(i): v for i, v in enumerate(leaves)}
        out['config'] = np.frombuffer(_opt_fp.encode(), np.uint8).copy()
        return out

    # EXACT resume: restore the optimizer moments saved alongside the
    # weights, so Adam m/v and schedule counters survive process restarts
    # (the reference's Keras checkpoints store weights only —
    # /root/reference/custom_train_objects/checkpoint_manager.py)
    manager = getattr(model, 'ckpt_manager', None)
    if model.epochs and manager is not None:
        try:
            ckpt = manager.load(trees = ('opt',))
        except Exception:
            ckpt = None
        saved_opt = (ckpt or {}).get('opt')
        if saved_opt:
            saved_fp = saved_opt.pop('config', None)
            fp_ok = saved_fp is not None and \
                bytes(np.asarray(saved_fp, np.uint8)) == _opt_fp.encode()
            fresh = jax.tree_util.tree_leaves(opt_state)
            loaded = [saved_opt[k] for k in sorted(saved_opt)]
            if not fp_ok:
                logger.warning('checkpointed optimizer state was saved under '
                               'a different optimizer config; starting fresh')
            elif len(loaded) == len(fresh) and all(
                    np.shape(a) == np.shape(b)
                    for a, b in zip(loaded, fresh)):
                opt_state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(opt_state),
                    [jax.numpy.asarray(a, dtype = b.dtype)
                     for a, b in zip(loaded, fresh)])
                logger.info('resumed optimizer state from epoch %s',
                            manager.latest_epoch)
            else:
                logger.warning('checkpointed optimizer state does not match '
                               'the current optimizer; starting fresh')

    if mesh is not None:
        repl = replicated(mesh)
        params = jax.device_put(params, repl)
        state = jax.device_put(state, repl)
        opt_state = jax.device_put(opt_state, repl)

    def _ds_summary(ds):
        # dataset summary recorded into the training history (the reference
        # behavior at base_model.py:596-601)
        if ds is None:
            return None
        try:
            return {'batches': len(ds), 'batch_size': batch_size}
        except TypeError:
            return {'batches': None, 'batch_size': batch_size}

    history = model.history
    history.set_config({
        'epochs': epochs, 'batch_size': batch_size, 'optimizer': str(optimizer),
        'lr': lr, 'loss': getattr(loss_fn, 'name', str(loss_fn)),
        'precision': _get_policy_name(precision),
        'mesh': str(mesh.shape) if mesh is not None else None,
        'dataset': _ds_summary(train_ds), 'valid_dataset': _ds_summary(valid_ds),
    })

    initial_epoch = model.epochs
    best_value, patience_left = None, early_stopping_patience
    interrupted = False

    saver = None
    if async_checkpointing and getattr(model, 'ckpt_manager', None) is not None:
        from .checkpoint import AsyncCheckpointSaver
        saver = AsyncCheckpointSaver(model.ckpt_manager)

    try:
        for epoch in range(initial_epoch, initial_epoch + epochs):
            history.on_epoch_begin(epoch)
            epoch_metrics, n_batches = {}, 0
            start = time.time()

            def flush(device_metrics):
                """Fetch + record one step's metrics.  Called AFTER the next
                step has been dispatched, so the device→host sync overlaps
                the next step's compute instead of serializing the loop
                (the per-step `float()` was the pipeline's only barrier).
                NaN termination therefore trips one step late — harmless:
                the extra step's updates are discarded with the raise."""
                nonlocal n_batches
                metrics = {k: float(v) for k, v in device_metrics.items()}
                if terminate_on_nan and not np.isfinite(metrics['loss']):
                    logger.error('NaN loss at epoch %d; stopping', epoch)
                    raise FloatingPointError('NaN loss')
                history.on_batch_end(metrics)
                for k, v in metrics.items():
                    epoch_metrics[k] = epoch_metrics.get(k, 0.) + v
                n_batches += 1

            pending = None
            for batch in train_ds:
                inputs, targets = bucket_pad(
                    batch, model, token_multiple = token_multiple,
                    frame_multiple = frame_multiple,
                )
                if mesh is not None:
                    inputs = pad_batch_to_devices(
                        inputs, mesh, multiple = batch_multiple)
                    targets = pad_batch_to_devices(
                        targets, mesh, multiple = batch_multiple)
                    inputs = shard_batch(inputs, mesh, axis = data_axes(mesh))
                    targets = shard_batch(targets, mesh, axis = data_axes(mesh))
                rng, step_rng = jax.random.split(rng)
                params, state, opt_state, metrics = train_step(
                    params, state, opt_state, step_rng, inputs, targets
                )
                if pending is not None:
                    flush(pending)
                pending = metrics
            if pending is not None:
                flush(pending)

            epoch_metrics = {k: v / max(n_batches, 1) for k, v in epoch_metrics.items()}

            if valid_ds is not None:
                val_metrics, n_val = {}, 0
                for batch in valid_ds:
                    inputs, targets = bucket_pad(
                        batch, model, token_multiple = token_multiple,
                        frame_multiple = frame_multiple,
                    )
                    if mesh is not None:
                        axes = data_axes(mesh)
                        inputs = shard_batch(
                            pad_batch_to_devices(inputs, mesh, axis = axes),
                            mesh, axis = axes)
                        targets = shard_batch(
                            pad_batch_to_devices(targets, mesh, axis = axes),
                            mesh, axis = axes)
                    rng, step_rng = jax.random.split(rng)
                    m = eval_step(params, state, step_rng, inputs, targets)
                    for k, v in m.items():
                        val_metrics['val_' + k] = val_metrics.get('val_' + k, 0.) + float(v)
                    n_val += 1
                epoch_metrics.update({k: v / max(n_val, 1) for k, v in val_metrics.items()})

            history.on_epoch_end(epoch_metrics, epoch = epoch)
            if verbose:
                logger.info('epoch %d: %s (%.1fs)', epoch,
                            {k: round(v, 4) for k, v in epoch_metrics.items()},
                            time.time() - start)

            # checkpoint + early stopping on the monitored metric
            monitor_key = 'val_' + monitor if valid_ds is not None else monitor
            value = epoch_metrics.get(monitor_key, epoch_metrics.get(monitor))
            model.set_weights(params, state)
            if saver is not None:
                # config/history write stays synchronous (cheap JSON); the
                # weight fetch + npz write drains on the background thread
                model.save(save_weights = False)
                trees = {'params': params, 'opt': _opt_leaves(opt_state)}
                if state: trees['state'] = state
                saver.save(trees, epoch + 1, metric = value)
            else:
                model.save(epoch = epoch + 1, metric = value,
                           extra_trees = {'opt': _opt_leaves(opt_state)})

            if early_stopping_patience:
                if best_value is None or (value is not None and value < best_value):
                    best_value, patience_left = value, early_stopping_patience
                else:
                    patience_left -= 1
                    if patience_left <= 0:
                        logger.info('early stopping at epoch %d', epoch)
                        break
    except KeyboardInterrupt:
        interrupted = True
        logger.warning('training interrupted; saving current state')
    except FloatingPointError:
        interrupted = True
    finally:
        # always drain the background writer and restore the latest weights
        # onto the model — even when an epoch body (or a deferred background
        # checkpoint error re-raised by saver.save) propagates, so a failed
        # epoch-N write cannot also lose epoch N+1's trained params
        import sys
        exc_in_flight = sys.exc_info()[0] is not None
        if saver is not None:
            try:
                saver.close()
            except Exception:
                if exc_in_flight:   # don't mask the primary exception
                    logger.exception('background checkpoint writer failed')
                else:
                    model.set_weights(params, state)
                    # keep the 'opt' tree: a plain save() would replace the
                    # same-epoch manifest entry with weights-only trees and
                    # exact resume would silently start fresh
                    model.save(epoch = model.epochs, metric = None,
                               extra_trees = {'opt': _opt_leaves(opt_state)})
                    raise
        model.set_weights(params, state)
        if interrupted or exc_in_flight:
            try:
                model.save(epoch = model.epochs, metric = None,
                           extra_trees = {'opt': _opt_leaves(opt_state)})
            except Exception:
                if not exc_in_flight:
                    raise
                logger.exception('emergency save failed')   # keep primary exc
    return history


def _get_policy_name(precision):
    from .precision import get_policy
    return get_policy(precision).name


def _item_length(item):
    try:
        inputs = item[0] if isinstance(item, tuple) else item
        first = inputs[0] if isinstance(inputs, tuple) else inputs
        return len(first)
    except Exception:
        return 0
