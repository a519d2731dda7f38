"""Optimizer + LR-schedule factories on optax.

Capability parity with ``/root/reference/custom_train_objects/optimizers/``
(name registry ``__init__.py:35,55``; schedulers `DivideByStep:40`,
`ReduceEvery:53`, `WarmupScheduler:72`, `SinScheduler`, `TanhDecayScheduler`
``lr_schedulers.py``).
"""

import math

import optax

_SCHEDULERS = {}
_OPTIMIZERS = {}


def register_scheduler(name):
    def deco(fn):
        _SCHEDULERS[name.lower()] = fn
        return fn
    return deco


@register_scheduler('DivideByStep')
def divide_by_step(maxval = 1e-3, minval = 1e-6, factor = 1., ** kwargs):
    def schedule(step):
        import jax.numpy as jnp
        return jnp.maximum(maxval / (1. + factor * step), minval)
    return schedule


@register_scheduler('ReduceEvery')
def reduce_every(lr = 1e-3, every = 1000, factor = 0.5, minval = 1e-6, ** kwargs):
    def schedule(step):
        import jax.numpy as jnp
        return jnp.maximum(lr * factor ** (step // every), minval)
    return schedule


@register_scheduler('WarmupScheduler')
def warmup_scheduler(factor = 1., warmup_steps = 4000, dim = 512, ** kwargs):
    """Transformer schedule: dim^-0.5 * min(step^-0.5, step * warmup^-1.5)."""
    def schedule(step):
        import jax.numpy as jnp
        step = jnp.maximum(step.astype(jnp.float32) if hasattr(step, 'astype') else float(step), 1.)
        return factor * dim ** -0.5 * jnp.minimum(step ** -0.5, step * warmup_steps ** -1.5)
    return schedule


@register_scheduler('SinScheduler')
def sin_scheduler(maxval = 1e-3, minval = 1e-5, period = 1000, ** kwargs):
    def schedule(step):
        import jax.numpy as jnp
        phase = jnp.sin(2. * math.pi * step / period)
        return minval + (maxval - minval) * 0.5 * (1. + phase)
    return schedule


@register_scheduler('TanhDecayScheduler')
def tanh_decay_scheduler(maxval = 1e-3, minval = 1e-5, decay_steps = 10000, ** kwargs):
    def schedule(step):
        import jax.numpy as jnp
        frac = jnp.tanh(2. * step / decay_steps)
        return maxval - (maxval - minval) * frac
    return schedule


def get_scheduler(scheduler, ** kwargs):
    if callable(scheduler): return scheduler
    if isinstance(scheduler, dict):
        kwargs = {** scheduler, ** kwargs}
        scheduler = kwargs.pop('name', None) or kwargs.pop('class_name')
    key = scheduler.lower()
    if key not in _SCHEDULERS:
        raise ValueError('Unknown scheduler {!r} (known: {})'.format(
            scheduler, sorted(_SCHEDULERS)))
    return _SCHEDULERS[key](** kwargs)


def register_optimizer(name):
    def deco(fn):
        _OPTIMIZERS[name.lower()] = fn
        return fn
    return deco


for _name in ('adam', 'adamw', 'sgd', 'rmsprop', 'adagrad', 'adafactor', 'lion'):
    def _make(name):
        def build(learning_rate = 1e-3, ** kwargs):
            return getattr(optax, name)(learning_rate = learning_rate, ** kwargs)
        return build
    _OPTIMIZERS[_name] = _make(_name)


def get_optimizer(optimizer = 'adam', *, lr = None, learning_rate = None,
                  lr_scheduler = None, clip_norm = None, weight_decay = None,
                  ** kwargs):
    """Build an optax GradientTransformation from a name/config.

    `lr_scheduler` may be a schedule name/config/callable; `clip_norm` adds
    global-norm clipping; `weight_decay` adds decoupled decay.
    """
    if isinstance(optimizer, optax.GradientTransformation):
        return optimizer
    if isinstance(optimizer, dict):
        kwargs = {** optimizer, ** kwargs}
        optimizer = kwargs.pop('name', kwargs.pop('class_name', 'adam'))

    learning_rate = learning_rate if learning_rate is not None else (lr or 1e-3)
    if lr_scheduler is not None:
        learning_rate = get_scheduler(lr_scheduler)

    key = optimizer.lower()
    if key not in _OPTIMIZERS:
        raise ValueError('Unknown optimizer {!r} (known: {})'.format(
            optimizer, sorted(_OPTIMIZERS)))
    if key == 'adamw' and weight_decay is not None:
        kwargs['weight_decay'] = weight_decay
        weight_decay = None

    tx = _OPTIMIZERS[key](learning_rate = learning_rate, ** kwargs)

    chain = []
    if clip_norm:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(tx)
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    return optax.chain(* chain) if len(chain) > 1 else tx


def list_optimizers():
    return sorted(_OPTIMIZERS)


def list_schedulers():
    return sorted(_SCHEDULERS)
