"""Device mesh + sharding utilities (the distributed-communication layer).

The reference has no distributed backend (SURVEY.md §2.10); here scaling is
first-class and TPU-native: a `jax.sharding.Mesh` over ICI with
`NamedSharding` annotations — XLA inserts the collectives (psum for
data-parallel gradient reduction, all-gathers for tensor-parallel layers).

Axes convention:
  - ``dp``: data parallel — batches sharded on their leading axis;
  - ``tp``: tensor parallel — wide channel dims (e.g. WaveGlow WN channels,
    Tacotron encoder embedding) sharded across chips.
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)


def get_devices(platform = None, count = None):
    """Devices for `platform` ('tpu'/'cpu'/None=default backend)."""
    import jax
    devices = jax.devices(platform) if platform else jax.devices()
    if count is not None:
        if len(devices) < count:
            raise ValueError('Requested {} devices, have {}'.format(count, len(devices)))
        devices = devices[:count]
    return devices


def create_mesh(axes = None, *, devices = None, platform = None):
    """Build a Mesh from an axis spec.

    `axes`: dict like ``{'dp': 4, 'tp': 2}`` (use -1 for one axis to absorb
    the remaining devices), or None for pure DP over all devices.
    """
    from jax.sharding import Mesh

    if devices is None:
        devices = get_devices(platform)
    n = len(devices)

    if axes is None:
        axes = {'dp': n}
    axes = dict(axes)

    known = int(np.prod([v for v in axes.values() if v != -1]))
    for k, v in axes.items():
        if v == -1:
            axes[k] = n // known
    total = int(np.prod(list(axes.values())))
    if total != n:
        raise ValueError('Mesh {} does not cover {} devices'.format(axes, n))

    mesh_devices = np.asarray(devices).reshape(tuple(axes.values()))
    return Mesh(mesh_devices, tuple(axes.keys()))


def replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P())


def batch_sharding(mesh, axis = 'dp'):
    """Sharding for a batch leaf: leading axis over `axis`, rest replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh, axis = 'dp'):
    """device_put every leaf of `batch` with its leading axis sharded on
    `axis` (leaves whose leading dim doesn't divide — or meshes without
    the axis at all — stay replicated)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if axis not in mesh.shape:
        return jax.device_put(batch, replicated(mesh))
    n = mesh.shape[axis]

    def put(leaf):
        leaf = np.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] % n == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P(axis)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)


def pad_batch_to_devices(batch, mesh, axis = 'dp', multiple = None):
    """Pad the leading axis of every array leaf so it divides the dp size
    (repeating the last row) — keeps ragged final batches shardable.
    `multiple` overrides the divisor (e.g. dp x microbatches for the
    pipeline-parallel train step)."""
    import jax
    n = multiple if multiple is not None else mesh.shape.get(axis, 1)

    def pad(leaf):
        leaf = np.asarray(leaf)
        if leaf.ndim == 0 or leaf.shape[0] % n == 0:
            return leaf
        pad_n = n - leaf.shape[0] % n
        reps = np.repeat(leaf[-1:], pad_n, axis = 0)
        return np.concatenate([leaf, reps], axis = 0)

    return jax.tree_util.tree_map(pad, batch)


def shard_params(tree, mesh, specs = None):
    """device_put a param tree onto `mesh`: replicated by default, or per-leaf
    `PartitionSpec`s from a matching `specs` tree (tensor parallelism)."""
    import jax
    from jax.sharding import NamedSharding
    if specs is None:
        return jax.device_put(tree, replicated(mesh))
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        tree, specs,
    )


# -- tensor-parallel param shardings ------------------------------------------

def waveglow_param_specs(params, axis = 'tp'):
    """PartitionSpec tree for WaveGlow params: WN hidden channels sharded on
    `axis` (conv kernels (W, in, out): `in_conv` split on both hidden dims,
    pointwise cond/res_skip on their hidden side), everything else
    replicated.  XLA inserts the all-reduces at the block boundaries."""
    from jax.sharding import PartitionSpec as P
    import jax

    def spec_for(path, leaf):
        names = [getattr(p, 'key', str(p)) for p in path]
        name = '/'.join(names)
        if 'block' in name and leaf.ndim == 3:
            if 'start' in name:
                return P(None, None, axis)            # out = hidden
            if 'in_conv' in name:
                return P(None, axis, None)            # in = hidden (out = 2*hidden kept full)
            if 'cond_conv' in name:
                return P(None, None, None)
            if 'res_skip_conv' in name:
                return P(None, axis, None)
            if 'end' in name:
                return P(None, axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def moe_param_specs(params, axis = 'ep'):
    """PartitionSpec tree for a MoE transformer (`n_experts > 0`): every
    stacked expert tensor (leading expert axis) sharded over `axis`, all
    other leaves replicated.  Each device then computes only its local
    experts in the dense-eval einsums and XLA psum-reduces the combine —
    expert parallelism.  Compose with dp by sharding the batch."""
    from jax.sharding import PartitionSpec as P
    import jax

    def spec_for(path, leaf):
        names = [getattr(p, 'key', str(p)) for p in path]
        if 'experts' in names and leaf.ndim == 3:
            return P(axis, None, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def tacotron2_param_specs(params, axis = 'tp'):
    """PartitionSpec tree for Tacotron-2: the big decoder LSTM kernels and
    projection matmuls sharded on their output dim.

    SCOPE: this validates sharding propagation + collective insertion for
    the training dryrun (teacher-forced scan: the all-gather of ``h`` is
    amortized over the whole sequence matmul).  It is NOT a serving TP
    plan — autoregressive decode would all-gather ``h`` every sequential
    step, which ICI latency makes a net loss at Tacotron's dims.  The
    production multi-chip story is batch-DP here plus channel-TP on the
    FLOPs-dominant vocoder (`waveglow_param_specs`)."""
    from jax.sharding import PartitionSpec as P
    import jax

    def spec_for(path, leaf):
        name = '/'.join(getattr(p, 'key', str(p)) for p in path)
        if leaf.ndim == 2 and any(k in name for k in (
                'attention_rnn/kernel', 'attention_rnn/recurrent_kernel',
                'decoder_rnn', 'linear_projection/kernel')):
            return P(None, axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)
