"""Device mesh + sharding utilities (the distributed-communication layer).

The reference has no distributed backend (SURVEY.md §2.10); here scaling is
first-class and TPU-native: a `jax.sharding.Mesh` over ICI with
`NamedSharding` annotations — XLA inserts the collectives (psum for
data-parallel gradient reduction, all-gathers for tensor-parallel layers).

Axes convention:
  - ``dp``: data parallel — batches sharded on their leading axis;
  - ``tp``: tensor parallel — wide channel dims (e.g. WaveGlow WN channels,
    Tacotron encoder embedding) sharded across chips;
  - ``dcn``: data parallel across *slices* (multi-slice/multi-pod meshes,
    `create_hybrid_mesh`) — the outermost axis, carried by the data-center
    network; only per-step gradient all-reduces cross it.
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


def create_hybrid_mesh(ici_axes, dcn_axes = None, *, devices = None,
                       platform = None):
    """Mesh spanning multiple TPU slices (multi-slice / multi-pod).

    ``dcn_axes`` are laid out ACROSS slices — collectives over them ride the
    data-center network — and come first in the mesh so they are the
    outermost (least frequent) communication.  ``ici_axes`` are laid out
    WITHIN a slice and ride ICI.  The standard training recipe is
    ``create_hybrid_mesh({'dp': d, 'tp': t}, {'dcn': n_slices})``: tp
    collectives stay on ICI, and only the per-step gradient all-reduce
    crosses DCN (shard batches over ``('dcn', 'dp')`` — see `shard_batch`).

    On real multi-slice hardware devices are grouped by their
    ``slice_index`` attribute so ICI axes never straddle a slice boundary;
    devices without one (single slice, CPU/virtual meshes) fall back to
    contiguous equal blocks — the same mesh topology, which is how tests
    and the driver dryrun exercise this path.
    """
    from jax.sharding import Mesh

    if devices is None:
        devices = get_devices(platform)
    dcn = dict(dcn_axes) if dcn_axes else {'dcn': 1}
    ici = dict(ici_axes)
    overlap = set(dcn) & set(ici)
    if overlap:
        raise ValueError('axes {} appear in both dcn and ici'.format(overlap))

    n_slices = int(np.prod(list(dcn.values())))
    per_slice = int(np.prod(list(ici.values())))
    if n_slices * per_slice != len(devices):
        raise ValueError(
            'hybrid mesh dcn={} x ici={} does not cover {} devices'.format(
                dcn, ici, len(devices)))

    slice_ids = [getattr(d, 'slice_index', None) for d in devices]
    if all(s is not None for s in slice_ids):
        if len(set(slice_ids)) != n_slices:
            raise ValueError(
                'devices span {} slices but dcn axes request {}'.format(
                    len(set(slice_ids)), n_slices))
        devices = sorted(devices, key = lambda d: (d.slice_index, d.id))
        counts = {s: slice_ids.count(s) for s in set(slice_ids)}
        if set(counts.values()) != {per_slice}:
            raise ValueError(
                'uneven devices per slice {} vs ici size {}'.format(
                    counts, per_slice))

    mesh_devices = np.asarray(devices).reshape(
        tuple(dcn.values()) + tuple(ici.values()))
    return Mesh(mesh_devices, tuple(dcn.keys()) + tuple(ici.keys()))


def data_axes(mesh, candidates = ('dcn', 'dp')):
    """The mesh's data-parallel axes (outermost first) — the tuple to shard
    batch leading dims over: ('dcn', 'dp') on a hybrid mesh, ('dp',) on a
    single-slice mesh."""
    return tuple(a for a in candidates if a in mesh.shape)


def replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P())


def batch_sharding(mesh, axis = 'dp'):
    """Sharding for a batch leaf: leading axis over `axis` (a name or a
    tuple of names, e.g. ('dcn', 'dp') on hybrid meshes), rest replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    if isinstance(axis, (tuple, list)):
        axis = tuple(axis)
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh, axis = 'dp'):
    """device_put every leaf of `batch` with its leading axis sharded on
    `axis` — a name or tuple of names; names the mesh lacks are dropped
    (leaves whose leading dim doesn't divide, or meshes with none of the
    axes, stay replicated)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(axis) if isinstance(axis, (tuple, list)) else (axis,)
    axes = tuple(a for a in axes if a in mesh.shape)
    if not axes:
        return jax.device_put(batch, replicated(mesh))
    n = int(np.prod([mesh.shape[a] for a in axes]))
    spec = P(axes if len(axes) > 1 else axes[0])

    def put(leaf):
        leaf = np.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] % n == 0:
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)


def pad_batch_to_devices(batch, mesh, axis = 'dp', multiple = None):
    """Pad the leading axis of every array leaf so it divides the dp size
    (repeating the last row) — keeps ragged final batches shardable.
    `multiple` overrides the divisor (e.g. dp x microbatches for the
    pipeline-parallel train step)."""
    import jax
    if multiple is not None:
        n = multiple
    else:
        axes = tuple(axis) if isinstance(axis, (tuple, list)) else (axis,)
        n = int(np.prod([mesh.shape.get(a, 1) for a in axes]))

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


def fastspeech2_param_specs(params, axis = 'tp'):
    """PartitionSpec tree for FastSpeech-2 (or any FFT-block transformer
    built on `init_mha` + conv FFN): Megatron-style tensor parallelism —
    QKV projections and FFN conv1 sharded on their output (head / hidden)
    dim, attention output and FFN conv2 sharded on their input dim, so each
    block needs exactly one all-reduce per sub-layer.  Variance predictors /
    embeddings / norms are replicated (tiny)."""
    from jax.sharding import PartitionSpec as P
    import jax

    def spec_for(path, leaf):
        names = [getattr(p, 'key', str(p)) for p in path]
        name = '/'.join(names)
        if 'layer_' not in name:
            return P()
        if leaf.ndim == 2:                       # dense kernels (in, out)
            if any(k in name for k in ('query/', 'key/', 'value/')):
                return P(None, axis)
            if 'output/' in name:
                return P(axis, None)
        if leaf.ndim == 3:                       # conv kernels (W, in, out)
            if 'conv1' in name:
                return P(None, None, axis)
            if 'conv2' in name:
                return P(None, axis, None)
        if leaf.ndim == 1 and any(k in name for k in
                                  ('query/', 'key/', 'value/', 'conv1')):
            return P(axis)                       # biases on the sharded dim
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def vits_param_specs(params, axis = 'tp'):
    """PartitionSpec tree for VITS: Megatron-style TP on the text-encoder
    FFT blocks (QKV/conv1 on output, output/conv2 on input — one all-reduce
    per sub-layer), channel-TP on the posterior/flow WaveNet stacks
    (`in_conv` hidden in-dim, `res_skip_conv` hidden in-dim, like
    `waveglow_param_specs`), and the HiFi-GAN decoder's widest convs
    (`conv_pre` out, first upsample stage in) on `axis`.  Small leaves
    (norms, embeddings, duration predictor, projections) replicate."""
    from jax.sharding import PartitionSpec as P
    import jax

    def spec_for(path, leaf):
        names = [getattr(p, 'key', str(p)) for p in path]
        name = '/'.join(names)
        if 'text_encoder/' in name:
            if leaf.ndim == 2:
                if any(k in name for k in ('query/', 'key/', 'value/')):
                    return P(None, axis)
                if 'output/' in name:
                    return P(axis, None)
            if leaf.ndim == 3:
                if 'conv1' in name:
                    return P(None, None, axis)
                if 'conv2' in name:
                    return P(None, axis, None)
            if leaf.ndim == 1 and any(k in name for k in
                                      ('query/', 'key/', 'value/', 'conv1')):
                return P(axis)
        if '/wn/' in name and leaf.ndim == 3:
            if 'in_conv' in name:
                return P(None, axis, None)
            if 'res_skip_conv' in name:
                return P(None, axis, None)
        if 'generator/' in name and leaf.ndim == 3:
            if 'conv_pre' in name:
                return P(None, None, axis)
            if 'up0/up' in name:
                return P(None, axis, None)
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
