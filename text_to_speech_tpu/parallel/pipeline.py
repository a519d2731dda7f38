"""Pipeline-parallel WaveGlow training (GPipe schedule on a TPU mesh).

The reference has no model parallelism of any kind (SURVEY.md §2.10); this
module adds the TPU-native pipeline axis: WaveGlow's flow stack is a chain
of uniform-cost stages, which maps directly onto a ``pp`` mesh axis with a
GPipe microbatch schedule:

  - the 12 flows are partitioned into ``n_stages`` contiguous segments;
  - each device runs ONE stage; activations travel stage→stage over ICI
    via `lax.ppermute` (XLA lowers this to the ring's native collective);
  - microbatches stream through the ring: at tick ``t`` stage ``s``
    processes microbatch ``t - s`` (the classic GPipe fill/drain bubble of
    ``n_stages - 1`` ticks);
  - the whole schedule is ONE `lax.scan` inside ONE `jax.shard_map` —
    a single compiled program, differentiable end-to-end (the transpose of
    `ppermute` is the reverse permutation, so `jax.grad` of the pipelined
    loss yields exact gradients, automatically psum-reduced over stages).

Early outputs (the WaveGlow z-splits every ``n_early_every`` flows) would
make per-stage activation shapes ragged, so the carried activation is the
FULL ``(micro_batch, Lg, n_group)`` group buffer: channels frozen by an
early output simply stop being touched — at the last stage the buffer IS
``z`` (frozen channels in front, final channels behind), and the NLL needs
only ``sum(z²)``, the accumulated ``log_s`` and the accumulated 1x1-conv
log-determinants, all of which ride along in the carry.

Per-stage programs differ (different flows, different active widths), so
the stage body is a `lax.switch` over `lax.axis_index('pp')` — all stages
are compiled once into the single SPMD program, each device executes its
own branch.

Params are passed replicated: WaveGlow's ~90 MB of weights are not the
scaling constraint (activations are), and replication keeps the per-flow
pytrees — whose shapes differ across early-output groups — out of the
stacked-leading-axis layout pipeline sharding would force.  An optional
``dp`` mesh axis shards each microbatch's leading dim: the stage math is
batch-parallel, so data parallelism composes transparently (gradient
psum over ``dp`` falls out of the shard_map transpose).

No reference counterpart exists; capability extension per SURVEY.md §2.10.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ['stage_bounds', 'WaveGlowPipeline']


def stage_bounds(n_flows, n_stages):
    """Contiguous, near-equal partition of ``range(n_flows)`` into stages:
    [b_0=0, b_1, ..., b_S=n_flows]."""
    if not 1 <= n_stages <= n_flows:
        raise ValueError('need 1 <= n_stages ({}) <= n_flows ({})'.format(
            n_stages, n_flows))
    base, extra = divmod(n_flows, n_stages)
    bounds = [0]
    for s in range(n_stages):
        bounds.append(bounds[-1] + base + (1 if s < extra else 0))
    return bounds


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b)


class WaveGlowPipeline:
    """Pipelined NLL for a `models.waveglow_arch.WaveGlow` over a mesh.

    ``mesh`` must carry the ``axis`` ('pp') dimension; an optional
    ``dp_axis`` present in the mesh shards microbatch rows.  ``n_micro``
    microbatches must divide the global batch; for a reasonable bubble use
    ``n_micro >= 2 * n_stages``.
    """

    def __init__(self, arch, mesh, *, axis = 'pp', dp_axis = None,
                 n_micro = None):
        self.arch = arch
        self.mesh = mesh
        self.axis = axis
        self.dp_axis = dp_axis if dp_axis in mesh.shape else None
        self.n_stages = mesh.shape[axis]
        self.n_micro = n_micro if n_micro is not None else 2 * self.n_stages
        self.bounds = stage_bounds(arch.hp.n_flows, self.n_stages)

    # -- stage programs --------------------------------------------------------

    def _make_stage_fn(self, params, lo, hi):
        """Flows [lo, hi) applied to the carried full-group buffer."""
        arch = self.arch
        n_group = arch.hp.n_group

        def stage(carry):
            buffer, spect, log_s, logdet = carry
            rows = buffer.shape[0] * buffer.shape[1]        # Bm * Lg
            for k in range(lo, hi):
                c = arch.flow_channels[k]
                off = n_group - c
                flow = params['flow_{}'.format(k)]
                active = buffer[..., off:]
                w = flow['convinv']['kernel']
                active = active @ w
                _, ld = jnp.linalg.slogdet(w)
                n_half = c // 2
                a0, a1 = active[..., :n_half], active[..., n_half:]
                # under the mixed policy spect (and the flow params) are
                # bf16: cast the WN operand at the boundary, keep the
                # audio stream + log-likelihood sums float32 — the same
                # islands as `waveglow_arch.forward`
                wn_out = arch.wn_block(flow['block'], a0.astype(spect.dtype),
                                       spect, fused = False)
                b, s = wn_out[..., :n_half], wn_out[..., n_half:]
                s = s.astype(jnp.float32)
                a1 = jnp.exp(s) * a1 + b.astype(jnp.float32)
                active = jnp.concatenate([a0, a1], axis = -1)
                buffer = jnp.concatenate([buffer[..., :off], active], axis = -1)
                log_s = log_s + jnp.sum(s)
                logdet = logdet + rows * ld
            return (buffer, spect, log_s, logdet)

        return stage

    # -- pipelined loss --------------------------------------------------------

    def loss(self, params, mel, audio, sigma = None, *, compute_dtype = None):
        """Global-batch WaveGlow NLL (per element), numerically equal to
        `arch.loss` up to summation order; differentiable (use under
        `jax.value_and_grad` for the train step).  ``compute_dtype`` is the
        mixed-precision training hook (bf16 WN matmuls, f32 masters/sums —
        see `waveglow_arch.forward`)."""
        arch, hp = self.arch, self.arch.hp
        if sigma is None: sigma = hp.sigma
        if compute_dtype is not None and \
                jnp.dtype(compute_dtype) != jnp.dtype(jnp.float32):
            from ..train.precision import cast_floating
            params = cast_floating(params, compute_dtype,
                                   exempt = ('convinv',))
            mel = mel.astype(compute_dtype)
        n_micro, n_stages, axis = self.n_micro, self.n_stages, self.axis

        B = audio.shape[0]
        if B % n_micro != 0:
            raise ValueError('batch {} not divisible into {} microbatches'
                             .format(B, n_micro))
        bm = B // n_micro

        # conditioning + group reshape for every microbatch, outside the
        # pipeline (tiny convs, batch-parallel; XLA shards them over dp)
        spect = arch.upsample_mel(params, mel)              # (B, Lg, Cc)
        lg = spect.shape[1]
        audio = audio[:, : lg * hp.n_group]
        buffers = audio.reshape(B, lg, hp.n_group)
        mb_buffers = buffers.reshape(n_micro, bm, lg, hp.n_group)
        mb_spect = spect.reshape(n_micro, bm, lg, spect.shape[-1])

        n_ticks = n_micro + n_stages - 1
        n_elems = B * lg * hp.n_group
        inv_2s2 = 1. / (2. * sigma * sigma)

        from jax.sharding import PartitionSpec as P
        dp = self.dp_axis
        mb_spec = P(None, dp)                   # microbatch rows over dp

        def pipelined(params, mb_buffers, mb_spect):
            stage = lax.axis_index(axis)
            stage_fns = [
                self._make_stage_fn(params, self.bounds[s], self.bounds[s + 1])
                for s in range(n_stages)
            ]

            carry0 = (
                jnp.zeros_like(mb_buffers[0]),
                jnp.zeros_like(mb_spect[0]),
                jnp.zeros(()), jnp.zeros(()),
            )

            def tick(state, t):
                carry, loss_acc = state
                m = jnp.clip(t, 0, n_micro - 1)
                fresh = (
                    lax.dynamic_index_in_dim(mb_buffers, m, keepdims = False),
                    lax.dynamic_index_in_dim(mb_spect, m, keepdims = False),
                    jnp.zeros(()), jnp.zeros(()),
                )
                carry_in = _tree_where(stage == 0, fresh, carry)
                out = lax.switch(stage, stage_fns, carry_in)

                buffer, _, log_s, logdet = out
                # microbatch t-(n_stages-1) completes on the last stage
                valid = (stage == n_stages - 1) & (t >= n_stages - 1)
                nll = jnp.sum(buffer.astype(jnp.float32) ** 2) * inv_2s2 \
                    - log_s - logdet
                loss_acc = loss_acc + jnp.where(valid, nll, 0.)

                perm = [(i, i + 1) for i in range(n_stages - 1)]
                carry = jax.tree_util.tree_map(
                    lambda x: lax.ppermute(x, axis, perm), out)
                return (carry, loss_acc), None

            (carry, loss_acc), _ = lax.scan(
                tick, (carry0, jnp.zeros(())), jnp.arange(n_ticks))

            # only the last stage holds the sum; psum broadcasts it (and, with
            # a dp axis, completes the cross-shard batch sum)
            axes = (axis,) + ((dp,) if dp else ())
            return lax.psum(loss_acc, axes)

        shard = jax.shard_map(
            pipelined,
            mesh = self.mesh,
            in_specs = (P(), mb_spec, mb_spec),
            out_specs = P(),
            check_vma = False,      # stage-indexed switch is intentionally
        )                           # non-replicated across 'pp'
        return shard(params, mb_buffers, mb_spect) / n_elems

    def train_step(self, tx):
        """(params, opt_state, mel, audio) -> (params, opt_state, loss)
        using optimizer ``tx`` (optax); jit with donate_argnums=(0, 1)."""
        import optax

        def step(params, opt_state, mel, audio):
            loss, grads = jax.value_and_grad(self.loss)(params, mel, audio)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step
