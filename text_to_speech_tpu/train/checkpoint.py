"""Rotating pytree checkpoints with a JSON manifest.

Capability parity with
``/root/reference/custom_train_objects/checkpoint_manager.py:28,148,169``
(`max_to_keep` rotation, best-checkpoint tracking, save/load/delete by epoch)
— re-designed for JAX pytrees: parameter trees are flattened to
``path -> array`` and stored as ``.npz`` (host-side, framework-free), so the
same files feed the name-based weights converter.
"""

import os
import logging

import numpy as np

from ..utils.file_utils import load_json, dump_json

logger = logging.getLogger(__name__)


# -- pytree <-> flat dict -----------------------------------------------------

def flatten_tree(tree, prefix = '', sep = '/'):
    """Nested dicts of arrays → flat {'a/b/c': array}."""
    flat = {}
    for key, value in tree.items():
        path = '{}{}{}'.format(prefix, sep if prefix else '', key)
        if isinstance(value, dict):
            flat.update(flatten_tree(value, path, sep))
        else:
            flat[path] = value
    return flat


def unflatten_tree(flat, sep = '/'):
    tree = {}
    for path, value in flat.items():
        parts = path.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def _to_host(value, retries = 3):
    """Device→host fetch with retry: bulk transfers through the axon TPU
    tunnel intermittently fail with FAILED_PRECONDITION; a retry (after a
    short pause) reliably recovers."""
    for attempt in range(retries):
        try:
            return np.asarray(value)
        except Exception:
            if attempt == retries - 1:
                raise
            import time
            time.sleep(0.5 * (attempt + 1))


def save_tree(filename, tree):
    flat = {k: _to_host(v) for k, v in flatten_tree(tree).items()}
    d = os.path.dirname(filename)
    if d: os.makedirs(d, exist_ok = True)
    np.savez(filename, ** flat)
    return filename


def load_tree(filename, as_jax = False):
    with np.load(filename) as data:
        flat = {k: data[k] for k in data.files}
    if as_jax:
        import jax.numpy as jnp
        flat = {k: jnp.asarray(v) for k, v in flat.items()}
    return unflatten_tree(flat)


# -- async writer ---------------------------------------------------------------

class AsyncCheckpointSaver:
    """Non-blocking checkpoint writes over a :class:`CheckpointManager`.

    ``save()`` snapshots the (immutable) device arrays, starts the
    device→host transfers immediately (``copy_to_host_async``) and defers the
    ``.npz`` write + manifest rotation to a single background thread, so the
    training loop keeps dispatching while the previous epoch's checkpoint
    drains to disk — the TPU-native analog of orbax's async checkpointing
    (the reference blocks the loop for the full save at
    ``/root/reference/custom_train_objects/checkpoint_manager.py:148``).

    At most one save is in flight: a new ``save()`` (and
    ``wait_until_finished``) first joins the previous one, re-raising any
    background error there.
    """

    def __init__(self, manager):
        import concurrent.futures
        self.manager = manager
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers = 1, thread_name_prefix = 'ckpt-writer')
        self._future = None

    def save(self, trees, epoch, *, metric = None, is_best = None):
        self.wait_until_finished()
        snap = {}
        for name, tree in trees.items():
            leaves = {}
            for k, v in flatten_tree(tree).items():
                if hasattr(v, 'copy_to_host_async'):
                    # device-side copy first: the caller's buffer is typically
                    # DONATED to the next train step, which deletes it before
                    # the background fetch runs; the copy is ours alone
                    import jax.numpy as jnp
                    v = jnp.copy(v)
                    try:
                        v.copy_to_host_async()
                    except Exception:
                        pass    # harmless: fetched synchronously in _write
                leaves[k] = v
            snap[name] = leaves
        self._future = self._pool.submit(self._write, snap, epoch, metric, is_best)

    def _write(self, flat, epoch, metric, is_best):
        host = {
            name: unflatten_tree({k: _to_host(v) for k, v in leaves.items()})
            for name, leaves in flat.items()
        }
        return self.manager.save(host, epoch, metric = metric, is_best = is_best)

    def wait_until_finished(self):
        """Barrier: join the in-flight save (if any) and surface its error."""
        future, self._future = self._future, None
        if future is not None:
            return future.result()

    def close(self):
        self.wait_until_finished()
        self._pool.shutdown(wait = True)


# -- manager ------------------------------------------------------------------

class CheckpointManager:
    """Directory layout::

        <directory>/checkpoint.json          # manifest
        <directory>/ckpt-<epoch>.npz         # one file per saved tree

    Multiple named trees per step (params + state + optimizer) are stored as
    ``ckpt-<epoch>.<tree>.npz``.
    """

    MANIFEST = 'checkpoint.json'

    def __init__(self, directory, max_to_keep = 3):
        self.directory = directory
        self.max_to_keep = max_to_keep
        os.makedirs(directory, exist_ok = True)
        self._manifest = load_json(
            os.path.join(directory, self.MANIFEST),
            default = {'checkpoints': [], 'best': None},
        )

    # -- queries ---------------------------------------------------------------

    @property
    def checkpoints(self):
        return list(self._manifest['checkpoints'])

    @property
    def latest_epoch(self):
        cks = self._manifest['checkpoints']
        return cks[-1]['epoch'] if cks else None

    @property
    def best_epoch(self):
        best = self._manifest.get('best')
        return best['epoch'] if best else None

    def _path(self, epoch, tree_name):
        return os.path.join(self.directory, 'ckpt-{}.{}.npz'.format(epoch, tree_name))

    # -- save / load -----------------------------------------------------------

    def save(self, trees, epoch, *, metric = None, is_best = None):
        """`trees` = {'params': tree, 'state': tree, ...}; rotates old
        checkpoints beyond `max_to_keep` (the best one is never deleted)."""
        entry = {'epoch': epoch, 'trees': sorted(trees), 'metric': metric}
        for name, tree in trees.items():
            save_tree(self._path(epoch, name), tree)

        self._manifest['checkpoints'] = [
            c for c in self._manifest['checkpoints'] if c['epoch'] != epoch
        ] + [entry]

        best = self._manifest.get('best')
        if is_best is None and metric is not None:
            is_best = best is None or (best.get('metric') is None) or metric < best['metric']
        if is_best:
            self._manifest['best'] = dict(entry)

        # rotation
        keep_epochs = {c['epoch'] for c in self._manifest['checkpoints'][-self.max_to_keep:]}
        if self._manifest.get('best'):
            keep_epochs.add(self._manifest['best']['epoch'])
        for ck in list(self._manifest['checkpoints']):
            if ck['epoch'] not in keep_epochs:
                self.delete(ck['epoch'])

        self._save_manifest()
        return entry

    def load(self, epoch = None, *, best = False, as_jax = False, trees = None):
        """Load {'params': tree, ...} for `epoch` (default: latest, or best).

        `trees` optionally restricts which named trees are read — e.g.
        inference restores only ('params', 'state') and skips the 'opt'
        tree (Adam moments, ~2x the params bytes) that `fit()` saves."""
        if best:
            epoch = self.best_epoch
        if epoch is None:
            epoch = self.latest_epoch
        if epoch is None:
            return None
        entry = next((c for c in self._manifest['checkpoints'] if c['epoch'] == epoch), None)
        if entry is None:
            raise ValueError('No checkpoint for epoch {} (have: {})'.format(
                epoch, [c['epoch'] for c in self._manifest['checkpoints']]
            ))
        return {
            name: load_tree(self._path(epoch, name), as_jax = as_jax)
            for name in entry['trees']
            if trees is None or name in trees
        }

    def delete(self, epoch):
        entry = next((c for c in self._manifest['checkpoints'] if c['epoch'] == epoch), None)
        if entry is None: return
        for name in entry['trees']:
            path = self._path(epoch, name)
            if os.path.exists(path): os.remove(path)
        self._manifest['checkpoints'] = [
            c for c in self._manifest['checkpoints'] if c['epoch'] != epoch
        ]
        self._save_manifest()

    def _save_manifest(self):
        self._manifest['checkpoints'].sort(key = lambda c: c['epoch'])
        dump_json(os.path.join(self.directory, self.MANIFEST), self._manifest, indent = 2)
