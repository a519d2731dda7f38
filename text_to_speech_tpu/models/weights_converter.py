"""Cross-model / cross-framework weight transfer.

Capability parity with ``/root/reference/models/weights_converter.py``
(name normalization + pattern maps :48-84, layer-mapping inference
`find_layers_mapping:345`, `name_based_partial_transfer_learning:465` with
zero-padded widening via `PartialInitializer:21`, shape-based
`partial_transfer_learning:642`) — operating on JAX pytrees flattened to
``path -> array``.

The headline use-cases:
  - SV2TTS: inherit a single-speaker Tacotron-2's weights into a model whose
    decoder inputs are wider (speaker embedding concat) — the overlapping
    sub-tensor is copied, the new rows initialized per `fill_mode`;
  - importing external checkpoints (torch/TF state dicts) through
    `convert_state_dict` pattern maps.
"""

import re
import logging

import numpy as np

from ..train.checkpoint import flatten_tree, unflatten_tree

logger = logging.getLogger(__name__)


def _normalize_name(name):
    name = name.lower()
    name = re.sub(r'[._/]+', '/', name)
    name = re.sub(r'(^|/)(layer|block|cell|conv|flow)[_-]?(\d+)', r'\1\2_\3', name)
    return name


def _partial_fill(target, source, fill_mode = 'zeros', rng = None):
    """Copy the overlapping sub-tensor of `source` into a `target`-shaped
    array; the remainder is filled per `fill_mode`
    ('zeros' | 'ones' | 'normal' | 'keep')."""
    if fill_mode == 'keep':
        out = np.array(target)
    elif fill_mode == 'ones':
        out = np.ones_like(target)
    elif fill_mode == 'normal':
        rng = rng or np.random.RandomState(0)
        out = rng.normal(0., 0.02, np.shape(target)).astype(np.asarray(target).dtype)
    else:
        out = np.zeros_like(target)
    slices = tuple(
        slice(0, min(s, t)) for s, t in zip(np.shape(source), np.shape(target))
    )
    out[slices] = np.asarray(source)[slices]
    return out


def find_layers_mapping(source_flat, target_flat):
    """Map each target path to candidate source paths by normalized-name
    suffix matching, then disambiguate by shape."""
    norm_sources = {}
    for path in source_flat:
        norm_sources.setdefault(_normalize_name(path), []).append(path)

    mapping = {}
    for t_path in target_flat:
        t_norm = _normalize_name(t_path)
        candidates = norm_sources.get(t_norm, [])
        if not candidates:
            # suffix match (different root prefixes)
            candidates = [
                s for norm, paths in norm_sources.items()
                if norm.endswith(t_norm) or t_norm.endswith(norm)
                for s in paths
            ]
        if len(candidates) > 1:
            t_shape = np.shape(target_flat[t_path])
            exact = [c for c in candidates if np.shape(source_flat[c]) == t_shape]
            candidates = exact or candidates
        mapping[t_path] = candidates
    return mapping


def name_based_partial_transfer_learning(source_tree,
                                         target_tree,
                                         *,
                                         fill_mode = 'zeros',
                                         strict = False,
                                         verbose = True):
    """Transfer every matching-by-name weight from `source_tree` into a copy
    of `target_tree`.  Shape mismatches transfer the common sub-tensor and
    fill the rest (`fill_mode`).  Returns the new target tree (same treedef,
    numpy leaves promoted back to jax on first use)."""
    import jax.numpy as jnp

    source_flat = flatten_tree(source_tree)
    target_flat = flatten_tree(target_tree)
    mapping = find_layers_mapping(source_flat, target_flat)

    transferred, partial, missing = [], [], []
    new_flat = {}
    for t_path, t_value in target_flat.items():
        candidates = mapping.get(t_path, [])
        if not candidates:
            missing.append(t_path)
            new_flat[t_path] = t_value
            continue
        s_value = source_flat[candidates[0]]
        if np.shape(s_value) == np.shape(t_value):
            new_flat[t_path] = jnp.asarray(s_value)
            transferred.append(t_path)
        else:
            new_flat[t_path] = jnp.asarray(
                _partial_fill(np.asarray(t_value), np.asarray(s_value), fill_mode)
            )
            partial.append((t_path, np.shape(s_value), np.shape(t_value)))

    if verbose:
        logger.info(
            'weight transfer: %d exact, %d partial, %d unmatched',
            len(transferred), len(partial), len(missing)
        )
        for path, s_shape, t_shape in partial:
            logger.info('  partial %s: %s -> %s', path, s_shape, t_shape)
    if strict and missing:
        raise ValueError('Unmatched target weights: {}'.format(missing))
    return unflatten_tree(new_flat)


def partial_transfer_learning(source_tree, target_tree, ** kwargs):
    """Shape-based transfer: assign source leaves to target leaves in
    traversal order when shapes line up (for architectures with different
    naming but identical layout)."""
    import jax.numpy as jnp

    source_values = list(flatten_tree(source_tree).values())
    target_flat = flatten_tree(target_tree)

    new_flat, si = {}, 0
    for t_path, t_value in target_flat.items():
        placed = False
        for j in range(si, min(si + 3, len(source_values))):
            if np.shape(source_values[j]) == np.shape(t_value):
                new_flat[t_path] = jnp.asarray(source_values[j])
                si = j + 1
                placed = True
                break
        if not placed:
            new_flat[t_path] = t_value
    return unflatten_tree(new_flat)


def convert_state_dict(state_dict, pattern_map, *, transforms = None):
    """Rename an external ``name -> array`` dict into this framework's tree.

    `pattern_map`: ordered {regex: replacement} applied to every name.
    `transforms`: {regex: fn(array) -> array} (e.g. torch conv kernels
    (out, in, w) → (w, in, out) transposition).
    Unmatched names are dropped with a log line.
    """
    out = {}
    for name, value in state_dict.items():
        value = np.asarray(value)
        new_name = name
        for pattern, repl in pattern_map.items():
            new_name = re.sub(pattern, repl, new_name)
        if transforms:
            for pattern, fn in transforms.items():
                if re.search(pattern, name):
                    value = fn(value)
        if new_name == name and not any(re.search(p, name) for p in pattern_map):
            logger.debug('state_dict name unmapped: %s', name)
        out[new_name] = value
    return unflatten_tree(out)


# -- torch layout transforms ---------------------------------------------------

def torch_conv1d_kernel(value):
    """torch Conv1d weight (out, in, w) → (w, in, out)."""
    return np.transpose(value, (2, 1, 0))


def torch_dense_kernel(value):
    """torch Linear weight (out, in) → (in, out)."""
    return np.transpose(value, (1, 0))


def torch_lstm_kernel(value, units = None):
    """torch LSTM weight_ih (4u, in) with gate order i,f,g,o → (in, 4u)."""
    return np.transpose(value, (1, 0))
