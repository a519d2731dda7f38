"""Speaker-embedding storage and selection.

Capability parity with ``/root/reference/utils/embeddings.py``
(`save_embeddings:119`/`load_embeddings:77` over npy/npz/csv/pkl/h5 dataframes,
`select_embedding:249` with random/mean/label modes, `compute_centroids:289`).
Embeddings are stored as a table: ``{'embedding': (N, D) array, ...metadata
columns (e.g. 'id'/'speaker': (N,) lists)}``.
"""

import os
import logging

import numpy as np

from .distances import distance

logger = logging.getLogger(__name__)


def embeddings_to_np(embeddings, col = 'embedding', dtype = np.float32):
    """Coerce embeddings to a (N, D) float array.

    Accepts: arrays, lists, our table dicts, DataFrames (`col` column),
    string representations ('[1, 2]' / '[[...], [...]]' csv cells), or a
    file path readable by `load_embeddings` (reference
    ``utils/embeddings.py:30``)."""
    if isinstance(embeddings, str):
        text = embeddings.strip()
        if text.startswith('[['):
            rows = [r.strip(' ,') for r in text[1:-1].split(']')]
            return np.stack([embeddings_to_np(r + ']', dtype = dtype)
                             for r in rows if r])
        if text.startswith('['):
            sep = ',' if ',' in text else None
            values = [v for v in text[1:-1].split(sep) if v.strip()]
            return np.array([float(v) for v in values], dtype)
        if os.path.isfile(embeddings):
            return embeddings_to_np(load_embeddings(embeddings),
                                    col = col, dtype = dtype)
        raise ValueError('invalid embedding string {!r}'.format(embeddings[:50]))
    if isinstance(embeddings, dict):
        return np.asarray(embeddings[col], dtype)
    if hasattr(embeddings, 'columns'):                  # DataFrame
        return np.stack([embeddings_to_np(e, dtype = dtype)
                         for e in embeddings[col].values])
    return np.atleast_2d(np.asarray(embeddings, dtype))


def aggregate_embeddings(table, column = 'id', embedding_col = 'embedding',
                         aggregation_name = 'speaker_embedding', mode = 'mean'):
    """Group the table's embeddings by `column` and aggregate per group
    (mode: 'mean'/'sum'/callable) → each row gains `aggregation_name` with
    its group's aggregate (reference ``utils/embeddings.py:214``)."""
    emb = embeddings_to_np(table, col = embedding_col)
    if hasattr(table, 'columns'):
        keys = table[column].values.tolist()
    else:
        keys = list(table[column])
    agg_fn = mode if callable(mode) else {
        'mean': lambda x: x.mean(0), 'sum': lambda x: x.sum(0)}[mode]
    groups = {}
    for i, k in enumerate(keys):
        groups.setdefault(k, []).append(i)
    per_key = {k: agg_fn(emb[idx]) for k, idx in groups.items()}
    aggregated = np.stack([per_key[k] for k in keys])
    if hasattr(table, 'columns'):
        table = table.copy()
        table[aggregation_name] = list(aggregated)
        return table
    return {** table, aggregation_name: aggregated}


def get_embeddings_with_ids(embeddings, assignment, ids):
    """Subset `(embeddings, assignment)` to rows whose assignment is in
    `ids` (reference ``utils/embeddings.py:325``).

    Host-side only: the output size is data-dependent, which XLA cannot
    express — inside `jit`, compute `jnp.isin(assignment, ids)` yourself
    and keep static shapes with `jnp.where` / segment ops instead."""
    if any(hasattr(a, 'aval') for a in (embeddings, assignment)):
        raise TypeError(
            'get_embeddings_with_ids produces data-dependent shapes and '
            'cannot run under jit; use jnp.isin + jnp.where inside traced code')
    embeddings, assignment = np.asarray(embeddings), np.asarray(assignment)
    mask = np.isin(assignment, np.asarray(ids))
    return embeddings[mask], assignment[mask]


def save_embeddings(filename, embeddings, ** metadata):
    """Save an (N, D) array (+ aligned metadata columns) to .npz/.npy/.csv/.pkl/.h5."""
    embeddings = np.asarray(embeddings)
    ext = os.path.splitext(filename)[1].lower()
    d = os.path.dirname(filename)
    if d: os.makedirs(d, exist_ok = True)

    if ext == '.npy' and not metadata:
        np.save(filename, embeddings)
    elif ext in ('.npz', '.npy'):
        if ext == '.npy': filename = filename[:-4] + '.npz'
        np.savez(filename, embedding = embeddings,
                 ** {k: np.asarray(v) for k, v in metadata.items()})
    elif ext == '.csv':
        import pandas as pd
        df = pd.DataFrame({
            'embedding': [' '.join(map(str, e)) for e in embeddings], ** metadata
        })
        df.to_csv(filename, index = False)
    elif ext in ('.pkl', '.pickle'):
        import pickle
        with open(filename, 'wb') as f:
            pickle.dump({'embedding': embeddings, ** metadata}, f)
    elif ext in ('.h5', '.hdf5'):
        from .file_utils import dump_data
        dump_data(filename, {
            'embedding': embeddings,
            ** {k: _h5_column(v) for k, v in metadata.items()},
        })
    else:
        raise ValueError('Unsupported embeddings format: {}'.format(ext))
    return filename


def _h5_column(values):
    arr = np.asarray(values)
    # h5py cannot store unicode object arrays directly; utf-8 byte strings can
    if arr.dtype.kind in ('U', 'O'):
        arr = np.asarray([str(v).encode('utf-8') for v in values])
    return arr


def load_embeddings(filename):
    """Load embeddings saved by `save_embeddings`; returns
    {'embedding': (N, D), ...metadata}."""
    ext = os.path.splitext(filename)[1].lower()
    if not os.path.exists(filename) and ext == '.npy' and os.path.exists(filename[:-4] + '.npz'):
        filename, ext = filename[:-4] + '.npz', '.npz'

    if ext == '.npy':
        return {'embedding': np.load(filename)}
    if ext == '.npz':
        with np.load(filename, allow_pickle = True) as data:
            return {k: data[k] for k in data.files}
    if ext == '.csv':
        import pandas as pd
        df = pd.read_csv(filename)
        out = {
            'embedding': np.stack([
                np.fromstring(e, sep = ' ') for e in df['embedding']
            ]).astype(np.float32)
        }
        for col in df.columns:
            if col != 'embedding': out[col] = df[col].to_numpy()
        return out
    if ext in ('.pkl', '.pickle'):
        import pickle
        with open(filename, 'rb') as f:
            return pickle.load(f)
    if ext in ('.h5', '.hdf5'):
        from .file_utils import load_data
        out = load_data(filename)
        for key, value in out.items():
            if isinstance(value, np.ndarray) and value.dtype.kind == 'S':
                out[key] = np.asarray([v.decode('utf-8') for v in value])
        return out
    raise ValueError('Unsupported embeddings format: {}'.format(ext))


def select_embedding(embeddings, mode = 'random', *, label = None,
                     label_column = None, seed = None, ** kwargs):
    """Pick one (D,) embedding from a table/array.

    mode: 'random' | 'mean' | int (row index) | callable(table) → (D,);
    `label` filters rows first (matching any metadata column, or
    `label_column` when given).
    """
    if isinstance(embeddings, str):
        embeddings = load_embeddings(embeddings)
    if isinstance(embeddings, np.ndarray):
        embeddings = {'embedding': embeddings if embeddings.ndim == 2 else embeddings[None]}

    table = dict(embeddings)
    vectors = np.asarray(table['embedding'])

    if label is not None:
        columns = [label_column] if label_column else [
            c for c in table if c != 'embedding'
        ]
        mask = np.zeros(len(vectors), dtype = bool)
        for col in columns:
            if col in table:
                mask |= np.asarray(table[col]) == label
        if not mask.any():
            raise ValueError('No embedding with label {!r}'.format(label))
        vectors = vectors[mask]

    if callable(mode):
        return mode(vectors)
    if mode == 'mean':
        return vectors.mean(axis = 0)
    if mode == 'random':
        rng = np.random.RandomState(seed)
        return vectors[rng.randint(len(vectors))]
    if isinstance(mode, (int, np.integer)):
        return vectors[int(mode)]
    raise ValueError('Unknown selection mode: {!r}'.format(mode))


def compute_centroids(embeddings, labels):
    """Per-label mean embeddings → (unique_labels, centroids (L, D))."""
    embeddings = np.asarray(embeddings)
    labels = np.asarray(labels)
    unique = sorted(set(labels.tolist()))
    centroids = np.stack([
        embeddings[labels == u].mean(axis = 0) for u in unique
    ])
    return unique, centroids


def get_closest_centroid(embedding, centroids, method = 'euclidean'):
    dists = distance(embedding, centroids, method = method, as_matrix = True)
    idx = int(np.argmin(np.asarray(dists), axis = -1)[0])
    return idx
