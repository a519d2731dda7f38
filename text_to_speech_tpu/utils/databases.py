"""Keyed databases + vector databases.

Capability parity with ``/root/reference/utils/databases/``
(`Database` ABC with loader ``database.py:21,48``, JSON/SQLite wrappers,
`VectorDatabase` with pluggable similarity indexes ``vectors/*.py``) —
vector search runs as a jit-able matmul (numpy or JAX backend).
"""

import os
import re
import json
import logging
import sqlite3
import threading

import numpy as np

logger = logging.getLogger(__name__)

_DATABASES = {}


def register_database(name):
    def deco(cls):
        _DATABASES[name] = cls
        return cls
    return deco


def build_database(db_type, path, ** kwargs):
    if db_type not in _DATABASES:
        raise ValueError('Unknown database type {!r} (known: {})'.format(
            db_type, sorted(_DATABASES)))
    return _DATABASES[db_type](path, ** kwargs)


class Database:
    """Keyed store: mapping protocol + persistence."""

    def __init__(self, path, primary_key = 'id', ** kwargs):
        self.path = path
        self.primary_key = primary_key
        self._lock = threading.RLock()
        self.load()

    def load(self):
        raise NotImplementedError()

    def save(self):
        raise NotImplementedError()

    def __getitem__(self, key):
        raise NotImplementedError()

    def __setitem__(self, key, value):
        raise NotImplementedError()

    def __delitem__(self, key):
        raise NotImplementedError()

    def __contains__(self, key):
        raise NotImplementedError()

    def __len__(self):
        raise NotImplementedError()

    def get(self, key, default = None):
        try:
            return self[key]
        except KeyError:
            return default

    def insert(self, row):
        self[row[self.primary_key]] = {
            k: v for k, v in row.items() if k != self.primary_key
        }

    def update(self, key, ** fields):
        entry = self[key]
        entry.update(fields)
        self[key] = entry

    def insert_or_update(self, row):
        """Insert the row, or merge its fields into the existing entry
        (reference ``utils/databases/json_file.py`` behavior)."""
        key = row[self.primary_key]
        if key in self:
            self.update(key, ** {
                k: v for k, v in row.items() if k != self.primary_key
            })
        else:
            self.insert(row)

    def multi_get(self, keys, default = None):
        return [self.get(k, default) for k in keys]

    def multi_insert(self, rows):
        with self._lock:
            for row in rows:
                self.insert(row)

    def multi_update(self, keys, fields):
        """Update many entries; `fields` is one dict (applied to all) or a
        list aligned with `keys`."""
        if isinstance(fields, dict):
            fields = [fields] * len(keys)
        with self._lock:
            for key, f in zip(keys, fields):
                self.update(key, ** f)

    def multi_pop(self, keys):
        out = []
        with self._lock:
            for key in keys:
                out.append(self.get(key))
                if key in self:
                    del self[key]
        return out


@register_database('json')
class JSONDatabase(Database):
    def load(self):
        with self._lock:
            self._data = {}
            if os.path.exists(self.path):
                with open(self.path, 'r', encoding = 'utf-8') as f:
                    self._data = json.load(f)

    def save(self):
        with self._lock:
            d = os.path.dirname(self.path)
            if d: os.makedirs(d, exist_ok = True)
            with open(self.path, 'w', encoding = 'utf-8') as f:
                json.dump(self._data, f, indent = 2, ensure_ascii = False)

    def __getitem__(self, key):
        return self._data[str(key)]

    def __setitem__(self, key, value):
        with self._lock:
            self._data[str(key)] = value

    def __delitem__(self, key):
        with self._lock:
            del self._data[str(key)]

    def __contains__(self, key):
        return str(key) in self._data

    def __len__(self):
        return len(self._data)

    def keys(self):
        return list(self._data.keys())

    def items(self):
        return list(self._data.items())


@register_database('json_dir')
class JSONDirDatabase(Database):
    """One JSON file per entry under a directory — scales to stores too
    large for a single file and allows concurrent writers per key
    (the ``utils/databases/json_dir.py`` capability)."""

    _SAFE = re.compile(r'[^A-Za-z0-9._-]')

    def _name(self, key):
        """Collision-free file stem: sanitized key, plus a short content
        hash whenever sanitization altered it (so 'spk/1' and 'spk_1'
        never alias onto the same file)."""
        key = str(key)
        name = self._SAFE.sub('_', key)
        if name != key:
            import hashlib
            name += '-' + hashlib.sha1(key.encode('utf-8')).hexdigest()[:8]
        return name

    def _file(self, key):
        return os.path.join(self.path, self._name(key) + '.json')

    def load(self):
        os.makedirs(self.path, exist_ok = True)
        self._keys_cache = None     # name→key map, built lazily on first
                                    # enumeration (get/set never need it)

    @property
    def _keys(self):
        # build under the lock so writes during the first enumeration are
        # either in the listdir snapshot or applied to the installed cache
        with self._lock:
            if self._keys_cache is None:
                keys = {}
                for f in os.listdir(self.path):
                    if not f.endswith('.json'): continue
                    try:
                        with open(os.path.join(self.path, f),
                                  encoding = 'utf-8') as fh:
                            entry = json.load(fh)
                        keys[f[:-5]] = entry.get('__key__', f[:-5])
                    except (json.JSONDecodeError, OSError):
                        logger.warning('skipping unreadable entry %s', f)
                self._keys_cache = keys
            return self._keys_cache

    def save(self):
        pass                                    # every write is persistent

    def __getitem__(self, key):
        try:
            with open(self._file(key), encoding = 'utf-8') as f:
                entry = json.load(f)
        except FileNotFoundError:
            raise KeyError(key)
        entry.pop('__key__', None)
        return entry

    def __setitem__(self, key, value):
        with self._lock:
            tmp = self._file(key) + '.tmp'
            with open(tmp, 'w', encoding = 'utf-8') as f:
                json.dump({** value, '__key__': key}, f,
                          indent = 2, ensure_ascii = False)
            os.replace(tmp, self._file(key))
            if self._keys_cache is not None:
                self._keys_cache[self._name(key)] = key

    def __delitem__(self, key):
        with self._lock:
            try:
                os.remove(self._file(key))
            except FileNotFoundError:
                raise KeyError(key)
            if self._keys_cache is not None:
                self._keys_cache.pop(self._name(key), None)

    def __contains__(self, key):
        return os.path.exists(self._file(key))

    def __len__(self):
        return len(self._keys)

    def keys(self):
        return list(self._keys.values())

    def items(self):
        return [(k, self[k]) for k in self.keys()]


@register_database('sqlite')
class SQLiteDatabase(Database):
    """Single-table key/value store (value JSON-encoded)."""

    def load(self):
        d = os.path.dirname(self.path)
        if d: os.makedirs(d, exist_ok = True)
        self._conn = sqlite3.connect(self.path, check_same_thread = False)
        with self._lock:
            self._conn.execute(
                'CREATE TABLE IF NOT EXISTS entries (key TEXT PRIMARY KEY, value TEXT)'
            )
            self._conn.commit()

    def save(self):
        with self._lock:
            self._conn.commit()

    def __getitem__(self, key):
        cur = self._conn.execute('SELECT value FROM entries WHERE key = ?', (str(key),))
        row = cur.fetchone()
        if row is None: raise KeyError(key)
        return json.loads(row[0])

    def __setitem__(self, key, value):
        with self._lock:
            self._conn.execute(
                'INSERT OR REPLACE INTO entries (key, value) VALUES (?, ?)',
                (str(key), json.dumps(value)),
            )
            self._conn.commit()

    def __delitem__(self, key):
        with self._lock:
            cur = self._conn.execute('DELETE FROM entries WHERE key = ?', (str(key),))
            self._conn.commit()
            if cur.rowcount == 0: raise KeyError(key)

    def __contains__(self, key):
        cur = self._conn.execute('SELECT 1 FROM entries WHERE key = ?', (str(key),))
        return cur.fetchone() is not None

    def __len__(self):
        return self._conn.execute('SELECT COUNT(*) FROM entries').fetchone()[0]

    def keys(self):
        return [r[0] for r in self._conn.execute('SELECT key FROM entries')]


# -- ordered wrapper -------------------------------------------------------------

class OrderedDatabase:
    """Insertion-ordered view over any `Database`: integer/slice indexing,
    ``index(key)`` lookup and ordered iteration, while delegating storage to
    the wrapped database (the reference's ``OrderedDatabaseWrapper``,
    ``utils/databases/ordered_database_wrapper.py:16``)."""

    def __init__(self, database):
        self.db = database
        self._order = list(self._initial_keys())

    def _initial_keys(self):
        keys = getattr(self.db, 'keys', None)
        return list(keys()) if callable(keys) else []

    @staticmethod
    def _key(key):
        """Normalize like the wrapped backends do (they store by str(key)),
        so inserting {'id': 5} and popping '5' address the same order
        entry.  Integer arguments to __getitem__/pop remain POSITIONS (the
        reference's convention) — use string keys for key lookup."""
        return str(key)

    # -- ordered access ----------------------------------------------------------
    def __len__(self):
        return len(self._order)

    def __iter__(self):
        for key in self._order:
            yield self.db[key]

    def __contains__(self, key):
        return key in self.db

    def index(self, key):
        return self._order.index(self._key(key))

    def __getitem__(self, index):
        if isinstance(index, slice):
            return [self.db[k] for k in self._order[index]]
        if isinstance(index, (list, tuple, np.ndarray)):
            return [self[i] for i in index]
        if isinstance(index, (int, np.integer)):
            index = self._order[index]
        return self.db[index]

    # -- delegated mutation (order-tracking) ---------------------------------------
    def insert(self, row):
        key = row[self.db.primary_key]
        existed = key in self.db
        self.db.insert(row)
        if not existed:
            self._order.append(self._key(key))
        return key

    def insert_or_update(self, row):
        key = row[self.db.primary_key]
        existed = key in self.db
        self.db.insert_or_update(row)
        if not existed:
            self._order.append(self._key(key))
        return key

    def update(self, key, ** fields):
        self.db.update(key, ** fields)

    def pop(self, index):
        if isinstance(index, (int, np.integer)):
            key = self._order[index]
        else:
            key = self._key(index)
        value = self.db[key]
        del self.db[key]
        self._order.remove(key)
        return value

    def __getattr__(self, name):
        return getattr(self.db, name)


# -- vector database -----------------------------------------------------------

class VectorIndex:
    """Pluggable brute-force similarity index."""

    def __init__(self, dim, metric = 'cosine'):
        self.dim = dim
        self.metric = metric
        self._vectors = np.zeros((0, dim), np.float32)

    def add(self, vectors):
        vectors = np.atleast_2d(np.asarray(vectors, np.float32))
        self._vectors = np.concatenate([self._vectors, vectors], axis = 0)

    def __len__(self):
        return len(self._vectors)

    @property
    def vectors(self):
        return self._vectors

    def search(self, query, k = 5):
        """→ (indices (Q, k), scores (Q, k)); higher score = closer."""
        from .distances import distance
        query = np.atleast_2d(np.asarray(query, np.float32))
        if len(self._vectors) == 0:
            return np.zeros((len(query), 0), np.int64), np.zeros((len(query), 0))
        scores = np.asarray(distance(query, self._vectors, method = self.metric,
                                     as_matrix = True))
        if self.metric not in ('cosine', 'dot'):
            scores = -scores
        k = min(k, scores.shape[1])
        idx = np.argsort(-scores, axis = 1)[:, :k]
        return idx, np.take_along_axis(scores, idx, axis = 1)


class JaxVectorIndex(VectorIndex):
    """Same brute-force search executed as a jitted device matmul — for large
    stores on TPU."""

    def search(self, query, k = 5):
        import jax
        import jax.numpy as jnp

        query = np.atleast_2d(np.asarray(query, np.float32))
        if len(self._vectors) == 0:
            return np.zeros((len(query), 0), np.int64), np.zeros((len(query), 0))

        @jax.jit
        def _search(q, v):
            if self.metric == 'cosine':
                q = q / (jnp.linalg.norm(q, axis = 1, keepdims = True) + 1e-9)
                v = v / (jnp.linalg.norm(v, axis = 1, keepdims = True) + 1e-9)
                scores = q @ v.T
            elif self.metric == 'dot':
                scores = q @ v.T
            else:
                scores = -jnp.sqrt(jnp.sum((q[:, None] - v[None]) ** 2, axis = -1))
            top = jax.lax.top_k(scores, min(k, v.shape[0]))
            return top[1], top[0]

        idx, scores = _search(query, self._vectors)
        return np.asarray(idx), np.asarray(scores)




class TorchVectorIndex(VectorIndex):
    """Brute-force search through torch (CPU) — the reference's TorchIndex
    (``utils/databases/vectors/torch_index.py``) without CUDA."""

    def search(self, query, k = 5):
        import torch
        query = np.atleast_2d(np.asarray(query, np.float32))
        if len(self._vectors) == 0:
            return np.zeros((len(query), 0), np.int64), np.zeros((len(query), 0))
        q = torch.from_numpy(query)
        v = torch.from_numpy(self._vectors)
        if self.metric == 'cosine':
            q = torch.nn.functional.normalize(q, dim = 1)
            v = torch.nn.functional.normalize(v, dim = 1)
            scores = q @ v.T
        elif self.metric == 'dot':
            scores = q @ v.T
        else:
            scores = -torch.cdist(q, v)
        top = torch.topk(scores, min(k, v.shape[0]), dim = 1)
        return top.indices.numpy(), top.values.numpy()


_VECTOR_INDEXES = {'numpy': VectorIndex, 'jax': JaxVectorIndex,
                   'torch': TorchVectorIndex}


def build_vector_index(kind, dim, metric = 'cosine'):
    """Index factory (the reference's pluggable numpy/keras/torch/faiss
    index registry, ``utils/databases/vectors/__init__.py``)."""
    if kind not in _VECTOR_INDEXES:
        raise ValueError('Unknown index {!r} (known: {})'.format(
            kind, sorted(_VECTOR_INDEXES)))
    return _VECTOR_INDEXES[kind](dim, metric)


class VectorDatabase:
    """Vectors + metadata with nearest-neighbor queries and persistence."""

    def __init__(self, path = None, dim = None, metric = 'cosine',
                 index = 'numpy'):
        self.path = path
        self.metric = metric
        index_cls = _VECTOR_INDEXES[index]
        self._index_cls = index_cls
        self.index = index_cls(dim or 1, metric) if dim else None
        self.metadata = []
        if path and os.path.exists(path):
            self.load()

    def add(self, vectors, metadata = None):
        vectors = np.atleast_2d(np.asarray(vectors, np.float32))
        if self.index is None:
            self.index = self._index_cls(vectors.shape[1], self.metric)
        self.index.add(vectors)
        if metadata is None:
            metadata = [{}] * len(vectors)
        elif isinstance(metadata, dict):
            metadata = [metadata]
        self.metadata.extend(metadata)

    def __len__(self):
        return len(self.metadata)

    def search(self, query, k = 5):
        """→ list (per query row) of {'score', 'index', **metadata}."""
        idx, scores = self.index.search(query, k)
        out = []
        for row_idx, row_scores in zip(idx, scores):
            out.append([
                {'index': int(i), 'score': float(s), ** self.metadata[int(i)]}
                for i, s in zip(row_idx, row_scores)
            ])
        return out if len(out) > 1 else out[0]

    def save(self, path = None):
        path = path or self.path
        np.savez(path, vectors = self.index.vectors,
                 metadata = np.asarray(json.dumps(self.metadata)),
                 metric = np.asarray(self.metric))
        return path

    def load(self, path = None):
        path = path or self.path
        with np.load(path, allow_pickle = False) as data:
            vectors = data['vectors']
            self.metadata = json.loads(str(data['metadata']))
            self.metric = str(data['metric'])
        self.index = self._index_cls(vectors.shape[1], self.metric)
        self.index.add(vectors)
        return self
