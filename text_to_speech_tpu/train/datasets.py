"""Input pipeline: map/filter/cache/shuffle/bucket-batch/prefetch.

Capability parity with ``/root/reference/utils/datasets/builder.py``
(`prepare_dataset:23` stage ordering, `build_tf_dataset:133` source adapters,
`train_test_split:192` incl. split-by-unique-speaker) and the file-cached
generator (``custom_train_objects/generators/file_cache_generator.py:21``) —
re-designed host-side on plain python/numpy with thread prefetch (no tf.data):
the TPU consumes padded, *bucketed* numpy batches so jit compiles a handful
of shapes.
"""

import os
import math
import random
import logging
import threading
import queue as _queue

import numpy as np

logger = logging.getLogger(__name__)


def as_rows(data):
    """Normalize a data source into a list of row dicts / items.

    Accepts: list/tuple, pandas DataFrame, dict of columns, csv/tsv path.
    """
    if isinstance(data, str) and os.path.isfile(data):
        import pandas as pd
        sep = '\t' if data.endswith('.tsv') else ','
        data = pd.read_csv(data, sep = sep)
    if hasattr(data, 'to_dict') and hasattr(data, 'columns'):   # DataFrame
        return data.to_dict('records')
    if isinstance(data, dict):
        keys = list(data)
        n = len(data[keys[0]])
        return [{k: data[k][i] for k in keys} for i in range(n)]
    return list(data)


def train_test_split(data,
                     *,
                     valid_size = 0.1,
                     shuffle = True,
                     random_state = 0,
                     split_column = None):
    """Split rows into (train, valid).

    With `split_column` (e.g. 'speaker'), unique values are split so no
    value appears in both sets.
    """
    rows = as_rows(data)
    rng = random.Random(random_state)

    if split_column is not None:
        values = sorted({r[split_column] for r in rows})
        if shuffle: rng.shuffle(values)
        n_valid = max(1, int(len(values) * valid_size)) if valid_size < 1 else int(valid_size)
        valid_values = set(values[:n_valid])
        train = [r for r in rows if r[split_column] not in valid_values]
        valid = [r for r in rows if r[split_column] in valid_values]
        return train, valid

    idx = list(range(len(rows)))
    if shuffle: rng.shuffle(idx)
    n_valid = int(len(rows) * valid_size) if valid_size < 1 else int(valid_size)
    valid_idx = set(idx[:n_valid])
    train = [rows[i] for i in idx[n_valid:]]
    valid = [rows[i] for i in sorted(valid_idx)]
    return train, valid


class Dataset:
    """Composable host-side pipeline over a list of rows.

    Stage order mirrors the reference builder: map → filter → cache →
    shuffle → batch(+collate) → prefetch.
    """

    def __init__(self, rows, *, map_fn = None, filter_fn = None, cache = True,
                 shuffle = False, batch_size = 1, collate_fn = None,
                 drop_remainder = False, prefetch = 2, seed = 0,
                 length_bucket_fn = None, num_parallel_calls = None,
                 native_audio_rate = None):
        self.rows = as_rows(rows)
        self.map_fn = map_fn
        self.filter_fn = filter_fn
        self.cache = cache
        self.shuffle = shuffle
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        self.seed = seed
        self.length_bucket_fn = length_bucket_fn
        self.num_parallel_calls = num_parallel_calls
        self.native_audio_rate = native_audio_rate
        self._cached = None
        self._epoch = 0

    def _native_preload(self, rows):
        """Decode the rows' WAV files through the C++ loader pool
        (`native.data_loader`) and inject ``('audio', 'rate')`` so
        `map_fn`'s audio load skips file I/O + resampling — the
        framework's counterpart of tf.data's C++ parallel file reads
        (reference `utils/datasets/builder.py:72-129`).  Rows the native
        decoder cannot handle keep their filename and go through the
        Python readers inside `map_fn` unchanged."""
        from ..native import data_loader
        if not data_loader.available():
            return rows
        idx = [i for i, r in enumerate(rows)
               if isinstance(r, dict) and 'audio' not in r
               and str(r.get('filename', '')).lower().endswith('.wav')]
        if not idx:
            return rows
        decoded = data_loader.load_audio_batch(
            [rows[i]['filename'] for i in idx],
            target_rate = self.native_audio_rate,
            n_workers = self.num_parallel_calls or 2)
        rows = list(rows)
        for i, (audio, rate) in zip(idx, decoded):
            rows[i] = dict(rows[i], audio = audio, rate = rate)
        return rows

    def _map_one(self, row):
        try:
            return True, (self.map_fn(row) if self.map_fn else row)
        except Exception:
            logger.exception('map_fn failed on a row; skipping it')
            return False, None

    def _materialize(self):
        if self._cached is not None:
            return self._cached
        rows = list(self.rows)
        if self.native_audio_rate:
            rows = self._native_preload(rows)
        n_workers = self.num_parallel_calls or 1
        if self.map_fn is not None and n_workers > 1 and len(rows) > 1:
            # parallel map (tf.data num_parallel_calls analog): audio
            # read + resample + mel extraction release the GIL in numpy /
            # the native DSP, so threads overlap the first-epoch cost;
            # order is preserved
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(min(n_workers, len(rows))) as pool:
                mapped = list(pool.map(self._map_one, rows))
        else:
            mapped = [self._map_one(row) for row in rows]
        out = []
        for ok, item in mapped:
            if not ok:
                continue
            if self.filter_fn and not self.filter_fn(* item if isinstance(item, tuple) else (item,)):
                continue
            out.append(item)
        if self.cache:
            self._cached = out
        return out

    def __len__(self):
        items = self._materialize()
        n = len(items) / self.batch_size
        return int(n) if self.drop_remainder else math.ceil(n)

    def _batches(self):
        items = self._materialize()
        order = list(range(len(items)))
        if self.shuffle:
            random.Random(self.seed + self._epoch).shuffle(order)
        self._epoch += 1

        if self.length_bucket_fn is not None:
            # group similarly-sized items to reduce padding waste
            order.sort(key = lambda i: self.length_bucket_fn(items[i]))

        for start in range(0, len(order), self.batch_size):
            chunk = [items[i] for i in order[start: start + self.batch_size]]
            if self.drop_remainder and len(chunk) < self.batch_size:
                return
            yield self.collate_fn(chunk) if self.collate_fn else chunk

    def __iter__(self):
        if not self.prefetch:
            yield from self._batches()
            return
        buf = _queue.Queue(maxsize = self.prefetch)
        DONE = object()

        def producer():
            try:
                for batch in self._batches():
                    buf.put(batch)
            finally:
                buf.put(DONE)

        t = threading.Thread(target = producer, daemon = True)
        t.start()
        while True:
            item = buf.get()
            if item is DONE: break
            yield item
        t.join()


def prepare_dataset(data,
                    *,
                    prepare_fn = None,
                    filter_fn = None,
                    collate_fn = None,
                    batch_size = 16,
                    shuffle = True,
                    cache = True,
                    prefetch = 2,
                    length_bucket_fn = None,
                    ** kwargs):
    """Build a `Dataset` with the standard stage ordering."""
    return Dataset(
        data, map_fn = prepare_fn, filter_fn = filter_fn, cache = cache,
        shuffle = shuffle, batch_size = batch_size, collate_fn = collate_fn,
        prefetch = prefetch, length_bucket_fn = length_bucket_fn, ** kwargs,
    )


class FileCacheDataset(Dataset):
    """Dataset whose mapped items are cached to disk (one .npz per row) —
    the `FileCacheGenerator` analog (mel extraction runs once, later epochs
    stream from cache files)."""

    def __init__(self, rows, cache_dir, *, cache_key_fn = None, ** kwargs):
        super().__init__(rows, ** kwargs)
        self.cache_dir = cache_dir
        self.cache_key_fn = cache_key_fn or (lambda i, row: 'item-{}.npz'.format(i))
        os.makedirs(cache_dir, exist_ok = True)

    def _materialize(self):
        if self._cached is not None:
            return self._cached
        out = []
        for i, row in enumerate(self.rows):
            path = os.path.join(self.cache_dir, self.cache_key_fn(i, row))
            if os.path.exists(path):
                with np.load(path, allow_pickle = True) as data:
                    item = data['item'].item() if data['item'].dtype == object else data['item']
                out.append(item)
                continue
            try:
                item = self.map_fn(row) if self.map_fn else row
            except Exception:
                logger.exception('map_fn failed; skipping row')
                continue
            if self.filter_fn and not self.filter_fn(* item if isinstance(item, tuple) else (item,)):
                continue
            np.savez(path, item = np.asarray(item, dtype = object))
            out.append(item)
        if self.cache:
            self._cached = out
        return out


class GE2EDataset:
    """Batch sampler for GE2E speaker-verification training: each batch is
    `n_speakers` groups of `n_utterances` rows of the same speaker
    (the `GE2EGenerator` analog,
    ``custom_train_objects/generators/ge2e_generator.py:20``)."""

    def __init__(self, rows, *, speaker_column = 'speaker', n_speakers = 4,
                 n_utterances = 4, map_fn = None, collate_fn = None, seed = 0):
        self.rows = as_rows(rows)
        self.map_fn = map_fn
        self.collate_fn = collate_fn
        self.n_speakers = n_speakers
        self.n_utterances = n_utterances
        self.seed = seed
        self._epoch = 0

        self.by_speaker = {}
        for row in self.rows:
            self.by_speaker.setdefault(row[speaker_column], []).append(row)
        self.speakers = [
            s for s, items in self.by_speaker.items() if len(items) >= n_utterances
        ]
        if len(self.speakers) < n_speakers:
            raise ValueError('Need >= {} speakers with >= {} utterances'.format(
                n_speakers, n_utterances))

    def __len__(self):
        return max(1, len(self.speakers) // self.n_speakers)

    def __iter__(self):
        rng = random.Random(self.seed + self._epoch)
        self._epoch += 1
        speakers = list(self.speakers)
        rng.shuffle(speakers)
        for start in range(0, len(speakers) - self.n_speakers + 1, self.n_speakers):
            batch = []
            for spk in speakers[start: start + self.n_speakers]:
                rows = rng.sample(self.by_speaker[spk], self.n_utterances)
                batch.append([self.map_fn(r) if self.map_fn else r for r in rows])
            yield self.collate_fn(batch) if self.collate_fn else batch
