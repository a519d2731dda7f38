"""Dataset facade: named-corpus resolution, dataset-dir config, task tags,
summaries and pipeline benchmarking.

Capability parity with ``/root/reference/utils/datasets/loader.py``
(`get_dataset:46`, `set_dataset_dir:70`, `show_datasets:80`,
`add_dataset:148`, Task enum `:29`, multi-dataset concat
`load_custom_dataset:90-114`) and ``utils/datasets/summary.py``
(`summarize_dataset:33`, `benchmark_dataset:43`).
"""

import os
import enum
import time
import logging

import numpy as np

from .audio_datasets import _DATASETS, list_datasets
from .datasets import prepare_dataset

logger = logging.getLogger(__name__)

_dataset_dir = os.environ.get('DATASET_DIR', '/storage')

#: task tag -> [dataset names]
_TASKS = {}
#: name -> {'directory': ..., 'task': ...} extra registration info
_DATASET_INFOS = {}


class Task(enum.Enum):
    TTS = 'Text To Speech'
    STT = 'Speech To Text'
    SI = 'Speaker Identification'
    QA = 'Question Answering (Q&A)'
    OCR = 'OCR'
    TEXT_DETECTION = 'text detection'
    OBJECT_DETECTION = 'object detection'
    OBJECT_SEGMENTATION = 'object segmentation'
    FACE_RECOGNITION = 'face recognition'
    IMAGE_CAPTIONING = 'image captioning'


def set_dataset_dir(directory):
    """Set the root directory under which named corpora live."""
    global _dataset_dir
    _dataset_dir = directory


def get_dataset_dir(dataset = None):
    """Root dataset dir, or the resolved directory of a named dataset."""
    if not dataset:
        return _dataset_dir
    info = _DATASET_INFOS.get(_clean_name(dataset), {})
    directory = info.get('directory')
    if directory:
        return directory.format(_dataset_dir)
    return os.path.join(_dataset_dir, str(dataset))


def _resolve_name(name):
    """Registry key for `name`, tolerant to case / punctuation differences
    ('CommonVoice' → 'common_voice')."""
    key = str(name).lower()
    if key in _DATASETS:
        return key
    cleaned = _clean_name(name)
    for k in _DATASETS:
        if _clean_name(k) == cleaned:
            return k
    return None


def add_dataset(fn, name = None, task = Task.TTS, directory = None):
    """Register a custom dataset loader `fn(directory, **kwargs) -> DataFrame`."""
    name = name or getattr(fn, 'dataset', fn.__name__)
    _DATASETS[str(name).lower()] = fn
    _DATASET_INFOS[_clean_name(name)] = {'directory': directory, 'task': task}
    task_key = task.value if isinstance(task, Task) else str(task)
    _TASKS.setdefault(task_key, [])
    if name not in _TASKS[task_key]:
        _TASKS[task_key].append(name)
    return fn


def is_custom_dataset(dataset):
    if isinstance(dataset, (list, tuple)):
        return [is_custom_dataset(ds) for ds in dataset]
    return _resolve_name(dataset) is not None


def show_datasets(task = None):
    """Log the registered datasets, grouped by task."""
    tagged = {n for names in _TASKS.values() for n in names}
    for t, names in _TASKS.items():
        if task and t not in (task, getattr(task, 'value', task)):
            continue
        logger.info('%s :\t%s', t, tuple(names))
    tagged_clean = {_clean_name(x) for x in tagged}
    untagged = [n for n in list_datasets() if _clean_name(n) not in tagged_clean]
    if untagged and not task:
        logger.info('(untagged) :\t%s', tuple(untagged))


def get_dataset(dataset, *, directory = None, source = None, ** kwargs):
    """Load one or several named datasets into DataFrame(s).

    - list/tuple → every dataset loaded and concatenated (a `dataset`
      column tags each row's origin); per-dataset kwargs via a dict
      `{name: {kwargs}}`.
    - `source` may be a callable `(name, **kwargs) -> data` escape hatch.
    - `directory` defaults to `<dataset_dir>/<name>`.
    """
    if isinstance(dataset, dict):
        return get_dataset(list(dataset), per_dataset_kwargs = dataset,
                           directory = directory, source = source, ** kwargs)

    if isinstance(dataset, (list, tuple)):
        import pandas as pd
        per = kwargs.pop('per_dataset_kwargs', {})
        parts = []
        for name in dataset:
            df = get_dataset(name, directory = directory, source = source,
                             ** {** kwargs, ** (per.get(name) or {})})
            if hasattr(df, 'columns') and 'dataset' not in df.columns:
                df = df.assign(dataset = name)
            parts.append(df)
        if all(hasattr(p, 'columns') for p in parts):
            return pd.concat(parts, ignore_index = True, sort = False)
        return parts

    if callable(source):
        return source(dataset, ** kwargs)

    key = _resolve_name(dataset)
    if key is None:
        raise ValueError('Unknown dataset {!r} (known: {})'.format(
            dataset, list_datasets()))
    if directory is None:
        directory = get_dataset_dir(dataset)
    logger.info('Loading dataset %s from %s...', dataset, directory)
    return _DATASETS[key](directory, ** kwargs)


def _clean_name(name):
    return ''.join(c for c in str(name).lower() if c.isalnum())


# -- summaries & pipeline benchmarking ----------------------------------------

def summarize_dataset(dataset, columns = None, limit = 0.25, ** _):
    """Per-column stats of a DataFrame (or list of row dicts): unique-value
    counts (full histogram when few, count when many) + numeric describe."""
    if isinstance(dataset, (list, tuple)) and dataset and isinstance(dataset[0], dict):
        import pandas as pd
        dataset = pd.DataFrame(dataset)
    if not hasattr(dataset, 'columns'):
        return {}
    if isinstance(limit, float):
        limit = int(limit * len(dataset))
    if columns is None:
        columns = dataset.columns
    return {col: _summarize_column(dataset[col], limit) for col in columns}


def _summarize_column(col, limit):
    if len(col) == 0:
        return {}
    first = col.iloc[0]
    if isinstance(first, list):
        if not first or not isinstance(first[0], (str, int)):
            return {}
        count = {}
        for row in col.values:
            for v in (row if isinstance(row, list) else [row]):
                count[v] = count.get(v, 0) + 1
        count = dict(sorted(count.items(), key = lambda p: -p[1]))
    elif isinstance(first, (str, int, float, np.integer, np.floating)):
        count = col.value_counts().to_dict()
    else:
        return {}

    infos = {'# uniques': len(count)} if len(count) > limit else {'uniques': count}
    if isinstance(first, (int, float, np.integer, np.floating)):
        infos.update({k: float(v) for k, v in col.describe().items() if k != 'count'})
    return infos


def benchmark_dataset(dataset, steps = 100, build = False, ** kwargs):
    """Iterate `dataset` for `steps` batches and report timing statistics
    (initial vs average batch time, batches/sec) plus per-leaf batch shape
    stats — for diagnosing input-pipeline vs device bottlenecks."""
    import jax

    t0 = time.time()
    if build:
        dataset = prepare_dataset(dataset, ** kwargs)
    t1 = time.time()

    times, batch = [t1], None
    for i, batch in enumerate(dataset):
        times.append(time.time())
        if steps > 0 and i >= steps - 1:
            break

    n = len(times) - 1
    if n == 0:
        return {'steps': 0}
    deltas = [times[i] - times[i - 1] for i in range(1, len(times))]
    infos = {
        'steps': n,
        'batch_size': getattr(dataset, 'batch_size', 1),
        'total time': times[-1] - t0,
        'initial batch time': deltas[0],
        'average batch time': sum(deltas) / n,
        'batches per sec': n / sum(deltas),
    }
    if build:
        infos['build time'] = t1 - t0
    try:
        infos['batch_stats'] = jax.tree_util.tree_map(_leaf_stats, batch)
    except Exception:        # non-pytree batches (custom objects) — skip stats
        pass
    logger.info('%d batches in %.3fs (%.2f batch/s, first %.3fs, avg %.3fs)',
                n, sum(deltas), infos['batches per sec'], deltas[0],
                infos['average batch time'])
    return infos


def _leaf_stats(x):
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.floating):
        return 'shape : {} - min : {:.3f} - max : {:.3f} - mean : {:.3f}'.format(
            x.shape, x.min(), x.max(), x.mean())
    if np.issubdtype(x.dtype, np.integer):
        return 'shape : {} - min : {} - max : {}'.format(x.shape, x.min(), x.max())
    return 'shape : {}'.format(x.shape)


# tag the built-in corpora
for _name in list(_DATASETS):
    _TASKS.setdefault(Task.TTS.value, []).append(_name)
    _DATASET_INFOS.setdefault(_clean_name(_name), {'directory': None, 'task': Task.TTS})
