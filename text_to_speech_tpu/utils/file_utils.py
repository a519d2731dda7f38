"""Extension-dispatched structured file I/O.

Capability parity with ``/root/reference/utils/file_utils.py:188,300``
(`load_data` / `dump_data` over json/jsonl/npy/npz/pkl/csv/txt/yaml-lite),
re-designed as a small registry.
"""

import os
import json
import pickle
import logging

import numpy as np

logger = logging.getLogger(__name__)

_loaders = {}
_dumpers = {}


def register_loader(*exts):
    def deco(fn):
        for e in exts: _loaders[e] = fn
        return fn
    return deco


def register_dumper(*exts):
    def deco(fn):
        for e in exts: _dumpers[e] = fn
        return fn
    return deco


def _ext(filename):
    return os.path.splitext(filename)[1].lstrip('.').lower()


def load_data(filename, default = '__raise__', ** kwargs):
    """Load `filename` based on its extension; `default` is returned when the
    file does not exist (unless left as the raising sentinel)."""
    if not os.path.exists(filename):
        if default == '__raise__':
            raise FileNotFoundError(filename)
        return default
    ext = _ext(filename)
    if ext not in _loaders:
        raise ValueError('No loader for extension {!r} ({})'.format(ext, filename))
    return _loaders[ext](filename, ** kwargs)


def dump_data(filename, data, *, makedirs = True, ** kwargs):
    ext = _ext(filename)
    if ext not in _dumpers:
        raise ValueError('No dumper for extension {!r} ({})'.format(ext, filename))
    if makedirs:
        d = os.path.dirname(filename)
        if d: os.makedirs(d, exist_ok = True)
    _dumpers[ext](filename, data, ** kwargs)
    return filename


# -- json ---------------------------------------------------------------------

class _NumpyJSONEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, np.integer): return int(o)
        if isinstance(o, np.floating): return float(o)
        if isinstance(o, np.ndarray): return o.tolist()
        if isinstance(o, bytes): return o.decode('utf-8', 'replace')
        return super().default(o)


@register_loader('json')
def load_json(filename, default = '__raise__', ** kwargs):
    if isinstance(filename, str) and not os.path.exists(filename):
        if default == '__raise__': raise FileNotFoundError(filename)
        return default
    with open(filename, 'r', encoding = 'utf-8') as f:
        return json.load(f)


@register_dumper('json')
def dump_json(filename, data, indent = None, ** kwargs):
    d = os.path.dirname(filename)
    if d: os.makedirs(d, exist_ok = True)
    with open(filename, 'w', encoding = 'utf-8') as f:
        json.dump(data, f, indent = indent, cls = _NumpyJSONEncoder, ensure_ascii = False)
    return filename


@register_loader('jsonl')
def _load_jsonl(filename, ** kwargs):
    with open(filename, 'r', encoding = 'utf-8') as f:
        return [json.loads(line) for line in f if line.strip()]


@register_dumper('jsonl')
def _dump_jsonl(filename, data, ** kwargs):
    with open(filename, 'w', encoding = 'utf-8') as f:
        for row in data:
            f.write(json.dumps(row, cls = _NumpyJSONEncoder, ensure_ascii = False) + '\n')


# -- numpy / pickle -----------------------------------------------------------

@register_loader('npy')
def _load_npy(filename, ** kwargs):
    return np.load(filename, allow_pickle = False)


@register_dumper('npy')
def _dump_npy(filename, data, ** kwargs):
    np.save(filename, np.asarray(data))


@register_loader('npz')
def _load_npz(filename, ** kwargs):
    return dict(np.load(filename, allow_pickle = False))


@register_dumper('npz')
def _dump_npz(filename, data, ** kwargs):
    np.savez(filename, ** data)


@register_loader('pkl', 'pickle')
def _load_pkl(filename, ** kwargs):
    with open(filename, 'rb') as f:
        return pickle.load(f)


@register_dumper('pkl', 'pickle')
def _dump_pkl(filename, data, ** kwargs):
    with open(filename, 'wb') as f:
        pickle.dump(data, f)


# -- text / csv ---------------------------------------------------------------

@register_loader('txt', 'md', 'py')
def _load_txt(filename, encoding = 'utf-8', ** kwargs):
    with open(filename, 'r', encoding = encoding) as f:
        return f.read()


@register_dumper('txt', 'md')
def _dump_txt(filename, data, encoding = 'utf-8', ** kwargs):
    with open(filename, 'w', encoding = encoding) as f:
        f.write(data if isinstance(data, str) else str(data))


@register_loader('csv', 'tsv')
def _load_csv(filename, ** kwargs):
    import pandas as pd
    sep = '\t' if filename.endswith('.tsv') else ','
    return pd.read_csv(filename, sep = kwargs.pop('sep', sep), ** kwargs)


@register_dumper('csv', 'tsv')
def _dump_csv(filename, data, ** kwargs):
    import pandas as pd
    sep = '\t' if filename.endswith('.tsv') else ','
    pd.DataFrame(data).to_csv(filename, sep = kwargs.pop('sep', sep), index = False, ** kwargs)


@register_loader('yaml', 'yml')
def _load_yaml(filename, ** kwargs):
    import yaml
    with open(filename, encoding = 'utf-8') as file:
        return yaml.safe_load(file)


@register_dumper('yaml', 'yml')
def _dump_yaml(filename, data, ** kwargs):
    import yaml
    with open(filename, 'w', encoding = 'utf-8') as file:
        yaml.safe_dump(data, file, ** kwargs)


@register_loader('h5', 'hdf5')
def _load_h5(filename, ** kwargs):
    """Read an HDF5 file as {dataset name: ndarray} (groups flattened by path)."""
    import h5py
    out = {}
    with h5py.File(filename, 'r') as file:
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                value = obj[()]
                if isinstance(value, bytes): value = value.decode('utf-8')
                out[name] = value
        file.visititems(visit)
    return out


@register_dumper('h5', 'hdf5')
def _dump_h5(filename, data, ** kwargs):
    import h5py
    with h5py.File(filename, 'w') as file:
        for key, value in data.items():
            file.create_dataset(key, data = value)


@register_loader('xlsx', 'xls')
def _load_xlsx(filename, ** kwargs):
    import pandas as pd
    return pd.read_excel(filename, ** kwargs)


@register_dumper('xlsx', 'xls')
def _dump_xlsx(filename, data, ** kwargs):
    import pandas as pd
    pd.DataFrame(data).to_excel(filename, index = False, ** kwargs)


def download_file(url, directory = None, filename = None, *, overwrite = False):
    """Fetch `url` into `directory` (cached: skips when the file exists).

    The capability of reference ``utils/file_utils.py:132``.  Local paths and
    ``file://`` URLs are served from disk; http(s) uses urllib.  Returns the
    local path.
    """
    import urllib.parse
    import urllib.request

    parsed = urllib.parse.urlparse(str(url))
    if parsed.scheme in ('', 'file'):
        source = parsed.path if parsed.scheme == 'file' else str(url)
        if directory is None and filename is None:
            return source
    else:
        source = None

    if filename is None:
        filename = os.path.basename(parsed.path) or 'download'
    if directory:
        os.makedirs(directory, exist_ok = True)
        filename = os.path.join(directory, filename)

    if os.path.exists(filename) and not overwrite:
        return filename

    if source is not None:
        import shutil
        shutil.copyfile(source, filename)
    else:
        tmp = filename + '.part'
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, filename)
    return filename


def hash_file(filename, algorithm = 'sha256', chunk_size = 1 << 20):
    """Streaming content hash of a file → hex digest."""
    import hashlib
    h = hashlib.new(algorithm)
    with open(filename, 'rb') as file:
        while True:
            block = file.read(chunk_size)
            if not block: break
            h.update(block)
    return h.hexdigest()


def expand_path(path):
    return os.path.abspath(os.path.expanduser(os.path.expandvars(path)))
