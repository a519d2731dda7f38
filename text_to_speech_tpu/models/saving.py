"""Persistent model directory layout.

Capability parity with ``/root/reference/models/utils/saving.py:19-57`` and
the layout described at ``models/interfaces/base_model.py:127-137``::

    <root>/<name>/config.json            # class name + constructor kwargs
    <root>/<name>/saving/config_models.json   # architecture config
    <root>/<name>/saving/history.json
    <root>/<name>/saving/checkpoint/     # CheckpointManager dir (.npz trees)
    <root>/<name>/saving/tokenizer.json
    <root>/<name>/saving/mel_fn.json
    <root>/<name>/predictions/           # map.json + saved artifacts
    <root>/<name>/embeddings/            # (SV2TTS)
"""

import os

from ..utils.file_utils import load_json, dump_json

_PRETRAINED_ROOT = os.environ.get('TTS_PRETRAINED_DIR', 'pretrained_models')


def get_pretrained_root():
    return _PRETRAINED_ROOT


def set_pretrained_root(path):
    global _PRETRAINED_ROOT
    _PRETRAINED_ROOT = path


def get_model_dir(name, *parts):
    return os.path.join(_PRETRAINED_ROOT, name, *parts)


def is_model_name(name):
    return os.path.exists(get_model_dir(name, 'config.json'))


def list_pretrained():
    root = _PRETRAINED_ROOT
    if not os.path.isdir(root): return []
    return sorted(
        d for d in os.listdir(root)
        if os.path.exists(os.path.join(root, d, 'config.json'))
    )


def merge_disk_config(name, kwargs, exclude = ('name',)):
    """Fill `kwargs` (in place, setdefault) from a saved model's config,
    skipping `exclude` keys → the disk config dict ({} when unsaved).
    Shared by task-model constructors so reload-by-name restores the
    architecture hparams."""
    if not is_model_name(name):
        return {}
    disk = get_model_config(name).get('config', {})
    for k, v in disk.items():
        if k not in exclude:
            kwargs.setdefault(k, v)
    return disk


def get_model_infos(name):
    """Full saved info for a model: its `config.json` content, or, for a
    live model instance, its class + `get_config()` (reference
    ``models/utils/saving.py:33``)."""
    if name is None:
        return {}
    if not isinstance(name, str):
        return {'class_name': name.__class__.__name__,
                'config': name.get_config()}
    try:
        return load_json(get_model_dir(name, 'config.json'))
    except FileNotFoundError:
        return {}


def get_model_config(name):
    return load_json(get_model_dir(name, 'config.json'))


def remove_training_checkpoint(name):
    """Delete every rotating training checkpoint of model `name`
    (keeps config/history/tokenizer — reference ``saving.py:53``)."""
    import shutil
    ckpt_dir = get_model_dir(name, 'saving', 'checkpoint')
    removed = []
    if os.path.isdir(ckpt_dir):
        for f in os.listdir(ckpt_dir):
            path = os.path.join(ckpt_dir, f)
            removed.append(f)
            shutil.rmtree(path) if os.path.isdir(path) else os.remove(path)
    return removed


def save_model_config(name, config):
    return dump_json(get_model_dir(name, 'config.json'), config, indent = 2)


def get_model_class_name(name):
    return get_model_config(name).get('class_name')


def get_model_history_file(name):
    return get_model_dir(name, 'saving', 'history.json')
