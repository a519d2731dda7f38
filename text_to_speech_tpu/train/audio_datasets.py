"""Per-corpus audio dataset loaders → pandas DataFrames.

Capability parity with ``/root/reference/utils/datasets/audio_datasets/``
(registry + resampled-file caching ``processing.py:23,52``; SIWIS
``siwis.py:20``, CommonVoice ``common_voice.py:20``, LibriSpeech
``libri_speech.py:24``, VoxForge ``voxforge.py:20``).  Each loader returns a
DataFrame with at least ``filename`` / ``text`` / ``speaker`` columns (plus
``wavs_<rate>`` after `resample_dataset`).
"""

import os
import glob
import logging

logger = logging.getLogger(__name__)

_DATASETS = {}


def register_dataset(name):
    def deco(fn):
        _DATASETS[name.lower()] = fn
        return fn
    return deco


def load_dataset(name, directory, ** kwargs):
    key = name.lower()
    if key not in _DATASETS:
        raise ValueError('Unknown dataset {!r} (known: {})'.format(
            name, sorted(_DATASETS)))
    return _DATASETS[key](directory, ** kwargs)


def list_datasets():
    return sorted(_DATASETS)


def _df(rows):
    import pandas as pd
    return pd.DataFrame(rows)


@register_dataset('siwis')
def load_siwis(directory, *, langs = ('fr',), parts = None, ** kwargs):
    """SIWIS layout: ``text/<part>/*.txt`` + ``wavs/<part>/*.wav`` per part
    (single professional speaker)."""
    rows = []
    text_root = os.path.join(directory, 'text')
    wav_root = os.path.join(directory, 'wavs')
    part_dirs = sorted(os.listdir(text_root)) if os.path.isdir(text_root) else []
    if parts: part_dirs = [p for p in part_dirs if p in set(map(str, parts))]
    for part in part_dirs:
        for txt in sorted(glob.glob(os.path.join(text_root, part, '*.txt'))):
            stem = os.path.splitext(os.path.basename(txt))[0]
            wav = os.path.join(wav_root, part, stem + '.wav')
            if not os.path.exists(wav): continue
            with open(txt, encoding = 'utf-8') as f:
                text = f.read().strip()
            rows.append({'id': stem, 'filename': wav, 'text': text,
                         'speaker': 'siwis', 'part': part})
    return _df(rows)


@register_dataset('common_voice')
def load_common_voice(directory, *, subset = 'validated', ** kwargs):
    """Mozilla CommonVoice: ``<subset>.tsv`` with client_id/path/sentence +
    ``clips/`` audio."""
    import pandas as pd
    tsv = os.path.join(directory, subset + '.tsv')
    df = pd.read_csv(tsv, sep = '\t')
    out = pd.DataFrame({
        'id': df['path'].str.replace(r'\.\w+$', '', regex = True),
        'filename': df['path'].map(lambda p: os.path.join(directory, 'clips', p)),
        'text': df['sentence'],
        'speaker': df['client_id'],
    })
    for extra in ('age', 'gender', 'accent'):
        if extra in df.columns: out[extra] = df[extra]
    return out


@register_dataset('libri_speech')
def load_libri_speech(directory, ** kwargs):
    """LibriSpeech: ``<spk>/<chapter>/<spk>-<chapter>.trans.txt`` transcripts
    next to ``.flac`` files."""
    rows = []
    for trans in sorted(glob.glob(os.path.join(
            directory, '*', '*', '*.trans.txt'))):
        chapter_dir = os.path.dirname(trans)
        speaker = os.path.basename(os.path.dirname(chapter_dir))
        with open(trans, encoding = 'utf-8') as f:
            for line in f:
                if not line.strip(): continue
                utt_id, text = line.strip().split(' ', 1)
                audio = os.path.join(chapter_dir, utt_id + '.flac')
                if os.path.exists(audio):
                    rows.append({'id': utt_id, 'filename': audio,
                                 'text': text.lower(), 'speaker': speaker})
    return _df(rows)


@register_dataset('voxforge')
def load_voxforge(directory, ** kwargs):
    """VoxForge sessions: ``<session>/etc/PROMPTS`` + ``<session>/wav/*.wav``;
    the speaker is the session-name prefix."""
    rows = []
    for prompts in sorted(glob.glob(os.path.join(directory, '*', 'etc', 'PROMPTS'))):
        session_dir = os.path.dirname(os.path.dirname(prompts))
        session = os.path.basename(session_dir)
        speaker = session.split('-')[0]
        with open(prompts, encoding = 'utf-8', errors = 'replace') as f:
            for line in f:
                parts = line.strip().split(' ', 1)
                if len(parts) != 2: continue
                utt_path, text = parts
                utt = os.path.basename(utt_path)
                wav = os.path.join(session_dir, 'wav', utt + '.wav')
                if os.path.exists(wav):
                    rows.append({'id': '{}-{}'.format(session, utt),
                                 'filename': wav, 'text': text.lower(),
                                 'speaker': speaker})
    return _df(rows)


@register_dataset('ljspeech')
def load_ljspeech(directory, ** kwargs):
    """LJSpeech: ``metadata.csv`` (id|text|normalized_text) + ``wavs/``."""
    rows = []
    with open(os.path.join(directory, 'metadata.csv'), encoding = 'utf-8') as f:
        for line in f:
            parts = line.rstrip('\n').split('|')
            if len(parts) < 2: continue
            utt_id, text = parts[0], parts[-1]
            rows.append({'id': utt_id,
                         'filename': os.path.join(directory, 'wavs', utt_id + '.wav'),
                         'text': text, 'speaker': 'ljspeech'})
    return _df(rows)


def resample_dataset(df, rate, *, directory = None, max_workers = 4):
    """Resample every file to `rate` once, caching next to the originals in a
    ``wavs_<rate>/`` sibling dir; adds a ``wavs_<rate>`` column that
    `load_audio` picks up preferentially."""
    from concurrent.futures import ThreadPoolExecutor
    from ..ops import load_audio, write_audio
    import numpy as np

    column = 'wavs_{}'.format(rate)

    def process(filename):
        out_dir = directory or os.path.join(os.path.dirname(os.path.dirname(filename)),
                                            column)
        out = os.path.join(out_dir, os.path.basename(filename))
        out = os.path.splitext(out)[0] + '.wav'
        if not os.path.exists(out):
            audio = load_audio(filename, rate)
            write_audio(out, (np.asarray(audio) * 32767).astype('int16'), rate)
        return out

    with ThreadPoolExecutor(max_workers = max_workers) as pool:
        df = df.copy()
        df[column] = list(pool.map(process, df['filename']))
    return df
