"""Audio annotation workspace: segmentation, diarization, dataset export.

Capability parity with ``/root/reference/utils/audio/audio_annotation.py:48,788``
(`AudioAnnotation` workspace: subtitle import, speaker clustering, alignment
building, per-speaker extraction, save-as-dataset) — compact re-design:

  - silence-based segmentation (native RMS scan) or subtitle-driven
    alignments (srt/vtt parsers included);
  - speaker diarization by clustering segment embeddings from a
    `SpeakerEncoder` (agglomerative over cosine distance);
  - per-speaker audio extraction and export as a training DataFrame + wavs.
"""

import os
import re
import logging

import numpy as np

logger = logging.getLogger(__name__)


# -- subtitle parsing ----------------------------------------------------------

_TIME_RE = re.compile(r'(\d+):(\d{2}):(\d{2})[.,](\d{1,3})')


def _parse_time(text):
    h, m, s, ms = _TIME_RE.match(text.strip()).groups()
    return int(h) * 3600 + int(m) * 60 + int(s) + int(ms.ljust(3, '0')) / 1000.


def parse_subtitles(filename):
    """Parse .srt / .vtt → [{'start', 'end', 'text'}]."""
    with open(filename, 'r', encoding = 'utf-8', errors = 'replace') as f:
        content = f.read()
    segments = []
    for block in re.split(r'\n\s*\n', content):
        lines = [l for l in block.strip().split('\n') if l.strip()]
        if not lines: continue
        time_line = next((l for l in lines if '-->' in l), None)
        if time_line is None: continue
        start_s, end_s = [p.strip() for p in time_line.split('-->')]
        text_lines = lines[lines.index(time_line) + 1:]
        text = ' '.join(text_lines).strip()
        text = re.sub(r'<[^>]+>', '', text)
        if text:
            segments.append({
                'start': _parse_time(start_s), 'end': _parse_time(end_s),
                'text': text,
            })
    return segments


# -- media stream extraction (ffmpeg) -------------------------------------------

def _ffmpeg_extract(path, output_file, mode, stream = 0, overwrite = False):
    """Extract stream `mode` ('a' audio / 's' subtitles) #`stream` from a
    media container (mkv/mp4/...) via ffmpeg; cached when the output exists.
    Returns the output path, or None on failure / missing ffmpeg."""
    import shutil
    import subprocess
    if os.path.exists(output_file) and not overwrite:
        return output_file
    if shutil.which('ffmpeg') is None:
        logger.warning('ffmpeg is not available; cannot extract streams')
        return None
    rc = subprocess.run(
        ['ffmpeg', '-y', '-i', path,
         '-map', '0:{}:{}'.format(mode, stream), output_file],
        capture_output = True,
    ).returncode
    return output_file if rc == 0 else None


def extract_audio(path, output_file = None, stream = 0, ** kwargs):
    """Extract an audio track from a media container
    (reference ``utils/audio/mkv_utils.py:98``)."""
    if output_file is None:
        output_file = os.path.splitext(path)[0] + '_audio.wav'
    return _ffmpeg_extract(path, output_file, 'a', stream, ** kwargs)


def extract_subtitles(path, output_file = None, stream = 0, ** kwargs):
    """Extract a subtitle track as .srt
    (reference ``utils/audio/mkv_utils.py:109``)."""
    if output_file is None:
        output_file = os.path.splitext(path)[0] + '_subs.srt'
    return _ffmpeg_extract(path, output_file, 's', stream, ** kwargs)


def process_media(path, *, audio_stream = 0, subs_stream = 0, ** kwargs):
    """Extract audio + subtitles from a media file (or every mkv/mp4 in a
    directory) → {'filename', 'audio_filename', 'subs_filename', 'alignment'}
    (the ``process_mkv`` capability, ``mkv_utils.py:24``)."""
    if isinstance(path, (list, tuple)) or os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(('.mkv', '.mp4', '.webm'))
        ) if os.path.isdir(path) else list(path)
        return [process_media(f, audio_stream = audio_stream,
                              subs_stream = subs_stream, ** kwargs)
                for f in files]
    audio = extract_audio(path, stream = audio_stream)
    subs = extract_subtitles(path, stream = subs_stream)
    info = {'filename': path, 'audio_filename': audio, 'subs_filename': subs}
    if subs:
        info['alignment'] = parse_subtitles(subs)
    return info


# -- segmentation --------------------------------------------------------------

def segment_audio(audio, rate, *, min_segment = 0.5, max_segment = 12.,
                  silence_threshold = 0.08, frame_ms = 25., hop_ms = 10.):
    """Split on silences → [{'start', 'end'}] (seconds)."""
    from .. import native
    frame = max(1, int(frame_ms * rate / 1000.))
    hop = max(1, int(hop_ms * rate / 1000.))
    rms = native.frame_rms(np.asarray(audio, np.float32), frame, hop)
    voiced = rms >= silence_threshold * max(rms.max(), 1e-9)

    segments, start = [], None
    for i, v in enumerate(voiced.tolist() + [False]):
        t = i * hop / rate
        if v and start is None:
            start = t
        elif not v and start is not None:
            if t - start >= min_segment:
                while t - start > max_segment:
                    segments.append({'start': start, 'end': start + max_segment})
                    start += max_segment
                segments.append({'start': start, 'end': t})
            start = None
    return segments


# -- clustering ----------------------------------------------------------------

def cluster_embeddings(embeddings, *, threshold = 0.25, metric = 'cosine'):
    """Agglomerative (average-linkage) clustering by distance threshold →
    labels (N,).  Cosine distance default matches speaker-embedding geometry."""
    from ..utils.distances import distance

    embeddings = np.asarray(embeddings)
    n = len(embeddings)
    if n == 0: return np.zeros((0,), np.int64)

    if metric == 'cosine':
        dist = 1. - np.asarray(distance(embeddings, embeddings, 'cosine',
                                        as_matrix = True))
    else:
        dist = np.asarray(distance(embeddings, embeddings, metric,
                                   as_matrix = True))
    clusters = [[i] for i in range(n)]
    while len(clusters) > 1:
        best, best_d = None, threshold
        for a in range(len(clusters)):
            for b in range(a + 1, len(clusters)):
                d = np.mean([dist[i, j] for i in clusters[a] for j in clusters[b]])
                if d < best_d:
                    best, best_d = (a, b), d
        if best is None: break
        a, b = best
        clusters[a] = clusters[a] + clusters[b]
        del clusters[b]

    labels = np.zeros((n,), np.int64)
    for idx, members in enumerate(clusters):
        for m in members:
            labels[m] = idx
    return labels


# -- workspace -----------------------------------------------------------------

class AudioAnnotation:
    """Annotation session over one recording."""

    def __init__(self, audio, rate = None, *, directory = None,
                 speaker_encoder = None):
        from .audio_io import load_audio
        if isinstance(audio, str):
            if rate is None: rate = 16000
            self.filename = audio
            audio = load_audio(audio, rate)
        else:
            self.filename = None
            assert rate is not None
        self.audio = np.asarray(audio, np.float32)
        self.rate = rate
        self.directory = directory
        self.speaker_encoder = speaker_encoder
        self.alignment = []      # [{'start','end','text'?,'speaker'?}]

    # -- building the alignment ----------------------------------------------

    def segment(self, ** kwargs):
        self.alignment = segment_audio(self.audio, self.rate, ** kwargs)
        return self.alignment

    def import_subtitles(self, filename):
        self.alignment = parse_subtitles(filename)
        return self.alignment

    def annotate_speakers(self, *, threshold = 0.25, ** kwargs):
        """Embed every segment and cluster into speaker labels."""
        if not self.alignment:
            self.segment()
        if self.speaker_encoder is None:
            raise ValueError('a speaker_encoder is required for diarization')
        clips = [self.extract(seg) for seg in self.alignment]
        embeddings = self.speaker_encoder.embed(
            [{'audio': c, 'rate': self.rate} for c in clips]
        )
        labels = cluster_embeddings(embeddings, threshold = threshold, ** kwargs)
        for seg, label, emb in zip(self.alignment, labels, embeddings):
            seg['speaker'] = 'speaker_{}'.format(int(label))
            seg['embedding'] = emb
        return self.alignment

    def set_text(self, index, text):
        self.alignment[index]['text'] = text

    # -- workspace editing (reference ``audio_annotation.py:307-628``) ---------

    def pop(self, index, rebuild = True):
        """Remove segment(s) by index (int or list; negatives count from
        the end; out-of-range indices are IGNORED, matching the
        reference's filter semantics ``:307`` — never wrapped onto a
        different segment)."""
        if not isinstance(index, (list, tuple, np.ndarray)):
            index = [index]
        n = len(self.alignment)
        drop = {int(i) + n if int(i) < 0 else int(i) for i in index}
        self.alignment = [seg for i, seg in enumerate(self.alignment)
                          if i not in drop]
        if rebuild and getattr(self, 'parts', None) is not None:
            self.build_alignment()
        return self

    def split(self, index, at = None, rebuild = True):
        """Split segment `index` in two — at its midpoint (reference
        ``:313``) or at absolute time `at` (seconds).  Both halves keep the
        segment's text/speaker annotations."""
        seg = self.alignment[index]
        if at is None:
            at = (seg['start'] + seg['end']) / 2.
        if not (seg['start'] < at < seg['end']):
            raise ValueError('split point {:.3f}s outside [{:.3f}, {:.3f}]'
                             .format(at, seg['start'], seg['end']))
        second = dict(seg)
        seg['end'] = at
        second['start'] = at
        self.alignment.insert(index + 1, second)
        if rebuild and getattr(self, 'parts', None) is not None:
            self.build_alignment()
        return self

    def update_segment(self, index, *, rebuild = True, ** kwargs):
        """Update one segment's fields.  `start` / `end` are RELATIVE
        offsets in seconds (the reference's ``_update_infos:327``
        convention: ``start = 1`` shifts the start 1 s later); every other
        field is assigned."""
        seg = self.alignment[index]
        updated = dict(seg)
        for key, value in kwargs.items():
            if key in ('start', 'end'):
                updated[key] = updated[key] + float(value)
            else:
                updated[key] = value
        if updated['start'] > updated['end']:
            # validate BEFORE committing: a rejected edit leaves the
            # segment untouched
            raise ValueError('segment {} would be empty: start {:.3f} > '
                             'end {:.3f}'.format(index, updated['start'],
                                                 updated['end']))
        seg.clear()
        seg.update(updated)
        if rebuild and getattr(self, 'parts', None) is not None:
            self.build_alignment()
        return self

    # -- speaker management ----------------------------------------------------

    def rename(self, old_id, new_id):
        """New id for a speaker across the whole alignment — ``:589``."""
        return self.set_speaker_infos(old_id, speaker = new_id)

    def set_speaker_infos(self, name, ** kwargs):
        """Set fields on every segment of one speaker (e.g. ``sex='F'``) —
        reference ``:593``.  Timing fields are refused (they are
        per-segment facts)."""
        for key in ('start', 'end', 'time'):
            kwargs.pop(key, None)
        for seg in self.alignment:
            if seg.get('speaker') == name:
                seg.update(kwargs)
        for part in getattr(self, 'parts', None) or []:
            if part.get('speaker') == name:
                part.update(kwargs)
        return self

    def remove_speaker(self, name):
        """Drop every segment of a speaker — reference ``:611``."""
        return self.pop([i for i, seg in enumerate(self.alignment)
                         if seg.get('speaker') == name])

    def get_speaker_alignment(self, name):
        return [dict(seg) for seg in self.alignment
                if seg.get('speaker') == name]

    def speaker_infos(self, names = None):
        """{speaker: {non-timing fields common to its segments}} —
        reference ``:615``."""
        if names is not None and not isinstance(names, (list, tuple)):
            names = [names]
        infos = {}
        for seg in self.alignment:
            speaker = seg.get('speaker')
            if speaker is None or (names is not None and speaker not in names):
                continue
            fields = {k: v for k, v in seg.items()
                      if k not in ('start', 'end', 'time', 'embedding',
                                   'text', 'indexes')}
            if speaker not in infos:
                infos[speaker] = dict(fields)
            else:   # keep only fields identical across the speaker's segments
                infos[speaker] = {
                    k: v for k, v in infos[speaker].items()
                    if k in fields and _same(fields[k], v)}
        return infos

    def get_speaker_audios(self, name):
        """Per-segment audio clips of one speaker (rate, [clips])."""
        return self.rate, [self.extract(seg) for seg in self.alignment
                           if seg.get('speaker') == name]

    def display(self, name = None, *, max_display = None, by_part = False,
                play = False, verbose = True):
        """Print (and optionally play) segments — reference ``:640``.
        `name` filters to one speaker (or a list); `by_part` shows the
        merged ``build_alignment`` parts."""
        if name is not None and not isinstance(name, (list, tuple)):
            name = [name]
        segments = (getattr(self, 'parts', None) or self.build_alignment()) \
            if by_part else self.alignment
        shown = 0
        for i, seg in enumerate(segments):
            if name is not None and seg.get('speaker') not in name:
                continue
            if max_display is not None and shown >= max_display:
                break
            shown += 1
            if verbose:
                print('[{:4d}] {:8.2f} - {:8.2f}  {:<12} {}'.format(
                    i, seg['start'], seg['end'],
                    str(seg.get('speaker', '-')), seg.get('text', '')))
            if play:
                from .audio_io import display_audio
                display_audio(self.extract(seg), rate = self.rate)
        return shown

    def build_alignment(self, join_threshold = 0.5, text_based = True):
        """Group consecutive same-speaker segments into alignment parts
        (reference ``audio_annotation.py:179``): segments merge when the
        speaker matches, the silence gap is under `join_threshold` seconds,
        and — with `text_based` — the next text reads as a continuation
        (a capitalized different text starts a new part).  Each part carries
        the joined text, the span timing, and the member segment `indexes`.

        The merged view is stored as ``self.parts`` and returned; the
        fine-grained ``self.alignment`` is untouched."""
        parts = []
        current = None
        for i, seg in enumerate(self.alignment):
            text = seg.get('text', '') or ''
            speaker = seg.get('speaker')
            if current is not None:
                gap = seg['start'] - current['end']
                new_sentence = bool(text) and text != current.get('text', '') \
                    and text[:1].isupper()
                joinable = (
                    speaker == current.get('speaker')
                    and 0 <= join_threshold and gap < join_threshold
                    and (not text_based or not new_sentence)
                )
                if joinable:
                    current['end'] = seg['end']
                    current['indexes'].append(i)
                    if text:
                        current['text'] = (current.get('text', '') + ' ' + text).strip()
                    continue
                parts.append(current)
            current = {
                'start': seg['start'], 'end': seg['end'],
                'speaker': speaker, 'text': text, 'indexes': [i],
            }
        if current is not None:
            parts.append(current)
        for part in parts:
            part['time'] = part['end'] - part['start']
        self.parts = parts
        return parts

    # -- extraction -----------------------------------------------------------

    def extract(self, segment):
        lo = int(segment['start'] * self.rate)
        hi = int(segment['end'] * self.rate)
        return self.audio[lo:hi]

    def speakers(self):
        return sorted({s.get('speaker') for s in self.alignment if 'speaker' in s})

    def extract_speaker(self, speaker):
        """Concatenated audio of one speaker."""
        clips = [self.extract(s) for s in self.alignment
                 if s.get('speaker') == speaker]
        return np.concatenate(clips) if clips else np.zeros((0,), np.float32)

    # -- persistence (reference ``audio_annotation.py:689,828``) ---------------

    def get_config(self):
        return {
            'filename': self.filename,
            'rate': self.rate,
        }

    def save(self, directory = None):
        """Persist the whole workspace (config + alignment + parts) to
        ``<directory>/config.json``; segment embeddings (numpy) go to an
        ``embeddings.npy`` sidecar.  Round-trip partner of `load`."""
        directory = directory or self.directory
        if not directory:
            raise ValueError('a directory is required to save')
        self.directory = directory
        os.makedirs(directory, exist_ok = True)

        from ..utils import dump_json
        alignment, embeddings = [], []
        for seg in self.alignment:
            seg = dict(seg)
            emb = seg.pop('embedding', None)
            if emb is not None:
                seg['embedding_index'] = len(embeddings)
                embeddings.append(np.asarray(emb))
            alignment.append(seg)
        data = {** self.get_config(), 'alignment': alignment}
        if getattr(self, 'parts', None) is not None:
            data['parts'] = self.parts
        dump_json(os.path.join(directory, 'config.json'), data, indent = 4)
        if embeddings:
            np.save(os.path.join(directory, 'embeddings.npy'),
                    np.stack(embeddings))
        return directory

    @classmethod
    def load(cls, directory, *, audio = None, rate = None, ** kwargs):
        """Re-open a saved workspace from a directory or its
        ``config.json``.  The audio reloads from the saved `filename`;
        pass `audio` (+ `rate`) explicitly when the recording moved."""
        from ..utils import load_json

        if directory.endswith('.json'):
            config_file, directory = directory, os.path.dirname(directory)
        else:
            config_file = os.path.join(directory, 'config.json')
        config = load_json(config_file)

        if audio is None:
            if not config.get('filename'):
                raise ValueError('the saved workspace has no source filename;'
                                 ' pass `audio` explicitly')
            audio = config['filename']
        self = cls(audio, rate or config.get('rate'),
                   directory = directory, ** kwargs)

        emb_file = os.path.join(directory, 'embeddings.npy')
        embeddings = np.load(emb_file) if os.path.exists(emb_file) else None
        self.alignment = []
        for seg in config.get('alignment', []):
            seg = dict(seg)
            idx = seg.pop('embedding_index', None)
            if idx is not None and embeddings is not None:
                seg['embedding'] = embeddings[idx]
            self.alignment.append(seg)
        if 'parts' in config:
            self.parts = config['parts']
        return self

    load_from_file = load

    # -- export ---------------------------------------------------------------

    def save_as_dataset(self, directory = None, *, merged = False):
        """Write per-segment wavs + a metadata DataFrame usable by `fit`.
        With ``merged``, export the `build_alignment` parts instead of the
        fine-grained segments (the reference's parts/ vs alignments/
        duality, ``audio_annotation.py:788``)."""
        import pandas as pd
        from .audio_io import write_audio

        segments = self.alignment
        if merged:
            segments = getattr(self, 'parts', None) or self.build_alignment()

        directory = directory or self.directory or 'annotation_dataset'
        os.makedirs(os.path.join(directory, 'wavs'), exist_ok = True)
        rows = []
        for i, seg in enumerate(segments):
            clip = self.extract(seg)
            if len(clip) == 0: continue
            path = os.path.join(directory, 'wavs', 'seg-{:05d}.wav'.format(i))
            write_audio(path, (clip * 32767).astype(np.int16), self.rate)
            rows.append({
                'id': 'seg-{:05d}'.format(i),
                'filename': path,
                'text': seg.get('text', ''),
                'speaker': seg.get('speaker', 'unknown'),
                'start': seg['start'], 'end': seg['end'],
            })
        df = pd.DataFrame(rows)
        df.to_csv(os.path.join(directory, 'metadata.csv'), index = False)
        return df


def _same(a, b):
    try:
        return bool(a == b)
    except Exception:
        return False


def load_annotation_dir(directory):
    """Load every saved `AudioAnnotation` workspace under `directory`
    (sub-directories with a ``config.json``, or bare ``.json`` files) —
    reference ``audio_annotation.py:843``.  Unloadable entries are skipped
    with a log line (e.g. the source audio moved)."""
    results = []
    for entry in sorted(os.listdir(directory)):
        path = os.path.join(directory, entry)
        if os.path.isdir(path):
            if not os.path.exists(os.path.join(path, 'config.json')):
                continue
        elif not entry.endswith('.json'):
            continue
        try:
            results.append(AudioAnnotation.load(path))
        except Exception as e:
            logger.info('skipping %s: %s', path, e)
    return results


def embed_annotation_dataset(directory, embed_fn, *, rate = None,
                             overwrite = False, filename = 'embeddings.h5',
                             ** kwargs):
    """Embed every exported annotation dataset under `directory` (the
    ``save_as_dataset`` layout: ``<name>/metadata.csv`` + ``wavs/``) and
    save per-segment embeddings next to each — the SV2TTS preparation step
    (reference ``audio_annotation.py:857``).

    `embed_fn(rows) -> (N, D)` is typically ``SpeakerEncoder.embed``.
    Returns {dataset_dir: embeddings_path}."""
    import pandas as pd
    from ..utils.embeddings import save_embeddings
    from .audio_io import load_audio

    out = {}
    candidates = [directory] if os.path.exists(
        os.path.join(directory, 'metadata.csv')) else [
        os.path.join(directory, d) for d in sorted(os.listdir(directory))
        if os.path.exists(os.path.join(directory, d, 'metadata.csv'))]
    for ds_dir in candidates:
        target = os.path.join(ds_dir, filename)
        if os.path.exists(target) and not overwrite:
            out[ds_dir] = target
            continue
        df = pd.read_csv(os.path.join(ds_dir, 'metadata.csv'))
        rows = []
        for _, row in df.iterrows():
            audio = load_audio(row['filename'], rate)
            rows.append({'audio': audio, 'rate': rate, 'id': row.get('id'),
                         'speaker': row.get('speaker')})
        embeddings = np.asarray(embed_fn(rows))
        save_embeddings(target, embeddings,
                        ids = list(df['id']), speakers = list(df['speaker']),
                        ** kwargs)
        out[ds_dir] = target
    return out
