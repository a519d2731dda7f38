"""Tests for the text-stack depth additions: chunk overlap, paragraphs,
text distances, token utilities, and the dataset facade."""

import numpy as np
import pytest

from text_to_speech_tpu.text.processing import merge_texts, split_text
from text_to_speech_tpu.text.paragraphs import (
    chunks_from_paragraphs, group_paragraphs, merge_paragraphs,
    paragraph_to_text,
)
from text_to_speech_tpu.text.metrics import (
    text_distance, edit_distance, hamming_distance, text_f1,
    list_text_distances,
)
from text_to_speech_tpu.text.tokens import (
    filter_texts, mask_tokens, mask_batch_tokens, mask_slice_tokens,
    process_model_output,
)


class TestMergeOverlap:
    def test_no_overlap_unchanged(self):
        assert merge_texts(['a', 'b', 'c'], 3) == ['a b', 'c']

    def test_overlap_prefixes_previous_parts(self):
        parts = ['one two', 'abc', 'five six']
        merged, idx = merge_texts(
            parts, 12, max_overlap = 2, max_overlap_len = 8,
            return_indices = True)
        # 'abc' (tail of chunk 0) fits the overlap budget of chunk 1
        assert idx == [[0, 1], [1, 2]]
        assert merged[1] == 'abc five six'

    def test_overlap_budget_respected(self):
        parts = ['aaaaaaaa', 'bbbbbbbb', 'cccccccc']
        merged, idx = merge_texts(
            parts, 9, max_overlap = 5, max_overlap_len = 4,
            return_indices = True)
        # parts are 8 chars; overlap budget 4 can never fit one → no overlap
        assert idx == [[0], [1], [2]]

    def test_split_text_forwards_overlap(self):
        text = 'One two. Three four. Five six. Seven eight.'
        chunks = split_text(text, 22, max_overlap = 1, max_overlap_len = 0.9)
        assert len(chunks) >= 2
        joined = ' '.join(chunks)
        assert 'Three four' in joined


class TestParagraphs:
    def test_paragraph_to_text_types(self):
        assert paragraph_to_text('plain') == 'plain'
        assert paragraph_to_text({'text': 'x'}) == 'x'
        assert paragraph_to_text({'type': 'list', 'items': ['a', 'b']}) == '\n- a\n- b'
        assert paragraph_to_text({'type': 'image', 'filename': 'x.png'}) is None
        with pytest.raises(ValueError):
            paragraph_to_text({'type': 'wat'})

    def test_group_and_merge(self):
        paras = [
            {'text': 'a', 'section': 's1', 'page': 1},
            {'text': 'b', 'section': 's2', 'page': 1},
            {'text': 'c', 'section': 's1', 'page': 2},
        ]
        groups = group_paragraphs(paras, 'section')
        assert [len(g) for g in groups] == [2, 1]
        merged = merge_paragraphs(groups[0], 'ignore', skip = ('text',))
        assert merged['section'] == 's1'
        assert 'page' not in merged          # mismatching → dropped
        with pytest.raises(RuntimeError):
            merge_paragraphs(groups[0], 'error', skip = ('text',))
        first = merge_paragraphs(groups[0], 'first', skip = ('text',))
        assert first['page'] == 1

    def test_chunks_group_by_section(self):
        paras = [
            {'text': 'Sentence one.', 'section': 'A'},
            {'text': 'Sentence two.', 'section': 'A'},
            {'text': 'Other part.', 'section': 'B'},
        ]
        chunks = chunks_from_paragraphs(paras, 200, group_by = 'section')
        assert len(chunks) == 2
        assert 'Sentence one.' in chunks[0]['text']
        assert 'Sentence two.' in chunks[0]['text']
        assert chunks[0]['section'] == 'A' and chunks[1]['section'] == 'B'

    def test_chunks_split_long_carry_metadata(self):
        paras = [{'text': 'One two. ' * 20, 'section': 'A'}]
        chunks = chunks_from_paragraphs(paras, 40)
        assert len(chunks) > 2
        assert all(c['section'] == 'A' for c in chunks)
        assert all(len(c['text']) <= 40 for c in chunks)

    def test_media_paragraphs_dropped(self):
        chunks = chunks_from_paragraphs(
            [{'type': 'image', 'filename': 'f'}, {'text': 'kept'}], 100)
        assert [c['text'] for c in chunks] == ['kept']


class TestTextDistances:
    def test_edit_distance_basic(self):
        assert edit_distance('kitten', 'sitting', normalize = False) == 3
        assert edit_distance('abc', 'abc', normalize = False) == 0

    def test_edit_distance_weighted(self):
        # free replacement a→b makes 'aa'→'bb' cost 0
        d = edit_distance('aa', 'bb', replacement_cost = {'a': {'b': 0}},
                          normalize = False)
        assert d == 0

    def test_edit_distance_partial(self):
        # 'bcd' occurs inside 'abcde' → partial distance 0
        assert edit_distance('bcd', 'abcde', partial = True, normalize = False) == 0

    def test_edit_distance_matrix_shape(self):
        d, m = edit_distance('ab', 'abc', return_matrix = True, normalize = False)
        assert m.shape == (3, 4) and d == m[-1, -1] == 1

    def test_hamming(self):
        assert hamming_distance('abc', 'abd', normalize = False) == 1
        assert hamming_distance('abc', 'ab') == -1

    def test_registry_and_modes(self):
        assert {'edit', 'hamming', 'exact_match', 'f1'} <= set(list_text_distances())
        d = text_distance('abc', 'abd', 'edit', normalize = False)
        s = text_distance('abc', 'abd', 'edit', normalize = False,
                          mode = 'similarity')
        assert s == -d

    def test_batch_and_matrix(self):
        v = text_distance(['a', 'b'], ['a', 'c'], 'exact_match')
        assert v.tolist() == [1, 0]
        m = text_distance(['a', 'b'], ['a', 'b', 'c'], 'exact_match',
                          as_matrix = True)
        assert m.shape == (2, 3) and m[0, 0] == 1 and m[1, 1] == 1

    def test_f1_components(self):
        em, f1, p, r = text_f1('the cat sat', 'the cat ran')
        assert em == 0 and 0 < f1 < 1 and p == r == pytest.approx(2 / 3)


class TestTokenUtils:
    def test_mask_tokens(self):
        logits = np.zeros((2, 4), np.float32)
        out = np.asarray(mask_tokens(logits, [[0, 1], [1, 3]]))
        assert np.isneginf(out[0, 1]) and np.isneginf(out[1, 3])
        assert np.isfinite(out[0, 0])

    def test_mask_batch_tokens(self):
        out = np.asarray(mask_batch_tokens(np.zeros((3, 5), np.float32), [0, 2]))
        assert np.isneginf(out[:, 0]).all() and np.isneginf(out[:, 2]).all()
        assert np.isfinite(out[:, 1]).all()

    def test_mask_slice_tokens(self):
        logits = np.zeros((2, 6), np.float32)
        after = np.asarray(mask_slice_tokens(logits, 4, True))
        assert np.isfinite(after[:, :4]).all() and np.isneginf(after[:, 4:]).all()
        before = np.asarray(mask_slice_tokens(logits, 4, False))
        assert np.isneginf(before[:, :4]).all() and np.isfinite(before[:, 4:]).all()

    def test_mask_slice_jittable(self):
        import jax
        fn = jax.jit(mask_slice_tokens, static_argnums = (2,))
        out = np.asarray(fn(np.zeros((1, 5), np.float32), 2, True))
        assert np.isneginf(out[:, 2:]).all()

    def test_process_model_output(self):
        class Out:
            tokens = np.arange(12).reshape(2, 6)
            lengths = np.array([4, 2])
        parts = process_model_output(Out())
        assert parts[0].tolist() == [0, 1, 2, 3]
        assert parts[1].tolist() == [6, 7]

    def test_filter_texts_length_budget(self):
        texts = np.arange(20).reshape(4, 5)
        lengths = np.array([5, 2, 4, 3])
        out, lens = filter_texts(texts, lengths, max_text_length = 4)
        assert len(out) == 3 and out.shape[1] == 4   # cropped to max kept len
        assert lens.tolist() == [2, 4, 3]

    def test_filter_texts_total_and_max(self):
        texts = np.arange(20).reshape(4, 5)
        lengths = np.array([5, 2, 4, 3])
        # shortest-first keeps lengths 2 then 3 (cumsum 5 ≤ 7), drops 4, 5
        out, lens = filter_texts(texts, lengths, max_total_length = 7,
                                 sort_by_length = True)
        assert sorted(lens.tolist()) == [2, 3]
        out, lens = filter_texts(texts, lengths, max_texts = 2)
        assert len(lens) == 2 and lens.tolist() == [5, 2]

    def test_filter_texts_required_idx(self):
        texts = np.arange(20).reshape(4, 5)
        lengths = np.array([5, 2, 4, 3])
        # required text dropped by the length filter → everything dropped
        out, lens = filter_texts(texts, lengths, max_text_length = 4,
                                 required_idx = 0)
        assert len(lens) == 0
        out, lens, idx = filter_texts(
            texts, lengths, max_texts = 2, required_idx = 3,
            return_indices = True)
        assert 3 in idx.tolist() and len(idx) == 2

    def test_filter_texts_multi_flatten(self):
        texts = np.arange(24).reshape(2, 3, 4)    # 2 rows × 3 sentences
        lengths = np.array([[4, 2, 0], [3, 0, 0]])
        out, lens = filter_texts(texts, lengths)
        assert out.shape == (3, 4) and lens.tolist() == [4, 2, 3]
        out2, lens2 = filter_texts(texts, lengths, max_sentences = 1)
        assert lens2.tolist() == [3]


class TestDatasetFacade:
    def test_registry_roundtrip(self, tmp_path):
        from text_to_speech_tpu.train.loader import (
            add_dataset, get_dataset, is_custom_dataset, Task,
            set_dataset_dir, get_dataset_dir,
        )
        import pandas as pd

        calls = {}

        def loader(directory, ** kwargs):
            calls['dir'] = directory
            return pd.DataFrame([{'filename': 'a.wav', 'text': 'hi',
                                  'speaker': 'sp0'}])

        add_dataset(loader, name = 'toy_corpus', task = Task.TTS)
        assert is_custom_dataset('ToyCorpus')
        set_dataset_dir(str(tmp_path))
        assert get_dataset_dir() == str(tmp_path)
        df = get_dataset('toy_corpus')
        assert calls['dir'] == str(tmp_path / 'toy_corpus')
        assert df.iloc[0]['text'] == 'hi'

    def test_multi_dataset_concat(self, tmp_path):
        from text_to_speech_tpu.train.loader import add_dataset, get_dataset
        import pandas as pd

        def mk(tag):
            def loader(directory, ** kwargs):
                return pd.DataFrame([{'filename': tag, 'text': tag}])
            return loader

        add_dataset(mk('x'), name = 'ds_x')
        add_dataset(mk('y'), name = 'ds_y')
        df = get_dataset(['ds_x', 'ds_y'])
        assert len(df) == 2 and set(df['dataset']) == {'ds_x', 'ds_y'}

    def test_unknown_raises(self):
        from text_to_speech_tpu.train.loader import get_dataset
        with pytest.raises(ValueError):
            get_dataset('nope_nothing')

    def test_summarize(self):
        from text_to_speech_tpu.train.loader import summarize_dataset
        rows = [{'speaker': 'a', 'dur': 1.0}, {'speaker': 'a', 'dur': 3.0},
                {'speaker': 'b', 'dur': 2.0}]
        s = summarize_dataset(rows, limit = 10)
        assert s['speaker']['uniques'] == {'a': 2, 'b': 1}
        assert s['dur']['mean'] == pytest.approx(2.0)

    def test_benchmark(self):
        from text_to_speech_tpu.train.loader import benchmark_dataset
        from text_to_speech_tpu.train.datasets import Dataset

        ds = Dataset([{'x': i} for i in range(8)], batch_size = 4,
                     collate_fn = lambda rows: np.array([r['x'] for r in rows]))
        infos = benchmark_dataset(ds, steps = 2)
        assert infos['steps'] == 2 and infos['batch_size'] == 4
        assert 'batch_stats' in infos and 'shape : (4,)' in infos['batch_stats']


class TestReviewFixes:
    def test_group_by_list_of_keys(self):
        paras = [
            {'text': 'a', 'section': 's', 'page': 1},
            {'text': 'b', 'section': 's', 'page': 1},
            {'text': 'c', 'section': 's', 'page': 2},
        ]
        chunks = chunks_from_paragraphs(paras, 100, group_by = ['section', 'page'])
        assert len(chunks) == 2 and chunks[0]['page'] == 1

    def test_text_distance_multi_output_passthrough(self):
        d = text_distance('ab', 'abc', 'edit', mode = 'similarity',
                          return_matrix = True, normalize = False)
        assert isinstance(d, tuple) and d[1].shape == (3, 4)
        four = text_distance('a b', 'a c', 'f1', mode = 'distance')
        assert isinstance(four, tuple) and len(four) == 4

    def test_get_dataset_dict_passes_directory(self, tmp_path):
        from text_to_speech_tpu.train.loader import add_dataset, get_dataset
        import pandas as pd
        seen = {}

        def loader(directory, ** kwargs):
            seen['dir'] = directory
            return pd.DataFrame([{'filename': 'f', 'text': 't'}])

        add_dataset(loader, name = 'dircheck')
        get_dataset({'dircheck': {}}, directory = str(tmp_path / 'custom'))
        assert seen['dir'] == str(tmp_path / 'custom')


# smoke tier: host-side/cheap-compile tests that gate every commit
# (<3 min cold on one core; see pytest.ini)
pytestmark = [pytest.mark.smoke]
