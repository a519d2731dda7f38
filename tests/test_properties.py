"""Property / invariant tests across the text + box + audio stacks.

Deterministic pseudo-random fuzzing (seeded `random.Random` /
`np.random.default_rng`) — no hypothesis dependency.  These complement the
example-based tests with round-trip and invariant checks the reference
validates only implicitly.
"""

import random
import string

import numpy as np
import pytest

from text_to_speech_tpu.text import Tokenizer, split_text, merge_texts
from text_to_speech_tpu.text.metrics import edit_distance
from text_to_speech_tpu.utils.image.boxes import (
    BoxFormat, convert_boxes, box_iou, nms,
)
from text_to_speech_tpu.utils.sequence_utils import pad_batch


def _random_texts(rng, n, alphabet = string.ascii_lowercase + ' .,!?'):
    out = []
    for _ in range(n):
        length = rng.randint(1, 120)
        out.append(''.join(rng.choice(alphabet) for _ in range(length)).strip()
                   or 'a')
    return out


class TestTokenizerRoundTrip:
    @pytest.mark.parametrize('level', ['char', 'byte'])
    def test_encode_decode_identity(self, level):
        rng = random.Random(0)
        if level == 'char':
            # '_' pad first: vocab[0] is the blank token and decode skips it
            vocab = ['_'] + sorted(set(string.ascii_lowercase + ' .,!?'))
            tok = Tokenizer(vocab, level = level)
            alphabet = string.ascii_lowercase + ' .,!?'
        else:
            # int vocab is normalized to chr() units by the constructor
            tok = Tokenizer(list(range(256)), level = level)
            alphabet = string.ascii_lowercase + ' .,!?'
        for text in _random_texts(rng, 25, alphabet):
            ids = tok.encode(text, cleaned = True, add_sos_and_eos = False)
            round_tripped = tok.decode(ids)
            assert round_tripped == text, (text, round_tripped)

    def test_unknown_chars_do_not_crash(self):
        tok = Tokenizer(sorted(set('abc ')), level = 'char')
        ids = tok.encode('abc xyz é', cleaned = True, add_sos_and_eos = False)
        assert all(0 <= i < tok.vocab_size for i in np.asarray(ids).tolist())
        tok.decode(ids)     # must not raise


class TestSplitMergeInvariants:
    def test_split_preserves_all_words(self):
        rng = random.Random(1)
        for _ in range(10):
            words = [''.join(rng.choice(string.ascii_lowercase)
                             for _ in range(rng.randint(1, 8)))
                     for _ in range(rng.randint(5, 60))]
            text = ' '.join(words)
            chunks = split_text(text, max_length = 40)
            rejoined = ' '.join(chunks).split()
            assert rejoined == words        # order + content preserved

    def test_split_respects_max_length_for_splittable_text(self):
        rng = random.Random(2)
        for _ in range(10):
            words = ['w' * rng.randint(1, 10) for _ in range(30)]
            chunks = split_text(' '.join(words), max_length = 25)
            assert all(len(c) <= 25 for c in chunks)

    def test_merge_indices_cover_all_parts(self):
        rng = random.Random(3)
        parts = _random_texts(rng, 20)
        merged, idx = merge_texts(parts, 80, max_overlap = 2,
                                  return_indices = True)
        flat = [i for group in idx for i in group]
        assert set(flat) == set(range(len(parts)))   # nothing dropped
        for group in idx:                            # in-order within chunk
            assert group == sorted(group)


class TestEditDistanceProperties:
    def test_metric_axioms(self):
        rng = random.Random(4)
        texts = _random_texts(rng, 8, string.ascii_lowercase)
        for a in texts:
            assert edit_distance(a, a, normalize = False) == 0
        for a in texts[:4]:
            for b in texts[4:]:
                d_ab = edit_distance(a, b, normalize = False)
                d_ba = edit_distance(b, a, normalize = False)
                # unit costs → symmetric
                assert d_ab == d_ba
                # bounded by max length, at least length difference
                assert abs(len(a) - len(b)) <= d_ab <= max(len(a), len(b))

    def test_triangle_inequality(self):
        rng = random.Random(5)
        texts = _random_texts(rng, 6, 'abc')
        for a in texts[:2]:
            for b in texts[2:4]:
                for c in texts[4:]:
                    ab = edit_distance(a, b, normalize = False)
                    bc = edit_distance(b, c, normalize = False)
                    ac = edit_distance(a, c, normalize = False)
                    assert ac <= ab + bc + 1e-9


class TestBoxInvariants:
    def test_format_round_trip(self):
        rng = np.random.default_rng(6)
        xy = rng.uniform(0, 100, (32, 2)).astype(np.float32)
        wh = rng.uniform(1, 50, (32, 2)).astype(np.float32)
        xywh = np.concatenate([xy, wh], 1)
        for via in (BoxFormat.XYXY, BoxFormat.CXCYWH):
            there = convert_boxes(xywh, BoxFormat.XYWH, via)
            back = convert_boxes(there, via, BoxFormat.XYWH)
            np.testing.assert_allclose(back, xywh, atol = 1e-4)

    def test_iou_bounds_and_self(self):
        rng = np.random.default_rng(7)
        a = rng.uniform(0, 50, (10, 2)).astype(np.float32)
        boxes = np.concatenate([a, a + rng.uniform(1, 20, (10, 2))], 1)
        iou = box_iou(boxes, boxes)
        assert (iou >= -1e-6).all() and (iou <= 1 + 1e-6).all()
        np.testing.assert_allclose(np.diag(iou), 1., atol = 1e-5)

    def test_nms_keeps_highest_scored_of_overlapping(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                         np.float32)
        scores = np.array([0.5, 0.9, 0.3])
        keep = nms(boxes, scores, iou_threshold = 0.3)
        keep = list(np.asarray(keep).tolist())
        assert 1 in keep and 0 not in keep and 2 in keep


class TestPadBatchInvariants:
    def test_contents_preserved(self):
        rng = np.random.default_rng(8)
        rows = [rng.normal(size = rng.integers(1, 9)).astype(np.float32)
                for _ in range(12)]
        out = pad_batch(rows, pad_value = -7.)
        assert out.shape == (12, max(len(r) for r in rows))
        for i, r in enumerate(rows):
            np.testing.assert_array_equal(out[i, :len(r)], r)
            assert (out[i, len(r):] == -7.).all()


# smoke tier: host-side/cheap-compile tests that gate every commit
# (<3 min cold on one core; see pytest.ini)
pytestmark = [pytest.mark.smoke]
