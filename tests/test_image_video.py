"""Bounding-box layout/LANMS/filters + video subsystem tests.

Reference surfaces: /root/reference/utils/image/bounding_box/ (combination,
locality_aware_nms, processing, filters) and /root/reference/utils/image/
video/ + image_io.py streaming entry points.
"""

import os
import shutil

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# boxes: layout combination / lanms / sorting / filters
# ---------------------------------------------------------------------------


class TestLayoutCombination:
    def test_horizontal_merges_words_on_a_line(self):
        from text_to_speech_tpu.utils.image.boxes import \
            combine_boxes_horizontal
        boxes = np.array([[0, 0, 1, 1], [1, 0, 2, 1], [3, 3, 4, 4]],
                         np.float32)
        merged, groups, rows = combine_boxes_horizontal(boxes)
        assert np.allclose(merged[0], [0, 0, 2, 1])
        assert groups[0] == [0, 1] and groups[1] == [2]
        assert rows[0].shape == (2, 4)

    def test_horizontal_merge_is_order_independent(self):
        from text_to_speech_tpu.utils.image.boxes import \
            combine_boxes_horizontal
        # same two words on a line, given in non-reading order: the gap
        # must be the interval gap (60px), not a direction-dependent span
        boxes = np.array([[100, 0, 140, 10], [0, 0, 40, 10]], np.float32)
        merged, groups, _ = combine_boxes_horizontal(boxes, x_threshold = 65)
        assert len(merged) == 1
        assert np.allclose(merged[0], [0, 0, 140, 10])
        merged2, _, _ = combine_boxes_horizontal(boxes[::-1], x_threshold = 65)
        assert np.allclose(merged2, merged)

    def test_vertical_merge_is_order_independent(self):
        from text_to_speech_tpu.utils.image.boxes import \
            combine_boxes_vertical
        boxes = np.array([[0, 20, 40, 30], [0, 0, 38, 10]], np.float32)
        merged, _, _ = combine_boxes_vertical(boxes, y_threshold = 11)
        assert len(merged) == 1
        assert np.allclose(merged[0], [0, 0, 40, 30])

    def test_horizontal_respects_y_overlap(self):
        from text_to_speech_tpu.utils.image.boxes import \
            combine_boxes_horizontal
        # same x-gap but no vertical overlap → stay separate
        boxes = np.array([[0, 0, 1, 1], [1, 2, 2, 3]], np.float32)
        merged, _, _ = combine_boxes_horizontal(boxes)
        assert len(merged) == 2

    def test_vertical_merges_lines_to_paragraph(self):
        from text_to_speech_tpu.utils.image.boxes import \
            combine_boxes_vertical
        boxes = np.array([[0, 0, 1, 1], [0, 1, 1, 2], [3, 3, 4, 4]],
                         np.float32)
        merged, groups, _ = combine_boxes_vertical(boxes)
        assert np.allclose(merged[0], [0, 0, 1, 2])
        assert groups[0] == [0, 1]

    def test_layout_words_to_paragraphs(self):
        from text_to_speech_tpu.utils.image.boxes import combine_boxes_layout
        words = np.array([[0, 0, 1, 1], [1.2, 0, 2, 1],      # line 1
                          [0, 1.1, 2, 2.1],                  # line 2
                          [5, 5, 6, 6]], np.float32)         # isolated
        paras, nested, _ = combine_boxes_layout(words)
        assert len(paras) == 2
        assert np.allclose(paras[0], [0, 0, 2, 2.1], atol = 1e-5)
        flat = sorted(i for g in nested[0] for sub in g
                      for i in (sub if isinstance(sub, list) else [sub]))
        assert flat == [0, 1, 2]


class TestLanms:
    def test_merges_then_suppresses(self):
        from text_to_speech_tpu.utils.image.boxes import lanms
        boxes = np.array([[0, 0, 2, 2], [0.1, 0, 2.1, 2], [5, 5, 6, 6]],
                         np.float32)
        merged, scores, mask = lanms(
            boxes, np.array([0.9, 0.8, 0.7]), merge_threshold = 0.3)
        assert mask.sum() == 2
        kept = merged[mask]
        assert any(np.allclose(k, [0, 0, 2.1, 2]) for k in kept)

    def test_average_merge_weights_by_score(self):
        from text_to_speech_tpu.utils.image.boxes import lanms
        boxes = np.array([[0, 0, 2, 2], [1, 0, 3, 2]], np.float32)
        merged, scores, mask = lanms(
            boxes, np.array([3., 1.]), merge_threshold = 0.2,
            merge_method = 'average')
        keep = merged[mask]
        assert len(keep) == 1
        # weighted mean: (3*[0,..] + 1*[1,..]) / 4 → x0 = 0.25
        assert np.allclose(keep[0], [0.25, 0, 2.25, 2])
        assert scores[mask][0] == 4.

    def test_empty(self):
        from text_to_speech_tpu.utils.image.boxes import lanms
        merged, scores, mask = lanms(np.zeros((0, 4), np.float32))
        assert len(merged) == 0 and len(mask) == 0


class TestSortBoxes:
    def test_reading_order_top(self):
        from text_to_speech_tpu.utils.image.boxes import sort_boxes
        # slight y jitter on the first row must not split it
        boxes = np.array([[5, 0.05, 6, 1], [0, 0, 1, 1], [0, 2, 1, 3]],
                         np.float32)
        idx = sort_boxes(boxes, 'top', return_indices = True)
        assert list(idx) == [1, 0, 2]

    @pytest.mark.parametrize('method,expected', [
        ('x', [1, 0, 2]), ('corner', [1, 0, 2]), ('area', [2, 1, 0]),
    ])
    def test_simple_criteria(self, method, expected):
        from text_to_speech_tpu.utils.image.boxes import sort_boxes
        boxes = np.array([[1, 1, 2, 2], [0, 1.5, 1, 3], [3, 0, 9, 9]],
                         np.float32)
        assert list(sort_boxes(boxes, method, return_indices = True)) \
            == expected

    def test_score_requires_scores(self):
        from text_to_speech_tpu.utils.image.boxes import sort_boxes
        with pytest.raises(ValueError):
            sort_boxes(np.zeros((2, 4), np.float32), 'score')


class TestBoxFilters:
    def test_size_and_region_chain(self):
        from text_to_speech_tpu.utils.image.boxes import (
            filter_boxes, SizeFilter, RegionFilter)
        boxes = np.array([[0, 0, 1, 1], [0, 0, 0.1, 0.1],
                          [20, 20, 21, 21]], np.float32)
        kept, indices, _ = filter_boxes(
            [SizeFilter(min_area = 0.5), RegionFilter([0, 0, 10, 10])],
            boxes)
        assert indices == [0]
        assert np.allclose(kept[0], boxes[0])

    def test_region_center_mode(self):
        from text_to_speech_tpu.utils.image.boxes import RegionFilter
        f = RegionFilter([0, 0, 2, 2], mode = 'center')
        keep = f(boxes = np.array([[1, 1, 2, 2], [3, 3, 5, 5]], np.float32))
        assert list(keep) == [0]

    def test_repetition_filter_needs_n_frames(self):
        from text_to_speech_tpu.utils.image.boxes import RepetitionFilter
        f = RepetitionFilter(n_repeat = 2)
        box = np.array([[0, 0, 1, 1]], np.float32)
        assert len(f(boxes = box)) == 0          # first sighting: held back
        assert len(f(boxes = box + 1e-3)) == 1   # second: emitted

    def test_repetition_filter_drops_unseen(self):
        from text_to_speech_tpu.utils.image.boxes import RepetitionFilter
        f = RepetitionFilter(n_repeat = 2, max_unseen = 0)
        f(boxes = np.array([[0, 0, 1, 1]], np.float32))
        f(boxes = np.array([[5, 5, 6, 6]], np.float32))   # original unseen
        f(boxes = np.array([[5, 5, 6, 6]], np.float32))
        # the [0,0,1,1] candidate aged out: a new sighting is 1st again
        assert len(f(boxes = np.array([[0, 0, 1, 1]], np.float32))) == 0


# ---------------------------------------------------------------------------
# video subsystem
# ---------------------------------------------------------------------------


class _FakeCamera:
    """Synthetic `read()` source (the camera protocol `_open_source`
    passes through)."""

    def __init__(self, n = 8, fail_at = None):
        self.n, self.i = n, 0
        self.fail_at = fail_at
        self.released = False

    def read(self):
        self.i += 1
        if self.fail_at and self.i == self.fail_at:
            return False, None
        if self.i > self.n:
            return False, None
        return True, np.full((4, 4, 3), self.i % 256, np.uint8)

    def release(self):
        self.released = True


class TestFrameGenerator:
    def test_nb_frames_and_index(self):
        from text_to_speech_tpu.utils.image.video import frame_generator
        frames = list(frame_generator(_FakeCamera(), nb_frames = 5,
                                      add_index = True))
        assert len(frames) == 5
        assert frames[0]['frame_index'] == 0
        assert frames[0]['image'][0, 0, 0] == 1

    def test_frames_step(self):
        from text_to_speech_tpu.utils.image.video import frame_generator
        frames = list(frame_generator(_FakeCamera(8), frames_step = 2))
        assert [int(f[0, 0, 0]) for f in frames] == [1, 3, 5, 7]

    def test_survives_transient_failures(self):
        from text_to_speech_tpu.utils.image.video import frame_generator
        frames = list(frame_generator(_FakeCamera(6, fail_at = 3),
                                      max_failures = 2))
        assert len(frames) == 5          # one dropped read, stream continues

    def test_add_copy_isolates_buffer(self):
        from text_to_speech_tpu.utils.image.video import frame_generator
        frame = next(iter(frame_generator(_FakeCamera(), add_copy = True)))
        assert 'image_copy' in frame
        frame['image_copy'][0, 0, 0] = 99
        assert frame['image'][0, 0, 0] != 99


class TestStreamCamera:
    def test_transform_pipeline_processes_all_frames(self):
        from text_to_speech_tpu.utils.image.video import stream_camera
        seen = []
        n = stream_camera(
            _FakeCamera(6),
            transform_fn = lambda f: seen.append(int(np.asarray(f).max())))
        assert n == 6
        assert seen == [1, 2, 3, 4, 5, 6]

    def test_transform_errors_are_isolated(self):
        from text_to_speech_tpu.utils.image.video import stream_camera

        def bomb(frame):
            raise RuntimeError('boom')

        n = stream_camera(_FakeCamera(3), transform_fn = bomb)
        assert n == 3                    # capture loop keeps going


class TestVideoGates:
    def test_reader_gates_without_ffmpeg(self):
        from text_to_speech_tpu.utils.image import video
        if shutil.which('ffmpeg'):
            pytest.skip('ffmpeg present')
        with pytest.raises(RuntimeError, match = 'ffmpeg'):
            video.FFMPEGReader('/tmp/nonexistent.mp4')

    def test_frame_size_resolution(self):
        from text_to_speech_tpu.utils.image.video import _get_frame_size
        assert _get_frame_size(None, {'image_h': 48, 'image_w': 64}) \
            == (48, 64)
        assert _get_frame_size(None, {'s': '64x48'}) == (48, 64)
        assert _get_frame_size(None, {'image_shape': (48, 64, 3)}) \
            == (48, 64)
        with pytest.raises(ValueError):
            _get_frame_size(None, {})


class TestGifSprite:
    def test_build_gif(self, tmp_path):
        from text_to_speech_tpu.utils.image.video import build_gif
        path = str(tmp_path / 'out.gif')
        out = build_gif([np.random.rand(8, 8, 3) for _ in range(4)],
                        path, fps = 5, keep_frames = 2)
        assert os.path.exists(out)

    def test_build_sprite_tiles_square(self, tmp_path):
        from text_to_speech_tpu.utils.image.video import build_sprite
        from text_to_speech_tpu.utils.image.image_io import load_image
        path = str(tmp_path / 'sprite.jpg')
        build_sprite([np.random.rand(8, 8, 3) for _ in range(5)],
                     image_size = 16, filename = path)
        sprite = load_image(path)
        assert sprite.shape == (48, 48, 3)    # ceil(sqrt(5)) = 3 tiles


class TestImageProcessing:
    def test_pad_image_modes(self):
        import numpy as np
        from text_to_speech_tpu.utils.image import pad_image
        img = np.arange(12, dtype = np.float32).reshape(2, 2, 3)
        after = pad_image(img, (4, 3), 'after')
        assert after.shape == (4, 3, 3)
        assert np.all(after[:2, :2] == img) and after[3, 2, 0] == 0
        before = pad_image(img, (4, 3), 'before', pad_value = 7)
        assert before.shape == (4, 3, 3)
        assert np.all(before[2:, 1:] == img) and before[0, 0, 0] == 7
        even = pad_image(img, (4, 4), 'even')
        assert np.all(even[1:3, 1:3] == img)
        rep = pad_image(img, (3, 3), 'repeat_last')
        assert np.all(rep[2] == rep[1]) and np.all(rep[:, 2] == rep[:, 1])
        batched = pad_image(img[None], (4, 3), 'after')
        assert batched.shape == (1, 4, 3, 3)

    def test_get_output_size(self):
        import numpy as np
        from text_to_speech_tpu.utils.image import get_output_size
        img = np.zeros((30, 50, 3))
        assert get_output_size(img) == (30, 50)
        assert get_output_size(img, (64, 64)) == (64, 64)
        assert get_output_size(img, (-1, 100)) == (30, 100)
        assert get_output_size(img, (-1, 100),
                               preserve_aspect_ratio = True) == (60, 100)
        assert get_output_size(img, multiples = (32, 32)) == (32, 64)
        assert get_output_size(img, multiples = (32, 32),
                               round = True) == (32, 64)

    def test_rotate_image(self):
        import numpy as np
        from text_to_speech_tpu.utils.image import rotate_image
        img = np.zeros((8, 8, 3), np.float32)
        img[0, :, 0] = 1.                      # top row red
        rot = rotate_image(img, 90, method = 'nearest')
        assert rot.shape == img.shape
        assert rot[:, 0, 0].sum() > rot[0, :, 0].sum()  # moved to left column

    def test_normalization_registry(self):
        import numpy as np
        import pytest
        from text_to_speech_tpu.utils.image import (
            get_image_normalization_fn, normalize_image, build_mean_normalize)
        img = (np.ones((2, 2, 3)) * 255).astype(np.uint8)
        assert np.allclose(normalize_image(img, '01'), 1.)
        assert np.allclose(normalize_image(img, 'centered'), 1.)
        vgg = normalize_image(img, 'vgg')
        assert vgg.shape == img.shape and vgg[0, 0, 0] != 1.
        fn = build_mean_normalize([0.5, 0.5, 0.5], [2., 2., 2.])
        assert np.allclose(fn(np.ones((1, 1, 3))), 0.25)
        assert get_image_normalization_fn(None)(img).dtype == np.float32
        with pytest.raises(ValueError):
            get_image_normalization_fn('nope')
        # the full reference scheme set (image_normalization.py:47-59)
        rnd = np.random.RandomState(0).rand(4, 4, 3).astype(np.float32) * 255
        out = normalize_image(rnd, 'normal')
        assert abs(float(out.mean())) < 1e-5 and abs(float(out.std()) - 1.) < 1e-4
        assert np.allclose(normalize_image(img, 'tanh'), 1.)
        assert np.allclose(normalize_image(img, 'mobilenet'), 1.)
        assert normalize_image(img, 'clip').shape == img.shape
        assert np.allclose(normalize_image(img, 'easyocr'), 1.)
        bgr = normalize_image(img, 'vggface')
        assert bgr.shape == img.shape and bgr[0, 0, 0] != 255.
        # dict / tuple dispatch builds a mean normalizer
        assert np.allclose(get_image_normalization_fn(
            {'means': 0.5, 'std': 2.})(np.ones((1, 1, 3))), 0.25)
        assert np.allclose(get_image_normalization_fn(
            ([0.5], [2.]))(np.ones((1, 1, 3))), 0.25)

    def test_size_and_uint8(self, tmp_path):
        import numpy as np
        from text_to_speech_tpu.utils.image import (
            get_image_size, convert_to_uint8, save_image)
        img = np.random.rand(6, 9, 3).astype(np.float32)
        assert get_image_size(img) == (6, 9)
        assert get_image_size(img[None]) == (6, 9)
        path = save_image(str(tmp_path / 'x.png'), img)
        assert get_image_size(path) == (6, 9)
        u8 = convert_to_uint8(img)
        assert u8.dtype == np.uint8 and u8.max() <= 255
        assert convert_to_uint8(u8) is u8


class TestBoxVisualization:
    def test_draw_boxes_paints_border(self):
        from text_to_speech_tpu.utils.image import draw_boxes
        img = np.zeros((32, 32, 3), np.uint8)
        out = draw_boxes(img, [[4, 4, 20, 20]], thickness = 2, show_text = False)
        assert out.shape == (32, 32, 3) and out.dtype == np.uint8
        assert out[4, 10].any() and out[10, 4].any()    # top + left borders
        assert not out[10, 10].any()                     # interior untouched
        assert not img.any()                             # input not mutated

    def test_draw_boxes_relative_and_labels(self):
        from text_to_speech_tpu.utils.image import draw_boxes
        img = np.zeros((40, 40, 3), np.float32)
        out = draw_boxes(img, [[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]],
                         labels = ['a', 'b'], scores = [0.9, 0.5])
        assert out.dtype == np.uint8 and out.any()

    def test_draw_boxes_numpy_fallback(self, monkeypatch):
        import builtins
        from text_to_speech_tpu.utils.image import visualization
        real_import = builtins.__import__

        def no_cv2(name, *a, ** k):
            if name == 'cv2': raise ImportError(name)
            return real_import(name, *a, ** k)

        monkeypatch.setattr(builtins, '__import__', no_cv2)
        out = visualization.draw_boxes(
            np.zeros((16, 16, 3), np.uint8), [[2, 2, 10, 10]],
            labels = ['x'], shape = 'rectangle')
        assert out[2, 5].any()

    def test_show_boxes_returns_crops(self):
        from text_to_speech_tpu.utils.image import show_boxes
        img = np.arange(32 * 32 * 3, dtype = np.uint8).reshape(32, 32, 3)
        crops = show_boxes(img, [[0, 0, 8, 8], [8, 8, 16, 24]])
        assert len(crops) == 2
        assert crops[0].shape == (8, 8, 3) and crops[1].shape == (16, 8, 3)


class TestDisplayers:
    def test_boxes_displayer(self):
        from text_to_speech_tpu.utils.callbacks import BoxesDisplayer
        cb = BoxesDisplayer()
        out = {'image': np.zeros((16, 16, 3), np.uint8),
               'boxes': np.array([[2, 2, 10, 10]])}
        infos = cb({}, out)
        assert 'drawn' in infos and infos['drawn'].any()

    def test_boxes_displayer_crop_mode(self):
        from text_to_speech_tpu.utils.callbacks import BoxesDisplayer
        cb = BoxesDisplayer(crop = True)
        infos = cb({}, {'image': np.ones((16, 16, 3), np.uint8),
                        'boxes': np.array([[0, 0, 4, 4]])})
        assert len(infos['crops']) == 1

    def test_ocr_displayer(self):
        from text_to_speech_tpu.utils.callbacks import OCRDisplayer
        cb = OCRDisplayer()
        infos = cb({}, {'image': np.zeros((8, 8, 3), np.uint8),
                        'boxes': np.array([[1, 1, 6, 6]]),
                        'text': ['hello', 'world']})
        assert infos['ocr_text'] == 'hello\nworld'

    def test_missing_keys_noop(self):
        from text_to_speech_tpu.utils.callbacks import BoxesDisplayer
        infos = BoxesDisplayer()({}, {'other': 1})
        assert 'drawn' not in infos


# smoke tier: host-side/cheap-compile tests that gate every commit
# (<3 min cold on one core; see pytest.ini)
pytestmark = [pytest.mark.smoke]
