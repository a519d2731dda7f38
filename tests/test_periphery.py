import os
import numpy as np
import pytest

from text_to_speech_tpu.utils.plot_utils import (
    plot, plot_multiple, plot_audio, plot_spectrogram, plot_embedding,
)
from text_to_speech_tpu.train.audio_datasets import (
    load_dataset, list_datasets, load_ljspeech, load_libri_speech,
    load_common_voice,
)


class TestPlotUtils:
    def test_plot_series(self, tmp_path):
        path = plot({'a': [1, 2, 3], 'b': [3, 2, 1]},
                    filename = str(tmp_path / 'p.png'), title = 't')
        assert os.path.getsize(path) > 0

    def test_plot_multiple(self, tmp_path):
        path = plot_multiple(np.arange(5), np.random.rand(4, 6), ncols = 2,
                             filename = str(tmp_path / 'm.png'))
        assert os.path.exists(path)

    def test_plot_audio_and_mel(self, tmp_path):
        assert os.path.exists(plot_audio(np.random.randn(1000), 22050,
                                         filename = str(tmp_path / 'a.png')))
        assert os.path.exists(plot_spectrogram(np.random.randn(20, 80),
                                               filename = str(tmp_path / 's.png')))

    def test_plot_embedding(self, tmp_path):
        path = plot_embedding(np.random.randn(10, 8),
                              labels = ['a'] * 5 + ['b'] * 5,
                              filename = str(tmp_path / 'e.png'))
        assert os.path.exists(path)

    def test_plot_axis_options(self, tmp_path):
        path = plot([1., 10., 100.], logscale = True, with_grid = True,
                    hlines = 10., vlines = [0, 2], ylim = (0.5, 200),
                    xtick_labels = ['a', 'b', 'c'], tick_rotation = 45,
                    filename = str(tmp_path / 'opts.png'))
        assert os.path.getsize(path) > 0

    def test_plot_date_axis(self, tmp_path):
        import datetime
        xs = [datetime.datetime(2026, 8, 20, 12, 0, i) for i in range(5)]
        path = plot([1, 3, 2, 5, 4], x = xs, date_format = '%H:%M:%S',
                    filename = str(tmp_path / 'dates.png'))
        assert os.path.getsize(path) > 0

    def test_plot_3d(self, tmp_path):
        pts = np.random.RandomState(0).randn(20, 3)
        assert os.path.exists(plot(pts, plot_3d = True,
                                   plot_type = 'scatter',
                                   filename = str(tmp_path / 'p3a.png')))
        assert os.path.exists(plot(np.random.rand(6, 8), plot_3d = True,
                                   filename = str(tmp_path / 'p3b.png')))

    def test_plot_into_existing_ax(self, tmp_path):
        import matplotlib
        matplotlib.use('Agg', force = True)
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2)
        plot([1, 2, 3], ax = axes[0], title = 'left')
        plot([3, 2, 1], ax = axes[1], title = 'right')
        out = str(tmp_path / 'composed.png')
        fig.savefig(out)
        plt.close(fig)
        assert os.path.getsize(out) > 0
        assert axes[0].get_title() == 'left'

    def test_plot_3d_into_existing_ax(self, tmp_path):
        """A caller-supplied 3-D axes must not be closed by plot()
        (review finding: the 3-D branch skipped the caller_ax guard)."""
        import matplotlib
        matplotlib.use('Agg', force = True)
        import matplotlib.pyplot as plt
        fig = plt.figure()
        ax = fig.add_subplot(projection = '3d')
        out = plot(np.random.rand(10, 3), ax = ax, plot_3d = True,
                   plot_type = 'scatter', title = 'cloud')
        assert out is fig                       # figure still alive
        path = str(tmp_path / 'p3ax.png')
        fig.savefig(path)
        plt.close(fig)
        assert os.path.getsize(path) > 0

    def test_plot_tick_positions(self, tmp_path):
        path = plot([5, 1, 4, 2], xtick_pos = [0, 3],
                    xtick_labels = ['start', 'end'],
                    ytick_pos = [1, 5], ytick_labels = ['lo', 'hi'],
                    ytick_rotation = 90,
                    filename = str(tmp_path / 'ticks.png'))
        assert os.path.getsize(path) > 0

    def test_plot_bar_and_hist(self, tmp_path):
        assert os.path.exists(plot([3, 1, 2], plot_type = 'bar',
                                   filename = str(tmp_path / 'b.png')))
        assert os.path.exists(plot(np.random.randn(100), plot_type = 'hist',
                                   filename = str(tmp_path / 'h.png')))

    def test_plot_confusion_matrix_from_labels(self, tmp_path):
        from text_to_speech_tpu.utils.plot_utils import plot_confusion_matrix
        path = plot_confusion_matrix(
            true = ['cat', 'dog', 'cat', 'cat'],
            pred = ['cat', 'dog', 'dog', 'cat'],
            filename = str(tmp_path / 'cm.png'))
        assert os.path.getsize(path) > 0

    def test_plot_matrix_normalized(self, tmp_path):
        from text_to_speech_tpu.utils.plot_utils import plot_matrix
        path = plot_matrix(np.random.rand(4, 6), norm = True,
                           x_labels = list('abcdef'),
                           y_labels = list('wxyz'),
                           filename = str(tmp_path / 'mat.png'))
        assert os.path.exists(path)

    def test_plot_classification_topk(self, tmp_path):
        from text_to_speech_tpu.utils.plot_utils import plot_classification
        path = plot_classification(np.random.rand(20), k = 5,
                                   filename = str(tmp_path / 'cls.png'))
        assert os.path.exists(path)

    def test_plot_boxes_overlay(self, tmp_path):
        from text_to_speech_tpu.utils.plot_utils import plot_boxes
        path = plot_boxes(np.array([[0.1, 0.1, 0.4, 0.3]]),
                          image = np.random.rand(32, 32, 3),
                          labels = ['word'], scores = [0.9],
                          filename = str(tmp_path / 'boxes.png'))
        assert os.path.exists(path)

    def test_plot_polygons(self, tmp_path):
        from text_to_speech_tpu.utils.plot_utils import plot_polygons
        path = plot_polygons([np.array([[0, 0], [4, 0], [3, 2], [0, 3]])],
                             labels = ['quad'],
                             filename = str(tmp_path / 'poly.png'))
        assert os.path.exists(path)

    def test_plot_volume(self, tmp_path):
        from text_to_speech_tpu.utils.plot_utils import plot_volume
        path = plot_volume(np.random.rand(6, 6, 6), threshold = 0.8,
                           filename = str(tmp_path / 'vol.png'))
        assert os.path.exists(path)

    def test_plot_distribution(self, tmp_path):
        from text_to_speech_tpu.utils.plot_utils import plot_distribution
        assert os.path.exists(plot_distribution(
            np.random.randn(50), np.random.randn(50) + 1,
            labels = ['a', 'b'], plot_type = 'violin',
            filename = str(tmp_path / 'violin.png')))
        assert os.path.exists(plot_distribution(
            np.random.randn(50), plot_type = 'box',
            filename = str(tmp_path / 'box.png')))


class TestAudioDatasets:
    def test_registry(self):
        assert {'siwis', 'common_voice', 'libri_speech', 'voxforge',
                'ljspeech'} <= set(list_datasets())
        with pytest.raises(ValueError):
            load_dataset('nope', '/tmp')

    def test_ljspeech_layout(self, tmp_path):
        (tmp_path / 'wavs').mkdir()
        with open(tmp_path / 'metadata.csv', 'w') as f:
            f.write('LJ001|raw text|normalized text\n')
        (tmp_path / 'wavs' / 'LJ001.wav').touch()
        df = load_ljspeech(str(tmp_path))
        assert len(df) == 1
        assert df.iloc[0]['text'] == 'normalized text'
        assert df.iloc[0]['speaker'] == 'ljspeech'

    def test_librispeech_layout(self, tmp_path):
        chap = tmp_path / '19' / '198'
        chap.mkdir(parents = True)
        with open(chap / '19-198.trans.txt', 'w') as f:
            f.write('19-198-0000 HELLO WORLD\n19-198-0001 SECOND LINE\n')
        (chap / '19-198-0000.flac').touch()
        (chap / '19-198-0001.flac').touch()
        df = load_libri_speech(str(tmp_path))
        assert len(df) == 2
        assert df.iloc[0]['speaker'] == '19'
        assert df.iloc[0]['text'] == 'hello world'

    def test_common_voice_layout(self, tmp_path):
        (tmp_path / 'clips').mkdir()
        with open(tmp_path / 'validated.tsv', 'w') as f:
            f.write('client_id\tpath\tsentence\n')
            f.write('spk1\tc1.mp3\tbonjour tout le monde\n')
        df = load_common_voice(str(tmp_path))
        assert len(df) == 1
        assert df.iloc[0]['speaker'] == 'spk1'
        assert df.iloc[0]['filename'].endswith(os.path.join('clips', 'c1.mp3'))


# smoke tier: host-side/cheap-compile tests that gate every commit
# (<3 min cold on one core; see pytest.ini)
pytestmark = [pytest.mark.smoke]
