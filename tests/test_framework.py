import os
import numpy as np
import jax
import pytest

from text_to_speech_tpu.train.history import History
from text_to_speech_tpu.train.checkpoint import (
    CheckpointManager, flatten_tree, unflatten_tree, save_tree, load_tree,
)
from text_to_speech_tpu.utils.callbacks import (
    JSONSaver, SpectrogramSaver, FunctionCallback, apply_callbacks,
)
from text_to_speech_tpu.utils.embeddings import (
    save_embeddings, load_embeddings, select_embedding, compute_centroids,
)
from text_to_speech_tpu.utils.distances import distance
from text_to_speech_tpu.models.weights_converter import (
    name_based_partial_transfer_learning, partial_transfer_learning,
)


class TestHistory:
    def test_epoch_flow(self, tmp_path):
        h = History(str(tmp_path / 'h.json'))
        h.set_config({'lr': 1e-3})
        h.on_epoch_begin()
        h.on_batch_end({'loss': 1.0})
        h.on_batch_end({'loss': 0.5})
        h.on_epoch_end({'loss': 0.75})
        h.on_epoch_begin()
        h.on_batch_end({'loss': 0.4})
        h.on_epoch_end({'loss': 0.4})
        assert h.epochs == 2
        assert h.steps == 3
        best, epoch = h.get_best('loss')
        assert best == 0.4 and epoch == 1

    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / 'h.json')
        h = History(path)
        h.set_config({})
        h.on_epoch_begin(); h.on_epoch_end({'loss': 1.})
        h.save()
        h2 = History.load(path)
        assert h2.epochs == 1
        assert h2.epoch_logs[0]['metrics']['loss'] == 1.


class TestCheckpointTree:
    def test_flatten_roundtrip(self):
        tree = {'a': {'b': np.ones(2), 'c': {'d': np.zeros(3)}}, 'e': np.arange(4)}
        flat = flatten_tree(tree)
        assert set(flat) == {'a/b', 'a/c/d', 'e'}
        rec = unflatten_tree(flat)
        np.testing.assert_array_equal(rec['a']['c']['d'], np.zeros(3))

    def test_save_load_tree(self, tmp_path):
        tree = {'x': {'k': np.random.randn(3, 4)}}
        path = save_tree(str(tmp_path / 't.npz'), tree)
        rec = load_tree(path)
        np.testing.assert_allclose(rec['x']['k'], tree['x']['k'])


class TestCheckpointManager:
    def test_rotation_keeps_best(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), max_to_keep = 2)
        for epoch, metric in [(1, 5.), (2, 1.), (3, 3.), (4, 2.)]:
            mgr.save({'params': {'w': np.full(2, epoch)}}, epoch, metric = metric)
        epochs = [c['epoch'] for c in mgr.checkpoints]
        assert 2 in epochs            # best (metric 1.) survives rotation
        assert epochs[-1] == 4
        assert len(epochs) <= 3
        assert mgr.best_epoch == 2

    def test_load_latest_and_best(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        mgr.save({'params': {'w': np.ones(2)}}, 1, metric = 1.)
        mgr.save({'params': {'w': np.full(2, 2.)}}, 2, metric = 3.)
        latest = mgr.load()
        np.testing.assert_array_equal(latest['params']['w'], np.full(2, 2.))
        best = mgr.load(best = True)
        np.testing.assert_array_equal(best['params']['w'], np.ones(2))

    def test_reload_manifest(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        mgr.save({'params': {'w': np.ones(1)}}, 7)
        mgr2 = CheckpointManager(str(tmp_path))
        assert mgr2.latest_epoch == 7


class TestCallbacks:
    def test_json_saver_cache(self, tmp_path):
        data = {}
        saver = JSONSaver(data, str(tmp_path / 'map.json'), primary_key = 'text')
        apply_callbacks([saver], {}, {'text': 'hi', 'time': 1.5, 'mel': np.ones(3)})
        saver.join()
        assert 'hi' in data
        assert 'mel' not in data['hi']          # non-json values filtered
        assert os.path.exists(str(tmp_path / 'map.json'))

    def test_spectrogram_saver(self, tmp_path):
        saver = SpectrogramSaver(str(tmp_path / 'mel-{}.npy'))
        infos = apply_callbacks([saver], {}, {'mel': [np.ones((4, 3))]})
        saver.join()
        assert os.path.exists(infos['mel'])

    def test_function_callback_and_isolation(self):
        seen = []
        def bad(infos, output, **kw): raise RuntimeError('x')
        cbs = [FunctionCallback(seen.append), bad]
        apply_callbacks(cbs, {}, {'a': 1})
        apply_callbacks(cbs, {}, {'a': 2})
        assert len(seen) == 2
        assert bad not in cbs


class TestEmbeddings:
    def test_npz_roundtrip(self, tmp_path):
        emb = np.random.randn(4, 8).astype(np.float32)
        path = save_embeddings(str(tmp_path / 'e.npz'), emb, speaker = ['a', 'a', 'b', 'b'])
        table = load_embeddings(path)
        np.testing.assert_allclose(table['embedding'], emb)
        assert list(table['speaker']) == ['a', 'a', 'b', 'b']

    def test_select_modes(self):
        emb = np.arange(8, dtype = np.float32).reshape(4, 2)
        table = {'embedding': emb, 'speaker': np.array(['a', 'a', 'b', 'b'])}
        np.testing.assert_allclose(select_embedding(table, 'mean'), emb.mean(0))
        np.testing.assert_allclose(
            select_embedding(table, 'mean', label = 'b'), emb[2:].mean(0))
        assert select_embedding(table, 2).tolist() == [4., 5.]
        with pytest.raises(ValueError):
            select_embedding(table, 'mean', label = 'zz')

    def test_centroids(self):
        emb = np.array([[0., 0.], [2., 2.], [10., 10.]])
        labels, cents = compute_centroids(emb, np.array(['a', 'a', 'b']))
        assert labels == ['a', 'b']
        np.testing.assert_allclose(cents[0], [1., 1.])

    def test_distances(self):
        a, b = np.array([1., 0.]), np.array([0., 1.])
        assert abs(float(distance(a, b, 'euclidean')) - np.sqrt(2)) < 1e-6
        assert abs(float(distance(a, a, 'cosine')) - 1.) < 1e-6
        m = distance(np.eye(2), np.eye(2), 'euclidean', as_matrix = True)
        assert np.asarray(m).shape == (2, 2)


class TestWeightsConverter:
    def test_exact_transfer(self):
        src = {'layer': {'kernel': np.ones((3, 4)), 'bias': np.full(4, 2.)}}
        tgt = {'layer': {'kernel': np.zeros((3, 4)), 'bias': np.zeros(4)}}
        out = name_based_partial_transfer_learning(src, tgt)
        np.testing.assert_allclose(np.asarray(out['layer']['kernel']), 1.)

    def test_partial_widening_zero_pads(self):
        """The SV2TTS case: decoder input widened by the speaker embedding."""
        src = {'rnn': {'kernel': np.ones((8, 4))}}
        tgt = {'rnn': {'kernel': np.full((12, 4), 9.)}}
        out = name_based_partial_transfer_learning(src, tgt, fill_mode = 'zeros')
        arr = np.asarray(out['rnn']['kernel'])
        np.testing.assert_allclose(arr[:8], 1.)
        np.testing.assert_allclose(arr[8:], 0.)

    def test_unmatched_kept(self):
        src = {'a': {'kernel': np.ones(2)}}
        tgt = {'b_new': {'kernel': np.full(2, 5.)}, 'a': {'kernel': np.zeros(2)}}
        out = name_based_partial_transfer_learning(src, tgt)
        np.testing.assert_allclose(np.asarray(out['b_new']['kernel']), 5.)
        np.testing.assert_allclose(np.asarray(out['a']['kernel']), 1.)

    def test_shape_based(self):
        src = {'x': np.ones((2, 3)), 'y': np.full((4,), 7.)}
        tgt = {'p': np.zeros((2, 3)), 'q': np.zeros((4,))}
        out = partial_transfer_learning(src, tgt)
        np.testing.assert_allclose(np.asarray(out['p']), 1.)
        np.testing.assert_allclose(np.asarray(out['q']), 7.)
