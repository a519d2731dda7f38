import os
import numpy as np
import jax
import pytest

from text_to_speech_tpu.train.history import History
from text_to_speech_tpu.train.checkpoint import (
    CheckpointManager, AsyncCheckpointSaver,
    flatten_tree, unflatten_tree, save_tree, load_tree,
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


class TestAsyncCheckpointSaver:
    def test_background_save_matches_sync(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), max_to_keep = 2)
        saver = AsyncCheckpointSaver(mgr)
        trees = {
            'params': {'w': jax.numpy.arange(6.).reshape(2, 3)},
            'state': {'s': np.full(3, 7.)},
        }
        saver.save(trees, 1, metric = 2.5)
        saver.save({'params': {'w': jax.numpy.ones((2, 3))}}, 2, metric = 1.0)
        saver.close()
        assert mgr.latest_epoch == 2
        assert mgr.best_epoch == 2
        rec = mgr.load(epoch = 1)
        np.testing.assert_allclose(rec['params']['w'], np.arange(6.).reshape(2, 3))
        np.testing.assert_allclose(rec['state']['s'], np.full(3, 7.))

    def test_background_error_surfaces_on_next_call(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        saver = AsyncCheckpointSaver(mgr)

        class Boom:
            def __array__(self, dtype = None):
                raise RuntimeError('boom')

        saver.save({'params': {'w': Boom()}}, 1)
        with pytest.raises(RuntimeError, match = 'boom'):
            saver.wait_until_finished()
        # a later save still works
        saver.save({'params': {'w': np.ones(2)}}, 2)
        saver.close()
        assert mgr.latest_epoch == 2

    def test_fit_async_checkpointing_end_to_end(self, tmp_path):
        # the trainer path: async per-epoch save produces loadable rotating
        # checkpoints identical in layout to the sync path
        mgr = CheckpointManager(str(tmp_path / 'async'))
        saver = AsyncCheckpointSaver(mgr)
        for epoch in range(1, 4):
            saver.save({'params': {'w': np.full(2, float(epoch))}}, epoch,
                       metric = float(4 - epoch))
        saver.close()
        sync = CheckpointManager(str(tmp_path / 'sync'))
        for epoch in range(1, 4):
            sync.save({'params': {'w': np.full(2, float(epoch))}}, epoch,
                      metric = float(4 - epoch))
        assert [c['epoch'] for c in mgr.checkpoints] \
            == [c['epoch'] for c in sync.checkpoints]
        assert mgr.best_epoch == sync.best_epoch == 3
        np.testing.assert_array_equal(
            mgr.load()['params']['w'], sync.load()['params']['w'])


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

    def test_h5_roundtrip(self, tmp_path):
        emb = np.random.randn(4, 8).astype(np.float32)
        path = save_embeddings(str(tmp_path / 'e.h5'), emb, speaker = ['a', 'a', 'b', 'b'])
        table = load_embeddings(path)
        np.testing.assert_allclose(table['embedding'], emb)
        assert list(table['speaker']) == ['a', 'a', 'b', 'b']
        # selection over the restored metadata column works
        np.testing.assert_allclose(
            select_embedding(table, 'mean', label = 'b'), emb[2:].mean(0))

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

    def test_dice(self):
        x = np.array([1., 1., 0., 0.])
        y = np.array([1., 0., 1., 0.])
        assert abs(float(distance(x, y, 'dice')) - 0.5) < 1e-6
        assert abs(float(distance(x, x, 'dice')) - 1.) < 1e-6

    def test_knn(self):
        from text_to_speech_tpu.utils.distances import knn
        emb = np.array([[0., 0.], [0.1, 0.], [5., 5.], [5.1, 5.]])
        ids = np.array([0, 0, 1, 1])
        pred = knn([[0.05, 0.], [5.05, 5.]], emb, ids, k = 2)
        assert pred.tolist() == [0, 1]
        pred_w, scores = knn([0.05, 0.], emb, ids, k = 4,
                             weighted = True, return_scores = True)
        assert pred_w.tolist() == [0] and scores[0] > 0.


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


class TestKerasConverter:
    """Keras/TF2-convention checkpoint import (reference checkpoints are
    Keras weights; /root/reference/models/weights_converter.py:48-84,103).
    The synthetic state dict below uses the reference architecture's layer
    names (/root/reference/architectures/tacotron2_arch.py) with this
    framework's tiny-hparams shapes."""

    TINY = dict(
        vocab_size = 20, n_mel_channels = 8,
        encoder_embedding_dim = 16, encoder_n_conv = 2, encoder_kernel_size = 3,
        prenet_sizes = (8, 8), lsa_attention_dim = 8, lsa_attention_filters = 4,
        lsa_attention_kernel_size = 7, attention_rnn_dim = 16,
        decoder_rnn_dim = 16, postnet_n_conv = 2, postnet_filters = 8,
        postnet_kernel_size = 3,
    )

    @staticmethod
    def _keras_name(path):
        """Our tree path -> the reference Keras model's variable path."""
        import re as _re
        m = _re.match(r'encoder/embedding/embeddings', path)
        if m: return 'tacotron2/encoder/encoder_embeddings/embeddings'
        m = _re.match(r'encoder/conv_(\d+)/conv/(\w+)', path)
        if m: return 'tacotron2/encoder/conv_{}/{}'.format(int(m.group(1)) + 1, m.group(2))
        m = _re.match(r'encoder/conv_(\d+)/bn/(\w+)', path)
        if m:
            var = {'moving_var': 'moving_variance'}.get(m.group(2), m.group(2))
            return 'tacotron2/encoder/norm_{}/{}'.format(int(m.group(1)) + 1, var)
        m = _re.match(r'encoder/bilstm/(forward|backward)/(\w+)', path)
        if m: return ('tacotron2/encoder/bidirectional/{}_lstm/lstm_cell/{}'
                      .format(m.group(1), m.group(2)))
        m = _re.match(r'decoder/prenet/layer_(\d+)/(\w+)', path)
        if m: return 'tacotron2/decoder_cell/prenet/layer_{}/{}'.format(*m.groups())
        m = _re.match(r'decoder/attention_rnn/(\w+)', path)
        if m: return 'tacotron2/decoder_cell/attention_rnn/{}'.format(m.group(1))
        m = _re.match(r'decoder/attention/(query|memory|value)/kernel', path)
        if m: return ('tacotron2/decoder_cell/location_sensitive_attention/'
                      '{}_layer/kernel'.format(m.group(1)))
        m = _re.match(r'decoder/attention/(location_conv|location_dense)/kernel', path)
        if m: return ('tacotron2/decoder_cell/location_sensitive_attention/'
                      'location_layer/{}/kernel'.format(m.group(1)))
        m = _re.match(r'decoder/decoder_rnn/cell_(\d+)/(\w+)', path)
        if m: return 'tacotron2/decoder_cell/decoder_rnn/cell_{}/{}'.format(*m.groups())
        m = _re.match(r'decoder/linear_projection/(\w+)', path)
        if m: return 'tacotron2/decoder/linear_projection/{}'.format(m.group(1))
        m = _re.match(r'decoder/gate_layer/(\w+)', path)
        if m: return 'tacotron2/decoder/gate_output/{}'.format(m.group(1))
        m = _re.match(r'postnet/conv_(\d+)/conv/(\w+)', path)
        if m: return 'tacotron2/postnet/conv_{}/{}'.format(int(m.group(1)) + 1, m.group(2))
        m = _re.match(r'postnet/conv_(\d+)/bn/(\w+)', path)
        if m:
            var = {'moving_var': 'moving_variance'}.get(m.group(2), m.group(2))
            return 'tacotron2/postnet/norm_{}/{}'.format(int(m.group(1)) + 1, var)
        raise AssertionError('no keras name for ' + path)

    def _synthetic(self):
        from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
        arch = Tacotron2(** self.TINY)
        params, state = arch.init(jax.random.PRNGKey(0))
        target = dict(flatten_tree(params), ** flatten_tree(state))
        rng = np.random.RandomState(0)
        keras_sd = {}
        for path, v in target.items():
            val = rng.normal(0., 0.1, np.shape(v)).astype('float32')
            if path.endswith('moving_var'):        # variances must be positive
                val = np.abs(val) + 0.5
            keras_sd[self._keras_name(path)] = val
        return arch, params, state, target, keras_sd

    def test_round_trip(self):
        from text_to_speech_tpu.models.weights_converter import convert_keras_variables
        arch, params, state, target, keras_sd = self._synthetic()
        new_params, new_state = convert_keras_variables(keras_sd)

        got = dict(flatten_tree(new_params), ** flatten_tree(new_state))
        assert set(got) == set(target), (
            set(got) ^ set(target))
        # Keras layouts match ours: values must transfer verbatim
        for path, v in got.items():
            np.testing.assert_array_equal(
                v, keras_sd[self._keras_name(path)], err_msg = path)
        # params/state split: moving stats land in state
        assert 'moving_mean' in flatten_tree(new_state).get(
            'encoder/conv_0/bn/moving_mean', 'missing') or \
            'encoder/conv_0/bn/moving_mean' in flatten_tree(new_state)

        # converted trees drive a forward pass
        tokens = np.tile(np.arange(1, 9, dtype = np.int32), (2, 1))
        mel_in = np.zeros((2, 4, self.TINY['n_mel_channels']), np.float32)
        (dec, post, gates), _ = arch(
            new_params, new_state, tokens, mel_in,
            mel_lengths = np.full((2,), 4, np.int32),
            train = False, rng = jax.random.PRNGKey(0))
        assert np.all(np.isfinite(np.asarray(dec)))

    def test_tf_checkpoint_names(self):
        """Legacy TF-checkpoint form: 'model/' prefix +
        '.ATTRIBUTES/VARIABLE_VALUE' suffixes (reference
        load_saved_model_variables)."""
        from text_to_speech_tpu.models.weights_converter import convert_keras_variables
        arch, params, state, target, keras_sd = self._synthetic()
        tf_sd = {
            'model/' + k + '/.ATTRIBUTES/VARIABLE_VALUE': v
            for k, v in keras_sd.items()
        }
        new_params, new_state = convert_keras_variables(tf_sd)
        got = dict(flatten_tree(new_params), ** flatten_tree(new_state))
        assert set(got) == set(target)


class TestEmbeddingHelpers:
    def test_embeddings_to_np_forms(self):
        import numpy as np
        from text_to_speech_tpu.utils.embeddings import embeddings_to_np

        assert embeddings_to_np([[1., 2.]]).shape == (1, 2)
        assert np.allclose(embeddings_to_np('[1, 2, 3]'), [1, 2, 3])
        two = embeddings_to_np('[[1, 2], [3, 4]]')
        assert two.shape == (2, 2) and two[1, 0] == 3
        table = {'embedding': np.eye(2), 'id': ['a', 'b']}
        assert embeddings_to_np(table).shape == (2, 2)

    def test_aggregate_embeddings(self):
        import numpy as np
        from text_to_speech_tpu.utils.embeddings import aggregate_embeddings

        table = {'embedding': np.array([[0., 0.], [2., 2.], [4., 4.]]),
                 'speaker': ['a', 'a', 'b']}
        out = aggregate_embeddings(table, column = 'speaker')
        agg = out['speaker_embedding']
        assert np.allclose(agg[0], [1., 1.]) and np.allclose(agg[1], [1., 1.])
        assert np.allclose(agg[2], [4., 4.])

    def test_get_embeddings_with_ids(self):
        import numpy as np
        from text_to_speech_tpu.utils.embeddings import get_embeddings_with_ids

        emb = np.arange(8.).reshape(4, 2)
        assign = np.array([0, 1, 0, 2])
        sub, ids = get_embeddings_with_ids(emb, assign, np.array([0]))
        assert sub.shape == (2, 2) and ids.tolist() == [0, 0]


class TestEmbeddingIdsJitGuard:
    def test_traced_inputs_raise(self):
        import jax
        import numpy as np
        import pytest
        from text_to_speech_tpu.utils.embeddings import get_embeddings_with_ids

        emb = np.arange(8.).reshape(4, 2)
        assign = np.array([0, 1, 0, 2])
        with pytest.raises(TypeError):
            jax.jit(lambda e, a: get_embeddings_with_ids(e, a, np.array([0])))(
                emb, assign)
