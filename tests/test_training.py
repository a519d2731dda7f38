import numpy as np
import jax
import jax.numpy as jnp
import pytest

from text_to_speech_tpu.train.losses import (
    get_loss, TacotronLoss, TextLoss, GE2ELoss, list_losses,
)
from text_to_speech_tpu.train.optimizers import (
    get_optimizer, get_scheduler, list_schedulers,
)
from text_to_speech_tpu.train.datasets import (
    Dataset, prepare_dataset, train_test_split, GE2EDataset,
)

KEY = jax.random.PRNGKey(0)


class TestTacotronLoss:
    def _data(self, B = 2, T = 6, C = 4):
        k1, k2, k3 = jax.random.split(KEY, 3)
        mel_t = jax.random.normal(k1, (B, T, C))
        gate_t = jnp.zeros((B, T)).at[:, -1].set(1.)
        mel_p = jax.random.normal(k2, (B, T, C))
        gate_p = jax.nn.sigmoid(jax.random.normal(k3, (B, T)))
        return (mel_t, gate_t), (mel_p, mel_p * 0.9, gate_p)

    def test_components(self):
        loss = TacotronLoss()
        y_true, y_pred = self._data()
        out = loss(y_true, y_pred)
        assert set(out) == {'loss', 'mse_mel_loss', 'mse_mel_postnet_loss', 'gate_loss'}
        assert out['loss'].shape == (2,)
        np.testing.assert_allclose(
            np.asarray(out['loss']),
            np.asarray(out['mse_mel_loss'] + out['mse_mel_postnet_loss'] + out['gate_loss']),
            rtol = 1e-5,
        )

    def test_perfect_prediction(self):
        loss = TacotronLoss()
        y_true, _ = self._data()
        mel_t, gate_t = y_true
        out = loss(y_true, (mel_t, mel_t, gate_t))
        assert float(out['mse_mel_loss'].max()) < 1e-10
        assert float(out['gate_loss'].max()) < 1e-5

    def test_mask_excludes_final_frame(self):
        """mask = 1-gate: corrupting the gated (final) frame changes nothing."""
        loss = TacotronLoss(mask_mel_padding = True)
        y_true, y_pred = self._data()
        mel_p, post_p, gate_p = y_pred
        corrupted = mel_p.at[:, -1].set(999.)
        out1 = loss(y_true, (mel_p, post_p, gate_p))
        out2 = loss(y_true, (corrupted, post_p, gate_p))
        np.testing.assert_allclose(
            np.asarray(out1['mse_mel_loss']), np.asarray(out2['mse_mel_loss'])
        )

    def test_multiple_mel_losses(self):
        loss = TacotronLoss(mel_loss = ['mse', 'mae'])
        assert 'mae_mel_loss' in loss.output_names
        y_true, y_pred = self._data()
        out = loss(y_true, y_pred)
        assert 'mae_mel_postnet_loss' in out

    def test_registry(self):
        assert isinstance(get_loss('TacotronLoss'), TacotronLoss)
        assert isinstance(get_loss({'class_name': 'TextLoss', 'pad_value': 3}), TextLoss)
        with pytest.raises(ValueError):
            get_loss('NopeLoss')
        assert 'waveglowloss' in list_losses()


class TestTextLoss:
    def test_masked(self):
        loss = TextLoss(pad_value = 0)
        logits = jnp.zeros((1, 3, 5)).at[0, 0, 2].set(10.)
        tokens = jnp.array([[2, 0, 0]])
        out = loss(tokens, logits)
        assert float(out['loss'][0]) < 0.1


class TestGE2ELoss:
    def test_separated_clusters_low_loss(self):
        loss = GE2ELoss()
        emb = jnp.eye(4)[:, None, :].repeat(3, axis = 1)  # 4 speakers, 3 utts, orthogonal
        emb = emb + jax.random.normal(KEY, emb.shape) * 0.01
        out_good = loss(None, emb)
        shuffled = jax.random.normal(KEY, (4, 3, 4))
        out_bad = loss(None, shuffled)
        assert float(out_good['loss'].mean()) < float(out_bad['loss'].mean())


class TestOptimizers:
    def test_basic_build(self):
        tx = get_optimizer('adam', lr = 1e-3)
        params = {'w': jnp.ones(3)}
        state = tx.init(params)
        updates, _ = tx.update({'w': jnp.ones(3)}, state, params)
        assert updates['w'].shape == (3,)

    def test_clip_and_schedule(self):
        tx = get_optimizer('adamw', lr_scheduler = {
            'name': 'WarmupScheduler', 'warmup_steps': 10, 'dim': 8,
        }, clip_norm = 1.0)
        params = {'w': jnp.ones(3)}
        state = tx.init(params)
        tx.update({'w': jnp.full(3, 100.)}, state, params)

    def test_schedulers_shapes(self):
        for name in list_schedulers():
            sched = get_scheduler(name)
            v1, v2 = float(sched(jnp.asarray(1))), float(sched(jnp.asarray(1000)))
            assert np.isfinite(v1) and np.isfinite(v2)

    def test_warmup_increases_then_decays(self):
        sched = get_scheduler('WarmupScheduler', warmup_steps = 100, dim = 64)
        lr10, lr100, lr10000 = (float(sched(jnp.asarray(s))) for s in (10, 100, 10000))
        assert lr10 < lr100 and lr10000 < lr100


class TestDatasets:
    def test_pipeline_stages(self):
        ds = Dataset(
            list(range(10)),
            map_fn = lambda x: x * 2,
            filter_fn = lambda x: x < 12,
            batch_size = 2,
            collate_fn = lambda items: np.asarray(items),
            shuffle = False,
        )
        batches = list(ds)
        assert len(batches) == 3
        np.testing.assert_array_equal(batches[0], [0, 2])

    def test_shuffle_differs_by_epoch(self):
        ds = Dataset(list(range(32)), batch_size = 32, shuffle = True)
        e1, e2 = list(ds)[0], list(ds)[0]
        assert e1 != e2

    def test_map_error_skipped(self):
        def bad(x):
            if x == 1: raise ValueError()
            return x
        ds = Dataset([0, 1, 2], map_fn = bad, batch_size = 1)
        assert len(list(ds)) == 2

    def test_train_test_split(self):
        train, valid = train_test_split(list(range(100)), valid_size = 0.2)
        assert len(train) == 80 and len(valid) == 20
        assert not (set(map(id, train)) & set(map(id, valid)))

    def test_split_by_speaker(self):
        rows = [{'speaker': s, 'i': i} for i, s in enumerate('aabbccdd')]
        train, valid = train_test_split(rows, valid_size = 0.25, split_column = 'speaker')
        train_spk = {r['speaker'] for r in train}
        valid_spk = {r['speaker'] for r in valid}
        assert not (train_spk & valid_spk)

    def test_ge2e_batches(self):
        rows = [{'speaker': s, 'x': i} for i in range(6) for s in 'abcd']
        ds = GE2EDataset(rows, n_speakers = 2, n_utterances = 3)
        batch = next(iter(ds))
        assert len(batch) == 2
        assert all(len(group) == 3 for group in batch)
        for group in batch:
            assert len({r['speaker'] for r in group}) == 1


class TestParallelMap:
    """Dataset num_parallel_calls (the tf.data analog): identical results
    to the serial map, including filter + exception-skip semantics."""

    def test_matches_serial(self):
        from text_to_speech_tpu.train.datasets import Dataset

        def mapper(row):
            if row == 3:
                raise ValueError('bad row')
            return row * 10

        rows = list(range(8))
        kw = dict(map_fn = mapper, filter_fn = lambda x: x != 50,
                  batch_size = 3, shuffle = False, prefetch = 0)
        serial = [b for b in Dataset(rows, ** kw)]
        parallel = [b for b in Dataset(rows, num_parallel_calls = 4, ** kw)]
        assert serial == parallel
        assert [x for b in parallel for x in b] == [0, 10, 20, 40, 60, 70]
