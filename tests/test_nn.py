import numpy as np
import jax
import jax.numpy as jnp
import pytest

from text_to_speech_tpu import nn


KEY = jax.random.PRNGKey(0)


class TestDense:
    def test_shapes(self):
        p = nn.init_dense(KEY, 4, 8)
        y = nn.dense(p, jnp.ones((2, 4)))
        assert y.shape == (2, 8)

    def test_no_bias(self):
        p = nn.init_dense(KEY, 4, 8, use_bias = False)
        assert 'bias' not in p
        assert nn.dense(p, jnp.zeros((1, 4))).sum() == 0


class TestConv:
    def test_same_padding(self):
        p = nn.init_conv1d(KEY, 5, 3, 7)
        y = nn.conv1d(p, jnp.ones((2, 11, 3)), padding = 'SAME')
        assert y.shape == (2, 11, 7)

    def test_dilation(self):
        p = nn.init_conv1d(KEY, 3, 2, 2)
        y = nn.conv1d(p, jnp.ones((1, 16, 2)), dilation = 4, padding = 'SAME')
        assert y.shape == (1, 16, 2)

    def test_transpose_length(self):
        # Keras Conv1DTranspose VALID: out = (T-1)*stride + width
        p = nn.init_conv1d_transpose(KEY, 8, 3, 3)
        y = nn.conv1d_transpose(p, jnp.ones((1, 5, 3)), stride = 4)
        assert y.shape == (1, (5 - 1) * 4 + 8, 3)


class TestBatchNorm:
    def test_train_updates_state(self):
        p, s = nn.init_batch_norm(4)
        x = jax.random.normal(KEY, (8, 10, 4)) * 3. + 1.
        y, s2 = nn.batch_norm(p, s, x, train = True)
        assert abs(float(y.mean())) < 0.1
        assert float(jnp.abs(s2['moving_mean']).sum()) > 0

    def test_eval_uses_moving(self):
        p, s = nn.init_batch_norm(4)
        x = jnp.ones((2, 3, 4))
        y, s2 = nn.batch_norm(p, s, x, train = False)
        np.testing.assert_allclose(np.asarray(y), np.ones((2, 3, 4)), atol = 1e-2)
        assert s2 is s


class TestLSTM:
    def test_cell_step(self):
        p = nn.init_lstm_cell(KEY, 3, 5)
        h, (h2, c2) = nn.lstm_cell(p, jnp.ones((2, 3)), nn.lstm_init_carry(2, 5))
        assert h.shape == (2, 5) and h2.shape == (2, 5) and c2.shape == (2, 5)

    def test_forget_bias(self):
        p = nn.init_lstm_cell(KEY, 3, 5)
        assert np.allclose(np.asarray(p['bias'][5:10]), 1.)

    def test_scan_shapes(self):
        p = nn.init_lstm_cell(KEY, 3, 5)
        ys, (h, c) = nn.lstm(p, jax.random.normal(KEY, (2, 7, 3)))
        assert ys.shape == (2, 7, 5)
        np.testing.assert_allclose(np.asarray(ys[:, -1]), np.asarray(h), atol = 1e-6)

    def test_mask_freezes_state(self):
        p = nn.init_lstm_cell(KEY, 3, 5)
        xs = jax.random.normal(KEY, (1, 6, 3))
        mask = jnp.array([[True, True, True, False, False, False]])
        ys_masked, (h_m, _) = nn.lstm(p, xs, mask = mask)
        ys_short, (h_s, _) = nn.lstm(p, xs[:, :3])
        np.testing.assert_allclose(np.asarray(h_m), np.asarray(h_s), atol = 1e-6)
        assert float(jnp.abs(ys_masked[:, 3:]).max()) == 0.

    def test_bilstm(self):
        p = nn.init_bilstm(KEY, 3, 4)
        ys = nn.bilstm(p, jax.random.normal(KEY, (2, 5, 3)))
        assert ys.shape == (2, 5, 8)


class TestActivations:
    def test_registry(self):
        assert nn.get_activation('relu')(jnp.array([-1., 2.]))[0] == 0.
        assert nn.get_activation(None) is None
        with pytest.raises(ValueError):
            nn.get_activation('nope')

    def test_glu_halves(self):
        y = nn.glu(jnp.ones((2, 8)))
        assert y.shape == (2, 4)


class TestDropout:
    def test_off_at_eval(self):
        x = jnp.ones((4, 4))
        np.testing.assert_array_equal(
            np.asarray(nn.dropout(KEY, x, 0.5, train = False)), np.ones((4, 4))
        )

    def test_scaling(self):
        x = jnp.ones((1000,))
        y = nn.dropout(KEY, x, 0.5, train = True)
        assert abs(float(y.mean()) - 1.) < 0.15
