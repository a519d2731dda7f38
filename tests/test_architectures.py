import numpy as np
import jax
import jax.numpy as jnp
import pytest

from text_to_speech_tpu.models.tacotron2_arch import Tacotron2, Tacotron2InferenceOutput
from text_to_speech_tpu.models.waveglow_arch import WaveGlow
from text_to_speech_tpu.models.registry import get_architecture, list_architectures

KEY = jax.random.PRNGKey(0)

TINY_TACO = dict(
    vocab_size = 20,
    n_mel_channels = 6,
    encoder_embedding_dim = 16,
    encoder_n_conv = 2,
    encoder_kernel_size = 3,
    prenet_sizes = (8, 8),
    lsa_attention_dim = 8,
    lsa_attention_filters = 4,
    lsa_attention_kernel_size = 7,
    attention_rnn_dim = 12,
    decoder_rnn_dim = 12,
    postnet_n_conv = 3,
    postnet_filters = 8,
    postnet_kernel_size = 3,
    max_decoder_steps = 20,
)

TINY_WG = dict(
    n_mel_channels = 6,
    n_flows = 4,
    n_group = 4,
    n_early_every = 2,
    n_early_size = 2,
    wn_layers = 2,
    wn_channels = 8,
    upsample_width = 8,
    upsample_stride = 4,
)


@pytest.fixture(scope = 'module')
def taco():
    model = Tacotron2(** TINY_TACO)
    params, state = model.init(KEY)
    return model, params, state


@pytest.fixture(scope = 'module')
def wg():
    model = WaveGlow(** TINY_WG)
    params = model.init(KEY)
    return model, params


def tokens_batch():
    t = np.zeros((2, 7), np.int32)
    t[0, :7] = np.arange(1, 8)
    t[1, :4] = np.arange(1, 5)  # padded row
    return jnp.asarray(t)


class TestTacotron2:
    def test_teacher_forced_shapes(self, taco):
        model, params, state = taco
        tokens = tokens_batch()
        mel = jax.random.normal(KEY, (2, 11, 6))
        lengths = jnp.array([11, 8])
        (dec, post, gates), new_state = model(
            params, state, tokens, mel, mel_lengths = lengths,
            train = True, rng = KEY,
        )
        assert dec.shape == (2, 11, 6)
        assert post.shape == (2, 11, 6)
        assert gates.shape == (2, 11)
        # BN state updated in train mode
        old = state['encoder']['conv_0']['bn']['moving_mean']
        new = new_state['encoder']['conv_0']['bn']['moving_mean']
        assert float(jnp.abs(new - old).sum()) > 0

    def test_padded_frames_zeroed(self, taco):
        model, params, state = taco
        tokens = tokens_batch()
        mel = jax.random.normal(KEY, (2, 11, 6))
        (dec, _, _), _ = model(params, state, tokens, mel, mel_lengths = jnp.array([11, 8]))
        assert float(jnp.abs(dec[1, 8:]).max()) == 0.

    def test_infer_output(self, taco):
        model, params, state = taco
        out = model.infer(params, state, tokens_batch(), rng = KEY,
                          early_stopping = False, max_length = 15)
        assert isinstance(out, Tacotron2InferenceOutput)
        assert out.mel.shape == (2, 15, 6)
        assert out.stop_tokens.shape == (2, 15)
        assert out.attention_weights.shape == (2, 15, 7)
        assert out.lengths.shape == (2,)
        # attention rows are a distribution over non-padded tokens
        attn = np.asarray(out.attention_weights[1, 0])
        np.testing.assert_allclose(attn.sum(), 1., atol = 1e-5)
        assert np.abs(attn[4:]).max() < 1e-6  # padding masked out

    def test_infer_deterministic_reproducible(self, taco):
        model, params, state = taco
        out1 = model.infer(params, state, tokens_batch(), rng = KEY,
                           deterministic = True, early_stopping = False, max_length = 8)
        out2 = model.infer(params, state, tokens_batch(), rng = jax.random.PRNGKey(7),
                           deterministic = True, early_stopping = False, max_length = 8)
        np.testing.assert_allclose(np.asarray(out1.mel), np.asarray(out2.mel), atol = 1e-6)

    def test_infer_prenet_dropout_random(self, taco):
        model, params, state = taco
        out1 = model.infer(params, state, tokens_batch(), rng = KEY,
                           early_stopping = False, max_length = 8)
        out2 = model.infer(params, state, tokens_batch(), rng = jax.random.PRNGKey(7),
                           early_stopping = False, max_length = 8)
        assert float(jnp.abs(out1.mel - out2.mel).max()) > 0

    def test_infer_attention_window(self, taco):
        model, params, state = taco
        out = model.infer(params, state, tokens_batch(), rng = KEY,
                          early_stopping = False, max_length = 8,
                          attn_mask_win_len = 3)
        # each step's attention is confined to <= win_len+1 tokens
        attn = np.asarray(out.attention_weights)
        nonzero = (attn > 1e-8).sum(axis = -1)
        assert nonzero.max() <= 4

    def test_infer_jits(self, taco):
        model, params, state = taco
        jitted = jax.jit(
            lambda p, s, t: model.infer(p, s, t, early_stopping = True, max_length = 12)
        )
        out = jitted(params, state, tokens_batch())
        assert out.mel.shape == (2, 12, 6)

    def test_speaker_conditioning(self):
        model = Tacotron2(** TINY_TACO, speaker_embedding_dim = 5,
                          speaker_concat_pos = 'end')
        params, state = model.init(KEY)
        assert model.encoder_output_dim == 16 + 5
        spk = jax.random.normal(KEY, (2, 5))
        out = model.infer(params, state, tokens_batch(), speaker_embedding = spk,
                          early_stopping = False, max_length = 6)
        assert out.mel.shape == (2, 6, 6)


class TestWaveGlow:
    def test_infer_shape(self, wg):
        model, params = wg
        mel = jax.random.normal(KEY, (2, 12, 6))
        audio = model.infer(params, mel, rng = KEY)
        assert audio.shape == (2, 12 * 4)

    def test_deterministic(self, wg):
        model, params = wg
        mel = jax.random.normal(KEY, (1, 8, 6))
        a1 = model.infer(params, mel, deterministic = True)
        a2 = model.infer(params, mel, deterministic = True, rng = jax.random.PRNGKey(3))
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol = 1e-6)

    def test_forward_shapes(self, wg):
        model, params = wg
        mel = jax.random.normal(KEY, (2, 12, 6))
        audio = jax.random.normal(KEY, (2, 12 * 4))
        z, log_s, log_det = model.forward(params, mel, audio)
        assert z.shape == (2, 12, 4)
        assert np.isfinite(float(log_s)) and np.isfinite(float(log_det))

    def test_invertibility(self, wg):
        """forward then inverse must reconstruct the waveform (flow property)."""
        model, params = wg
        mel = jax.random.normal(KEY, (1, 10, 6))
        audio = jax.random.normal(jax.random.PRNGKey(5), (1, 10 * 4)) * 0.1
        z, _, _ = model.forward(params, mel, audio)
        # inverse consumes [final | early_k(last) | ... | early_k(first)]
        n_rem = model.n_remaining_channels
        early = []
        idx = 0
        hp = model.hp
        for k in range(hp.n_flows):
            if k % hp.n_early_every == 0 and k > 0:
                early.append(z[..., idx: idx + hp.n_early_size])
                idx += hp.n_early_size
        final = z[..., idx:]
        z_inv = jnp.concatenate([final] + list(reversed(early)), axis = -1)
        rec = model.infer(params, mel, z = z_inv, sigma = 1.)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(audio), atol = 1e-3
        )

    def test_loss_finite(self, wg):
        model, params = wg
        mel = jax.random.normal(KEY, (1, 8, 6))
        audio = jax.random.normal(KEY, (1, 8 * 4))
        loss = model.loss(params, mel, audio)
        assert np.isfinite(float(loss))

    def test_conv1d_shifted_matches_dilated(self):
        from text_to_speech_tpu.nn import layers as nnl
        p = nnl.init_conv1d(jax.random.PRNGKey(7), 3, 8, 16)
        x = jax.random.normal(jax.random.PRNGKey(8), (2, 20, 8))
        for d in (1, 2, 4):
            np.testing.assert_allclose(
                np.asarray(nnl.conv1d(p, x, dilation = d, padding = 'SAME')),
                np.asarray(nnl.conv1d_shifted(p, x, dilation = d)),
                atol = 1e-5)
        p1 = nnl.init_conv1d(jax.random.PRNGKey(9), 1, 8, 16)
        np.testing.assert_allclose(
            np.asarray(nnl.conv1d(p1, x)),
            np.asarray(nnl.conv1d_shifted(p1, x)), atol = 1e-6)
        with pytest.raises(ValueError):
            nnl.conv1d_shifted(
                {'kernel': jnp.zeros((2, 8, 16))}, x, dilation = 2)

    def test_wn_train_conv_shifted_parity(self, wg):
        """The shifted-matmul conv formulation is the same contraction:
        forward outputs AND gradients match the dilated-conv path."""
        model, params = wg
        shifted = WaveGlow(** {** TINY_WG, 'wn_train_conv': 'shifted'})
        mel = jax.random.normal(KEY, (2, 8, 6))
        audio = jax.random.normal(jax.random.PRNGKey(4), (2, 8 * 4)) * 0.1
        z0, s0, d0 = model.forward(params, mel, audio)
        z1, s1, d1 = shifted.forward(params, mel, audio)
        np.testing.assert_allclose(np.asarray(z0), np.asarray(z1),
                                   atol = 1e-4)
        np.testing.assert_allclose(float(s0), float(s1), rtol = 1e-4)
        g0 = jax.grad(lambda p: model.loss(p, mel, audio))(params)
        g1 = jax.grad(lambda p: shifted.loss(p, mel, audio))(params)
        for (k0, l0), (k1, l1) in zip(
                jax.tree_util.tree_leaves_with_path(g0),
                jax.tree_util.tree_leaves_with_path(g1)):
            assert k0 == k1
            np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                                       atol = 2e-4, err_msg = str(k0))

    def test_remat_acts_matches_full(self, wg):
        """remat='acts' (save WN acts + residual stream, recompute only
        elementwise) computes the same loss and gradients as full remat."""
        model, params = wg
        mel = jax.random.normal(KEY, (2, 8, 6))
        audio = jax.random.normal(jax.random.PRNGKey(4), (2, 8 * 4)) * 0.1
        l0, g0 = jax.value_and_grad(
            lambda p: model.loss(p, mel, audio, remat = True))(params)
        l1, g1 = jax.value_and_grad(
            lambda p: model.loss(p, mel, audio, remat = 'acts'))(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol = 1e-6)
        for l0_, l1_ in zip(jax.tree_util.tree_leaves(g0),
                            jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(l0_), np.asarray(l1_),
                                       atol = 1e-5)

    def test_wn_train_fused_forward_and_grads(self):
        """hp.wn_train_fused: the Pallas-forward / XLA-backward custom_vjp
        path must produce a loss close to the XLA chain (bf16 kernel
        buffers) and gradients that track the unfused path (the backward
        IS the XLA chain; small drift comes only from downstream flows
        seeing the kernel's forward values)."""
        cfg = dict(n_mel_channels = 6, n_flows = 2, n_group = 8,
                   n_early_every = 4, n_early_size = 2, wn_layers = 2,
                   wn_channels = 128, upsample_width = 8,
                   upsample_stride = 8)
        base = WaveGlow(** cfg)
        fused = WaveGlow(** cfg, wn_train_fused = True)
        params = base.fuse_params(base.init(KEY))
        # the zero-init end conv would zero most WN gradients; perturb so
        # the parity check exercises real gradient flow
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
        params = jax.tree_util.tree_unflatten(treedef, [
            l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)])
        mel = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 6))
        audio = jax.random.normal(jax.random.PRNGKey(2), (1, 4096)) * 0.1

        l0, g0 = jax.value_and_grad(
            lambda p: base.loss(p, mel, audio))(params)
        l1, g1 = jax.value_and_grad(
            lambda p: fused.loss(p, mel, audio))(params)
        assert np.isfinite(float(l1))
        assert abs(float(l1) - float(l0)) <= 0.05 * max(1., abs(float(l0)))
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b),
                rtol = 0.1, atol = 0.05 * (float(np.abs(a).max()) + 1e-3))

    def test_fused_cond_equivalence(self, wg):
        """fuse_params concatenates cond convs; outputs must be identical."""
        model, params = wg
        fused = model.fuse_params(params)
        assert 'cond_layer' in fused['flow_0']['block']
        assert 'cond_conv_0' not in fused['flow_0']['block']
        mel = jax.random.normal(KEY, (1, 8, 6))
        a1 = model.infer(params, mel, deterministic = True)
        a2 = model.infer(fused, mel, deterministic = True)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol = 1e-5)

    def test_loss_differentiable(self, wg):
        model, params = wg
        mel = jax.random.normal(KEY, (1, 8, 6))
        audio = jax.random.normal(KEY, (1, 8 * 4))
        grads = jax.grad(lambda p: model.loss(p, mel, audio))(params)
        leaf = grads['flow_0']['block']['start']['kernel']
        assert np.isfinite(np.asarray(leaf)).all()


class TestReductionFactor:
    """n_frames_per_step = r > 1: the decoder emits r frames per sequential
    step — the latency axis divides by r (the reference declares the hparam
    but never exercises it; here it is a first-class TPU latency lever)."""

    R = 3

    @pytest.fixture(scope = 'class')
    def taco_r(self):
        model = Tacotron2(** {** TINY_TACO, 'n_frames_per_step': self.R})
        params, state = model.init(KEY)
        return model, params, state

    def test_teacher_forced_frame_rate_outputs(self, taco_r):
        model, params, state = taco_r
        tokens = tokens_batch()
        G = 5                                   # decode steps (groups)
        mel_in = jax.random.normal(KEY, (2, G, 6))    # group-rate inputs
        lengths = jnp.array([5, 3])
        (dec, post, gates), _ = model(
            params, state, tokens, mel_in, mel_lengths = lengths,
            train = True, rng = KEY,
        )
        assert dec.shape == (2, G * self.R, 6)  # frame-rate outputs
        assert post.shape == (2, G * self.R, 6)
        assert gates.shape == (2, G * self.R)
        # group mask unfolds to frames: row 1 is zero past 3 groups
        assert float(jnp.abs(dec[1, 3 * self.R:]).max()) == 0.
        assert float(jnp.abs(dec[1, :3 * self.R]).max()) > 0.

    def test_infer_steps_divided_by_r(self, taco_r):
        model, params, state = taco_r
        out = model.infer(params, state, tokens_batch(), rng = KEY,
                          early_stopping = False, max_length = 15)
        # 15 frames -> ceil(15/3) = 5 sequential steps -> 15 frames out
        assert out.mel.shape == (2, 15, 6)
        assert out.stop_tokens.shape == (2, 15)
        assert out.attention_weights.shape == (2, 5, 7)   # one per STEP
        assert np.isfinite(np.asarray(out.mel)).all()
        # lengths are frame counts, always whole groups
        lengths = np.asarray(out.lengths)
        assert (lengths % self.R == 0).all() and (lengths <= 15).all()

    def test_infer_jits(self, taco_r):
        model, params, state = taco_r
        fn = jax.jit(lambda p, s, t: model.infer(
            p, s, t, deterministic = True, early_stopping = True,
            max_length = 15))
        out = fn(params, state, tokens_batch())
        assert np.isfinite(np.asarray(out.mel)).all()

    @pytest.mark.parametrize('n_frames, r', [(10, 3), (12, 3), (13, 2), (7, 4)])
    def test_prepare_data_grouping_invariants(self, tmp_path, monkeypatch,
                                              n_frames, r):
        """For any utterance length: targets cover mel[1:] padded to whole
        groups, inputs are the frames just before each group's first
        target, lengths count groups."""
        from text_to_speech_tpu.models import saving
        from text_to_speech_tpu.models.interfaces import reset_instances
        from text_to_speech_tpu.models.tts import Tacotron2 as TacoTask

        monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
        reset_instances()
        try:
            model = TacoTask(
                lang = 'en', name = 'taco_prep_r{}_{}'.format(r, n_frames),
                n_frames_per_step = r, encoder_embedding_dim = 8,
                encoder_n_conv = 1, encoder_kernel_size = 3,
                prenet_sizes = (4, 4), lsa_attention_dim = 4,
                lsa_attention_filters = 2, lsa_attention_kernel_size = 5,
                attention_rnn_dim = 8, decoder_rnn_dim = 8,
                postnet_n_conv = 1, postnet_filters = 4,
                postnet_kernel_size = 3,
            )
            mel = np.arange(n_frames * 80, dtype = np.float32).reshape(n_frames, 80)
            gate = np.zeros((n_frames,), np.float32)
            gate[-1] = 1.
            monkeypatch.setattr(model, 'prepare_input', lambda d: np.arange(5))
            monkeypatch.setattr(model, 'prepare_output', lambda d: (mel, gate))

            (tok, mel_in, n_groups), (mel_out, gate_out) = model.prepare_data({})
            assert n_groups == -(-(n_frames - 1) // r)
            assert mel_in.shape == (n_groups, 80)
            assert mel_out.shape == (n_groups * r, 80)
            assert gate_out.shape == (n_groups * r,)
            # inputs: the frame just before each group's first target
            for g in range(n_groups):
                np.testing.assert_array_equal(mel_in[g], mel[g * r])
            # targets: mel[1:] then pad; padded gate is 1 (finished)
            np.testing.assert_array_equal(mel_out[:n_frames - 1], mel[1:])
            assert (gate_out[n_frames - 1:] == 1.).all()
        finally:
            reset_instances()

    def test_fit_and_predict_through_task_model(self, tmp_path, monkeypatch):
        """prepare_data grouping + bucket_pad target coupling + AR predict
        through the public API at r=2."""
        from text_to_speech_tpu.models import saving
        from text_to_speech_tpu.models.interfaces import reset_instances
        from text_to_speech_tpu.models.tts import Tacotron2 as TacoTask

        monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
        reset_instances()
        try:
            model = TacoTask(
                lang = 'en', name = 'taco_r2', n_frames_per_step = 2,
                encoder_embedding_dim = 8, encoder_n_conv = 1,
                encoder_kernel_size = 3, prenet_sizes = (4, 4),
                lsa_attention_dim = 4, lsa_attention_filters = 2,
                lsa_attention_kernel_size = 5, attention_rnn_dim = 8,
                decoder_rnn_dim = 8, postnet_n_conv = 2, postnet_filters = 4,
                postnet_kernel_size = 3, max_decoder_steps = 16,
            )
            rng = np.random.RandomState(0)
            rows = [{'text': 'hello world', 'rate': 22050,
                     'audio': (rng.randn(2200) * 0.1).astype(np.float32)}] * 4
            history = model.fit(rows, epochs = 1, batch_size = 2,
                                valid_size = 0., frame_multiple = 8,
                                token_multiple = 8)
            assert np.isfinite(history.get_metric('loss')[0])

            out = model.predict('hello world', max_trial = 1, save = False)[0]
            mel = np.asarray(out['mel'][0])
            assert mel.shape[1] == 80 and np.isfinite(mel).all()
        finally:
            reset_instances()


class TestRegistry:
    def test_listing(self):
        assert 'tacotron2' in list_architectures()
        assert 'waveglow' in list_architectures()

    def test_factory(self):
        model = get_architecture('WaveGlow', ** TINY_WG)
        assert isinstance(model, WaveGlow)
        with pytest.raises(ValueError):
            get_architecture('unknown_arch')


class TestWaveGlowInt8:
    def test_quantized_inference_runs(self, wg):
        """int8-quantized params produce finite audio (experimental path)."""
        model, params = wg
        pq = model.quantize_params(params)
        assert pq['flow_0']['block']['in_conv_0']['kernel_q'].dtype == np.int8
        mel = jax.random.normal(KEY, (1, 8, 6))
        audio = model.infer(pq, mel, deterministic = True)
        assert bool(jnp.isfinite(audio).all())
