"""Multi-device inference sharding: WaveGlow channel-TP and batch-DP on a
virtual CPU mesh, asserting numeric parity with single-device execution.
(SURVEY.md §2.10 — the TPU-native replacement for the reference's absent
distributed backend.)"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from text_to_speech_tpu.parallel import (
    create_mesh, create_hybrid_mesh, data_axes, get_devices, shard_params,
    shard_batch, replicated, waveglow_param_specs, tacotron2_param_specs,
)
from text_to_speech_tpu.models.waveglow_arch import WaveGlow
from text_to_speech_tpu.models.tacotron2_arch import Tacotron2


WG_TINY = dict(n_flows = 2, n_group = 4, wn_layers = 2, wn_channels = 32,
               upsample_width = 16, upsample_stride = 8)


def _wg_setup():
    arch = WaveGlow(** WG_TINY)
    params = arch.init(jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 80)) * 2. - 6.
    return arch, params, mel


class TestWaveGlowTensorParallel:
    def test_tp_infer_parity(self):
        """WN channel dims sharded over tp=4: XLA inserts the collectives;
        the waveform must match single-device bit-for-bit (same program,
        f32)."""
        devices = get_devices('cpu')
        arch, params, mel = _wg_setup()

        ref = jax.jit(lambda p, m: arch.infer(p, m, deterministic = True))(
            params, mel)

        mesh = create_mesh({'dp': 2, 'tp': 4}, devices = devices[:8])
        specs = waveglow_param_specs(params, axis = 'tp')
        p_tp = shard_params(params, mesh, specs)
        m_dp = shard_batch(mel, mesh)
        out = jax.jit(lambda p, m: arch.infer(p, m, deterministic = True))(
            p_tp, m_dp)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol = 1e-5)

    def test_tp_specs_shard_the_wn_channels(self):
        """The spec tree actually partitions the hidden dims (not a no-op)."""
        arch, params, _ = _wg_setup()
        specs = waveglow_param_specs(params, axis = 'tp')
        flat = jax.tree_util.tree_flatten_with_path(specs)[0]
        sharded = ['/'.join(getattr(k, 'key', str(k)) for k in path)
                   for path, spec in flat if spec != jax.sharding.PartitionSpec()]
        assert any('in_conv' in name for name in sharded)
        assert any('start' in name for name in sharded)
        assert any('end' in name for name in sharded)

    def test_tp_forward_nll_parity(self):
        """Training direction (forward + NLL) under channel TP."""
        devices = get_devices('cpu')
        arch, params, mel = _wg_setup()
        audio = jax.random.normal(jax.random.PRNGKey(2), (4, 16 * 8))

        ref = float(jax.jit(arch.loss)(params, mel, audio))

        mesh = create_mesh({'dp': 2, 'tp': 4}, devices = devices[:8])
        p_tp = shard_params(params, mesh, waveglow_param_specs(params))
        got = float(jax.jit(arch.loss)(
            p_tp, * shard_batch((mel, audio), mesh)))
        assert abs(got - ref) < 1e-5 * max(1., abs(ref))


class TestWaveGlowPipelineParallel:
    """GPipe pipeline over the flow stack (parallel/pipeline.py): the
    pipelined NLL and its gradients must match the single-device loss."""

    WG_PP = dict(n_flows = 4, n_early_every = 2, n_early_size = 1,
                 n_group = 4, wn_layers = 2, wn_channels = 16,
                 upsample_width = 16, upsample_stride = 8)

    def _setup(self):
        arch = WaveGlow(** self.WG_PP)
        params = arch.init(jax.random.PRNGKey(0))
        mel = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 80)) * 2. - 6.
        audio = jax.random.normal(jax.random.PRNGKey(2), (4, 16 * 8))
        return arch, params, mel, audio

    def test_pp_loss_and_grad_parity(self):
        from text_to_speech_tpu.parallel.pipeline import WaveGlowPipeline
        devices = get_devices('cpu')
        arch, params, mel, audio = self._setup()

        ref_loss, ref_grads = jax.jit(jax.value_and_grad(arch.loss))(
            params, mel, audio)

        mesh = create_mesh({'pp': 4}, devices = devices[:4])
        pipe = WaveGlowPipeline(arch, mesh, n_micro = 2)
        got_loss, got_grads = jax.jit(jax.value_and_grad(pipe.loss))(
            params, mel, audio)

        assert abs(float(got_loss) - float(ref_loss)) \
            < 1e-5 * max(1., abs(float(ref_loss)))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol = 1e-4, rtol = 1e-4),
            got_grads, ref_grads)

    def test_pp_dp_composed_train_step(self):
        """pp=4 stages x dp=2 batch shards in one mesh; one optimizer step
        must match the single-device step."""
        import optax
        from text_to_speech_tpu.parallel.pipeline import WaveGlowPipeline
        devices = get_devices('cpu')
        arch, params, mel, audio = self._setup()
        tx = optax.sgd(1e-3)

        def ref_step(p, o, mel, audio):
            loss, g = jax.value_and_grad(arch.loss)(p, mel, audio)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, loss

        p1, _, ref_loss = jax.jit(ref_step)(
            params, tx.init(params), mel, audio)

        mesh = create_mesh({'dp': 2, 'pp': 4}, devices = devices[:8])
        pipe = WaveGlowPipeline(arch, mesh, dp_axis = 'dp', n_micro = 2)
        p2, _, got_loss = jax.jit(pipe.train_step(tx))(
            params, tx.init(params), mel, audio)

        assert abs(float(got_loss) - float(ref_loss)) \
            < 1e-5 * max(1., abs(float(ref_loss)))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol = 1e-5),
            p2, p1)

    def test_stage_bounds(self):
        from text_to_speech_tpu.parallel.pipeline import stage_bounds
        assert stage_bounds(12, 4) == [0, 3, 6, 9, 12]
        assert stage_bounds(12, 3) == [0, 4, 8, 12]
        assert stage_bounds(5, 2) == [0, 3, 5]
        with pytest.raises(ValueError):
            stage_bounds(2, 3)


class TestSequenceParallelVocoding:
    def test_sp_infer_parity(self):
        """Vocoder inference with the TIME axis sharded (sp): GSPMD inserts
        the conv halo exchanges; output must match single-device."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        devices = get_devices('cpu')
        arch, params, mel = _wg_setup()

        run = lambda p, m: arch.infer(p, m, deterministic = True)
        ref = jax.jit(run)(params, mel)

        mesh = create_mesh({'sp': 4}, devices = devices[:4])
        m_sp = jax.device_put(mel, NamedSharding(mesh, P(None, 'sp', None)))
        out = jax.jit(run)(shard_params(params, mesh), m_sp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol = 1e-5)


class TestDataParallelInference:
    def test_waveglow_dp_infer_parity(self):
        devices = get_devices('cpu')
        arch, params, mel = _wg_setup()
        ref = jax.jit(lambda p, m: arch.infer(p, m, deterministic = True))(
            params, mel)

        mesh = create_mesh({'dp': 4}, devices = devices[:4])
        out = jax.jit(lambda p, m: arch.infer(p, m, deterministic = True))(
            shard_params(params, mesh), shard_batch(mel, mesh))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol = 1e-5)

    def test_tacotron2_dp_batched_infer_parity(self):
        """Batched AR inference with the batch sharded over dp."""
        devices = get_devices('cpu')
        arch = Tacotron2(
            vocab_size = 24, n_mel_channels = 8, encoder_embedding_dim = 16,
            encoder_n_conv = 1, encoder_kernel_size = 3, prenet_sizes = (8, 8),
            lsa_attention_dim = 8, lsa_attention_filters = 4,
            lsa_attention_kernel_size = 7, attention_rnn_dim = 16,
            decoder_rnn_dim = 16, postnet_n_conv = 2, postnet_filters = 8,
            postnet_kernel_size = 3, max_decoder_steps = 8,
        )
        params, state = arch.init(jax.random.PRNGKey(0))
        tokens = np.tile(np.arange(1, 9, dtype = np.int32), (4, 1))

        run = lambda p, s, t: arch.infer(
            p, s, t, deterministic = True, early_stopping = False,
            max_length = 8)
        ref = jax.jit(run)(params, state, tokens)

        mesh = create_mesh({'dp': 4}, devices = devices[:4])
        out = jax.jit(run)(
            shard_params(params, mesh),
            jax.device_put(state, replicated(mesh)),
            shard_batch(tokens, mesh))
        np.testing.assert_allclose(
            np.asarray(out.mel), np.asarray(ref.mel), atol = 1e-5)
        np.testing.assert_array_equal(
            np.asarray(out.lengths), np.asarray(ref.lengths))

    def test_tacotron2_tp_specs_cover_decoder(self):
        """tacotron2_param_specs shards the big decoder matmuls (dryrun
        collective-insertion validation; see the spec's docstring for why
        this is not the serving TP plan)."""
        arch = Tacotron2(vocab_size = 24, attention_rnn_dim = 16,
                         decoder_rnn_dim = 16, n_mel_channels = 8,
                         encoder_embedding_dim = 16, encoder_n_conv = 1,
                         prenet_sizes = (8, 8), lsa_attention_dim = 8,
                         lsa_attention_filters = 4,
                         lsa_attention_kernel_size = 7,
                         postnet_n_conv = 1, postnet_filters = 8,
                         postnet_kernel_size = 3)
        params, _ = arch.init(jax.random.PRNGKey(0))
        specs = tacotron2_param_specs(params)
        flat = jax.tree_util.tree_flatten_with_path(specs)[0]
        sharded = ['/'.join(getattr(k, 'key', str(k)) for k in path)
                   for path, spec in flat if spec != jax.sharding.PartitionSpec()]
        assert any('decoder_rnn' in n for n in sharded)
        assert any('linear_projection' in n for n in sharded)


class TestHybridMesh:
    """Multi-slice meshes: dcn axes across slices (outermost), ici axes
    within a slice.  Virtual CPU devices have no slice_index, so slices are
    contiguous blocks — same topology the scaling recipe produces."""

    def test_axis_layout(self):
        devices = get_devices('cpu')[:8]
        mesh = create_hybrid_mesh({'dp': 2, 'tp': 2}, {'dcn': 2},
                                  devices = devices)
        assert tuple(mesh.axis_names) == ('dcn', 'dp', 'tp')
        assert dict(mesh.shape) == {'dcn': 2, 'dp': 2, 'tp': 2}
        # ici axes never straddle a slice boundary: each dcn slab is one
        # contiguous 4-device block
        ids = np.vectorize(lambda d: d.id)(mesh.devices)
        assert sorted(ids[0].ravel().tolist()) == [d.id for d in devices[:4]]
        assert sorted(ids[1].ravel().tolist()) == [d.id for d in devices[4:]]
        assert data_axes(mesh) == ('dcn', 'dp')

    def test_coverage_validation(self):
        devices = get_devices('cpu')[:8]
        with pytest.raises(ValueError):
            create_hybrid_mesh({'dp': 3}, {'dcn': 2}, devices = devices)
        with pytest.raises(ValueError):
            create_hybrid_mesh({'dp': 2, 'dcn': 2}, {'dcn': 2},
                               devices = devices[:8])

    def test_hybrid_dp_dcn_tp_train_step_parity(self):
        """One WaveGlow NLL train step on a dcn=2 x dp=2 x tp=2 hybrid mesh
        (batch over ('dcn','dp'), WN channels over tp) matches the
        single-device step."""
        import optax
        devices = get_devices('cpu')[:8]
        arch, params, mel = _wg_setup()
        audio = jax.random.normal(jax.random.PRNGKey(2), (4, 16 * 8))
        tx = optax.sgd(1e-3)

        def step(p, o, mel, audio):
            loss, g = jax.value_and_grad(arch.loss)(p, mel, audio)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), loss

        p_ref, ref_loss = jax.jit(step)(params, tx.init(params), mel, audio)

        mesh = create_hybrid_mesh({'dp': 2, 'tp': 2}, {'dcn': 2},
                                  devices = devices)
        p_tp = shard_params(params, mesh, waveglow_param_specs(params))
        batch = shard_batch((mel, audio), mesh, axis = data_axes(mesh))
        p_got, got_loss = jax.jit(step)(p_tp, tx.init(p_tp), * batch)

        assert abs(float(got_loss) - float(ref_loss)) \
            < 1e-5 * max(1., abs(float(ref_loss)))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol = 1e-5),
            p_got, p_ref)

    def test_shard_batch_tuple_axis_sharding(self):
        devices = get_devices('cpu')[:8]
        mesh = create_hybrid_mesh({'dp': 2, 'tp': 2}, {'dcn': 2},
                                  devices = devices)
        x = np.arange(8 * 3, dtype = np.float32).reshape(8, 3)
        y = shard_batch(x, mesh, axis = ('dcn', 'dp'))
        # 4-way sharded on the leading axis: each shard is 2 rows
        assert {s.data.shape for s in y.addressable_shards} == {(2, 3)}
        np.testing.assert_array_equal(np.asarray(y), x)


class TestHiFiGANDataParallel:
    def test_hifigan_dp_infer_parity(self):
        """HiFi-GAN generation with the batch sharded over dp matches
        single-device output."""
        from text_to_speech_tpu.models.hifigan_arch import HiFiGAN

        devices = get_devices('cpu')
        arch = HiFiGAN(n_mel_channels = 8, upsample_rates = (4, 2),
                       upsample_kernel_sizes = (8, 4),
                       upsample_initial_channel = 16,
                       resblock_kernel_sizes = (3,),
                       resblock_dilation_sizes = ((1, 2),))
        params = arch.init(jax.random.PRNGKey(0))
        mel = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 8))

        ref = jax.jit(arch.apply)(params, mel)

        mesh = create_mesh({'dp': 4}, devices = devices[:4])
        out = jax.jit(arch.apply)(
            shard_params(params, mesh), shard_batch(mel, mesh))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol = 1e-5)


class TestVITSParallel:
    def test_vits_dp_tp_infer_parity(self):
        """End-to-end VITS inference with dp-sharded tokens + tp-sharded
        params (vits_param_specs) matches the single-device audio."""
        from text_to_speech_tpu.models.vits_arch import VITS
        from text_to_speech_tpu.parallel import vits_param_specs

        devices = get_devices('cpu')
        arch = VITS(vocab_size = 32, spec_channels = 9, inter_channels = 8,
                    hidden_channels = 16, filter_channels = 32, n_heads = 2,
                    n_text_layers = 1, posterior_layers = 2, flow_layers = 2,
                    flow_wn_layers = 2, duration_filters = 16,
                    upsample_rates = (4, 2), upsample_kernel_sizes = (8, 4),
                    upsample_initial_channel = 16,
                    resblock_kernel_sizes = (3,),
                    resblock_dilation_sizes = ((1, 2),), mpd_periods = (2,),
                    msd_scales = 1, segment_frames = 8, max_frames = 64,
                    max_position = 128)
        params, _ = arch.init(jax.random.PRNGKey(0))
        tokens = np.tile(np.arange(1, 7, dtype = np.int32), (4, 1))
        infer = jax.jit(lambda p, t: arch.infer(
            p, {}, t, max_frames = 16, min_duration = 2,
            rng = jax.random.PRNGKey(7)))

        ref = infer(params, tokens)

        mesh = create_mesh({'dp': 2, 'tp': 2}, devices = devices[:4])
        specs = vits_param_specs(params)
        flat = jax.tree_util.tree_flatten(specs)[0]
        assert any(s != jax.sharding.PartitionSpec() for s in flat)
        got = infer(shard_params(params, mesh, specs),
                    shard_batch(tokens, mesh))
        np.testing.assert_allclose(np.asarray(got.audio),
                                   np.asarray(ref.audio), atol = 1e-4)
        np.testing.assert_array_equal(np.asarray(got.lengths),
                                      np.asarray(ref.lengths))


class TestFastSpeech2TensorParallel:
    FS2_TINY = dict(vocab_size = 32, n_mel_channels = 8, dim = 16,
                    n_heads = 2, encoder_layers = 1, decoder_layers = 1,
                    ffn_dim = 32, variance_filters = 8, postnet_n_conv = 2,
                    postnet_filters = 8, max_position = 64, max_frames = 32)

    def _setup(self):
        from text_to_speech_tpu.models.fastspeech2_arch import FastSpeech2
        arch = FastSpeech2(** self.FS2_TINY)
        params, state = arch.init(jax.random.PRNGKey(0))
        tokens = np.tile(np.arange(1, 9, dtype = np.int32), (4, 1))
        return arch, params, state, tokens

    def test_tp_specs_shard_the_fft_blocks(self):
        from text_to_speech_tpu.parallel import fastspeech2_param_specs
        arch, params, _, _ = self._setup()
        specs = fastspeech2_param_specs(params)
        flat = jax.tree_util.tree_flatten_with_path(specs)[0]
        sharded = ['/'.join(getattr(k, 'key', str(k)) for k in path)
                   for path, spec in flat if spec != jax.sharding.PartitionSpec()]
        assert any('query' in n for n in sharded)
        assert any('conv1' in n for n in sharded)
        assert any('conv2' in n for n in sharded)
        # variance predictors and embeddings stay replicated
        assert not any('predictor' in n or 'embedding' in n for n in sharded)

    def test_tp_infer_parity(self):
        """dp=2 x tp=4 parallel synthesis matches single-device (same
        program, f32) — the multi-chip path of the non-AR family."""
        from text_to_speech_tpu.parallel import fastspeech2_param_specs
        devices = get_devices('cpu')
        arch, params, state, tokens = self._setup()

        fn = jax.jit(lambda p, s, t: arch.infer(p, s, t, max_frames = 32).mel)
        ref = fn(params, state, tokens)

        mesh = create_mesh({'dp': 2, 'tp': 4}, devices = devices[:8])
        p_tp = shard_params(params, mesh, fastspeech2_param_specs(params))
        s_rep = jax.device_put(state, replicated(mesh))
        out = fn(p_tp, s_rep, shard_batch(tokens, mesh))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol = 1e-5)

    def test_tp_train_step_parity(self):
        """Loss under dp x tp matches the single-device loss."""
        from text_to_speech_tpu.parallel import fastspeech2_param_specs
        from text_to_speech_tpu.train.losses import FastSpeech2Loss
        devices = get_devices('cpu')
        arch, params, state, tokens = self._setup()
        loss_fn = FastSpeech2Loss()
        durations = np.full((4, 8), 4, np.int32)
        pitch = np.zeros((4, 8), np.float32)
        energy = np.zeros((4, 8), np.float32)
        mel = np.zeros((4, 32, 8), np.float32)

        def loss_of(p, s, batch):
            tokens, durations, pitch, energy, mel = batch
            preds, _ = arch(p, s, tokens, durations = durations,
                            pitch = pitch, energy = energy, max_frames = 32)
            return jnp.mean(loss_fn((mel, durations, pitch, energy),
                                    preds)['loss'])

        batch = (tokens, durations, pitch, energy, mel)
        ref = float(jax.jit(loss_of)(params, state, batch))

        mesh = create_mesh({'dp': 2, 'tp': 4}, devices = devices[:8])
        p_tp = shard_params(params, mesh, fastspeech2_param_specs(params))
        s_rep = jax.device_put(state, replicated(mesh))
        got = float(jax.jit(loss_of)(p_tp, s_rep, shard_batch(batch, mesh)))
        assert abs(got - ref) < 1e-5 * max(1., abs(ref))
