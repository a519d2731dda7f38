"""Mixed-precision training policy (train/precision.py): bf16 compute /
f32 masters across the NLL, teacher-forced, and GAN train steps, with the
f32 islands (norm stats, NLL sums, GAN score means, SDP) holding the loss
values close to the pure-f32 step.  Quality-parity at convergence is the
slow-tier overfit probe (`test_mixed_overfit_parity_waveglow`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from text_to_speech_tpu.train.precision import (
    Policy, get_policy, set_global_policy, get_global_policy, cast_floating,
)

KEY = jax.random.PRNGKey(0)

TINY_WG = dict(
    n_mel_channels = 8, n_flows = 2, n_group = 4, n_early_every = 4,
    n_early_size = 2, wn_layers = 2, wn_channels = 8, wn_kernel_size = 3,
    upsample_width = 16, upsample_stride = 8, use_pallas = False,
)


def tiny_waveglow_arch():
    from text_to_speech_tpu.models.waveglow_arch import WaveGlow
    return WaveGlow(** TINY_WG)


@pytest.mark.smoke
class TestPolicy:
    def test_names_and_alias(self):
        assert get_policy('float32').compute_dtype == 'float32'
        mixed = get_policy('mixed_bfloat16')
        assert mixed.is_mixed and mixed.compute_dtype == 'bfloat16'
        assert mixed.param_dtype == 'float32'
        # full-bf16 params would corrupt Adam moments: the name maps to
        # the safe mixed policy
        assert get_policy('bfloat16').name == 'mixed_bfloat16'
        with pytest.raises(ValueError):
            get_policy('float8')

    def test_global_policy_roundtrip(self):
        assert get_policy(None).name == get_global_policy().name
        try:
            set_global_policy('mixed_bfloat16')
            assert get_policy(None).is_mixed
        finally:
            set_global_policy('float32')
        assert not get_policy(None).is_mixed

    def test_set_default_precision_installs_policy(self):
        """The reference's one-liner (utils/keras/gpu.py:32-34) surface:
        set_default_precision('mixed_bfloat16') changes what every later
        train step computes in."""
        from text_to_speech_tpu.devices import set_default_precision
        try:
            set_default_precision('mixed_bfloat16')
            assert get_global_policy().is_mixed
        finally:
            set_global_policy('float32')

    def test_cast_floating_leaves_and_exemptions(self):
        tree = {
            'a': jnp.ones((2, 2), jnp.float32),
            'convinv': {'kernel': jnp.eye(2, dtype = jnp.float32)},
            'ids': jnp.zeros((3,), jnp.int32),
        }
        out = cast_floating(tree, jnp.bfloat16, exempt = ('convinv',))
        assert out['a'].dtype == jnp.bfloat16
        assert out['convinv']['kernel'].dtype == jnp.float32
        assert out['ids'].dtype == jnp.int32
        # no exemptions: everything floating casts
        out2 = cast_floating(tree, jnp.bfloat16)
        assert out2['convinv']['kernel'].dtype == jnp.bfloat16


@pytest.mark.smoke
class TestBatchNormIsland:
    def test_bf16_activations_f32_stats(self):
        from text_to_speech_tpu import nn
        params, state = nn.init_batch_norm(4)
        x = jax.random.normal(KEY, (2, 6, 4), jnp.float32)
        y32, st32 = nn.batch_norm(params, state, x, train = True)
        y16, st16 = nn.batch_norm(params, state, x.astype(jnp.bfloat16),
                                  train = True)
        assert y16.dtype == jnp.bfloat16
        # the moving statistics must stay f32 and match the f32 run to
        # bf16 *input* rounding (not bf16 accumulation) tolerance
        for k in st32:
            assert st16[k].dtype == jnp.float32
            np.testing.assert_allclose(np.asarray(st16[k]),
                                       np.asarray(st32[k]),
                                       rtol = 2e-2, atol = 2e-2)
        np.testing.assert_allclose(
            np.asarray(y16, np.float32), np.asarray(y32),
            rtol = 0, atol = 0.1)


class TestWaveGlowMixedForward:
    def _data(self, arch, B = 2, F = 8):
        k1, k2 = jax.random.split(KEY)
        mel = jax.random.normal(k1, (B, F, arch.hp.n_mel_channels))
        audio = 0.1 * jax.random.normal(
            k2, (B, F * arch.hp.upsample_stride))
        return mel, audio

    @pytest.mark.smoke
    def test_loss_close_and_grads_f32(self):
        arch = tiny_waveglow_arch()
        params = arch.init(KEY)
        mel, audio = self._data(arch)

        loss32, g32 = jax.value_and_grad(
            lambda p: arch.loss(p, mel, audio))(params)
        loss16, g16 = jax.value_and_grad(
            lambda p: arch.loss(p, mel, audio,
                                compute_dtype = jnp.bfloat16))(params)
        # masters stay f32 ⇒ every gradient leaf is f32
        for leaf in jax.tree_util.tree_leaves(g16):
            assert leaf.dtype == jnp.float32
        assert np.isfinite(float(loss16))
        # the f32 islands keep the NLL value close to the f32 chain
        assert abs(float(loss16) - float(loss32)) < 0.05 * max(
            1., abs(float(loss32)))
        # and gradients point the same way (cosine over the flattened tree)
        v32 = np.concatenate([np.asarray(l).ravel()
                              for l in jax.tree_util.tree_leaves(g32)])
        v16 = np.concatenate([np.asarray(l).ravel()
                              for l in jax.tree_util.tree_leaves(g16)])
        cos = float(np.dot(v32, v16)
                    / (np.linalg.norm(v32) * np.linalg.norm(v16) + 1e-12))
        assert cos > 0.98, cos

    @pytest.mark.smoke
    def test_z_stream_stays_f32(self):
        arch = tiny_waveglow_arch()
        params = arch.init(KEY)
        mel, audio = self._data(arch)
        z, log_s, log_det = arch.forward(params, mel, audio,
                                         compute_dtype = jnp.bfloat16)
        assert z.dtype == jnp.float32
        assert log_s.dtype == jnp.float32

    def test_remat_matches_no_remat_mixed(self):
        arch = tiny_waveglow_arch()
        params = arch.init(KEY)
        mel, audio = self._data(arch)
        l1 = float(arch.loss(params, mel, audio,
                             compute_dtype = jnp.bfloat16))
        l2 = float(arch.loss(params, mel, audio, remat = True,
                             compute_dtype = jnp.bfloat16))
        np.testing.assert_allclose(l1, l2, rtol = 1e-5)


class TestTrainStepPrecision:
    def test_make_train_step_mixed_waveglow(self, tmp_path, monkeypatch):
        import optax
        from text_to_speech_tpu.models import saving
        from text_to_speech_tpu.models.interfaces import reset_instances
        from text_to_speech_tpu.models.tts import WaveGlow as WGTask
        from text_to_speech_tpu.train.trainer import make_train_step
        from text_to_speech_tpu.train.losses import WaveGlowLoss

        monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
        reset_instances()
        try:
            model = WGTask(name = 'prec_wg', ** {
                k: v for k, v in TINY_WG.items() if k != 'use_pallas'})
            loss_fn = WaveGlowLoss()
            tx = optax.adam(1e-4)
            step = make_train_step(model, loss_fn, tx,
                                   precision = 'mixed_bfloat16')
            params, state = model.params, model.state
            opt_state = tx.init(params)
            F = 8
            mel = jax.random.normal(KEY, (2, F, TINY_WG['n_mel_channels']))
            audio = 0.1 * jax.random.normal(
                KEY, (2, F * TINY_WG['upsample_stride']))
            params, state, opt_state, metrics = step(
                params, state, opt_state, KEY, (mel, audio), None)
            assert np.isfinite(float(metrics['loss']))
            # master params keep f32 through the mixed update
            for leaf in jax.tree_util.tree_leaves(params):
                if jnp.issubdtype(leaf.dtype, jnp.floating):
                    assert leaf.dtype == jnp.float32
        finally:
            reset_instances()

    def test_tacotron_opts_in_with_native_scan(self, tmp_path, monkeypatch):
        """Tacotron-2 OPTS IN to the mixed policy (r5: the r4 '311→2307 ms
        regression' was a tunnel-stall measurement artifact — per-iter
        medians are f32 130 ms vs bf16 85 ms, tacotron_stall_probe.py).
        The mixed step must run the bf16 path (loss differs from f32) and
        stay finite/close at convergence scale."""
        import optax
        from text_to_speech_tpu.models import saving
        from text_to_speech_tpu.models.interfaces import reset_instances
        from text_to_speech_tpu.models.tts import Tacotron2
        from text_to_speech_tpu.train.trainer import make_train_step
        from text_to_speech_tpu.train.losses import TacotronLoss

        monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
        reset_instances()
        try:
            model = Tacotron2(
                lang = 'en', name = 'prec_taco',
                encoder_embedding_dim = 8, encoder_n_conv = 1,
                prenet_sizes = (4, 4), lsa_attention_dim = 4,
                lsa_attention_filters = 2, lsa_attention_kernel_size = 5,
                attention_rnn_dim = 8, decoder_rnn_dim = 8,
                postnet_n_conv = 2, postnet_filters = 4,
                postnet_kernel_size = 3, max_decoder_steps = 16,
            )
            assert model.mixed_precision_ok is True
            loss_fn = TacotronLoss()
            tx = optax.adam(1e-4)
            B, S, T, C = 2, 8, 16, 80
            tokens = jnp.ones((B, S), jnp.int32)
            mel_in = jnp.zeros((B, T, C))
            lengths = jnp.asarray([T, T - 4], jnp.int32)
            targets = (jnp.zeros((B, T, C)),
                       jnp.zeros((B, T)).at[:, -1:].set(1.))

            losses = {}
            for prec in ('float32', 'mixed_bfloat16'):
                step = make_train_step(model, loss_fn, tx, precision = prec)
                # fresh buffers per run: the jitted step donates params +
                # opt_state
                params = jax.tree_util.tree_map(jnp.array, model.params)
                state = model.state
                opt_state = tx.init(params)
                params, state, opt_state, metrics = step(
                    params, state, opt_state, KEY,
                    (tokens, mel_in, lengths), targets)
                losses[prec] = float(metrics['loss'])
            # opted in ⇒ the bf16 compute path actually runs (same value
            # to bf16 tolerance, but not the bit-identical f32 program)
            import math
            assert math.isfinite(losses['mixed_bfloat16'])
            assert abs(losses['mixed_bfloat16'] - losses['float32']) \
                <= 0.05 * max(1., abs(losses['float32']))
        finally:
            reset_instances()

    def test_generic_cast_path_fastspeech2(self, tmp_path, monkeypatch):
        """The parallel families ride the generic boundary cast: params +
        float inputs → bf16, predictions → f32 for the loss."""
        import optax
        from text_to_speech_tpu.models import saving
        from text_to_speech_tpu.models.interfaces import reset_instances
        from text_to_speech_tpu.models.tts import FastSpeech2
        from text_to_speech_tpu.train.trainer import make_train_step
        from text_to_speech_tpu.train.losses import FastSpeech2Loss

        monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
        reset_instances()
        try:
            model = FastSpeech2(
                lang = 'en', name = 'prec_fs2',
                dim = 16, encoder_layers = 1, decoder_layers = 1,
                n_heads = 2, ffn_dim = 32, variance_filters = 8,
                n_bins = 8, max_frames = 32, max_position = 64,
                postnet_n_conv = 2, postnet_filters = 4,
                postnet_kernel_size = 3,
            )
            assert model.mixed_precision_ok is True
            loss_fn = FastSpeech2Loss()
            tx = optax.adam(1e-4)
            B, S, T, C = 2, 8, 16, 80
            tokens = jnp.ones((B, S), jnp.int32)
            durations = jnp.full((B, S), 2, jnp.int32)
            pitch = jnp.zeros((B, S))
            energy = jnp.zeros((B, S))
            targets = (jnp.zeros((B, T, C)),
                       jnp.full((B, S), 2.), jnp.zeros((B, S)),
                       jnp.zeros((B, S)))

            losses = {}
            for prec in ('float32', 'mixed_bfloat16'):
                step = make_train_step(model, loss_fn, tx, precision = prec)
                params = jax.tree_util.tree_map(jnp.array, model.params)
                state = model.state
                opt_state = tx.init(params)
                params, state, opt_state, metrics = step(
                    params, state, opt_state, KEY,
                    (tokens, durations, pitch, energy), targets)
                losses[prec] = float(metrics['loss'])
                for leaf in jax.tree_util.tree_leaves(params):
                    if jnp.issubdtype(leaf.dtype, jnp.floating):
                        assert leaf.dtype == jnp.float32
            assert np.isfinite(losses['mixed_bfloat16'])
            assert abs(losses['mixed_bfloat16'] - losses['float32']) \
                < 0.05 * max(1., abs(losses['float32']))
        finally:
            reset_instances()


class TestTacotronScanNativeBf16:
    """Scan-native bf16 for the teacher-forced decode
    (`tacotron2_arch.py hp.scan_native_bf16`): the whole scan carry —
    alignment maps and attention softmax included — stays bf16, replacing
    the r4 per-step f32 islands that regressed the latency-bound scan 7x.
    The TPU step time + 300-step parity gate live in
    benchmarks/train_throughput.py / mixed_precision_parity.py."""

    TINY = dict(
        vocab_size = 32, n_mel_channels = 8, encoder_embedding_dim = 8,
        encoder_n_conv = 1, encoder_kernel_size = 3, prenet_sizes = (4, 4),
        lsa_attention_dim = 4, lsa_attention_filters = 2,
        lsa_attention_kernel_size = 5, attention_rnn_dim = 8,
        decoder_rnn_dim = 8, postnet_n_conv = 2, postnet_filters = 4,
        postnet_kernel_size = 3,
    )

    def _forward(self, arch, params, state, dtype):
        B, S, T, C = 2, 8, 16, 8
        tokens = jnp.ones((B, S), jnp.int32)
        mel_in = jnp.linspace(-1., 1., B * T * C).reshape(B, T, C)
        lengths = jnp.asarray([T, T - 4], jnp.int32)
        p, mi = params, mel_in
        if dtype is not None:
            p, mi = cast_floating(p, dtype), mel_in.astype(dtype)
        (dec, post, gates), _ = arch(p, state, tokens, mi,
                                     mel_lengths = lengths, train = True,
                                     rng = KEY)
        return dec, post, gates

    @pytest.mark.smoke
    def test_carry_dtype_follows_flag(self):
        from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
        native = Tacotron2(** self.TINY, scan_native_bf16 = True)
        islands = Tacotron2(** self.TINY, scan_native_bf16 = False)
        cs = native.init_cell_state(2, 8, jnp.bfloat16)
        assert cs[3][0].dtype == jnp.bfloat16       # alignments follow
        cs = islands.init_cell_state(2, 8, jnp.bfloat16)
        assert cs[3][0].dtype == jnp.float32        # f32 islands restored
        # f32 training is untouched either way
        cs = native.init_cell_state(2, 8, jnp.float32)
        assert cs[3][0].dtype == jnp.float32

    @pytest.mark.smoke
    def test_native_bf16_forward_close_to_f32(self):
        from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
        arch = Tacotron2(** self.TINY, scan_native_bf16 = True)
        params, state = arch.init(KEY)
        dec32, post32, _ = self._forward(arch, params, state, None)
        dec16, post16, gates16 = self._forward(arch, params, state,
                                               jnp.bfloat16)
        assert dec16.dtype == jnp.bfloat16          # really ran bf16
        for a in (dec16, post16, gates16):
            assert np.isfinite(np.asarray(a, np.float32)).all()
        # bf16 rounding only — the decode did not diverge
        np.testing.assert_allclose(
            np.asarray(dec16, np.float32), np.asarray(dec32),
            atol = 0.05, rtol = 0.1)

    def test_grads_stay_f32_through_native_scan(self):
        from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
        from text_to_speech_tpu.train.losses import TacotronLoss
        arch = Tacotron2(** self.TINY, scan_native_bf16 = True)
        params, state = arch.init(KEY)
        loss_fn = TacotronLoss()
        B, S, T, C = 2, 8, 16, 8
        targets = (jnp.zeros((B, T, C)), jnp.zeros((B, T)).at[:, -1:].set(1.))

        def loss_of(p):
            dec, post, gates = self._forward(arch, p, state, jnp.bfloat16)
            preds = tuple(t.astype(jnp.float32) for t in (dec, post, gates))
            return jnp.mean(loss_fn(targets, preds)['loss'])

        loss, grads = jax.jit(jax.value_and_grad(loss_of))(params)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(l.dtype == jnp.float32 for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestGANStepPrecision:
    def test_hifigan_step_mixed(self):
        import optax
        from text_to_speech_tpu.models.hifigan_arch import HiFiGAN
        from text_to_speech_tpu.train.gan import (
            make_hifigan_train_step, init_hifigan_train_state)

        arch = HiFiGAN(
            n_mel_channels = 8, upsample_rates = (4, 2),
            upsample_kernel_sizes = (8, 4), upsample_initial_channel = 16,
            resblock_kernel_sizes = (3,), resblock_dilation_sizes = ((1, 3),),
            mpd_periods = (2,), msd_scales = 1,
        )
        state = init_hifigan_train_state(arch, KEY, optax.adam(2e-4),
                                         optax.adam(2e-4))
        mel = jax.random.normal(KEY, (2, 16, 8))
        audio = 0.1 * jax.random.normal(KEY, (2, 16 * 8))
        metrics_by = {}
        for prec in ('float32', 'mixed_bfloat16'):
            step = make_hifigan_train_step(
                arch, optax.adam(2e-4), optax.adam(2e-4), donate = False,
                precision = prec)
            new_state, metrics = step(state, mel, audio)
            metrics_by[prec] = {k: float(v) for k, v in metrics.items()}
            for leaf in jax.tree_util.tree_leaves(new_state['gen']):
                if jnp.issubdtype(leaf.dtype, jnp.floating):
                    assert leaf.dtype == jnp.float32
        m32, m16 = metrics_by['float32'], metrics_by['mixed_bfloat16']
        assert all(np.isfinite(v) for v in m16.values()), m16
        for k in ('disc_loss', 'gen_loss'):
            assert abs(m16[k] - m32[k]) < 0.05 * max(1., abs(m32[k])), (
                k, m16[k], m32[k])

    def test_vocos_step_mixed(self):
        """The Vocos arch reuses the HiFi-GAN train step: its loss wrappers
        must forward compute_dtype (regression — the first fast-suite run
        after the mixed feature TypeError'd here)."""
        import optax
        from text_to_speech_tpu.models.vocos_arch import Vocos
        from text_to_speech_tpu.train.gan import (
            make_hifigan_train_step, init_hifigan_train_state)

        arch = Vocos(n_mel_channels = 8, dim = 16, n_layers = 1,
                     intermediate_dim = 32, n_fft = 16, hop_length = 4,
                     win_length = 16, mpd_periods = (2,), msd_scales = 1)
        state = init_hifigan_train_state(arch, KEY, optax.adam(2e-4),
                                         optax.adam(2e-4))
        step = make_hifigan_train_step(
            arch, optax.adam(2e-4), optax.adam(2e-4), donate = False,
            precision = 'mixed_bfloat16')
        mel = jax.random.normal(KEY, (2, 16, 8))
        audio = 0.1 * jax.random.normal(KEY, (2, 16 * 4))
        new_state, metrics = step(state, mel, audio)
        assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
        for leaf in jax.tree_util.tree_leaves(new_state['gen']):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32

    def test_vits_step_mixed(self):
        import optax
        from text_to_speech_tpu.models.vits_arch import VITS
        from text_to_speech_tpu.train.gan import (
            make_vits_train_step, init_vits_train_state)

        arch = VITS(
            vocab_size = 40, spec_channels = 9, inter_channels = 8,
            hidden_channels = 16, filter_channels = 32, n_heads = 2,
            n_text_layers = 1, posterior_layers = 2, flow_layers = 2,
            flow_wn_layers = 2, duration_filters = 16,
            upsample_rates = (4, 2), upsample_kernel_sizes = (8, 4),
            upsample_initial_channel = 16, resblock_kernel_sizes = (3,),
            resblock_dilation_sizes = ((1, 2),), mpd_periods = (2,),
            msd_scales = 1, segment_frames = 8, max_frames = 64,
        )
        state = init_vits_train_state(arch, KEY, optax.adam(2e-4),
                                      optax.adam(2e-4))
        B, L, T = 2, 5, 16
        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.integers(3, 30, (B, L)), jnp.int32)
        spec = jnp.asarray(
            rng.normal(size = (B, T, 9)).astype(np.float32) ** 2)
        lengths = jnp.asarray([T, T - 4], jnp.int32)
        audio = jnp.asarray(
            0.1 * rng.normal(size = (B, T * arch.upsample_rate))
            .astype(np.float32))
        step = make_vits_train_step(arch, optax.adam(2e-4), optax.adam(2e-4),
                                    donate = False,
                                    precision = 'mixed_bfloat16')
        new_state, metrics = step(state, (tokens, spec, lengths, audio),
                                  jax.random.PRNGKey(1))
        assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
        for leaf in jax.tree_util.tree_leaves(new_state['gen']):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32


class TestPipelineMixed:
    def test_pp_loss_mixed_close_to_f32(self):
        """The GPipe pipelined NLL under the mixed policy stays close to
        the single-device f32 NLL (same islands as the plain forward)."""
        from text_to_speech_tpu.parallel import create_mesh, get_devices
        from text_to_speech_tpu.parallel.pipeline import WaveGlowPipeline

        devices = get_devices('cpu')
        mesh = create_mesh({'pp': 2}, devices = devices[:2])
        arch = tiny_waveglow_arch()
        params = arch.init(KEY)
        mel = jax.random.normal(KEY, (4, 8, arch.hp.n_mel_channels))
        audio = 0.1 * jax.random.normal(
            KEY, (4, 8 * arch.hp.upsample_stride))
        pipe = WaveGlowPipeline(arch, mesh, n_micro = 2)
        ref = float(arch.loss(params, mel, audio))
        mixed = float(pipe.loss(params, mel, audio,
                                compute_dtype = jnp.bfloat16))
        assert abs(mixed - ref) < 0.05 * max(1., abs(ref))


@pytest.mark.slow
class TestMixedOverfitParity:
    def test_mixed_overfit_parity_waveglow(self):
        """Quality-parity gate (the int8-gate discipline applied to
        training): N overfit steps on one synthetic utterance under f32 vs
        mixed_bfloat16 must produce loss curves that track each other —
        same large-scale descent, final losses within tolerance."""
        import optax

        arch = tiny_waveglow_arch()
        mel = jax.random.normal(KEY, (2, 16, arch.hp.n_mel_channels))
        audio = 0.1 * jax.random.normal(
            KEY, (2, 16 * arch.hp.upsample_stride))

        def run(compute_dtype):
            params = arch.init(KEY)
            tx = optax.adam(2e-3)
            opt = tx.init(params)

            @jax.jit
            def step(params, opt):
                loss, grads = jax.value_and_grad(
                    lambda p: arch.loss(p, mel, audio,
                                        compute_dtype = compute_dtype)
                )(params)
                updates, opt = tx.update(grads, opt, params)
                import optax as _optax
                return _optax.apply_updates(params, updates), opt, loss

            curve = []
            for _ in range(60):
                params, opt, loss = step(params, opt)
                curve.append(float(loss))
            return curve

        c32 = run(None)
        c16 = run(jnp.bfloat16)
        assert c32[-1] < c32[0] - 0.5          # the probe actually descends
        assert c16[-1] < c16[0] - 0.5
        # curves track: final NLLs within 10% of the f32 descent range
        descent = c32[0] - c32[-1]
        assert abs(c16[-1] - c32[-1]) < 0.1 * descent, (c32[-1], c16[-1])
