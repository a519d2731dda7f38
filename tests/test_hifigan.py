"""HiFi-GAN vocoder family: generator/discriminators, GAN training step,
task-model surface (beyond-reference capability — the reference ships
WaveGlow only)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from text_to_speech_tpu.models.hifigan_arch import HiFiGAN as HiFiGANArch

TINY = dict(
    n_mel_channels = 8,
    upsample_rates = (4, 2, 2),
    upsample_kernel_sizes = (8, 4, 4),
    upsample_initial_channel = 32,
    resblock_kernel_sizes = (3, 7),
    resblock_dilation_sizes = ((1, 3), (1, 3)),
    mpd_periods = (2, 3),
    msd_scales = 2,
)


@pytest.fixture(scope = 'module')
def arch():
    return HiFiGANArch(** TINY)


@pytest.fixture(scope = 'module')
def gen_params(arch):
    return arch.init(jax.random.PRNGKey(0))


class TestGenerator:
    def test_output_shape_is_exact_upsampling(self, arch, gen_params):
        mel = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 8))
        wave = jax.jit(arch.apply)(gen_params, mel)
        assert wave.shape == (2, 20 * arch.total_upsampling)
        assert wave.dtype == jnp.float32
        assert np.abs(np.asarray(wave)).max() <= 1.        # tanh-bounded

    def test_deterministic(self, arch, gen_params):
        mel = jax.random.normal(jax.random.PRNGKey(2), (1, 12, 8))
        a = np.asarray(arch.apply(gen_params, mel))
        b = np.asarray(arch.apply(gen_params, mel))
        np.testing.assert_array_equal(a, b)

    def test_bf16_path(self, arch, gen_params):
        mel = jax.random.normal(jax.random.PRNGKey(3), (1, 12, 8))
        wave32 = np.asarray(arch.apply(gen_params, mel))
        wave16 = np.asarray(arch.apply(gen_params, mel, dtype = jnp.bfloat16))
        assert wave16.dtype == np.float32                  # cast back out
        assert np.abs(wave32 - wave16).max() < 0.1

    def test_length_scaling(self, arch, gen_params):
        for frames in (10, 25):
            mel = jnp.zeros((1, frames, 8))
            assert arch.apply(gen_params, mel).shape[1] == \
                frames * arch.total_upsampling


class TestDiscriminators:
    def test_mpd_msd_shapes_and_features(self, arch):
        mpd = arch.init_mpd(jax.random.PRNGKey(4))
        msd = arch.init_msd(jax.random.PRNGKey(5))
        audio = jax.random.normal(jax.random.PRNGKey(6), (2, 320))
        for score, feats in arch.apply_mpd(mpd, audio):
            assert score.shape[0] == 2 and len(feats) == 6
        outs = arch.apply_msd(msd, audio)
        assert len(outs) == TINY['msd_scales']
        for score, feats in outs:
            assert score.shape[0] == 2 and len(feats) == 8

    def test_discriminator_loss_separates(self, arch):
        mpd = arch.init_mpd(jax.random.PRNGKey(7))
        real = jnp.ones((1, 160)) * 0.5
        fake = -jnp.ones((1, 160)) * 0.5
        loss_same = arch.discriminator_loss(
            arch.apply_mpd(mpd, real), arch.apply_mpd(mpd, real))
        assert np.isfinite(float(loss_same))


class TestGANTraining:
    def test_alternating_step_decreases_disc_loss(self, arch):
        import optax
        from text_to_speech_tpu.train.gan import (
            make_hifigan_train_step, init_hifigan_train_state,
        )
        gen_opt = optax.adam(2e-4)
        disc_opt = optax.adam(2e-4)
        state = init_hifigan_train_state(
            arch, jax.random.PRNGKey(8), gen_opt, disc_opt)
        step = make_hifigan_train_step(arch, gen_opt, disc_opt,
                                       mel_fn = None, donate = False)

        mel = jax.random.normal(jax.random.PRNGKey(9), (2, 10, 8))
        audio = jax.random.normal(jax.random.PRNGKey(10), (2, 160)) * 0.1

        losses = []
        for _ in range(4):
            state, metrics = step(state, mel, audio)
            losses.append(float(metrics['disc_loss']))
            assert np.isfinite(float(metrics['gen_loss']))
        assert losses[-1] < losses[0]       # discriminator learns

    def test_mel_loss_term(self, arch):
        import optax
        from text_to_speech_tpu.train.gan import (
            make_hifigan_train_step, init_hifigan_train_state,
        )

        def toy_mel_fn(wave):
            # cheap differentiable "mel": strided frame energies
            frames = wave.reshape(wave.shape[0], -1, 16)
            return jnp.log(jnp.mean(frames ** 2, axis = -1, keepdims = True) + 1e-5)

        gen_opt = disc_opt = optax.sgd(1e-3)
        state = init_hifigan_train_state(
            arch, jax.random.PRNGKey(11), gen_opt, disc_opt)
        step = make_hifigan_train_step(arch, gen_opt, disc_opt,
                                       mel_fn = toy_mel_fn, donate = False)
        mel = jax.random.normal(jax.random.PRNGKey(12), (1, 10, 8))
        audio = jax.random.normal(jax.random.PRNGKey(13), (1, 160)) * 0.1
        _, metrics = step(state, mel, audio)
        assert float(metrics['mel']) > 0


class TestTaskModel:
    def test_infer_and_persistence(self, tmp_path, monkeypatch):
        from text_to_speech_tpu.models import saving
        from text_to_speech_tpu.models.interfaces import reset_instances
        monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
        reset_instances()
        from text_to_speech_tpu.models.tts import HiFiGAN

        voc = HiFiGAN(name = 'tiny_hifigan', mel_fn = 'TacotronSTFT', ** TINY)
        mel = np.random.RandomState(0).randn(14, 8).astype(np.float32)
        audio = voc(mel)
        assert audio.shape == (14 * voc.upsample_rate,)
        batched = voc.infer(mel[None])
        assert batched.shape == (1, 14 * voc.upsample_rate)

        voc.save()
        reset_instances()
        reloaded = HiFiGAN(name = 'tiny_hifigan')
        assert tuple(reloaded.arch.hp.upsample_rates) == TINY['upsample_rates']
        np.testing.assert_allclose(
            np.asarray(reloaded(mel)), np.asarray(audio), atol = 1e-5)


class TestTTSIntegration:
    def test_tts_with_hifigan_vocoder(self, tmp_path, monkeypatch):
        """`tts()` works unchanged with the HiFi-GAN vocoder swapped in."""
        from text_to_speech_tpu.models import saving
        from text_to_speech_tpu.models.interfaces import reset_instances
        monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
        reset_instances()
        from text_to_speech_tpu import tts, Tacotron2
        from text_to_speech_tpu.models.tts import HiFiGAN

        taco = Tacotron2(
            lang = 'en', name = 'itaco',
            n_mel_channels = 8,
            encoder_embedding_dim = 16, encoder_n_conv = 1,
            encoder_kernel_size = 3, prenet_sizes = (8, 8),
            lsa_attention_dim = 8, lsa_attention_filters = 4,
            lsa_attention_kernel_size = 7, attention_rnn_dim = 12,
            decoder_rnn_dim = 12, postnet_n_conv = 2, postnet_filters = 8,
            postnet_kernel_size = 3, max_decoder_steps = 16,
        )
        voc = HiFiGAN(name = 'ihifi', ** TINY)
        results = tts('hi', model = taco, vocoder = voc, max_trial = 1,
                      max_length = 16, save = False)
        assert len(results) == 1
        assert 'audio' in results[0]
        audio = np.asarray(results[0]['audio'])
        assert audio.ndim == 1 and len(audio) > 0


class TestPresets:
    def test_v3_resblock2_runs(self):
        from text_to_speech_tpu.models.hifigan_arch import (
            HiFiGAN as Arch, HIFIGAN_V3,
        )
        arch = Arch(** {** HIFIGAN_V3,
                        'n_mel_channels': 8,
                        'upsample_rates': (4, 2, 2),
                        'upsample_kernel_sizes': (8, 4, 4),
                        'upsample_initial_channel': 16})
        params = arch.init(jax.random.PRNGKey(20))
        # ResBlock2 units have a single conv
        assert 'conv2' not in params['up0']['res0']['d0']
        mel = jnp.zeros((1, 6, 8))
        wave = arch.apply(params, mel)
        assert wave.shape == (1, 6 * 16)


class TestStreamingVocoder:
    def test_incremental_streaming_with_hifigan(self, tmp_path, monkeypatch):
        """The incremental-audio stepper is vocoder-agnostic: HiFi-GAN
        drops in for the streaming path (lower per-chunk cost than
        WaveGlow)."""
        from text_to_speech_tpu.models import saving
        from text_to_speech_tpu.models.interfaces import reset_instances
        from text_to_speech_tpu.models.tts import Tacotron2, HiFiGAN
        from text_to_speech_tpu.runtimes.serving import (
            ContinuousServingEngine, make_tacotron_stepper)

        monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
        reset_instances()
        model = Tacotron2(
            lang = 'en', name = 'hstream_taco',
            n_mel_channels = 8,
            encoder_embedding_dim = 8, encoder_n_conv = 1,
            encoder_kernel_size = 3, prenet_sizes = (4, 4),
            lsa_attention_dim = 4, lsa_attention_filters = 2,
            lsa_attention_kernel_size = 5, attention_rnn_dim = 8,
            decoder_rnn_dim = 8, postnet_n_conv = 2, postnet_filters = 4,
            postnet_kernel_size = 3, max_decoder_steps = 16,
        )
        model.arch.hp.gate_threshold = 1.1          # run to max_steps
        vocoder = HiFiGAN(name = 'hstream_voc', ** TINY)

        chunks = []
        start_fn, step_fn, finish_fn = make_tacotron_stepper(
            model, chunk = 4, token_multiple = 8, max_steps = 12,
            deterministic = True, vocoder = vocoder, stream_audio = True,
            stream_context = 4, stream_lookahead = 1)
        with ContinuousServingEngine(start_fn, step_fn, finish_fn) as engine:
            req = engine.submit('hello hifigan streaming',
                                on_audio = chunks.append)
            out = req.result.get(timeout = 300)

        assert out['steps'] == 12
        assert len(chunks) >= 2
        total = np.concatenate(chunks)
        np.testing.assert_array_equal(total, out['audio'])
        assert total.shape[0] == 12 * vocoder.upsample_rate


class TestRealMelLoss:
    def test_gan_step_with_tacotron_stft(self, arch):
        """The GAN mel term runs through the real (differentiable)
        TacotronSTFT front-end inside jit."""
        import optax
        from text_to_speech_tpu.ops.stft import TacotronSTFT
        from text_to_speech_tpu.train.gan import (
            make_hifigan_train_step, init_hifigan_train_state,
            mel_fn_from_stft,
        )

        stft = TacotronSTFT(filter_length = 64, hop_length = 16,
                            win_length = 64, n_mel_channels = 8)
        gen_opt = disc_opt = optax.sgd(1e-3)
        state = init_hifigan_train_state(
            arch, jax.random.PRNGKey(30), gen_opt, disc_opt)
        step = make_hifigan_train_step(
            arch, gen_opt, disc_opt, mel_fn = mel_fn_from_stft(stft),
            donate = False)
        mel = jax.random.normal(jax.random.PRNGKey(31), (1, 10, 8))
        audio = jax.random.normal(jax.random.PRNGKey(32), (1, 160)) * 0.1
        _, metrics = step(state, mel, audio)
        assert np.isfinite(float(metrics['mel'])) and float(metrics['mel']) > 0
        assert np.isfinite(float(metrics['gen_loss']))
