"""The one-command checkpoint gate (tools/import_and_verify.py) and the
official-layout exporters (models/tts_export.py) it self-tests through.

The exporters are the round-trip partners of ``models/tts_checkpoints.py``:
export → convert must reproduce the original tree exactly, proving names,
shapes and tensor-layout transposes both ways (VERDICT r2 next-round #2 —
the gate harness that runs the hour real pretrained weights appear)."""

import os
import sys
import subprocess

import numpy as np
import jax
import pytest

from text_to_speech_tpu.models import tts_checkpoints as ck
from text_to_speech_tpu.models import tts_export as ex

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, 'tools', 'import_and_verify.py')


def assert_trees_equal(got, want, path = ''):
    assert set(got) == set(want), (path, set(got) ^ set(want))
    for k in want:
        if isinstance(want[k], dict):
            assert_trees_equal(got[k], want[k], path + '/' + str(k))
        else:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                err_msg = path + '/' + str(k), atol = 1e-6)


class TestExportRoundtrips:
    def test_nvidia_tacotron2(self):
        from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
        arch = Tacotron2(
            vocab_size = 40, encoder_embedding_dim = 16, encoder_n_conv = 3,
            encoder_kernel_size = 3, prenet_sizes = (8, 8),
            lsa_attention_dim = 8, lsa_attention_filters = 4,
            lsa_attention_kernel_size = 7, attention_rnn_dim = 12,
            decoder_rnn_dim = 12, postnet_n_conv = 5, postnet_filters = 8,
            postnet_kernel_size = 3)
        params, state = arch.init(jax.random.PRNGKey(0))
        sd = ex.export_nvidia_tacotron2(params, state)
        got_p, got_s = ck.convert_nvidia_tacotron2(sd)
        assert_trees_equal(got_p, jax.tree_util.tree_map(np.asarray, params))
        assert_trees_equal(got_s, jax.tree_util.tree_map(np.asarray, state))
        # config inference reproduces the architecture
        cfg = ck.tacotron2_config_from_state_dict(sd)
        params2, _ = Tacotron2(** cfg).init(jax.random.PRNGKey(1))
        assert jax.tree_util.tree_structure(params) \
            == jax.tree_util.tree_structure(params2)
        assert all(np.shape(a) == np.shape(b) for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(params2)))

    def test_keras_tacotron2(self):
        from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
        from text_to_speech_tpu.models.weights_converter import \
            convert_keras_variables
        arch = Tacotron2(
            vocab_size = 40, encoder_embedding_dim = 16, encoder_n_conv = 3,
            encoder_kernel_size = 3, prenet_sizes = (8, 8),
            lsa_attention_dim = 8, lsa_attention_filters = 4,
            lsa_attention_kernel_size = 7, attention_rnn_dim = 12,
            decoder_rnn_dim = 12, postnet_n_conv = 5, postnet_filters = 8,
            postnet_kernel_size = 3)
        params, state = arch.init(jax.random.PRNGKey(0))
        variables = ex.export_keras_tacotron2(params, state)
        # the exported names exercise the reference's Keras conventions
        assert 'encoder/conv_1/kernel' in variables          # 1-indexed
        assert 'decoder/gate_output/kernel' in variables
        assert any('bidirectional' in k for k in variables)
        got_p, got_s = convert_keras_variables(variables)
        assert_trees_equal(got_p, jax.tree_util.tree_map(np.asarray, params))
        assert_trees_equal(got_s, jax.tree_util.tree_map(np.asarray, state))

    def test_nvidia_waveglow(self):
        from text_to_speech_tpu.models.waveglow_arch import WaveGlow
        arch = WaveGlow(n_flows = 6, n_group = 8, n_early_every = 2,
                        n_early_size = 2, wn_layers = 2, wn_channels = 8,
                        upsample_width = 16, upsample_stride = 8,
                        wn_fused = True)
        params = arch.init(jax.random.PRNGKey(0))
        sd = ex.export_nvidia_waveglow(params)
        got = ck.convert_nvidia_waveglow(sd)
        assert_trees_equal(got, jax.tree_util.tree_map(np.asarray, params))
        cfg = ck.waveglow_config_from_state_dict(sd)
        # the early-output schedule is reconstructed from channel counts
        assert cfg['n_early_every'] == 2 and cfg['n_early_size'] == 2
        assert cfg['n_group'] == 8 and cfg['n_flows'] == 6
        assert cfg['wn_fused'] is True
        params2 = WaveGlow(upsample_stride = 8, ** cfg).init(
            jax.random.PRNGKey(1))
        assert jax.tree_util.tree_structure(params) \
            == jax.tree_util.tree_structure(params2)

    def test_hifigan(self):
        from text_to_speech_tpu.models.hifigan_arch import HiFiGAN
        arch = HiFiGAN(upsample_initial_channel = 16,
                       upsample_rates = (2, 2),
                       upsample_kernel_sizes = (4, 4),
                       resblock_kernel_sizes = (3, 5),
                       resblock_dilation_sizes = ((1, 3), (1, 3)))
        params = arch.init(jax.random.PRNGKey(0))
        sd = ex.export_hifigan(params)
        got = ck.convert_hifigan(sd)
        assert_trees_equal(got, jax.tree_util.tree_map(np.asarray, params))
        cfg = ck.hifigan_config_from_state_dict(sd)
        assert cfg['resblock_kernel_sizes'] == (3, 5)
        assert cfg['resblock_dilation_sizes'] == ((1, 3), (1, 3))
        params2 = HiFiGAN(** cfg).init(jax.random.PRNGKey(1))
        assert jax.tree_util.tree_structure(params) \
            == jax.tree_util.tree_structure(params2)

    def test_hifigan_v3_resblock2(self):
        from text_to_speech_tpu.models.hifigan_arch import HiFiGAN
        arch = HiFiGAN(upsample_initial_channel = 16,
                       upsample_rates = (2, 2),
                       upsample_kernel_sizes = (4, 4),
                       resblock_kernel_sizes = (3,),
                       resblock_dilation_sizes = ((1, 3),),
                       resblock_version = 2)
        params = arch.init(jax.random.PRNGKey(0))
        sd = ex.export_hifigan(params)
        assert any('.convs.' in k for k in sd)      # single conv list (v3)
        got = ck.convert_hifigan(sd)
        assert_trees_equal(got, jax.tree_util.tree_map(np.asarray, params))
        assert ck.hifigan_config_from_state_dict(sd)['resblock_version'] == 2

    def test_vits(self):
        from text_to_speech_tpu.models.vits_arch import VITS
        arch = VITS(
            vocab_size = 40, spec_channels = 33, inter_channels = 8,
            hidden_channels = 16, filter_channels = 32, n_heads = 2,
            n_text_layers = 1, posterior_layers = 2, flow_layers = 2,
            flow_wn_layers = 2, duration_filters = 16,
            upsample_rates = (4, 2), upsample_kernel_sizes = (8, 4),
            upsample_initial_channel = 16, resblock_kernel_sizes = (3,),
            resblock_dilation_sizes = ((1, 2),), mpd_periods = (2, 3),
            msd_scales = 2, segment_frames = 8, max_frames = 64,
            use_sdp = True, sdp_filter_channels = 16, sdp_n_flows = 2,
            sdp_dds_layers = 2, sdp_n_bins = 4, n_speakers = 3,
            gin_channels = 8)
        params, _ = arch.init(jax.random.PRNGKey(0))
        sd = ex.export_vits(params)
        got = ck.convert_vits(sd)
        assert_trees_equal(got, jax.tree_util.tree_map(np.asarray, params))
        assert ck.vits_config_from_state_dict(sd)['use_sdp'] is True

    def test_vocos(self):
        from text_to_speech_tpu.models.vocos_arch import Vocos
        arch = Vocos(dim = 16, n_layers = 2, intermediate_dim = 32,
                     n_fft = 64, hop_length = 16, win_length = 64)
        params = arch.init(jax.random.PRNGKey(0))
        sd = ex.export_vocos(params)
        got = ck.convert_vocos(sd)
        assert_trees_equal(got, jax.tree_util.tree_map(np.asarray, params))
        cfg = ck.vocos_config_from_state_dict(sd)
        assert cfg['n_fft'] == 64 and cfg['hop_length'] == 16


class TestSafetensors:
    def test_reader_matches_official_writer(self, tmp_path):
        """The self-contained reader must parse files the official
        safetensors library writes (the installed lib acts as the
        ground-truth writer only)."""
        import ml_dtypes
        from safetensors.numpy import save_file
        from text_to_speech_tpu.models.tts_checkpoints import \
            load_safetensors
        rng = np.random.RandomState(0)
        tensors = {
            'a.weight': rng.randn(3, 4).astype(np.float32),
            'b.bias': rng.randn(5).astype(np.float16),
            'c.table': rng.randint(0, 9, (2, 2)).astype(np.int64),
            'd.bf': rng.randn(4, 2).astype(np.float32)
                .astype(ml_dtypes.bfloat16),
        }
        path = str(tmp_path / 'x.safetensors')
        save_file(tensors, path, metadata = {'format': 'pt'})
        got = load_safetensors(path)
        assert set(got) == set(tensors)
        np.testing.assert_array_equal(got['a.weight'], tensors['a.weight'])
        assert got['b.bias'].dtype == np.float32      # halves widen
        np.testing.assert_allclose(got['b.bias'],
                                   tensors['b.bias'].astype(np.float32))
        np.testing.assert_array_equal(got['c.table'], tensors['c.table'])
        assert got['d.bf'].dtype == np.float32
        np.testing.assert_allclose(
            got['d.bf'], tensors['d.bf'].astype(np.float32))

    def test_vocos_safetensors_roundtrip(self, tmp_path):
        """An official-layout Vocos checkpoint saved as .safetensors
        imports through the loaders and the gate tool's auto-detection."""
        from safetensors.numpy import save_file
        from text_to_speech_tpu.models.vocos_arch import Vocos
        arch = Vocos(dim = 16, n_layers = 2, intermediate_dim = 32,
                     n_fft = 64, hop_length = 16, win_length = 64)
        params = arch.init(jax.random.PRNGKey(0))
        sd = {k: np.ascontiguousarray(v)
              for k, v in ex.export_vocos(params).items()}
        path = str(tmp_path / 'vocos.safetensors')
        save_file(sd, path)
        got = ck.convert_vocos(ck._load_state_dict(path))
        assert_trees_equal(got, jax.tree_util.tree_map(np.asarray, params))


def run_tool(* args):
    env = dict(os.environ, JAX_PLATFORMS = 'cpu')
    env.pop('PALLAS_AXON_POOL_IPS', None)
    return subprocess.run([sys.executable, TOOL, * args],
                          capture_output = True, text = True, env = env,
                          timeout = 560)


class TestImportVerifyTool:
    def test_self_test_waveglow(self):
        """The full gate chain (export → .pth → detect → import → coverage
        → forward <2e-3 → listen) on the flagship vocoder family."""
        proc = run_tool('--self-test', 'waveglow')
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert 'SELF-TEST OK' in proc.stdout
        assert '[FAIL]' not in proc.stdout

    def test_self_test_keras_tacotron2(self):
        """The reference's own checkpoint format (Keras naming)."""
        proc = run_tool('--self-test', 'tacotron2-keras')
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert 'SELF-TEST OK' in proc.stdout

    @pytest.mark.slow
    def test_self_test_all_families(self):
        proc = run_tool('--self-test', 'all')
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert 'SELF-TEST OK (6 families)' in proc.stdout

    def test_pinned_configs_are_declared_hparams(self):
        """Every key in the pinned published-checkpoint hparam sets must
        stay a DECLARED architecture hparam (drift here would make the
        full-size --self-test-configs round-trip silently drop it)."""
        sys.path.insert(0, os.path.join(REPO, 'tools'))
        try:
            from import_and_verify import PINNED_CHECKPOINT_CONFIGS
        finally:
            sys.path.pop(0)
        from text_to_speech_tpu.models.tacotron2_arch import HParamsTacotron2
        from text_to_speech_tpu.models.waveglow_arch import HParamsWaveGlow
        names = [c[0] for c in PINNED_CHECKPOINT_CONFIGS]
        for expected in ('pretrained_tacotron2', 'tacotron2_siwis',
                         'sv2tts_tacotron2_256', 'waveglow'):
            assert expected in names
        for name, family, lang, cfg in PINNED_CHECKPOINT_CONFIGS:
            hp = HParamsWaveGlow if family == 'waveglow' \
                else HParamsTacotron2
            for key in cfg:
                assert key in hp, (name, key)

    @pytest.mark.slow
    def test_self_test_configs(self):
        """Full-size pinned-config round-trip (LJSpeech / SIWIS / SV2TTS /
        WaveGlow-256): detect → config inference → coverage → shape
        identity, no forward."""
        proc = run_tool('--self-test-configs')
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert 'CONFIG SELF-TEST OK (4 pinned configs)' in proc.stdout

    def test_corrupted_checkpoint_fails_forward_gate(self, tmp_path):
        """A checkpoint whose weights were perturbed above the gate must
        FAIL the forward stage — the gate detects real import drift."""
        import torch
        from text_to_speech_tpu.models.hifigan_arch import HiFiGAN
        arch = HiFiGAN(upsample_initial_channel = 16,
                       upsample_rates = (2, 2),
                       upsample_kernel_sizes = (4, 4),
                       resblock_kernel_sizes = (3,),
                       resblock_dilation_sizes = ((1, 3),))
        params = arch.init(jax.random.PRNGKey(0))
        mel = (np.random.RandomState(0).randn(1, 16, 80) * 2. - 6.) \
            .astype(np.float32)
        audio = np.asarray(arch.apply(
            jax.tree_util.tree_map(np.asarray, params), mel))
        golden = tmp_path / 'golden.npz'
        np.savez(golden, mel = mel, audio = audio[:, :16 * 4])

        sd = ex.export_hifigan(params)
        sd['conv_post.weight'] = sd['conv_post.weight'] + 0.05   # corrupt
        ckpt = tmp_path / 'corrupt.pth'
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, str(ckpt))

        proc = run_tool(str(ckpt), '--golden', str(golden),
                        '--workdir', str(tmp_path / 'wd'),
                        '--out', str(tmp_path / 'listen'))
        assert proc.returncode == 1, proc.stdout + proc.stderr
        assert '[FAIL] forward' in proc.stdout
