"""Numeric parity of layer conventions against torch, and NVIDIA checkpoint
converter structure checks — the guarantees that make real pretrained
checkpoints load correctly (no network needed: torch modules are built
locally with random weights)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from text_to_speech_tpu.nn import layers as nn
from text_to_speech_tpu.models.tts_checkpoints import (
    convert_nvidia_tacotron2, convert_nvidia_waveglow, remove_torch_weight_norm,
)


class TestLayerParity:
    def test_linear(self):
        lin = torch.nn.Linear(6, 4)
        x = torch.randn(3, 6)
        ref = lin(x).detach().numpy()
        params = {'kernel': lin.weight.detach().numpy().T,
                  'bias': lin.bias.detach().numpy()}
        out = nn.dense(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, atol = 1e-5)

    @pytest.mark.parametrize('dilation', [1, 2])
    def test_conv1d_same(self, dilation):
        conv = torch.nn.Conv1d(4, 8, 5, padding = 2 * dilation,
                               dilation = dilation)
        x = torch.randn(2, 4, 16)                      # torch NCW
        ref = conv(x).detach().numpy().transpose(0, 2, 1)
        params = {'kernel': conv.weight.detach().numpy().transpose(2, 1, 0),
                  'bias': conv.bias.detach().numpy()}
        out = nn.conv1d(params, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                        padding = 'SAME', dilation = dilation)
        np.testing.assert_allclose(np.asarray(out), ref, atol = 1e-5)

    def test_conv_transpose1d(self):
        conv = torch.nn.ConvTranspose1d(3, 5, 8, stride = 4)
        x = torch.randn(1, 3, 6)
        ref = conv(x).detach().numpy().transpose(0, 2, 1)
        kernel = conv.weight.detach().numpy().transpose(2, 0, 1)[::-1].copy()
        params = {'kernel': kernel,
                  'bias': conv.bias.detach().numpy()}
        out = nn.conv1d_transpose(params, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                                  stride = 4)
        np.testing.assert_allclose(np.asarray(out), ref, atol = 1e-5)

    def test_lstm_cell(self):
        cell = torch.nn.LSTMCell(5, 7)
        x = torch.randn(3, 5)
        h0, c0 = torch.randn(3, 7), torch.randn(3, 7)
        h_ref, c_ref = cell(x, (h0, c0))
        params = {
            'kernel': cell.weight_ih.detach().numpy().T,
            'recurrent_kernel': cell.weight_hh.detach().numpy().T,
            'bias': (cell.bias_ih + cell.bias_hh).detach().numpy(),
        }
        _, (h, c) = nn.lstm_cell(params, jnp.asarray(x.numpy()),
                                 (jnp.asarray(h0.numpy()), jnp.asarray(c0.numpy())))
        np.testing.assert_allclose(np.asarray(h), h_ref.detach().numpy(), atol = 1e-5)
        np.testing.assert_allclose(np.asarray(c), c_ref.detach().numpy(), atol = 1e-5)

    def test_bilstm_sequence(self):
        lstm = torch.nn.LSTM(4, 3, batch_first = True, bidirectional = True)
        x = torch.randn(2, 6, 4)
        ref, _ = lstm(x)
        params = {
            'forward': {
                'kernel': lstm.weight_ih_l0.detach().numpy().T,
                'recurrent_kernel': lstm.weight_hh_l0.detach().numpy().T,
                'bias': (lstm.bias_ih_l0 + lstm.bias_hh_l0).detach().numpy(),
            },
            'backward': {
                'kernel': lstm.weight_ih_l0_reverse.detach().numpy().T,
                'recurrent_kernel': lstm.weight_hh_l0_reverse.detach().numpy().T,
                'bias': (lstm.bias_ih_l0_reverse + lstm.bias_hh_l0_reverse).detach().numpy(),
            },
        }
        out = nn.bilstm(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), atol = 1e-5)

    def test_batch_norm_eval(self):
        bn = torch.nn.BatchNorm1d(6).eval()
        with torch.no_grad():
            bn.running_mean.normal_()
            bn.running_var.uniform_(0.5, 2.)
            bn.weight.normal_()
            bn.bias.normal_()
        x = torch.randn(2, 6, 10)
        ref = bn(x).detach().numpy().transpose(0, 2, 1)
        params = {'gamma': bn.weight.detach().numpy(),
                  'beta': bn.bias.detach().numpy()}
        state = {'moving_mean': bn.running_mean.numpy(),
                 'moving_var': bn.running_var.numpy()}
        out, _ = nn.batch_norm(params, state,
                               jnp.asarray(x.numpy().transpose(0, 2, 1)),
                               train = False)
        np.testing.assert_allclose(np.asarray(out), ref, atol = 1e-5)

    def test_weight_norm_removal(self):
        conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 6, 3))
        sd = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
        plain = remove_torch_weight_norm(sd)
        ref = torch.nn.utils.remove_weight_norm(conv).weight.detach().numpy()
        np.testing.assert_allclose(plain['weight'], ref, atol = 1e-6)


def synthetic_nvidia_tacotron2_sd():
    """state_dict with the NVIDIA layout/shapes (random values)."""
    rng = np.random.RandomState(0)
    sd = {}

    def add(name, * shape):
        sd[name] = rng.randn(* shape).astype(np.float32) * 0.05

    add('embedding.weight', 148, 512)
    for i in range(3):
        add('encoder.convolutions.{}.0.conv.weight'.format(i), 512, 512, 5)
        add('encoder.convolutions.{}.0.conv.bias'.format(i), 512)
        add('encoder.convolutions.{}.1.weight'.format(i), 512)
        add('encoder.convolutions.{}.1.bias'.format(i), 512)
        add('encoder.convolutions.{}.1.running_mean'.format(i), 512)
        sd['encoder.convolutions.{}.1.running_var'.format(i)] = \
            np.abs(rng.randn(512)).astype(np.float32) + 0.5
    for suffix in ('_l0', '_l0_reverse'):
        add('encoder.lstm.weight_ih' + suffix, 1024, 512)
        add('encoder.lstm.weight_hh' + suffix, 1024, 256)
        add('encoder.lstm.bias_ih' + suffix, 1024)
        add('encoder.lstm.bias_hh' + suffix, 1024)
    add('decoder.prenet.layers.0.linear_layer.weight', 256, 80)
    add('decoder.prenet.layers.1.linear_layer.weight', 256, 256)
    add('decoder.attention_rnn.weight_ih', 4096, 768)
    add('decoder.attention_rnn.weight_hh', 4096, 1024)
    add('decoder.attention_rnn.bias_ih', 4096)
    add('decoder.attention_rnn.bias_hh', 4096)
    add('decoder.attention_layer.query_layer.linear_layer.weight', 128, 1024)
    add('decoder.attention_layer.memory_layer.linear_layer.weight', 128, 512)
    add('decoder.attention_layer.v.linear_layer.weight', 1, 128)
    add('decoder.attention_layer.location_layer.location_conv.conv.weight', 32, 2, 31)
    add('decoder.attention_layer.location_layer.location_dense.linear_layer.weight', 128, 32)
    add('decoder.decoder_rnn.weight_ih', 4096, 1536)
    add('decoder.decoder_rnn.weight_hh', 4096, 1024)
    add('decoder.decoder_rnn.bias_ih', 4096)
    add('decoder.decoder_rnn.bias_hh', 4096)
    add('decoder.linear_projection.linear_layer.weight', 80, 1536)
    add('decoder.linear_projection.linear_layer.bias', 80)
    add('decoder.gate_layer.linear_layer.weight', 1, 1536)
    add('decoder.gate_layer.linear_layer.bias', 1)
    for i in range(5):
        ch_in = 80 if i == 0 else 512
        ch_out = 80 if i == 4 else 512
        add('postnet.convolutions.{}.0.conv.weight'.format(i), ch_out, ch_in, 5)
        add('postnet.convolutions.{}.0.conv.bias'.format(i), ch_out)
        add('postnet.convolutions.{}.1.weight'.format(i), ch_out)
        add('postnet.convolutions.{}.1.bias'.format(i), ch_out)
        add('postnet.convolutions.{}.1.running_mean'.format(i), ch_out)
        sd['postnet.convolutions.{}.1.running_var'.format(i)] = \
            np.abs(rng.randn(ch_out)).astype(np.float32) + 0.5
    return sd


class TestNvidiaConverters:
    @pytest.mark.slow
    def test_tacotron2_shapes_match_arch(self):
        from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
        from text_to_speech_tpu.train.checkpoint import flatten_tree

        params, state = convert_nvidia_tacotron2(synthetic_nvidia_tacotron2_sd())
        arch = Tacotron2()          # default = NVIDIA hyper-parameters
        ref_params, ref_state = arch.init(jax.random.PRNGKey(0))

        ref_flat = flatten_tree(ref_params)
        got_flat = flatten_tree(params)
        assert set(ref_flat) == set(got_flat), (
            set(ref_flat) ^ set(got_flat))
        for key in ref_flat:
            assert np.shape(got_flat[key]) == np.shape(ref_flat[key]), key
        assert set(flatten_tree(ref_state)) == set(flatten_tree(state))

    def test_tacotron2_imported_forward_runs(self):
        from text_to_speech_tpu.models.tacotron2_arch import Tacotron2
        params, state = convert_nvidia_tacotron2(synthetic_nvidia_tacotron2_sd())
        params = jax.tree_util.tree_map(jnp.asarray, params)
        state = jax.tree_util.tree_map(jnp.asarray, state)
        arch = Tacotron2()
        out = arch.infer(params, state, jnp.ones((1, 8), jnp.int32),
                         max_length = 8, early_stopping = False,
                         deterministic = True)
        assert bool(jnp.isfinite(out.mel).all())

    def test_waveglow_shapes_match_arch(self):
        from text_to_speech_tpu.models.waveglow_arch import WaveGlow
        from text_to_speech_tpu.train.checkpoint import flatten_tree

        rng = np.random.RandomState(1)
        sd = {}
        n_flows, n_layers, n_ch = 2, 3, 64
        sd['upsample.weight'] = rng.randn(80, 80, 1024).astype(np.float32) * 0.05
        sd['upsample.bias'] = rng.randn(80).astype(np.float32)
        n_half_per_flow = [4, 4]
        for k in range(n_flows):
            n_half = n_half_per_flow[k]
            sd['convinv.{}.conv.weight'.format(k)] = rng.randn(8, 8, 1).astype(np.float32)
            sd['WN.{}.start.weight'.format(k)] = rng.randn(n_ch, n_half, 1).astype(np.float32) * 0.05
            sd['WN.{}.start.bias'.format(k)] = rng.randn(n_ch).astype(np.float32)
            sd['WN.{}.end.weight'.format(k)] = rng.randn(2 * n_half, n_ch, 1).astype(np.float32) * 0.05
            sd['WN.{}.end.bias'.format(k)] = rng.randn(2 * n_half).astype(np.float32)
            sd['WN.{}.cond_layer.weight'.format(k)] = rng.randn(
                n_layers * 2 * n_ch, 640, 1).astype(np.float32) * 0.05
            sd['WN.{}.cond_layer.bias'.format(k)] = rng.randn(
                n_layers * 2 * n_ch).astype(np.float32)
            for i in range(n_layers):
                sd['WN.{}.in_layers.{}.weight'.format(k, i)] = rng.randn(
                    2 * n_ch, n_ch, 3).astype(np.float32) * 0.05
                sd['WN.{}.in_layers.{}.bias'.format(k, i)] = rng.randn(2 * n_ch).astype(np.float32)
                out_ch = 2 * n_ch if i < n_layers - 1 else n_ch
                sd['WN.{}.res_skip_layers.{}.weight'.format(k, i)] = rng.randn(
                    out_ch, n_ch, 1).astype(np.float32) * 0.05
                sd['WN.{}.res_skip_layers.{}.bias'.format(k, i)] = rng.randn(out_ch).astype(np.float32)

        params = convert_nvidia_waveglow(sd)
        arch = WaveGlow(n_flows = n_flows, wn_layers = n_layers,
                        wn_channels = n_ch, n_early_every = 4, wn_fused = True)
        ref = arch.init(jax.random.PRNGKey(0))
        ref_flat = flatten_tree(ref)
        got_flat = flatten_tree(params)
        assert set(ref_flat) == set(got_flat), set(ref_flat) ^ set(got_flat)
        for key in ref_flat:
            assert np.shape(got_flat[key]) == np.shape(ref_flat[key]), key

        # imported params must actually vocode
        params = jax.tree_util.tree_map(jnp.asarray, params)
        audio = arch.infer(params, jnp.zeros((1, 16, 80)), deterministic = True)
        assert bool(jnp.isfinite(audio).all())


class TestDescribeMapping:
    def test_report_statuses(self):
        import numpy as np
        from text_to_speech_tpu.models.weights_converter import describe_mapping

        source = {'encoder': {'dense': {'kernel': np.zeros((4, 4))},
                              'extra': {'bias': np.zeros(2)}}}
        target = {'encoder': {'dense': {'kernel': np.zeros((4, 4))},
                              'wider': {'kernel': np.zeros((8, 4))}}}
        report = describe_mapping(source, target)
        assert 'exact' in report
        assert 'UNMATCHED' in report           # wider/kernel has no source
        assert 'unused source weights' in report and 'extra/bias' in report

    def test_partial_status(self):
        import numpy as np
        from text_to_speech_tpu.models.weights_converter import describe_mapping
        source = {'d': {'kernel': np.zeros((4, 4))}}
        target = {'d': {'kernel': np.zeros((6, 4))}}
        assert 'partial' in describe_mapping(source, target)


class TestHiFiGANParity:
    def _torch_generator(self, torch):
        """Tiny generator in the published layout (conv_pre / ups /
        resblocks / conv_post) for layout + numeric verification."""
        nn_t = torch.nn
        F = torch.nn.functional
        RATES, WIDTHS = (4, 2), (8, 4)
        KERNELS, DILS = (3, 7), ((1, 3), (1, 3))
        CH = 16

        class Gen(nn_t.Module):
            def __init__(self):
                super().__init__()
                self.conv_pre = nn_t.Conv1d(8, CH, 7, padding = 3)
                self.ups = nn_t.ModuleList()
                ch = CH
                for r, w in zip(RATES, WIDTHS):
                    self.ups.append(nn_t.ConvTranspose1d(
                        ch, ch // 2, w, stride = r, padding = (w - r) // 2))
                    ch //= 2
                self.resblocks = nn_t.ModuleList()
                ch = CH
                for _ in RATES:
                    ch //= 2
                    for k, dils in zip(KERNELS, DILS):
                        block = nn_t.Module()
                        block.convs1 = nn_t.ModuleList([
                            nn_t.Conv1d(ch, ch, k, dilation = d,
                                        padding = d * (k - 1) // 2)
                            for d in dils])
                        block.convs2 = nn_t.ModuleList([
                            nn_t.Conv1d(ch, ch, k, padding = (k - 1) // 2)
                            for d in dils])
                        self.resblocks.append(block)
                self.conv_post = nn_t.Conv1d(ch, 1, 7, padding = 3)

            def forward(self, x):
                x = self.conv_pre(x)
                for i in range(len(self.ups)):
                    x = F.leaky_relu(x, 0.1)
                    x = self.ups[i](x)
                    xs = None
                    for j, (k, dils) in enumerate(zip(KERNELS, DILS)):
                        block = self.resblocks[i * len(KERNELS) + j]
                        xb = x
                        for c1, c2, d in zip(block.convs1, block.convs2, dils):
                            xt = F.leaky_relu(xb, 0.1)
                            xt = c1(xt)
                            xt = F.leaky_relu(xt, 0.1)
                            xt = c2(xt)
                            xb = xb + xt
                        xs = xb if xs is None else xs + xb
                    x = xs / len(KERNELS)
                x = F.leaky_relu(x)
                x = self.conv_post(x)
                return torch.tanh(x)

        return Gen()

    def test_generator_numeric_parity(self):
        import torch
        from text_to_speech_tpu.models.tts_checkpoints import convert_hifigan
        from text_to_speech_tpu.models.hifigan_arch import HiFiGAN

        torch.manual_seed(0)
        gen = self._torch_generator(torch).eval()
        sd = {k: v.detach().numpy() for k, v in gen.state_dict().items()}
        params = convert_hifigan(sd, num_kernels = 2)

        arch = HiFiGAN(n_mel_channels = 8, upsample_rates = (4, 2),
                       upsample_kernel_sizes = (8, 4),
                       upsample_initial_channel = 16,
                       resblock_kernel_sizes = (3, 7),
                       resblock_dilation_sizes = ((1, 3), (1, 3)))

        mel = np.random.RandomState(1).randn(2, 12, 8).astype(np.float32)
        with torch.no_grad():
            ref = gen(torch.from_numpy(mel.transpose(0, 2, 1)))[:, 0].numpy()
        ours = np.asarray(arch.apply(params, mel))
        assert ours.shape == ref.shape
        assert np.abs(ours - ref).max() < 2e-5

    def test_weight_norm_fold(self):
        import torch
        from text_to_speech_tpu.models.tts_checkpoints import (
            load_hifigan,
        )
        from text_to_speech_tpu.models.hifigan_arch import HiFiGAN

        torch.manual_seed(2)
        gen = self._torch_generator(torch)
        # weight-norm every conv like the published checkpoint
        for mod in gen.modules():
            if isinstance(mod, (torch.nn.Conv1d, torch.nn.ConvTranspose1d)):
                torch.nn.utils.weight_norm(mod)
        gen = gen.eval()
        sd = {k: v.detach().numpy() for k, v in gen.state_dict().items()}
        params = load_hifigan(sd, num_kernels = 2)

        arch = HiFiGAN(n_mel_channels = 8, upsample_rates = (4, 2),
                       upsample_kernel_sizes = (8, 4),
                       upsample_initial_channel = 16,
                       resblock_kernel_sizes = (3, 7),
                       resblock_dilation_sizes = ((1, 3), (1, 3)))
        mel = np.random.RandomState(3).randn(1, 10, 8).astype(np.float32)
        with torch.no_grad():
            ref = gen(torch.from_numpy(mel.transpose(0, 2, 1)))[:, 0].numpy()
        ours = np.asarray(arch.apply(params, mel))
        assert np.abs(ours - ref).max() < 2e-5


class TestHiFiGANv3Parity:
    def test_resblock2_import(self):
        """v3-layout (ResBlock2, single 'convs' list) torch checkpoints
        convert and match numerically."""
        import torch
        from text_to_speech_tpu.models.tts_checkpoints import convert_hifigan
        from text_to_speech_tpu.models.hifigan_arch import HiFiGAN

        nn_t = torch.nn
        F = torch.nn.functional
        RATES, WIDTHS, KERNELS, DILS = (4, 2), (8, 4), (3, 5), ((1, 2), (2, 6))
        CH = 16

        class Gen(nn_t.Module):
            def __init__(self):
                super().__init__()
                self.conv_pre = nn_t.Conv1d(8, CH, 7, padding = 3)
                self.ups = nn_t.ModuleList()
                ch = CH
                for r, w in zip(RATES, WIDTHS):
                    self.ups.append(nn_t.ConvTranspose1d(
                        ch, ch // 2, w, stride = r, padding = (w - r) // 2))
                    ch //= 2
                self.resblocks = nn_t.ModuleList()
                ch = CH
                for _ in RATES:
                    ch //= 2
                    for k, dils in zip(KERNELS, DILS):
                        block = nn_t.Module()
                        block.convs = nn_t.ModuleList([
                            nn_t.Conv1d(ch, ch, k, dilation = d,
                                        padding = d * (k - 1) // 2)
                            for d in dils])
                        self.resblocks.append(block)
                self.conv_post = nn_t.Conv1d(ch, 1, 7, padding = 3)

            def forward(self, x):
                x = self.conv_pre(x)
                for i in range(len(self.ups)):
                    x = F.leaky_relu(x, 0.1)
                    x = self.ups[i](x)
                    xs = None
                    for j in range(len(KERNELS)):
                        block = self.resblocks[i * len(KERNELS) + j]
                        xb = x
                        for conv in block.convs:
                            xt = F.leaky_relu(xb, 0.1)
                            xb = xb + conv(xt)
                        xs = xb if xs is None else xs + xb
                    x = xs / len(KERNELS)
                x = F.leaky_relu(x)
                return torch.tanh(self.conv_post(x))

        torch.manual_seed(4)
        gen = Gen().eval()
        sd = {k: v.detach().numpy() for k, v in gen.state_dict().items()}
        params = convert_hifigan(sd)       # num_kernels inferred
        assert 'conv2' not in params['up0']['res0']['d0']

        arch = HiFiGAN(n_mel_channels = 8, upsample_rates = RATES,
                       upsample_kernel_sizes = WIDTHS,
                       upsample_initial_channel = CH,
                       resblock_kernel_sizes = KERNELS,
                       resblock_dilation_sizes = DILS,
                       resblock_version = 2)
        mel = np.random.RandomState(5).randn(1, 10, 8).astype(np.float32)
        with torch.no_grad():
            ref = gen(torch.from_numpy(mel.transpose(0, 2, 1)))[:, 0].numpy()
        ours = np.asarray(arch.apply(params, mel))
        assert np.abs(ours - ref).max() < 2e-5
