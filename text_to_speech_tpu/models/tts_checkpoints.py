"""Importers for published TTS checkpoints (NVIDIA Tacotron-2 / WaveGlow).

The pretrained-model path of the reference
(``/root/reference/models/weights_converter.py`` pattern maps;
``architectures/tacotron2_arch.py:934`` / ``waveglow_arch.py:327`` load the
NVIDIA torch-hub checkpoints): these functions rebuild this framework's
parameter trees from the torch ``state_dict`` layouts, with every tensor
transposed into the (in, out) / (width, in, out) conventions of ``nn``.

Layout conventions verified against torch numerically (see
``tests/test_torch_parity.py``):
  - Linear (out, in) → kernel (in, out): ``.T``
  - Conv1d (out, in, k) → kernel (k, in, out): ``transpose(2, 1, 0)``
  - ConvTranspose1d (in, out, k) → kernel (k, in, out) + width flip:
    ``transpose(2, 0, 1)[::-1]``
  - LSTM/LSTMCell weight_ih (4H, in) → kernel (in, 4H): ``.T``; the two
    torch biases sum into one; torch gate order i,f,g,o matches ``nn``.
"""

import re
import logging

import numpy as np

logger = logging.getLogger(__name__)


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(sd, prefix):
    out = {'kernel': np.ascontiguousarray(
        np.asarray(sd[prefix + '.weight']).transpose(2, 1, 0))}
    if prefix + '.bias' in sd:
        out['bias'] = np.asarray(sd[prefix + '.bias'])
    return out


def _dense(sd, prefix):
    out = {'kernel': _t(sd[prefix + '.weight'])}
    if prefix + '.bias' in sd:
        out['bias'] = np.asarray(sd[prefix + '.bias'])
    return out


def _lstm_cell(sd, prefix, suffix = ''):
    return {
        'kernel': _t(sd['{}.weight_ih{}'.format(prefix, suffix)]),
        'recurrent_kernel': _t(sd['{}.weight_hh{}'.format(prefix, suffix)]),
        'bias': (np.asarray(sd['{}.bias_ih{}'.format(prefix, suffix)])
                 + np.asarray(sd['{}.bias_hh{}'.format(prefix, suffix)])),
    }


def _batch_norm(sd, prefix):
    params = {'gamma': np.asarray(sd[prefix + '.weight']),
              'beta': np.asarray(sd[prefix + '.bias'])}
    state = {'moving_mean': np.asarray(sd[prefix + '.running_mean']),
             'moving_var': np.asarray(sd[prefix + '.running_var'])}
    return params, state


def convert_nvidia_tacotron2(sd):
    """NVIDIA/torch-hub Tacotron-2 ``state_dict`` → (params, state) trees
    matching ``models.tacotron2_arch.Tacotron2`` (default hparams)."""
    sd = {re.sub(r'^module\.', '', k): v for k, v in sd.items()}
    params = {'encoder': {}, 'decoder': {}, 'postnet': {}}
    state = {'encoder': {}, 'postnet': {}}

    params['encoder']['embedding'] = {'embeddings': np.asarray(sd['embedding.weight'])}
    for i in range(3):
        conv = _conv(sd, 'encoder.convolutions.{}.0.conv'.format(i))
        bn, bn_state = _batch_norm(sd, 'encoder.convolutions.{}.1'.format(i))
        params['encoder']['conv_{}'.format(i)] = {'conv': conv, 'bn': bn}
        state['encoder']['conv_{}'.format(i)] = {'bn': bn_state}
    params['encoder']['bilstm'] = {
        'forward': _lstm_cell(sd, 'encoder.lstm', '_l0'),
        'backward': _lstm_cell(sd, 'encoder.lstm', '_l0_reverse'),
    }

    dec = params['decoder']
    dec['prenet'] = {
        'layer_0': _dense(sd, 'decoder.prenet.layers.0.linear_layer'),
        'layer_1': _dense(sd, 'decoder.prenet.layers.1.linear_layer'),
    }
    dec['attention_rnn'] = _lstm_cell(sd, 'decoder.attention_rnn')
    dec['attention'] = {
        'query': _dense(sd, 'decoder.attention_layer.query_layer.linear_layer'),
        'memory': _dense(sd, 'decoder.attention_layer.memory_layer.linear_layer'),
        'value': _dense(sd, 'decoder.attention_layer.v.linear_layer'),
        'location_conv': _conv(
            sd, 'decoder.attention_layer.location_layer.location_conv.conv'),
        'location_dense': _dense(
            sd, 'decoder.attention_layer.location_layer.location_dense.linear_layer'),
    }
    dec['decoder_rnn'] = {'cell_0': _lstm_cell(sd, 'decoder.decoder_rnn')}
    dec['linear_projection'] = _dense(sd, 'decoder.linear_projection.linear_layer')
    dec['gate_layer'] = _dense(sd, 'decoder.gate_layer.linear_layer')

    for i in range(5):
        conv = _conv(sd, 'postnet.convolutions.{}.0.conv'.format(i))
        bn, bn_state = _batch_norm(sd, 'postnet.convolutions.{}.1'.format(i))
        params['postnet']['conv_{}'.format(i)] = {'conv': conv, 'bn': bn}
        state['postnet']['conv_{}'.format(i)] = {'bn': bn_state}

    return params, state


def convert_nvidia_waveglow(sd):
    """NVIDIA WaveGlow ``state_dict`` (weight-norm removed) → params tree
    matching ``models.waveglow_arch.WaveGlow`` (default hparams,
    ``wn_fused=True`` — NVIDIA's blocks use one fused cond conv)."""
    sd = {re.sub(r'^module\.', '', k): v for k, v in sd.items()}
    params = {
        'upsample': {
            # torch ConvTranspose1d (in, out, k) -> (k, in, out) with the
            # width axis flipped (lax.conv_transpose convention, verified
            # against torch in tests/test_torch_parity.py)
            'kernel': np.ascontiguousarray(
                np.asarray(sd['upsample.weight']).transpose(2, 0, 1)[::-1]),
            'bias': np.asarray(sd['upsample.bias']),
        },
    }
    n_flows = 1 + max(
        int(m.group(1)) for k in sd
        for m in [re.match(r'WN\.(\d+)\.', k)] if m
    )
    n_layers = 1 + max(
        int(m.group(1)) for k in sd
        for m in [re.match(r'WN\.\d+\.in_layers\.(\d+)\.', k)] if m
    )
    for k in range(n_flows):
        w = np.asarray(sd['convinv.{}.conv.weight'.format(k)])[:, :, 0]
        # torch conv: y_c = sum_d W[c, d] x_d  ->  x @ W.T
        block = {
            'start': _conv(sd, 'WN.{}.start'.format(k)),
            'end': _conv(sd, 'WN.{}.end'.format(k)),
            'cond_layer': _conv(sd, 'WN.{}.cond_layer'.format(k)),
        }
        for i in range(n_layers):
            block['in_conv_{}'.format(i)] = _conv(
                sd, 'WN.{}.in_layers.{}'.format(k, i))
            block['res_skip_conv_{}'.format(i)] = _conv(
                sd, 'WN.{}.res_skip_layers.{}'.format(k, i))
        params['flow_{}'.format(k)] = {
            'convinv': {'kernel': _t(w)},
            'block': block,
        }
    return params


def convert_hifigan(sd, *, num_kernels = None):
    """Published torch HiFi-GAN generator ``state_dict`` (weight-norm
    removed; layout of the official release: `conv_pre`, `ups.N`,
    `resblocks.{stage*num_kernels + j}`, `conv_post`) → params tree
    matching ``models.hifigan_arch.HiFiGAN``.

    Handles both resblock variants: v1/v2 name their conv lists
    `convs1`/`convs2` (dilated + plain pairs); v3 (ResBlock2) has a single
    `convs` list.  `num_kernels` (MRF size) is inferred from the resblock
    count when omitted (total = n_up * num_kernels)."""
    sd = {re.sub(r'^(module\.|generator\.)', '', k): v for k, v in sd.items()}
    params = {'conv_pre': _conv(sd, 'conv_pre'),
              'conv_post': _conv(sd, 'conv_post')}
    n_up = 1 + max(int(m.group(1)) for k in sd
                   for m in [re.match(r'ups\.(\d+)\.', k)] if m)
    n_resblocks = 1 + max(int(m.group(1)) for k in sd
                          for m in [re.match(r'resblocks\.(\d+)\.', k)] if m)
    if num_kernels is None:
        if n_resblocks % n_up:
            raise ValueError('cannot infer num_kernels: {} resblocks over {} '
                             'stages'.format(n_resblocks, n_up))
        num_kernels = n_resblocks // n_up

    def _dils(prefix):
        dils = [int(m.group(1)) for k in sd
                for m in [re.match(re.escape(prefix) + r'\.(\d+)\.', k)] if m]
        return 1 + max(dils) if dils else 0

    for i in range(n_up):
        stage = {'up': {
            'kernel': np.ascontiguousarray(
                np.asarray(sd['ups.{}.weight'.format(i)])
                .transpose(2, 0, 1)[::-1]),
        }}
        if 'ups.{}.bias'.format(i) in sd:
            stage['up']['bias'] = np.asarray(sd['ups.{}.bias'.format(i)])
        for j in range(num_kernels):
            r = i * num_kernels + j
            paired = _dils('resblocks.{}.convs1'.format(r))
            if paired:                                   # ResBlock1
                stage['res{}'.format(j)] = {
                    'd{}'.format(d): {
                        'conv1': _conv(sd, 'resblocks.{}.convs1.{}'.format(r, d)),
                        'conv2': _conv(sd, 'resblocks.{}.convs2.{}'.format(r, d)),
                    }
                    for d in range(paired)
                }
            else:                                        # ResBlock2 (v3)
                n_dil = _dils('resblocks.{}.convs'.format(r))
                if not n_dil:
                    raise KeyError('no convs found for resblocks.{}'.format(r))
                stage['res{}'.format(j)] = {
                    'd{}'.format(d): {
                        'conv1': _conv(sd, 'resblocks.{}.convs.{}'.format(r, d)),
                    }
                    for d in range(n_dil)
                }
        params['up{}'.format(i)] = stage
    return params


def load_hifigan(path_or_sd, ** kwargs):
    """Load the published torch HiFi-GAN generator checkpoint."""
    sd = _load_state_dict(path_or_sd)
    sd = remove_torch_weight_norm(sd)
    return convert_hifigan(sd, ** kwargs)


def remove_torch_weight_norm(sd):
    """Fold torch weight-norm (weight_g/weight_v) pairs back into plain
    weights (the published WaveGlow checkpoint ships weight-normed)."""
    out = {}
    for key, value in sd.items():
        if key.endswith('weight_g'):
            continue
        if key.endswith('weight_v'):
            base = key[: -len('weight_v')]
            g = np.asarray(sd[base + 'weight_g'])
            v = np.asarray(value)
            norm = np.sqrt(np.sum(v ** 2, axis = tuple(range(1, v.ndim)),
                                  keepdims = True))
            out[base + 'weight'] = g * v / np.maximum(norm, 1e-12)
        else:
            out[key] = np.asarray(value)
    return out


def load_nvidia_tacotron2(path_or_sd):
    """Load a NVIDIA Tacotron-2 checkpoint file (torch .pt/.pth) or a
    state_dict → (params, state)."""
    sd = _load_state_dict(path_or_sd)
    return convert_nvidia_tacotron2(sd)


def load_nvidia_waveglow(path_or_sd):
    sd = _load_state_dict(path_or_sd)
    sd = remove_torch_weight_norm(sd)
    return convert_nvidia_waveglow(sd)


def _load_state_dict(path_or_sd):
    if isinstance(path_or_sd, dict):
        sd = path_or_sd
    else:
        import torch
        ckpt = torch.load(path_or_sd, map_location = 'cpu', weights_only = False)
        sd = ckpt.get('state_dict', ckpt.get('model', ckpt)) \
            if isinstance(ckpt, dict) else ckpt.state_dict()
    return {k: (v.detach().cpu().numpy() if hasattr(v, 'detach') else np.asarray(v))
            for k, v in sd.items()}
