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

import os
import re
import logging

import numpy as np

logger = logging.getLogger(__name__)


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _strip_prefix(sd, pattern):
    """Strip wrapper prefixes (``module.`` / ``model.`` / ``generator.``)
    from the state-dict keys.  Returns `sd` UNCHANGED when no key matches —
    preserving dict subclasses (``tools/import_and_verify.py`` wraps state
    dicts in a consumption-tracking dict for its coverage gate)."""
    if not any(re.match(pattern, k) for k in sd):
        return sd
    return {re.sub(pattern, '', k): v for k, v in sd.items()}


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
    sd = _strip_prefix(sd, r'^module\.')
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
    sd = _strip_prefix(sd, r'^module\.')
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
    sd = _strip_prefix(sd, r'^(module\.|generator\.)')
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


def _dense1x1(sd, prefix):
    """torch Conv1d k=1 (out, in, 1) → dense kernel (in, out)."""
    out = {'kernel': _t(np.asarray(sd[prefix + '.weight'])[..., 0])}
    if prefix + '.bias' in sd:
        out['bias'] = np.asarray(sd[prefix + '.bias'])
    return out


def _count(sd, pattern):
    idx = [int(m.group(1)) for k in sd
           for m in [re.match(pattern, k)] if m]
    return 1 + max(idx) if idx else 0


def _vits_wn(sd, prefix):
    """Official WN module (`in_layers`, `res_skip_layers`, optional
    `cond_layer`) → this framework's wn subtree."""
    wn = {}
    n_layers = _count(sd, re.escape(prefix) + r'\.in_layers\.(\d+)\.')
    for i in range(n_layers):
        wn['in_conv_{}'.format(i)] = _conv(
            sd, '{}.in_layers.{}'.format(prefix, i))
        wn['res_skip_conv_{}'.format(i)] = _conv(
            sd, '{}.res_skip_layers.{}'.format(prefix, i))
    if '{}.cond_layer.weight'.format(prefix) in sd:
        wn['cond'] = _dense1x1(sd, prefix + '.cond_layer')
    return wn


def _vits_dds(sd, prefix):
    """Official DDSConv (`convs_sep` depthwise + `convs_1x1` + LayerNorms)
    → this framework's dds subtree."""
    dds = {}
    n = _count(sd, re.escape(prefix) + r'\.convs_sep\.(\d+)\.')
    for i in range(n):
        dds['layer_{}'.format(i)] = {
            'depthwise': _conv(sd, '{}.convs_sep.{}'.format(prefix, i)),
            'pointwise': _dense_to_conv(
                _dense1x1(sd, '{}.convs_1x1.{}'.format(prefix, i))),
            'norm1': {'gamma': np.asarray(
                sd['{}.norms_1.{}.gamma'.format(prefix, i)]).reshape(-1),
                'beta': np.asarray(
                sd['{}.norms_1.{}.beta'.format(prefix, i)]).reshape(-1)},
            'norm2': {'gamma': np.asarray(
                sd['{}.norms_2.{}.gamma'.format(prefix, i)]).reshape(-1),
                'beta': np.asarray(
                sd['{}.norms_2.{}.beta'.format(prefix, i)]).reshape(-1)},
        }
    return dds


def _dense_to_conv(dense):
    """dense (in, out) → conv1d kernel (1, in, out) (pointwise)."""
    out = {'kernel': dense['kernel'][None]}
    if 'bias' in dense:
        out['bias'] = dense['bias']
    return out


def _vits_flow_stack(sd, prefix):
    """Official SDP flow list ([ElementwiseAffine] + [ConvFlow, Flip]×n;
    ConvFlows at odd indices) → this framework's stack subtree."""
    stack = {'affine': {
        'm': np.asarray(sd[prefix + '.0.m']).reshape(-1),
        'logs': np.asarray(sd[prefix + '.0.logs']).reshape(-1),
    }}
    n_items = _count(sd, re.escape(prefix) + r'\.(\d+)\.')
    conv_flows = [i for i in range(1, n_items)
                  if '{}.{}.pre.weight'.format(prefix, i) in sd]
    for out_i, i in enumerate(sorted(conv_flows)):
        p = '{}.{}'.format(prefix, i)
        stack['conv_flow_{}'.format(out_i)] = {
            'pre': _conv(sd, p + '.pre'),
            'dds': _vits_dds(sd, p + '.convs'),
            'proj': _conv(sd, p + '.proj'),
        }
    return stack


def convert_vits(sd):
    """Official torch VITS ``SynthesizerTrn`` state_dict (weight-norm
    removed) → params tree matching ``models.vits_arch.VITS``.

    Covers: relative-window text encoder (`enc_p`), WaveNet posterior
    (`enc_q`), residual coupling flow (`flow`, couplings at even indices —
    flips carry no params), HiFi-GAN decoder (`dec`, via
    ``convert_hifigan``), both duration predictors (`dp`: stochastic when
    `dp.flows.0.m` exists, conv stack otherwise), and speaker conditioning
    (`emb_g`, `dec.cond`, per-module cond layers)."""
    sd = _strip_prefix(sd, r'^(module\.|model\.)')
    params = {
        'embedding': {'embeddings': np.asarray(sd['enc_p.emb.weight'])},
        'text_proj': _conv(sd, 'enc_p.proj'),
        'posterior': {
            'pre': _conv(sd, 'enc_q.pre'),
            'wn': _vits_wn(sd, 'enc_q.enc'),
            'proj': _conv(sd, 'enc_q.proj'),
        },
        # indexed (not .items()) so consumption-tracking wrappers see the
        # generator tensors being read (tools/import_and_verify.py)
        'generator': convert_hifigan(
            {k[len('dec.'):]: sd[k] for k in list(sd)
             if k.startswith('dec.') and not k.startswith('dec.cond')}),
    }

    n_text = _count(sd, r'enc_p\.encoder\.attn_layers\.(\d+)\.')
    text = {}
    for i in range(n_text):
        a = 'enc_p.encoder.attn_layers.{}'.format(i)
        blk = {
            'attention': {
                'query': _dense1x1(sd, a + '.conv_q'),
                'key': _dense1x1(sd, a + '.conv_k'),
                'value': _dense1x1(sd, a + '.conv_v'),
                'output': _dense1x1(sd, a + '.conv_o'),
            },
            'attention_norm': {
                'gamma': np.asarray(
                    sd['enc_p.encoder.norm_layers_1.{}.gamma'.format(i)]
                ).reshape(-1),
                'beta': np.asarray(
                    sd['enc_p.encoder.norm_layers_1.{}.beta'.format(i)]
                ).reshape(-1)},
            'conv1': _conv(sd, 'enc_p.encoder.ffn_layers.{}.conv_1'.format(i)),
            'conv2': _conv(sd, 'enc_p.encoder.ffn_layers.{}.conv_2'.format(i)),
            'ffn_norm': {
                'gamma': np.asarray(
                    sd['enc_p.encoder.norm_layers_2.{}.gamma'.format(i)]
                ).reshape(-1),
                'beta': np.asarray(
                    sd['enc_p.encoder.norm_layers_2.{}.beta'.format(i)]
                ).reshape(-1)},
        }
        if a + '.emb_rel_k' in sd:     # (1, 2w+1, head_dim), heads shared
            blk['rel_k'] = np.asarray(sd[a + '.emb_rel_k'])[0]
            blk['rel_v'] = np.asarray(sd[a + '.emb_rel_v'])[0]
        text['layer_{}'.format(i)] = blk
    params['text_encoder'] = text

    couplings = sorted({
        int(m.group(1)) for k in sd
        for m in [re.match(r'flow\.flows\.(\d+)\.pre\.', k)] if m})
    for out_k, k in enumerate(couplings):
        p = 'flow.flows.{}'.format(k)
        params['flow_{}'.format(out_k)] = {
            'pre': _conv(sd, p + '.pre'),
            'wn': _vits_wn(sd, p + '.enc'),
            'post': _conv(sd, p + '.post'),
        }

    if 'dp.flows.0.m' in sd:           # stochastic duration predictor
        dp = {
            'pre': _conv(sd, 'dp.pre'),
            'dds': _vits_dds(sd, 'dp.convs'),
            'proj': _conv(sd, 'dp.proj'),
            'flows': _vits_flow_stack(sd, 'dp.flows'),
            'post_pre': _conv(sd, 'dp.post_pre'),
            'post_dds': _vits_dds(sd, 'dp.post_convs'),
            'post_proj': _conv(sd, 'dp.post_proj'),
            'post_flows': _vits_flow_stack(sd, 'dp.post_flows'),
        }
        if 'dp.cond.weight' in sd:
            dp['cond'] = _dense1x1(sd, 'dp.cond')
        params['duration_predictor'] = dp
    else:                              # deterministic conv predictor
        params['duration_predictor'] = {
            'conv1': _conv(sd, 'dp.conv_1'),
            'norm1': {'gamma': np.asarray(sd['dp.norm_1.gamma']).reshape(-1),
                      'beta': np.asarray(sd['dp.norm_1.beta']).reshape(-1)},
            'conv2': _conv(sd, 'dp.conv_2'),
            'norm2': {'gamma': np.asarray(sd['dp.norm_2.gamma']).reshape(-1),
                      'beta': np.asarray(sd['dp.norm_2.beta']).reshape(-1)},
            'proj': _dense1x1(sd, 'dp.proj'),
        }
        if 'dp.cond.weight' in sd:
            params['duration_cond'] = _dense1x1(sd, 'dp.cond')

    if 'emb_g.weight' in sd:
        params['speaker_embedding'] = {
            'embeddings': np.asarray(sd['emb_g.weight'])}
    if 'dec.cond.weight' in sd:
        params['generator_cond'] = _dense1x1(sd, 'dec.cond')
    return params


def load_vits(path_or_sd):
    """Load a published torch VITS checkpoint (e.g. the official LJSpeech /
    VCTK releases) → params tree for ``models.vits_arch.VITS``."""
    sd = _load_state_dict(path_or_sd)
    sd = remove_torch_weight_norm(sd)
    return convert_vits(sd)


def vits_config_from_state_dict(sd):
    """Infer the ``HParamsVITS`` fields that are derivable from an official
    ``SynthesizerTrn`` state dict's tensor shapes, so
    ``VITS.from_torch_pretrained`` can build a matching architecture without
    the original ``config.json``.

    Not shape-derivable (defaults kept; pass overrides if the training
    config differed): `n_heads` when no relative embeddings are present,
    `upsample_rates` (strides — inferred as kernel//2, the published
    convention), `resblock_dilation_sizes`, and the dropout rates."""
    sd = _strip_prefix(sd, r'^(module\.|model\.)')
    shp = lambda k: tuple(np.shape(sd[k]))

    config = {}
    config['vocab_size'], config['hidden_channels'] = shp('enc_p.emb.weight')
    config['inter_channels'] = shp('enc_p.proj.weight')[0] // 2
    config['spec_channels'] = shp('enc_q.pre.weight')[1]

    config['n_text_layers'] = _count(
        sd, r'enc_p\.encoder\.attn_layers\.(\d+)\.')
    f_w = shp('enc_p.encoder.ffn_layers.0.conv_1.weight')
    config['filter_channels'], _, config['text_kernel_size'] = f_w
    rel = 'enc_p.encoder.attn_layers.0.emb_rel_k'
    if rel in sd:
        _, n_rel, head_dim = shp(rel)
        config['text_rel_window'] = (n_rel - 1) // 2
        config['n_heads'] = config['hidden_channels'] // head_dim
    else:
        config['text_rel_window'] = None

    config['posterior_layers'] = _count(
        sd, r'enc_q\.enc\.in_layers\.(\d+)\.')
    config['posterior_kernel_size'] = shp('enc_q.enc.in_layers.0.weight')[2]

    config['flow_layers'] = len({
        int(m.group(1)) for k in sd
        for m in [re.match(r'flow\.flows\.(\d+)\.pre\.', k)] if m})
    config['flow_wn_layers'] = _count(
        sd, r'flow\.flows\.0\.enc\.in_layers\.(\d+)\.')
    config['flow_kernel_size'] = shp('flow.flows.0.enc.in_layers.0.weight')[2]

    config['use_sdp'] = 'dp.flows.0.m' in sd
    if config['use_sdp']:
        config['sdp_filter_channels'] = shp('dp.pre.weight')[0]
        config['sdp_kernel_size'] = shp('dp.convs.convs_sep.0.weight')[2]
        config['sdp_dds_layers'] = _count(
            sd, r'dp\.convs\.convs_sep\.(\d+)\.')
        config['sdp_n_flows'] = sum(
            1 for k in sd if re.match(r'dp\.flows\.\d+\.pre\.weight$', k))
        # ConvFlow proj: out = half_channels * (3 * n_bins - 1), half = 1
        first_cf = min(int(m.group(1)) for k in sd for m in
                       [re.match(r'dp\.flows\.(\d+)\.proj\.weight$', k)] if m)
        config['sdp_n_bins'] = \
            (shp('dp.flows.{}.proj.weight'.format(first_cf))[0] + 1) // 3
    else:
        config['duration_filters'] = shp('dp.conv_1.weight')[0]
        config['duration_kernel_size'] = shp('dp.conv_1.weight')[2]

    if 'emb_g.weight' in sd:
        config['n_speakers'], config['gin_channels'] = shp('emb_g.weight')

    # HiFi-GAN decoder
    config['upsample_initial_channel'] = shp('dec.conv_pre.weight')[0]
    n_up = _count(sd, r'dec\.ups\.(\d+)\.')
    kernels = [shp('dec.ups.{}.weight'.format(i))[2] for i in range(n_up)]
    config['upsample_kernel_sizes'] = tuple(kernels)
    config['upsample_rates'] = tuple(k // 2 for k in kernels)
    n_res = _count(sd, r'dec\.resblocks\.(\d+)\.')
    num_kernels = n_res // n_up
    config['resblock_version'] = \
        1 if 'dec.resblocks.0.convs1.0.weight' in sd else 2
    res_key = 'convs1' if config['resblock_version'] == 1 else 'convs'
    config['resblock_kernel_sizes'] = tuple(
        shp('dec.resblocks.{}.{}.0.weight'.format(j, res_key))[2]
        for j in range(num_kernels))
    n_dil = _count(sd, r'dec\.resblocks\.0\.{}\.(\d+)\.'.format(res_key))
    config['resblock_dilation_sizes'] = tuple(
        tuple((1, 3, 5)[:n_dil]) for _ in range(num_kernels))
    return config


def tacotron2_config_from_state_dict(sd):
    """Shape-derivable ``HParamsTacotron2`` fields from a NVIDIA-layout
    ``state_dict`` (every architecture size is in the tensor shapes; only
    rates/flags keep their defaults)."""
    sd = _strip_prefix(sd, r'^module\.')
    shp = lambda k: tuple(np.shape(sd[k]))
    vocab_size, emb = shp('embedding.weight')
    config = {
        'vocab_size': vocab_size,
        'encoder_embedding_dim': emb,
        'encoder_n_conv': _count(sd, r'encoder\.convolutions\.(\d+)\.'),
        'encoder_kernel_size': shp('encoder.convolutions.0.0.conv.weight')[2],
        'prenet_sizes': tuple(
            shp('decoder.prenet.layers.{}.linear_layer.weight'.format(i))[0]
            for i in range(_count(
                sd, r'decoder\.prenet\.layers\.(\d+)\.'))),
        'lsa_attention_dim': shp(
            'decoder.attention_layer.query_layer.linear_layer.weight')[0],
        'lsa_attention_filters': shp(
            'decoder.attention_layer.location_layer.location_conv'
            '.conv.weight')[0],
        'lsa_attention_kernel_size': shp(
            'decoder.attention_layer.location_layer.location_conv'
            '.conv.weight')[2],
        'attention_rnn_dim': shp('decoder.attention_rnn.weight_hh')[1],
        'decoder_rnn_dim': shp('decoder.decoder_rnn.weight_hh')[1],
        'postnet_n_conv': _count(sd, r'postnet\.convolutions\.(\d+)\.'),
        'postnet_filters': shp('postnet.convolutions.0.0.conv.weight')[0],
        'postnet_kernel_size': shp('postnet.convolutions.0.0.conv.weight')[2],
        'n_mel_channels': shp(
            'decoder.linear_projection.linear_layer.weight')[0],
    }
    return config


def waveglow_config_from_state_dict(sd):
    """Shape-derivable ``HParamsWaveGlow`` fields from a NVIDIA-layout
    ``state_dict`` (weight-norm removed).  The early-output schedule is
    reconstructed from the per-flow 1x1-conv channel counts.  Not
    shape-derivable: ``upsample_stride`` (the published checkpoints use
    256 — pass an override otherwise)."""
    sd = _strip_prefix(sd, r'^module\.')
    shp = lambda k: tuple(np.shape(sd[k]))
    n_flows = _count(sd, r'WN\.(\d+)\.')
    remaining = [shp('convinv.{}.conv.weight'.format(k))[0]
                 for k in range(n_flows)]
    n_early_every, n_early_size = n_flows + 1, 0
    for k in range(1, n_flows):
        if remaining[k] < remaining[k - 1]:
            n_early_every = k
            n_early_size = remaining[k - 1] - remaining[k]
            break
    return {
        'n_mel_channels': shp('upsample.weight')[0],
        'n_flows': n_flows,
        'n_group': remaining[0],
        'n_early_every': n_early_every,
        'n_early_size': n_early_size,
        'wn_layers': _count(sd, r'WN\.0\.in_layers\.(\d+)\.'),
        'wn_channels': shp('WN.0.start.weight')[0],
        'wn_kernel_size': shp('WN.0.in_layers.0.weight')[2],
        'wn_fused': 'WN.0.cond_layer.weight' in sd,
        'upsample_width': shp('upsample.weight')[2],
    }


def hifigan_config_from_state_dict(sd):
    """Shape-derivable ``HParamsHiFiGAN`` fields from an official-layout
    generator ``state_dict`` (weight-norm removed).  Not shape-derivable:
    ``upsample_rates`` (inferred as kernel//2, the published convention)
    and the DILATION values — dilation changes no weight shape, so the
    published conventions are assumed: v1/v2 (ResBlock1) use (1, 3, 5)
    per kernel; v3 (ResBlock2) uses ((1, 2), (2, 6), (3, 12)) (the
    official config_v3, mirrored by ``HIFIGAN_V3``).  Pass a `config`
    override through ``HiFiGAN.from_torch_pretrained`` for anything
    non-standard — the forward gate of ``tools/import_and_verify.py``
    (with a golden) is what catches a wrong assumption."""
    sd = _strip_prefix(sd, r'^(module\.|generator\.)')
    shp = lambda k: tuple(np.shape(sd[k]))
    n_up = _count(sd, r'ups\.(\d+)\.')
    n_res = _count(sd, r'resblocks\.(\d+)\.')
    num_kernels = n_res // n_up
    version = 1 if 'resblocks.0.convs1.0.weight' in sd else 2
    res_key = 'convs1' if version == 1 else 'convs'
    kernels = [shp('ups.{}.weight'.format(i))[2] for i in range(n_up)]
    n_dil = _count(sd, r'resblocks\.0\.{}\.(\d+)\.'.format(res_key))
    if version == 2:
        v3 = ((1, 2), (2, 6), (3, 12))
        dilations = tuple(v3[j % len(v3)][:n_dil]
                          for j in range(num_kernels))
    else:
        dilations = tuple(tuple((1, 3, 5)[:n_dil])
                          for _ in range(num_kernels))
    return {
        'n_mel_channels': shp('conv_pre.weight')[1],
        'upsample_initial_channel': shp('conv_pre.weight')[0],
        'upsample_kernel_sizes': tuple(kernels),
        'upsample_rates': tuple(k // 2 for k in kernels),
        'resblock_version': version,
        'resblock_kernel_sizes': tuple(
            shp('resblocks.{}.{}.0.weight'.format(j, res_key))[2]
            for j in range(num_kernels)),
        'resblock_dilation_sizes': dilations,
    }


def convert_vocos(sd):
    """Official torch Vocos state_dict (``backbone.convnext`` layout,
    e.g. the published mel-spectrogram release) → params tree matching
    ``models.vocos_arch.Vocos``."""
    sd = _strip_prefix(sd, r'^(module\.|model\.)')

    def norm(prefix):
        return {'gamma': np.asarray(sd[prefix + '.weight']).reshape(-1),
                'beta': np.asarray(sd[prefix + '.bias']).reshape(-1)}

    params = {
        'embed': _conv(sd, 'backbone.embed'),
        'norm_pre': norm('backbone.norm'),
        'norm_post': norm('backbone.final_layer_norm'),
        'head': _dense(sd, 'head.out'),
    }
    n_layers = _count(sd, r'backbone\.convnext\.(\d+)\.')
    for i in range(n_layers):
        p = 'backbone.convnext.{}'.format(i)
        params['block_{}'.format(i)] = {
            'depthwise': _conv(sd, p + '.dwconv'),
            'norm': norm(p + '.norm'),
            'pw1': _dense(sd, p + '.pwconv1'),
            'pw2': _dense(sd, p + '.pwconv2'),
            'gamma': np.asarray(sd[p + '.gamma']).reshape(-1),
        }
    return params


def vocos_config_from_state_dict(sd):
    """Shape-derivable ``HParamsVocos`` fields from an official Vocos
    state dict.  hop/win follow the published convention
    (win = n_fft, hop = n_fft/4 — 256/1024 in the mel release); pass
    overrides if the training front-end differed."""
    sd = _strip_prefix(sd, r'^(module\.|model\.)')
    shp = lambda k: tuple(np.shape(sd[k]))
    dim, n_mels, kernel = shp('backbone.embed.weight')
    n_fft = shp('head.out.weight')[0] - 2
    return {
        'dim': dim,
        'n_mel_channels': n_mels,
        'kernel_size': kernel,
        'n_layers': _count(sd, r'backbone\.convnext\.(\d+)\.'),
        'intermediate_dim': shp('backbone.convnext.0.pwconv1.weight')[0],
        'n_fft': n_fft,
        'win_length': n_fft,
        'hop_length': max(1, n_fft // 4),
    }


def load_vocos(path_or_sd):
    """Load a published torch Vocos checkpoint → params tree for
    ``models.vocos_arch.Vocos``."""
    sd = _load_state_dict(path_or_sd)
    sd = remove_torch_weight_norm(sd)
    return convert_vocos(sd)


def remove_torch_weight_norm(sd):
    """Fold torch weight-norm (weight_g/weight_v) pairs back into plain
    weights (the published WaveGlow checkpoint ships weight-normed).
    Returns `sd` unchanged when nothing is weight-normed (preserving dict
    subclasses — see ``_strip_prefix``)."""
    if not any(k.endswith('weight_g') for k in sd):
        return sd
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


#: safetensors dtype tags → numpy dtypes (BF16 handled separately)
_SAFETENSORS_DTYPES = {
    'F64': np.float64, 'F32': np.float32, 'F16': np.float16,
    'I64': np.int64, 'I32': np.int32, 'I16': np.int16, 'I8': np.int8,
    'U64': np.uint64, 'U32': np.uint32, 'U16': np.uint16, 'U8': np.uint8,
    'BOOL': np.bool_,
}


def load_safetensors(path):
    """Self-contained `.safetensors` reader (several official releases —
    e.g. the Vocos mel checkpoint — ship this format): 8-byte
    little-endian header length, JSON header of
    ``{name: {dtype, shape, data_offsets}}``, then one raw buffer.
    Half/bfloat16 tensors widen to float32 (this framework's parameter
    dtype)."""
    import json
    with open(path, 'rb') as f:
        n = int.from_bytes(f.read(8), 'little')
        header = json.loads(f.read(n).decode('utf-8'))
        buf = f.read()
    out = {}
    for name, info in header.items():
        if name == '__metadata__':
            continue
        lo, hi = info['data_offsets']
        tag = info['dtype']
        if tag == 'BF16':
            import ml_dtypes
            arr = np.frombuffer(buf[lo:hi], dtype = ml_dtypes.bfloat16)
            arr = arr.astype(np.float32)
        else:
            if tag not in _SAFETENSORS_DTYPES:
                raise ValueError('unsupported safetensors dtype {!r} for '
                                 '{!r}'.format(tag, name))
            arr = np.frombuffer(buf[lo:hi],
                                dtype = _SAFETENSORS_DTYPES[tag])
            if arr.dtype == np.float16:
                arr = arr.astype(np.float32)
        out[name] = np.array(arr.reshape(info['shape']))
    return out


def _load_state_dict(path_or_sd):
    if isinstance(path_or_sd, dict):
        if all(isinstance(v, np.ndarray) for v in path_or_sd.values()):
            return path_or_sd       # already numpy: keep dict subclasses
        sd = path_or_sd
    elif isinstance(path_or_sd, (str, os.PathLike)) \
            and os.fspath(path_or_sd).endswith('.safetensors'):
        return load_safetensors(os.fspath(path_or_sd))
    else:
        import torch
        ckpt = torch.load(path_or_sd, map_location = 'cpu', weights_only = False)
        sd = ckpt.get('state_dict', ckpt.get('model', ckpt)) \
            if isinstance(ckpt, dict) else ckpt.state_dict()
    return {k: (v.detach().cpu().numpy() if hasattr(v, 'detach') else np.asarray(v))
            for k, v in sd.items()}
