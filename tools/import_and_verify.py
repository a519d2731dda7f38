#!/usr/bin/env python
"""One-command pretrained-checkpoint gate: import → coverage → forward
parity (<2e-3 mel gate) → int8 SNR → listen wavs.

The reference's value is its pretrained checkpoints
(``/root/reference/README.md:63-70``); this is the single artifact to run
the hour such weights appear.  Every stage already exists in the package
(``models/tts_checkpoints.py`` importers, ``models/weights_converter.py``
Keras maps, ``train/metrics`` mcd/mel_snr, ``WaveGlow.serving_snr``) —
this tool chains them unattended and prints a PASS/FAIL gate table.

Usage:
  python tools/import_and_verify.py CKPT [--family auto] [--out DIR]
      [--golden G.npz] [--write-golden G.npz] [--device cpu|tpu]
      [--mel-gate 2e-3] [--snr-gate 25] [--config '{"key": val}']
  python tools/import_and_verify.py --self-test [all|FAMILY]

Supported checkpoints:
  - torch ``.pt/.pth/.ckpt``: NVIDIA Tacotron-2 / NVIDIA WaveGlow /
    official HiFi-GAN generator / official VITS ``SynthesizerTrn`` /
    official Vocos — family auto-detected from the state-dict keys,
    architecture sizes inferred from tensor shapes.
  - Keras/TF2 Tacotron-2 variable dumps (``.npz`` / ``.h5`` of
    ``{variable_path: array}``) — the reference's own checkpoint naming
    (``weights_converter.KERAS_TACOTRON2_PATTERNS``).

Golden files (``--golden``): ``.npz`` with the family's deterministic
inputs/expected outputs —
  tacotron2: ``tokens``(B,T) + ``mel``(B,F,n_mel) [+ ``max_length``]
  waveglow/hifigan/vocos: ``mel``(B,F,n_mel) + ``audio``(B,N)
  vits: ``tokens`` + ``audio``
The forward gate asserts max deviation < ``--mel-gate`` (2e-3, the
BASELINE.md bar) on the mel surface (audio outputs are additionally
mel-analyzed so the gate is on the same scale for every family).

``--self-test`` proves the whole chain without network access: a tiny
random model of each family is EXPORTED to its official checkpoint layout
(``models/tts_export.py``), written to disk, re-imported through this
tool's pipeline and gated against goldens computed before the export.
Expected: every stage PASS (int8 SNR is SKIP off-TPU).
"""

import os
import sys
import json
import argparse
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REFERENCE_WAV = '/root/reference/tests/data/audio_test.wav'

FAMILIES = ('tacotron2', 'tacotron2-keras', 'waveglow', 'hifigan', 'vits',
            'vocos')


# -- reporting ------------------------------------------------------------------

class Report:
    def __init__(self):
        self.rows = []

    def add(self, stage, status, detail = ''):
        self.rows.append((stage, status, detail))
        print('  [{:^4}] {:<12} {}'.format(status, stage, detail), flush = True)

    @property
    def failed(self):
        return [r for r in self.rows if r[1] == 'FAIL']

    def summary(self):
        print('-' * 64)
        n_pass = sum(1 for r in self.rows if r[1] == 'PASS')
        n_skip = sum(1 for r in self.rows if r[1] == 'SKIP')
        print('gates: {} PASS / {} FAIL / {} SKIP'.format(
            n_pass, len(self.failed), n_skip))
        return 0 if not self.failed else 1


class TrackingDict(dict):
    """State dict wrapper recording which tensors the converter consumed."""

    def __init__(self, data):
        super().__init__(data)
        self.used = set()

    def __getitem__(self, key):
        self.used.add(key)
        return super().__getitem__(key)

    def get(self, key, default = None):
        if key in self:
            return self[key]
        return default


# -- loading / detection --------------------------------------------------------

def load_checkpoint(path):
    """checkpoint file → flat {name: ndarray}."""
    ext = os.path.splitext(path)[1].lower()
    if ext == '.safetensors':
        from text_to_speech_tpu.models.tts_checkpoints import \
            load_safetensors
        return load_safetensors(path)
    if ext in ('.npz', '.npy'):
        data = np.load(path, allow_pickle = False)
        return {k: np.asarray(data[k]) for k in data.files}
    if ext in ('.h5', '.hdf5', '.keras'):
        import h5py
        out = {}

        def walk(name, obj):
            if isinstance(obj, h5py.Dataset):
                out[name] = np.asarray(obj)
        with h5py.File(path, 'r') as f:
            f.visititems(walk)
        return out
    # torch formats
    from text_to_speech_tpu.models.tts_checkpoints import _load_state_dict
    return _load_state_dict(path)


def detect_family(sd):
    keys = list(sd)
    def any_match(*frags):
        return any(any(f in k for f in frags) for k in keys)
    if any_match('WN.0.', '.WN.0.'):
        return 'waveglow'
    if any_match('enc_p.'):
        return 'vits'
    if any_match('backbone.convnext'):
        return 'vocos'
    if any_match('decoder.attention_rnn.', 'encoder.convolutions.'):
        return 'tacotron2'
    if any_match('ups.0.', 'resblocks.0.'):
        return 'hifigan'
    if any_match('lstm_cell', 'attention_rnn', 'prenet', 'gate_output',
                 'bidirectional'):
        return 'tacotron2-keras'
    raise ValueError('cannot detect the model family from keys like: {}'
                     .format(sorted(keys)[:8]))


# -- import / build -------------------------------------------------------------

def import_and_build(path, family, config, report):
    """checkpoint path → task-model instance, with coverage accounting."""
    from text_to_speech_tpu.models import tts_checkpoints as ck

    raw = load_checkpoint(path)
    report.add('load', 'PASS', '{} tensors, {:.1f} M params'.format(
        len(raw), sum(np.size(v) for v in raw.values()) / 1e6))

    if family == 'auto':
        family = detect_family(raw)
        report.add('detect', 'PASS', family)

    if family == 'tacotron2-keras':
        from text_to_speech_tpu.models.weights_converter import \
            convert_keras_variables
        from text_to_speech_tpu.models.tts_export import \
            export_nvidia_tacotron2
        from text_to_speech_tpu.models.tts import Tacotron2
        import jax, jax.numpy as jnp

        tracked = TrackingDict(raw)
        params, state = convert_keras_variables(tracked)
        # the pattern renamer consumes every variable by construction;
        # structural mismatches surface in set_weights below
        tracked.used = set(tracked)
        # shapes → config through the NVIDIA-layout inference (layouts match)
        inferred = ck.tacotron2_config_from_state_dict(
            export_nvidia_tacotron2(params, state))
        inferred.update(config)
        model = Tacotron2(lang = 'en', name = 'verify_tacotron2_keras',
                          ** inferred)
        model.set_weights(jax.tree_util.tree_map(jnp.asarray, params),
                          jax.tree_util.tree_map(jnp.asarray, state))
    else:
        sd = raw
        if family != 'tacotron2':       # tacotron2 ships without weight norm
            sd = ck.remove_torch_weight_norm(sd)
        tracked = TrackingDict(sd)

        if family == 'tacotron2':
            from text_to_speech_tpu.models.tts import Tacotron2
            n_vocab = int(np.shape(sd['embedding.weight'])[0])
            model = Tacotron2.from_nvidia_pretrained(
                tracked, name = 'verify_tacotron2',
                config = {'vocab_size': n_vocab, ** config})
        elif family == 'waveglow':
            from text_to_speech_tpu.models.tts import WaveGlow
            model = WaveGlow.from_nvidia_pretrained(
                tracked, name = 'verify_waveglow', config = config)
        elif family == 'hifigan':
            from text_to_speech_tpu.models.tts import HiFiGAN
            model = HiFiGAN.from_torch_pretrained(
                tracked, name = 'verify_hifigan', config = config)
        elif family == 'vits':
            from text_to_speech_tpu.models.tts import VITS
            model = VITS.from_torch_pretrained(
                tracked, name = 'verify_vits', config = config)
        elif family == 'vocos':
            from text_to_speech_tpu.models.tts import Vocos
            model = Vocos.from_torch_pretrained(
                tracked, name = 'verify_vocos', config = config)
        else:
            raise ValueError('unknown family: ' + family)

    unused = sorted(set(tracked) - tracked.used)
    # discriminator / optimizer tensors are legitimately unused by inference
    benign = [k for k in unused if any(
        t in k for t in ('discriminator', 'mpd', 'msd', 'optimizer', 'step',
                         'epoch', 'dur_disc'))]
    stray = [k for k in unused if k not in benign]
    if stray:
        report.add('coverage', 'FAIL',
                   '{} checkpoint tensors not consumed, e.g. {}'.format(
                       len(stray), stray[:4]))
    else:
        detail = '{}/{} tensors consumed'.format(len(tracked.used),
                                                 len(tracked))
        if benign:
            detail += ' (+{} non-inference tensors ignored)'.format(len(benign))
        report.add('coverage', 'PASS', detail)
    return model, family


# -- deterministic forwards -----------------------------------------------------

def forward(model, family, tokens = None, mel = None, max_length = 64):
    """Deterministic forward for the golden gate; returns dict of outputs."""
    if family.startswith('tacotron2'):
        out = model.compiled_infer(
            np.asarray(tokens, np.int32), deterministic = True,
            max_length = int(max_length), early_stopping = True,
            padding_multiple = 16)
        return {'mel': np.asarray(out.mel),
                'lengths': np.asarray(out.lengths)}
    if family == 'vits':
        import jax
        out = model.compiled_infer(
            np.asarray(tokens, np.int32), noise_scale = 0.,
            noise_scale_w = 0., min_duration = 1, padding_multiple = 8,
            rng = jax.random.PRNGKey(0))
        return {'audio': np.asarray(out.audio),
                'lengths': np.asarray(out.lengths)}
    # vocoders
    kwargs = {'deterministic': True} if family == 'waveglow' else {}
    audio = np.asarray(model.compiled_infer(
        np.asarray(mel, np.float32), padding_multiple = 16, ** kwargs))
    return {'audio': audio[:, : np.shape(mel)[1] * model.upsample_rate]}


def golden_gate(model, family, golden, mel_gate, report):
    g = {k: np.asarray(golden[k]) for k in golden.files} \
        if hasattr(golden, 'files') else dict(golden)
    ours = forward(model, family,
                   tokens = g.get('tokens'), mel = g.get('mel'),
                   max_length = int(g.get('max_length', 64)))

    if 'mel' in ours:                       # mel-output family
        want, got = g['mel'], ours['mel']
        n = min(want.shape[1], got.shape[1])
        dev = float(np.max(np.abs(want[:, :n] - got[:, :n])))
        surface = 'mel'
    else:                                   # audio-output family
        want, got = g['audio'], ours['audio']
        n = min(want.shape[-1], got.shape[-1])
        dev = float(np.max(np.abs(want[..., :n] - got[..., :n])))
        surface = 'audio'
        # gate on the mel surface too (the BASELINE bar is mel deviation)
        mel_w = np.asarray(model.mel_fn(want[0, :n]))
        mel_g = np.asarray(model.mel_fn(got[0, :n]))
        dev = max(dev, float(np.max(np.abs(mel_w - mel_g))))
        surface = 'audio+mel'
    status = 'PASS' if dev < mel_gate else 'FAIL'
    report.add('forward', status,
               'max {} deviation {:.2e} (gate {:.0e})'.format(
                   surface, dev, mel_gate))
    return ours


def int8_snr_gate(model, family, mel, snr_gate, device, report):
    if family != 'waveglow':
        report.add('int8-snr', 'SKIP', 'waveglow-family only')
        return
    if device != 'tpu':
        report.add('int8-snr', 'SKIP',
                   'needs --device tpu (Pallas int8 kernels)')
        return
    snr = model.serving_snr(np.asarray(mel, np.float32))
    report.add('int8-snr', 'PASS' if snr >= snr_gate else 'FAIL',
               '{:.1f} dB (gate {} dB; failure serves f32/XLA)'.format(
                   snr, snr_gate))


def listen(model, family, out_dir, text, tokens, mel, report):
    from text_to_speech_tpu.ops.audio_io import write_audio
    os.makedirs(out_dir, exist_ok = True)
    wavs = []
    try:
        if family in ('waveglow', 'hifigan', 'vocos'):
            out = forward(model, family, mel = mel)
            path = os.path.join(out_dir, family + '_copy_synthesis.wav')
            write_audio(path, out['audio'][0], rate = model.rate)
            wavs.append(path)
        elif family == 'vits':
            out = forward(model, family, tokens = tokens)
            n = int(out['lengths'][0]) * model.upsample_rate
            path = os.path.join(out_dir, 'vits_listen.wav')
            write_audio(path, out['audio'][0, :n], rate = model.rate)
            wavs.append(path)
        else:                               # tacotron2*
            out = forward(model, family, tokens = tokens, max_length = 256)
            n = max(1, int(out['lengths'][0]))
            mel_out = out['mel'][0, :n]
            np.save(os.path.join(out_dir, 'tacotron2_mel.npy'), mel_out)
            wave = np.asarray(model.mel_fn.inverse(mel_out, n_iters = 32))[0]
            path = os.path.join(out_dir, 'tacotron2_griffin_lim.wav')
            write_audio(path, wave, rate = model.rate)
            wavs.append(path)
        report.add('listen', 'PASS', '; '.join(wavs))
    except Exception as e:                  # listening is best-effort
        report.add('listen', 'FAIL', '{}: {}'.format(type(e).__name__, e))
    return wavs


def default_inputs(model, family, text):
    """(tokens, mel) for gates when no golden supplies them."""
    tokens = mel = None
    if family.startswith('tacotron2') or family == 'vits':
        try:
            enc = model.encode_text(model.clean_text(text), cleaned = True)
            tokens = np.asarray(enc, np.int32)[None]
        except Exception:
            tokens = (np.arange(24, dtype = np.int32)[None]
                      % max(2, model.arch.hp.vocab_size - 1)) + 1
    if family in ('waveglow', 'hifigan', 'vocos'):
        if os.path.exists(REFERENCE_WAV):
            from text_to_speech_tpu.ops.audio_io import read_audio
            _, audio = read_audio(REFERENCE_WAV, target_rate = model.rate)
            mel = np.asarray(model.mel_fn(audio.astype(np.float32)))
        else:
            rng = np.random.RandomState(0)
            mel = rng.randn(1, 64, model.n_mel_channels).astype(np.float32) \
                * 2. - 6.
        if mel.ndim == 2:
            mel = mel[None]
    return tokens, mel


# -- the pipeline ---------------------------------------------------------------

def run(args):
    _setup_device(args.device)
    from text_to_speech_tpu.models import saving
    workdir = args.workdir or tempfile.mkdtemp(prefix = 'import_verify_')
    saving._PRETRAINED_ROOT = os.path.join(workdir, 'models')

    report = Report()
    print('checkpoint: {}'.format(args.checkpoint))
    config = json.loads(args.config) if args.config else {}

    try:
        model, family = import_and_build(
            args.checkpoint, args.family, config, report)
    except Exception as e:
        report.add('import', 'FAIL', '{}: {}'.format(type(e).__name__, e))
        return report.summary()
    report.add('import', 'PASS', '{} ({})'.format(
        type(model).__name__, family))

    tokens, mel = default_inputs(model, family, args.text)

    if args.golden:
        golden = np.load(args.golden)
        golden_gate(model, family, golden, args.mel_gate, report)
        if 'mel' in golden.files:
            mel = np.asarray(golden['mel'])
        if 'tokens' in golden.files:
            tokens = np.asarray(golden['tokens'])
    else:
        # no golden: the forward must still run (smoke gate)
        try:
            forward(model, family, tokens = tokens, mel = mel)
            report.add('forward', 'PASS',
                       'smoke only — pass --golden for the <{:.0e} gate'
                       .format(args.mel_gate))
        except Exception as e:
            report.add('forward', 'FAIL', '{}: {}'.format(
                type(e).__name__, e))

    if args.write_golden:
        out = forward(model, family, tokens = tokens, mel = mel)
        payload = {k: v for k, v in out.items()}
        if tokens is not None: payload['tokens'] = tokens
        if mel is not None and 'mel' not in payload: payload['mel'] = mel
        if family.startswith('tacotron2'): payload['max_length'] = 64
        np.savez(args.write_golden, ** payload)
        report.add('golden-out', 'PASS', args.write_golden)

    if mel is None:
        snr_mel = np.random.RandomState(0).randn(1, 32, 80) * 2. - 6.
    else:
        snr_mel = mel[:, :256]
    int8_snr_gate(model, family, snr_mel, args.snr_gate, args.device, report)

    listen(model, family, args.out, args.text, tokens, mel, report)
    return report.summary()


def _setup_device(device):
    import jax
    if device == 'cpu':
        # the axon plugin hangs backend init when the tunnel is down;
        # re-pin through jax.config BEFORE any backend touch
        jax.config.update('jax_platforms', 'cpu')
    # TPU: leave the default platform resolution (axon) in place


# -- self-test ------------------------------------------------------------------

def _tiny_model(family, root):
    """Tiny random task model + its official-layout checkpoint + golden."""
    import jax, jax.numpy as jnp
    from text_to_speech_tpu.models import tts_export as ex

    ckpt_path = os.path.join(root, family.replace('-', '_') + '_ckpt')
    rng = np.random.RandomState(1)

    if family in ('tacotron2', 'tacotron2-keras'):
        from text_to_speech_tpu.models.tts import Tacotron2
        model = Tacotron2(
            lang = 'en', name = 'selftest_' + family.replace('-', '_'),
            encoder_embedding_dim = 16, encoder_n_conv = 3,
            encoder_kernel_size = 3, prenet_sizes = (8, 8),
            lsa_attention_dim = 8, lsa_attention_filters = 4,
            lsa_attention_kernel_size = 7, attention_rnn_dim = 12,
            decoder_rnn_dim = 12, postnet_n_conv = 5, postnet_filters = 8,
            postnet_kernel_size = 3, max_decoder_steps = 64)
        sd = (ex.export_keras_tacotron2 if family == 'tacotron2-keras'
              else ex.export_nvidia_tacotron2)(model.params, model.state)
        tokens = np.asarray(
            model.encode_text(model.clean_text('hello world'),
                              cleaned = True), np.int32)[None]
        golden = {'tokens': tokens, 'max_length': 48}
        golden.update(forward(model, 'tacotron2', tokens = tokens,
                              max_length = 48))
    elif family == 'waveglow':
        from text_to_speech_tpu.models.tts import WaveGlow
        model = WaveGlow(name = 'selftest_waveglow', n_flows = 2,
                         n_group = 4, n_early_every = 4, n_early_size = 2,
                         wn_layers = 2, wn_channels = 8, wn_fused = True,
                         upsample_width = 16, upsample_stride = 8)
        sd = ex.export_nvidia_waveglow(model.params)
        mel = (rng.randn(1, 32, 80) * 2. - 6.).astype(np.float32)
        golden = {'mel': mel}
        golden.update(forward(model, family, mel = mel))
    elif family == 'hifigan':
        from text_to_speech_tpu.models.tts import HiFiGAN
        model = HiFiGAN(name = 'selftest_hifigan',
                        upsample_initial_channel = 16,
                        upsample_rates = (2, 2),
                        upsample_kernel_sizes = (4, 4),
                        resblock_kernel_sizes = (3, 5),
                        resblock_dilation_sizes = ((1, 3), (1, 3)))
        sd = ex.export_hifigan(model.params)
        mel = (rng.randn(1, 32, 80) * 2. - 6.).astype(np.float32)
        golden = {'mel': mel}
        golden.update(forward(model, family, mel = mel))
    elif family == 'vits':
        from text_to_speech_tpu.models.tts import VITS
        model = VITS(
            lang = 'en', name = 'selftest_vits',
            tts_model = {
                'architecture': 'vits', 'vocab_size': 64, 'pad_token': 0,
                'spec_channels': 513, 'inter_channels': 8,
                'hidden_channels': 16, 'filter_channels': 32, 'n_heads': 2,
                'n_text_layers': 1, 'posterior_layers': 2, 'flow_layers': 2,
                'flow_wn_layers': 2, 'duration_filters': 16,
                'upsample_rates': (4, 2), 'upsample_kernel_sizes': (8, 4),
                'upsample_initial_channel': 16,
                'resblock_kernel_sizes': (3,),
                'resblock_dilation_sizes': ((1, 3),),
                'max_frames': 64})
        sd = ex.export_vits(model.params)
        tokens = (np.arange(12, dtype = np.int32)[None] % 63) + 1
        golden = {'tokens': tokens}
        golden.update(forward(model, family, tokens = tokens))
    elif family == 'vocos':
        from text_to_speech_tpu.models.tts import Vocos
        model = Vocos(name = 'selftest_vocos',
                      vocoder = {'architecture': 'vocos', 'dim': 16,
                                 'n_layers': 2, 'intermediate_dim': 32,
                                 'n_fft': 64, 'hop_length': 16,
                                 'win_length': 64})
        # hop 16 matches the n_fft//4 convention the importer infers
        sd = ex.export_vocos(model.params)
        mel = (rng.randn(1, 32, model.n_mel_channels) * 2. - 6.) \
            .astype(np.float32)
        golden = {'mel': mel}
        golden.update(forward(model, family, mel = mel))
    else:
        raise ValueError(family)

    if family == 'tacotron2-keras':
        ckpt_path += '.npz'
        np.savez(ckpt_path, ** sd)
    else:
        ckpt_path += '.pth'
        import torch
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, ckpt_path)
    golden_path = os.path.join(root, family + '_golden.npz')
    np.savez(golden_path, ** golden)
    return ckpt_path, golden_path


# -- pinned published configs ---------------------------------------------------

#: FULL hparam sets of the reference's published checkpoints
#: (``/root/reference/README.md:63-70``) and the NVIDIA bases they
#: fine-tune from — pinned HERE so import day is config-surprise-free:
#: ``--self-test-configs`` builds each model at FULL size, exports the
#: official layout, and round-trips it through the import chain
#: (detect → config inference → coverage → shape identity).  No forward
#: (full-size forwards belong on the TPU, with real weights).
NVIDIA_TACOTRON2 = dict(
    vocab_size = 148, n_mel_channels = 80,
    encoder_embedding_dim = 512, encoder_n_conv = 3, encoder_kernel_size = 5,
    prenet_sizes = (256, 256),
    lsa_attention_dim = 128, lsa_attention_filters = 32,
    lsa_attention_kernel_size = 31,
    attention_rnn_dim = 1024, decoder_rnn_dim = 1024,
    postnet_n_conv = 5, postnet_filters = 512, postnet_kernel_size = 5,
    max_decoder_steps = 1000, gate_threshold = 0.5)

#: the LJSpeech release is ``waveglow_256channels``: 256 WN channels —
#: NOT this framework's 512-channel training default
NVIDIA_WAVEGLOW = dict(
    n_flows = 12, n_group = 8, n_early_every = 4, n_early_size = 2,
    wn_layers = 8, wn_channels = 256, wn_kernel_size = 3, wn_fused = True,
    upsample_width = 1024, upsample_stride = 256)

#: (published name, family, lang, task hparams) — tacotron2_siwis and the
#: sv2tts variants are saved in the reference's own Keras layout; the
#: SV2TTS rows add the 256-dim speaker embedding concatenated at the
#: encoder output ('end'), which WIDENS the attention/decoder matrices
PINNED_CHECKPOINT_CONFIGS = (
    ('pretrained_tacotron2', 'tacotron2', 'en', NVIDIA_TACOTRON2),
    ('tacotron2_siwis', 'tacotron2-keras', 'fr', NVIDIA_TACOTRON2),
    ('sv2tts_tacotron2_256', 'sv2tts-keras', 'fr',
     dict(NVIDIA_TACOTRON2, speaker_embedding_dim = 256,
          speaker_concat_pos = 'end')),
    ('waveglow', 'waveglow', None, NVIDIA_WAVEGLOW),
)


def _tree_shapes(tree):
    import jax
    return {
        jax.tree_util.keystr(path): tuple(np.shape(leaf))
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]}


def self_test_configs(base_args):
    """Full-size layout round-trip for every pinned published config."""
    _setup_device('cpu')
    import jax
    from text_to_speech_tpu.models import saving, tts_export as ex
    from text_to_speech_tpu.models import tts_checkpoints as ck
    from text_to_speech_tpu.models.interfaces import reset_instances

    root = tempfile.mkdtemp(prefix = 'import_verify_configs_')
    failures = []
    for name, family, lang, config in PINNED_CHECKPOINT_CONFIGS:
        print('=' * 64)
        print('CONFIG SELF-TEST: {} ({})'.format(name, family))
        report = Report()
        saving._PRETRAINED_ROOT = os.path.join(root, name)
        reset_instances()
        try:
            if family == 'tacotron2':
                from text_to_speech_tpu.models.tts import Tacotron2
                model = Tacotron2(lang = lang, name = 'pin_' + name,
                                  ** config)
                sd = ex.export_nvidia_tacotron2(model.params, model.state)
                inferred = ck.tacotron2_config_from_state_dict(sd)
                # every pinned key the shape inference can derive must agree
                clash = {k: (config[k], inferred[k]) for k in inferred
                         if k in config and tuple(np.ravel(config[k]))
                         != tuple(np.ravel(inferred[k]))}
                if clash:
                    report.add('config-inference', 'FAIL', str(clash))
                else:
                    report.add('config-inference', 'PASS',
                               '{} keys agree'.format(
                                   len(set(inferred) & set(config))))
                ckpt = os.path.join(root, name + '.pth')
                import torch
                torch.save(
                    {k: torch.from_numpy(np.ascontiguousarray(v))
                     for k, v in sd.items()}, ckpt)
                reset_instances()
                rebuilt, _ = import_and_build(ckpt, 'auto', {}, report)
            elif family in ('tacotron2-keras', 'sv2tts-keras'):
                from text_to_speech_tpu.models.tts import (
                    Tacotron2, SV2TTSTacotron2)
                from text_to_speech_tpu.models.weights_converter import \
                    convert_keras_variables
                cls = SV2TTSTacotron2 if family == 'sv2tts-keras' \
                    else Tacotron2
                kw = dict(config)
                if family == 'sv2tts-keras':
                    kw['embedding_dim'] = kw.pop('speaker_embedding_dim')
                model = cls(lang = lang, name = 'pin_' + name, ** kw)
                flat = ex.export_keras_tacotron2(model.params, model.state)
                report.add('export', 'PASS',
                           '{} keras variables'.format(len(flat)))
                params, state = convert_keras_variables(flat)
                rebuilt_tree, src_tree = (params, state), \
                    (model.params, model.state)
                rebuilt = None
            elif family == 'waveglow':
                from text_to_speech_tpu.models.tts import WaveGlow
                model = WaveGlow(name = 'pin_' + name, ** config)
                sd = ex.export_nvidia_waveglow(model.params)
                ckpt = os.path.join(root, name + '.pth')
                import torch
                torch.save(
                    {k: torch.from_numpy(np.ascontiguousarray(v))
                     for k, v in sd.items()}, ckpt)
                reset_instances()
                rebuilt, _ = import_and_build(ckpt, 'auto', {}, report)
            else:
                raise ValueError(family)

            if rebuilt is not None:
                rebuilt_tree = (rebuilt.params, getattr(rebuilt, 'state', {}))
                src_tree = (model.params, getattr(model, 'state', {}))
            a, b = _tree_shapes(src_tree), _tree_shapes(rebuilt_tree)
            diff = sorted(set(a.items()) ^ set(b.items()))
            if diff:
                report.add('shape-roundtrip', 'FAIL',
                           '{} mismatches, e.g. {}'.format(
                               len(diff), diff[:4]))
            else:
                report.add('shape-roundtrip', 'PASS',
                           '{} tensors identical'.format(len(a)))
        except Exception as e:
            import traceback; traceback.print_exc()
            report.add('build', 'FAIL', repr(e))
        report.summary()
        if report.failed:
            failures.append(name)
        reset_instances()
    print('=' * 64)
    if failures:
        print('CONFIG SELF-TEST FAILED for: {}'.format(', '.join(failures)))
        return 1
    print('CONFIG SELF-TEST OK ({} pinned configs)'.format(
        len(PINNED_CHECKPOINT_CONFIGS)))
    return 0


def self_test(which, base_args):
    _setup_device('cpu')
    from text_to_speech_tpu.models import saving
    from text_to_speech_tpu.models.interfaces import reset_instances

    families = FAMILIES if which == 'all' else (which,)
    root = tempfile.mkdtemp(prefix = 'import_verify_selftest_')
    failures = []
    for family in families:
        print('=' * 64)
        print('SELF-TEST: ' + family)
        saving._PRETRAINED_ROOT = os.path.join(root, family, 'build')
        reset_instances()
        ckpt, golden = _tiny_model(family, root)
        reset_instances()
        args = argparse.Namespace(
            ** {** vars(base_args),
                'checkpoint': ckpt, 'family': 'auto', 'golden': golden,
                'write_golden': None, 'config': None, 'device': 'cpu',
                'workdir': os.path.join(root, family, 'verify'),
                'out': os.path.join(root, family, 'listen')})
        rc = run(args)
        if rc != 0:
            failures.append(family)
    print('=' * 64)
    if failures:
        print('SELF-TEST FAILED for: {}'.format(', '.join(failures)))
        return 1
    print('SELF-TEST OK ({} families)'.format(len(families)))
    return 0


def main(argv = None):
    p = argparse.ArgumentParser(description = __doc__.split('\n')[0])
    p.add_argument('checkpoint', nargs = '?')
    p.add_argument('--family', default = 'auto',
                   choices = ('auto',) + FAMILIES)
    p.add_argument('--out', default = os.path.join(REPO, 'examples',
                                                   'imported_verify'))
    p.add_argument('--workdir', default = None)
    p.add_argument('--golden', default = None)
    p.add_argument('--write-golden', dest = 'write_golden', default = None)
    p.add_argument('--mel-gate', dest = 'mel_gate', type = float,
                   default = 2e-3)
    p.add_argument('--snr-gate', dest = 'snr_gate', type = float,
                   default = 25.)
    p.add_argument('--device', default = 'cpu', choices = ('cpu', 'tpu'))
    p.add_argument('--text', default = 'the quick brown fox jumps over '
                                       'the lazy dog')
    p.add_argument('--config', default = None,
                   help = 'JSON dict of architecture overrides')
    p.add_argument('--self-test', dest = 'self_test', nargs = '?',
                   const = 'all', default = None,
                   metavar = 'all|' + '|'.join(FAMILIES))
    p.add_argument('--self-test-configs', dest = 'self_test_configs',
                   action = 'store_true',
                   help = 'full-size layout round-trip of every PINNED '
                          'published-checkpoint config (LJSpeech/SIWIS/'
                          'SV2TTS/WaveGlow-256) — no forward, no weights')
    args = p.parse_args(argv)

    if args.self_test_configs:
        return self_test_configs(args)
    if args.self_test:
        return self_test(args.self_test, args)
    if not args.checkpoint:
        p.error('a checkpoint path (or --self-test) is required')
    return run(args)


if __name__ == '__main__':
    sys.exit(main())
