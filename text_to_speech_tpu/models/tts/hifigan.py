"""HiFi-GAN task model: drop-in vocoder alternative to WaveGlow.

Beyond-reference capability (the reference's only vocoder is WaveGlow,
``/root/reference/models/tts/waveglow.py``): same task-model surface —
`infer(mel) -> audio`, `__call__ = infer`, pad-to-multiple XLA shape
bucketing, persistence by name — over the ~100× cheaper HiFi-GAN generator
(`models/hifigan_arch.py`).  `tts(..., vocoder = HiFiGAN(...))` works
unchanged.
"""

import logging

import numpy as np

from .. import saving as saving_utils
from ..interfaces.base_model import BaseModel
from ..interfaces.base_audio_model import BaseAudioModel
from ...loggers import timer

logger = logging.getLogger(__name__)


class HiFiGAN(BaseAudioModel, BaseModel):
    serving_pad_multiple = 64    # compiled_infer's mel shape bucket

    def __init__(self, *, name = None, mel_fn = 'TacotronSTFT',
                 pad_mel_value = -11., ** kwargs):
        if getattr(self, '_initialized', False): return
        self.name = name or 'hifigan'

        disk = saving_utils.merge_disk_config(
            self.name, kwargs, exclude = ('name', 'pad_mel_value', 'audio_format'))
        pad_mel_value = disk.get('pad_mel_value', pad_mel_value)

        self._init_audio(mel_fn = mel_fn, audio_format = 'mel',
                         pad_mel_value = pad_mel_value, ** kwargs)
        BaseModel.__init__(self, name = self.name, ** kwargs)

    @classmethod
    def from_torch_pretrained(cls, checkpoint, *, name = 'hifigan',
                              config = None, ** kwargs):
        """Create a vocoder from a published torch HiFi-GAN generator
        checkpoint (weight-norm folded; layout verified numerically vs
        torch in ``tests/test_torch_parity.py``).  Architecture sizes are
        inferred from the state dict's shapes; pass `config` overrides for
        non-derivable fields (`upsample_rates` if not kernel//2, exotic
        dilation schedules)."""
        import jax
        import jax.numpy as jnp
        from ..tts_checkpoints import (
            _load_state_dict, remove_torch_weight_norm, convert_hifigan,
            hifigan_config_from_state_dict,
        )

        sd = remove_torch_weight_norm(_load_state_dict(checkpoint))
        inferred = hifigan_config_from_state_dict(sd)
        inferred.update(config or {})
        model = cls(name = name, ** {** inferred, ** kwargs})
        params = convert_hifigan(
            sd, num_kernels = len(model.arch.hp.resblock_kernel_sizes))
        model.set_weights(jax.tree_util.tree_map(jnp.asarray, params))
        model.save()
        return model

    def build(self, *, model = None, vocoder = None, ** kwargs):
        if vocoder is not None: model = vocoder
        if model is None:
            model = {
                'architecture': kwargs.pop('architecture', 'hifigan'),
                'n_mel_channels': self.n_mel_channels,
                ** kwargs,
            }
        return super().build(model = model)

    @property
    def upsample_rate(self):
        return self.arch.total_upsampling

    def compiled_infer(self, mel, *, padding_multiple = 64, dtype = None, ** _):
        """One fully-convolutional device call; mel padded to a shape
        bucket so arbitrary lengths hit a bounded number of executables.
        Device arrays pass through without a host round-trip."""
        mel = self._pad_mel_to_bucket(mel, padding_multiple)
        key = ('infer', dtype)

        def builder():
            def fn(params, mel):
                return self.arch.apply(params, mel, dtype = dtype)
            return fn

        return self.get_compiled(key, builder)(self.params, mel)

    def device_vocoder_fn(self, *, dtype = None, ** _):
        """(fn, params, tag): jit-composable vocode core — `fn(params,
        mel_dev, rng) → f32 waveform` — for single-launch
        decode→postnet→vocode programs (`Tacotron2.compiled_tts`; the rng
        is unused by this deterministic generator)."""
        def fn(params, mel, rng):
            return self.arch.apply(params, mel, dtype = dtype)
        return fn, self.params, (self.name, dtype)

    @timer(name = 'inference HiFiGAN')
    def infer(self, mel, *, dtype = None, ** kwargs):
        """Vocode a mel (np/jax, (T, n_mel) or (B, T, n_mel)) → float32
        waveform(s) cropped to exactly `T * upsample_rate` samples."""
        if isinstance(mel, str): mel = np.load(mel)
        squeeze = hasattr(mel, 'ndim') and mel.ndim == 2
        n_frames = np.shape(mel)[-2]
        audio = self.compiled_infer(mel, dtype = dtype, ** kwargs)
        audio = np.asarray(audio)[:, :n_frames * self.upsample_rate]
        return audio[0] if squeeze else audio

    __call__ = infer

    # -- training data pipeline (adversarial: `train/gan.fit_gan`) -------------

    def prepare_data(self, data):
        """audio row → (mel (T, n_mel), waveform (T·hop,)) aligned pair."""
        from ...ops.audio_io import load_audio

        audio = np.asarray(load_audio(data, self.rate), np.float32)
        mel = np.asarray(self.get_audio({'audio': audio, 'rate': self.rate}))
        hop = self.mel_fn.hop_length
        n = min(mel.shape[0], len(audio) // hop)
        return mel[:n], audio[: n * hop]

    def filter_data(self, * args):
        if len(args) == 1: args = args[0]
        return args[0].shape[0] >= 8            # enough frames to window

    def collate(self, batch):
        from ...utils import pad_batch
        mel = pad_batch([b[0] for b in batch], pad_value = self.pad_mel_value)
        audio = pad_batch([b[1] for b in batch], pad_value = 0.)
        return mel, audio

    def fit(self, data, ** kwargs):
        from ...train.gan import fit_gan
        return fit_gan(self, data, ** kwargs)

    def get_config(self):
        return {** super().get_config(), ** self.get_config_audio()}

    def get_saving_objects(self):
        return {** super().get_saving_objects(), ** self.get_saving_objects_audio()}
