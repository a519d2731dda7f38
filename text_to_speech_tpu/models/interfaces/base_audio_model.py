"""Audio-capable model mixin.

Capability parity with
``/root/reference/models/interfaces/base_audio_model.py`` (`_init_audio:31`,
`get_audio:184`, training-hparams→load-kwargs mapping ``:121``, time↔frame
conversion): owns the `MelSTFT`, persists it under ``saving/mel_fn.json``.
"""

import os

from ...ops import MelSTFT, load_audio, load_mel


class BaseAudioModel:
    def _init_audio(self,
                    mel_fn = 'TacotronSTFT',
                    audio_format = 'mel',
                    pad_mel_value = -11.,
                    audio_rate = None,
                    trim_audio = False,
                    ** kwargs
                   ):
        assert audio_format in ('raw', 'audio', 'mel')
        self.audio_format = audio_format
        self.pad_mel_value = pad_mel_value
        self.trim_audio = trim_audio

        saved = self._saved_mel_file()
        if isinstance(mel_fn, MelSTFT):
            self.mel_fn = mel_fn
        elif saved and os.path.exists(saved):
            self.mel_fn = MelSTFT.load_from_file(saved)
        else:
            mel_kwargs = {}
            if audio_rate: mel_kwargs['sampling_rate'] = audio_rate
            self.mel_fn = MelSTFT.create(mel_fn, ** mel_kwargs)

    def _saved_mel_file(self):
        from .. import saving as saving_utils
        name = getattr(self, 'name', None) or ''
        if not name: return None
        return saving_utils.get_model_dir(name, 'saving', 'mel_fn.json')

    # -- properties ------------------------------------------------------------

    @property
    def rate(self):
        return self.mel_fn.rate

    @property
    def n_mel_channels(self):
        return self.mel_fn.n_mel_channels

    # -- conversions -----------------------------------------------------------

    def time_to_frames(self, seconds):
        return self.mel_fn.get_mel_length(int(seconds * self.rate))

    def frames_to_time(self, frames):
        return self.mel_fn.get_audio_length(frames) / self.rate

    # -- data loading ----------------------------------------------------------

    def get_audio(self, data, ** kwargs):
        """Load the audio representation configured by `audio_format`."""
        kwargs.setdefault('trim_silence', self.trim_audio)
        if self.audio_format == 'mel':
            return load_mel(data, self.mel_fn, ** kwargs)
        return load_audio(data, self.rate, ** kwargs)

    get_mel_input = get_audio

    # -- training hparams mapping ----------------------------------------------

    @property
    def training_hparams_audio(self):
        return {'trim_audio': self.trim_audio}

    def apply_training_hparams_audio(self, ** hparams):
        if 'trim_audio' in hparams:
            self.trim_audio = hparams['trim_audio']

    def _pad_mel_to_bucket(self, mel, multiple):
        """mel (T, C) / (B, T, C), numpy or device array → (B, T', C) padded
        with `pad_mel_value` to the shape bucket.  Device arrays pad with
        `jnp.pad` on device (no host round-trip — the synthesizer pipelines
        its decoder output straight into the vocoder launch this way)."""
        import jax
        import numpy as np

        if isinstance(mel, jax.Array) and not isinstance(mel, np.ndarray):
            import jax.numpy as jnp
            if mel.ndim == 2: mel = mel[None]
            if multiple and mel.shape[1] % multiple:
                pad = multiple - mel.shape[1] % multiple
                mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)),
                              constant_values = self.pad_mel_value)
            return mel
        from ...utils import pad_to_multiple
        mel = np.asarray(mel)
        if mel.ndim == 2: mel = mel[None]
        if multiple:
            mel = pad_to_multiple(mel, multiple, axis = 1,
                                  constant_values = self.pad_mel_value)
        return mel

    # -- persistence -----------------------------------------------------------

    def get_config_audio(self):
        return {
            'audio_format': self.audio_format,
            'pad_mel_value': self.pad_mel_value,
        }

    def get_saving_objects_audio(self):
        return {'mel_fn.json': self.mel_fn}

    def _str_audio(self):
        return '- audio rate : {}\n- mel channels : {}\n'.format(
            self.rate, self.n_mel_channels
        )
