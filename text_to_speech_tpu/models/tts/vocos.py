"""Vocos task model: frame-rate iSTFT vocoder behind the WaveGlow surface.

Beyond-reference capability (the reference's only vocoder is WaveGlow,
``/root/reference/models/tts/waveglow.py``): same task-model surface as
`HiFiGAN`/`WaveGlow` — `infer(mel) -> audio`, pad-to-multiple XLA shape
bucketing, GAN training (`train/gan.fit_gan`), persistence by name — over
the ConvNeXt+iSTFT generator (`models/vocos_arch.py`), which runs entirely
at frame rate (~600× fewer FLOPs per audio-second than WaveGlow).
`tts(..., vocoder = Vocos(...))` works unchanged.
"""

import logging

from .hifigan import HiFiGAN

logger = logging.getLogger(__name__)


class Vocos(HiFiGAN):

    def __init__(self, *, name = None, ** kwargs):
        super().__init__(name = name or 'vocos', ** kwargs)

    def build(self, *, model = None, vocoder = None, ** kwargs):
        if model is None and vocoder is None:
            kwargs.setdefault('architecture', 'vocos')
        return super().build(model = model, vocoder = vocoder, ** kwargs)

    @classmethod
    def from_torch_pretrained(cls, checkpoint, *, name = 'vocos',
                              config = None, ** kwargs):
        """Create a vocoder from a published torch Vocos checkpoint
        (e.g. the public mel-spectrogram release; ``backbone.convnext``
        layout).  Architecture fields are inferred from the state dict's
        shapes; pass `config` overrides for non-derivable ones
        (`hop_length`, `win_length`)."""
        import jax
        import jax.numpy as jnp
        from ..tts_checkpoints import (
            _load_state_dict, remove_torch_weight_norm, convert_vocos,
            vocos_config_from_state_dict,
        )

        sd = remove_torch_weight_norm(_load_state_dict(checkpoint))
        inferred = vocos_config_from_state_dict(sd)
        inferred.update(config or {})
        model = cls(name = name,
                    vocoder = {'architecture': 'vocos', ** inferred},
                    ** kwargs)
        model.set_weights(jax.tree_util.tree_map(
            jnp.asarray, convert_vocos(sd)))
        model.save()
        return model
