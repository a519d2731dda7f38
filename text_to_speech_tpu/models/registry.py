"""Architecture registry.

Capability parity with ``/root/reference/architectures/__init__.py:22-61``
(`get_architecture` case-insensitive factory, `print_architectures`).
"""

_ARCHITECTURES = {}


def register_architecture(name, cls = None):
    def deco(c):
        _ARCHITECTURES[name.lower()] = c
        return c
    if cls is not None:
        return deco(cls)
    return deco


def get_architecture(architecture, ** kwargs):
    """Instantiate an architecture by (case-insensitive) name."""
    if isinstance(architecture, dict):
        kwargs = {** architecture, ** kwargs}
        architecture = kwargs.pop('architecture')
    key = architecture.lower()
    if key not in _ARCHITECTURES:
        raise ValueError('Unknown architecture {!r} (known: {})'.format(
            architecture, sorted(_ARCHITECTURES)
        ))
    return _ARCHITECTURES[key](** kwargs)


def list_architectures():
    return sorted(_ARCHITECTURES)


def _register_builtins():
    from .tacotron2_arch import Tacotron2
    from .waveglow_arch import WaveGlow
    from .encoder_arch import AudioEncoder
    from .transformers.transformer_arch import Transformer
    register_architecture('tacotron2', Tacotron2)
    register_architecture('sv2tts_tacotron2', Tacotron2)
    register_architecture('waveglow', WaveGlow)
    from .hifigan_arch import HiFiGAN
    register_architecture('hifigan', HiFiGAN)
    from .vocos_arch import Vocos
    register_architecture('vocos', Vocos)
    from .fastspeech2_arch import FastSpeech2
    register_architecture('fastspeech2', FastSpeech2)
    from .vits_arch import VITS
    register_architecture('vits', VITS)
    register_architecture('audio_encoder', AudioEncoder)
    register_architecture('audioencoder', AudioEncoder)   # lower(class name)
    register_architecture('transformer', Transformer)


_register_builtins()
