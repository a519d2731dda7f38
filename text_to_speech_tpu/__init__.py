"""text_to_speech_tpu — TPU-native text-to-speech framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference `yui-mhcp/text_to_speech` project (see SURVEY.md): text frontend,
Tacotron-2 synthesis, SV2TTS voice cloning, WaveGlow vocoding, training,
streaming inference, persistence, and observability.

Public API mirrors the reference: ``tts()``, ``stream()``, classes
``Tacotron2``, ``SV2TTSTacotron2``, ``WaveGlow``.
"""

__version__ = '0.1.0'


def tts(* args, ** kwargs):
    from .models.tts import tts as _tts
    return _tts(* args, ** kwargs)


def stream(* args, ** kwargs):
    from .models.tts import stream as _stream
    return _stream(* args, ** kwargs)


def get_pretrained(* args, ** kwargs):
    from .models import get_pretrained as _get
    return _get(* args, ** kwargs)


def __getattr__(name):
    if name in ('Tacotron2', 'SV2TTSTacotron2', 'WaveGlow', 'FastSpeech2',
                'VITS', 'SV2TTSVITS', 'HiFiGAN', 'Vocos'):
        from . import models
        from .models import tts as tts_module
        return getattr(tts_module, name)
    if name == 'setup_logging':
        from .loggers import setup_logging
        return setup_logging
    raise AttributeError(name)
