"""Model zoo: name → class resolution and instantiation.

Capability parity with ``/root/reference/models/__init__.py``
(`get_pretrained:22`, `print_pretrained:36` via `config.json` class lookup).
"""

import logging

from . import saving
from .registry import get_architecture, list_architectures

logger = logging.getLogger(__name__)


def _model_classes():
    from .interfaces.base_model import BaseModel
    from .tts import Tacotron2, SV2TTSTacotron2, FastSpeech2, WaveGlow
    from .encoder import SpeakerEncoder

    classes = {}

    def collect(cls):
        classes[cls.__name__] = cls
        for sub in cls.__subclasses__():
            collect(sub)

    collect(BaseModel)
    return classes


def get_pretrained(name, ** kwargs):
    """Instantiate a persisted model by name (class read from its config)."""
    if not saving.is_model_name(name):
        raise ValueError('Unknown pretrained model {!r} (known: {})'.format(
            name, saving.list_pretrained()
        ))
    class_name = saving.get_model_class_name(name)
    classes = _model_classes()
    if class_name not in classes:
        raise ValueError('Unknown model class {!r} for {!r}'.format(class_name, name))
    return classes[class_name](name = name, ** kwargs)


def print_pretrained():
    for name in saving.list_pretrained():
        config = saving.get_model_config(name)
        print('- {} ({})'.format(name, config.get('class_name')))
