"""TTS user API.

Capability parity with ``/root/reference/models/tts/__init__.py``
(`tts:62`, `stream:80`, `get_models:41`, `get_model_lang:103`, the
language→pretrained-model map).
"""

import os
import logging

from .tacotron2 import Tacotron2
from .sv2tts_tacotron2 import SV2TTSTacotron2
from .fastspeech2 import FastSpeech2
from .vits import VITS
from .sv2tts_vits import SV2TTSVITS
from .waveglow import WaveGlow
from .hifigan import HiFiGAN
from .vocos import Vocos

logger = logging.getLogger(__name__)

_pretrained = {
    'en': 'pretrained_tacotron2',
    'fr': 'sv2tts_siwis_v3',
}

_default_vocoder = 'waveglow'


def set_pretrained_model(model, lang):
    """Map `lang` onto `model` for future `tts(..., lang = lang)` calls
    (reference ``models/tts/__init__.py`` `set_pretrained_model`)."""
    _pretrained[lang] = model


def get_pretrained_model(lang):
    return _pretrained.get(lang)


def get_model_lang(lang):
    if lang not in _pretrained:
        raise ValueError('No pretrained model for lang {!r} (known: {})'.format(
            lang, sorted(_pretrained)
        ))
    return _pretrained[lang]


def get_models(model = None, lang = None, vocoder = None):
    """Resolve (synthesizer, vocoder) from a model name/instance or a lang."""
    from .. import get_pretrained

    if model is None:
        if lang is None:
            raise ValueError('Provide either `model` or `lang`')
        model = get_model_lang(lang)
    if isinstance(model, str):
        model = get_pretrained(model)

    if getattr(model, 'is_end_to_end', False):
        # the model synthesizes waveforms directly (e.g. VITS) — it is its
        # own vocoder unless one is explicitly forced
        return model, (vocoder if vocoder not in (None, _default_vocoder)
                       else model)
    if vocoder is None:
        vocoder = _default_vocoder
    if isinstance(vocoder, str):
        vocoder = get_pretrained(vocoder)
    return model, vocoder


def tts(text, *, model = None, lang = None, vocoder = None,
        add_model_name = False, ** kwargs):
    """Main entry point: text (str or list) → synthesized audio + artifacts.

    Returns the list of per-text output dicts (see `Tacotron2.predict`) —
    always a list, even for a single input text (unlike the reference,
    which unwraps single inputs; see docs/MIGRATION.md).

    `add_model_name` redirects an explicit `directory=` into a per-model
    subdirectory (reference `models/tts/__init__.py:62` behavior), so
    several models can predict into one artifact root without clobbering.
    """
    model, vocoder = get_models(model = model, lang = lang, vocoder = vocoder)
    if add_model_name and kwargs.get('directory'):
        kwargs['directory'] = os.path.join(kwargs['directory'], model.name)
    return model.predict(text, vocoder = vocoder, ** kwargs)


def stream(stream_input, *, model = None, lang = None, vocoder = None,
           play = True, ** kwargs):
    """Interactive / pipelined streaming synthesis over a queue or iterator."""
    model, vocoder = get_models(model = model, lang = lang, vocoder = vocoder)
    return model.stream(stream_input, vocoder = vocoder, play = play, ** kwargs)


def serve(*, model = None, lang = None, vocoder = None, host = '127.0.0.1',
          port = 8700, max_batch_size = 16, block = True, window = 96,
          chunk = 64, warmup = None, ** stepper_kwargs):
    """Serve a model over HTTP with continuous (in-flight) batching.

    Resolves (synthesizer, vocoder) like `tts()`, builds the matching
    stepper (`make_vits_stepper` for end-to-end models,
    `make_tacotron_stepper(stream_audio=True)` for AR synthesizers — both
    support the streaming endpoint), and starts
    `runtimes.http_server.TTSServer`.  ``block=False`` returns the started
    server (daemon thread) for programmatic use / tests.

    ``warmup``: a text (or list of texts covering the expected length
    buckets) precompiled through the engine at every batch bucket BEFORE
    the server accepts traffic (`ContinuousServingEngine.warmup`), so the
    first live requests don't pay XLA compiles.

    ``mesh=``: serve the decode across a data-parallel device mesh —
    params replicate, the active batch shards on dp (see
    `make_vits_stepper` / `make_tacotron_stepper`).

    Defaults (r5, 1x v5e, benchmarks/serving_load.py median-of-3): VITS
    window=96 carried the 256-request open-loop from 140 to 186 audio-s/s
    (steady 214; window 64's 2x-context overhead per chunk was the cost,
    window 128 regressed the tail-flush latency); AR max_batch=16 nearly
    doubled r=1 throughput over 8 (24.8->48.4 audio-s/s — the
    latency-bound decode chunk costs ~the same at 2x rows)."""
    from ...runtimes.serving import (
        ContinuousServingEngine, make_vits_stepper, make_tacotron_stepper)
    from ...runtimes.http_server import TTSServer

    model, vocoder = get_models(model = model, lang = lang, vocoder = vocoder)
    if getattr(model, 'is_end_to_end', False):
        # int16 chunk transfer by default: the HTTP layer re-encodes to
        # 16-bit PCM anyway, so the 4x-smaller device->host fetch is free
        # (measured 54.4 -> 35.9 ms/chunk steady at B=8 on a tunneled v5e)
        stepper_kwargs.setdefault('transfer_dtype', 'int16')
        # a small model's latent envelope may not fit the serving-tuned
        # default window + context span: shrink the window, never crash
        context = stepper_kwargs.get('context', 16)
        max_frames = getattr(model.arch.hp, 'max_frames', None)
        if max_frames and window + 2 * context > max_frames:
            window = max(1, max_frames - 2 * context)
        stepper = make_vits_stepper(model, window = window,
                                    ** stepper_kwargs)
    else:
        stepper = make_tacotron_stepper(
            model, chunk = chunk, vocoder = vocoder, stream_audio = True,
            ** stepper_kwargs)
    engine = ContinuousServingEngine(* stepper,
                                     max_batch_size = max_batch_size)
    if warmup is not None:
        elapsed = engine.warmup(warmup)
        logger.info('engine warmup took %.1fs', elapsed)
    server = TTSServer(engine, rate = model.rate, host = host, port = port,
                       name = model.name)
    if not block:
        return server.start()
    logger.info('serving %s on %s', model.name, server.address)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
