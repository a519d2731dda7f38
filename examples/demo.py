"""End-to-end demo of the TPU-native TTS framework.

The analog of the reference's ``text_to_speech.ipynb``: create (or load)
models, synthesize, clone a voice, train, stream.  Runs with random weights
out of the box; point ``TTS_PRETRAINED_DIR`` at a directory with trained
checkpoints for real speech.

Usage:  python examples/demo.py [quick|train|stream|clone]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np


def get_models():
    from text_to_speech_tpu import Tacotron2, WaveGlow
    synthesizer = Tacotron2(lang = 'en', name = 'demo_tacotron2')
    vocoder = WaveGlow(name = 'demo_waveglow')
    return synthesizer, vocoder


def demo_quick():
    """text → waveform with the `tts` facade (mirrors reference notebook cell 2)."""
    from text_to_speech_tpu import tts

    synthesizer, vocoder = get_models()
    results = tts(
        'Hello world! This framework runs text to speech natively on TPU.',
        model = synthesizer, vocoder = vocoder,
        max_trial = 1, save = True, audio_filename = 'audio-{}.wav',
    )
    out = results[0]
    print('generated {:.2f}s of audio at {} Hz'.format(
        out.get('time', 0.), out.get('rate')))
    print('artifacts under:', synthesizer.pred_dir)


def demo_long_text():
    """Long-document synthesis: recursive chunking + sliding attention window
    + windowed vocoding (reference notebook cells 4-5)."""
    from text_to_speech_tpu import tts

    synthesizer, vocoder = get_models()
    long_text = ('This is a long document. ' * 30)
    results = tts(
        long_text, model = synthesizer, vocoder = vocoder,
        max_text_length = 120,              # chunk to <=120 tokens
        attn_mask_win_len = 32,             # sliding attention window
        vocoder_config = {'win_len': 256, 'hop_len': -64},  # windowed vocoding
        max_trial = 1, save = False,
    )
    print('chunks synthesized:', len(results[0]['splitted']))


def demo_document(path = None):
    """Document → speech: parse any supported file (pdf/docx/md/html/txt),
    group paragraphs by section, chunk to synthesis length, and speak each
    chunk with its section metadata carried through to the saved artifacts."""
    from text_to_speech_tpu import tts
    from text_to_speech_tpu.text.parsers import parse_document
    from text_to_speech_tpu.text import chunks_from_paragraphs

    if path is None:                       # self-contained demo document
        import tempfile
        path = os.path.join(tempfile.mkdtemp(), 'doc.md')
        with open(path, 'w') as f:
            f.write('# Intro\n\nThis framework reads documents aloud.\n\n'
                    'It chunks long sections automatically.\n\n'
                    '# Details\n\nEach chunk keeps its section name.\n')

    paragraphs = parse_document(path)
    chunks = chunks_from_paragraphs(
        paragraphs, max_length = 120, group_by = 'section')
    print('document →', len(chunks), 'chunks:',
          [(c.get('section'), len(c['text'])) for c in chunks])

    synthesizer, vocoder = get_models()
    for chunk in chunks:
        results = tts(chunk['text'], model = synthesizer, vocoder = vocoder,
                      max_trial = 1, save = False)
        print('  [{}] {:.2f}s audio'.format(
            chunk.get('section'), results[0].get('time', 0.)))


def demo_stream():
    """Interactive-style streaming over a queue (reference `stream()`)."""
    import queue
    import threading
    from text_to_speech_tpu import stream

    synthesizer, vocoder = get_models()
    q = queue.Queue()

    def feed():
        for text in ('First sentence.', 'Second sentence.', None):
            q.put(text)

    threading.Thread(target = feed).start()
    stream(q, model = synthesizer, vocoder = vocoder,
           play = False, save = True, max_trial = 1)


def demo_train():
    """Train on a toy synthetic dataset (swap rows for an LJSpeech DataFrame
    from `train.audio_datasets.load_ljspeech`)."""
    synthesizer, _ = get_models()
    rng = np.random.RandomState(0)
    rows = [
        {'text': t, 'audio': rng.randn(6000).astype(np.float32) * 0.1,
         'rate': 22050}
        for t in ('hello world', 'a second sample', 'training data') * 2
    ]
    history = synthesizer.fit(rows, epochs = 1, batch_size = 2, valid_size = 2)
    print('trained; last loss:', history.get_metric('loss')[-1])


def demo_clone():
    """Zero-shot voice cloning (SV2TTS): embedding-conditioned synthesis."""
    from text_to_speech_tpu import SV2TTSTacotron2, WaveGlow

    model = SV2TTSTacotron2.from_pretrained(
        'demo_sv2tts', 'demo_tacotron2', lang = 'en', embedding_dim = 256,
    )
    vocoder = WaveGlow(name = 'demo_waveglow')
    embedding = np.random.randn(256).astype(np.float32)   # or model.embed_audio(ref_wav)
    out = model.infer('cloning a voice', embeddings = embedding,
                      vocoder = vocoder, max_trial = 1)
    print('cloned-voice mel frames:', out['mel'][0].shape)


def demo_serving():
    """Continuous-batching request server with incremental audio streaming:
    requests admitted at decode chunk boundaries, waveform chunks handed to
    per-request callbacks as they complete (docs/SERVING.md)."""
    from text_to_speech_tpu.runtimes.serving import (
        ContinuousServingEngine, make_tacotron_stepper)

    synthesizer, vocoder = get_models()
    # max_steps bounds the demo with random weights (an untrained gate may
    # never fire); drop it when serving trained checkpoints
    stepper = make_tacotron_stepper(
        synthesizer, chunk = 32, vocoder = vocoder, stream_audio = True,
        max_steps = 96)

    chunks = []
    with ContinuousServingEngine(* stepper, max_batch_size = 4) as engine:
        request = engine.submit('Streaming speech, chunk by chunk.',
                                on_audio = chunks.append)
        urgent = engine.submit('High priority request.', priority = 9)
        out = request.result.get(timeout = 300)
        urgent.result.get(timeout = 300)
    print('streamed {} audio chunks; first audio after {:.0f} ms'.format(
        len(chunks), 1000 * out.get('first_audio_s', 0.)))
    print('scheduler:', engine.scheduler_stats)


def demo_vits():
    """The end-to-end family: one parallel text→waveform program (no
    vocoder), exact windowed streaming, and zero-shot cloning on it —
    all beyond the reference's two-model pipelines."""
    import time
    from text_to_speech_tpu import tts, VITS, SV2TTSVITS
    from text_to_speech_tpu.runtimes.serving import (
        ContinuousServingEngine, make_vits_stepper)

    model = VITS(lang = 'en', name = 'demo_vits')
    out = tts('One program from text to waveform.', model = model,
              save = False, min_duration = 6)[0]
    print('one-shot: {:.2f}s of audio'.format(out.get('time', 0.)))

    # incremental streaming: latent stage once, windowed HiFi-GAN decode
    # (bit-exact vs the one-shot path), in-flight admission
    chunks = []
    stepper = make_vits_stepper(model, window = 64, min_duration = 6)
    with ContinuousServingEngine(* stepper, max_batch_size = 4) as engine:
        t0 = time.perf_counter()
        res = engine.submit('Streaming starts before the utterance ends.',
                            on_audio = chunks.append).result.get(timeout = 600)
    print('streamed {} chunks; first audio after {:.0f} ms'.format(
        len(chunks), 1000 * res.get('first_audio_s', 0.)))

    # zero-shot cloning: the SV2TTS embedding machinery over the same model
    cloner = SV2TTSVITS(lang = 'en', name = 'demo_sv2tts_vits',
                        embedding_dim = 256)
    cloner.set_default_embedding(np.random.randn(256).astype(np.float32))
    out = cloner.infer('Cloned end to end.', max_trial = 1)
    print('cloned: audio shape', np.shape(out.get('audio')))


def demo_parallel():
    """Multi-chip scaling recipes on a virtual CPU mesh (dp / tp / pp / sp):
    the same code drives real TPU meshes.  Run with
    XLA_FLAGS=--xla_force_host_platform_device_count=8."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from text_to_speech_tpu.models.waveglow_arch import WaveGlow as WGArch
    from text_to_speech_tpu.parallel import (
        create_mesh, shard_params, shard_batch, waveglow_param_specs)
    from text_to_speech_tpu.parallel.pipeline import WaveGlowPipeline

    jax.config.update('jax_platforms', 'cpu')
    devices = jax.devices('cpu')
    arch = WGArch(n_flows = 4, n_group = 4, wn_layers = 2, wn_channels = 32,
                  upsample_width = 16, upsample_stride = 8)
    params = arch.init(jax.random.PRNGKey(0))
    mel = np.random.randn(4, 16, 80).astype(np.float32) * 2. - 6.
    audio = np.random.randn(4, 16 * 8).astype(np.float32)

    # dp x tp inference: batch rows over dp, WN channels over tp
    mesh = create_mesh({'dp': 2, 'tp': 2}, devices = devices[:4])
    wave = jax.jit(lambda p, m: arch.infer(p, m, deterministic = True))(
        shard_params(params, mesh, waveglow_param_specs(params)),
        shard_batch(mel, mesh))
    print('dp x tp waveform:', wave.shape)

    # dp x pp training: GPipe microbatch pipeline over the flow stack
    pp_mesh = create_mesh({'dp': 2, 'pp': 2}, devices = devices[:4])
    pipe = WaveGlowPipeline(arch, pp_mesh, dp_axis = 'dp', n_micro = 2)
    loss = jax.jit(pipe.loss)(params, mel, audio)
    print('pipelined NLL:', float(loss))

    # sp inference: time axis sharded, GSPMD inserts the conv halo exchange
    sp_mesh = create_mesh({'sp': 4}, devices = devices[:4])
    wave = jax.jit(lambda p, m: arch.infer(p, m, deterministic = True))(
        shard_params(params, sp_mesh),
        jax.device_put(mel, NamedSharding(sp_mesh, P(None, 'sp', None))))
    print('sp waveform:', wave.shape)


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'quick'
    {
        'quick': demo_quick,
        'long': demo_long_text,
        'document': demo_document,
        'stream': demo_stream,
        'train': demo_train,
        'clone': demo_clone,
        'serving': demo_serving,
        'vits': demo_vits,
        'parallel': demo_parallel,
    }[mode]()
