"""End-to-end voice cloning with LEARNED weights, on two real voices
derived from the reference utterance — the SV2TTS-family counterpart of
``overfit_single_utterance.py`` (no pretrained checkpoints exist in this
environment, so every stage trains here, through the public APIs):

  1. make two "speakers": the reference utterance and a pitch-shifted
     variant (resample trick: play the same samples faster → higher f0),
  2. train a small `SpeakerEncoder` with the GE2E loss on 1-second
     segments of each — the real reference recipe
     (``/root/reference/README.md:140-142``) at toy scale,
  3. verify the learned embedding space separates the two voices,
  4. train a small `SV2TTSTacotron2` conditioned on the per-speaker
     embeddings (both voices, same text label),
  5. synthesize the SAME text with each speaker's embedding,
  6. verify the clone OBJECTIVELY: each synthesis' mel must be closer
     (DTW-aligned MCD) to its own speaker's ground truth than to the
     other's, and re-embedding the Griffin-Lim audio through the trained
     encoder must identify the right speaker.

Usage:  python examples/clone_voice.py [encoder_epochs] [tts_epochs] [out_dir]
        (CPU-friendly: ~15-20 min at the defaults on one core)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np

TEXT = 'the birch canoe slid on the smooth planks of the lake.'

ENCODER_HP = dict(embedding_dim = 32, filters = (16, 16), strides = (2, 2),
                  kernel_size = 3)
TTS_HP = dict(
    encoder_embedding_dim = 64, encoder_n_conv = 2, encoder_kernel_size = 5,
    prenet_sizes = (64, 64), lsa_attention_dim = 32, lsa_attention_filters = 8,
    lsa_attention_kernel_size = 15, attention_rnn_dim = 128,
    decoder_rnn_dim = 128, postnet_n_conv = 3, postnet_filters = 128,
    postnet_kernel_size = 5, max_decoder_steps = 400,
)


def load_voices(max_seconds = 3.0):
    """(rate, {speaker: waveform}) — speaker 'high' is the same utterance
    resampled to play ~12% faster (higher pitch AND tempo: a crude but
    real second voice)."""
    from overfit_single_utterance import load_utterance
    from text_to_speech_tpu.ops.audio_processing import resample_audio

    rate, audio = load_utterance(max_seconds)
    shifted, _ = resample_audio(audio, int(rate * 1.12), rate)
    return rate, {'base': audio.astype(np.float32),
                  'high': np.asarray(shifted, np.float32)}


def segments(audio, rate, seconds = 1.0, hop = 0.5):
    n, h = int(seconds * rate), int(hop * rate)
    return [audio[s: s + n] for s in range(0, max(1, len(audio) - n), h)]


def main(encoder_epochs = 12, tts_epochs = 300, out_dir = None):
    from text_to_speech_tpu.models.encoder import SpeakerEncoder
    from text_to_speech_tpu.models.tts import SV2TTSTacotron2
    from text_to_speech_tpu.ops.audio_io import write_audio
    from text_to_speech_tpu.train.metrics import get_metric
    from text_to_speech_tpu.utils.distances import distance

    rate, voices = load_voices()
    print('voices: %s (%.2fs / %.2fs @ %d Hz)' % (
        ', '.join(voices), len(voices['base']) / rate,
        len(voices['high']) / rate, rate))

    # -- 2. GE2E speaker encoder on 1 s segments -----------------------------
    rows = [{'audio': seg, 'rate': rate, 'speaker': spk}
            for spk, audio in voices.items()
            for seg in segments(audio, rate)]
    print('%d segments across %d speakers' % (len(rows), len(voices)))
    encoder = SpeakerEncoder(name = 'clone_demo_encoder', ** ENCODER_HP)
    history = encoder.fit(rows, n_speakers = 2, n_utterances = 4,
                          epochs = encoder_epochs, lr = 3e-3)
    losses = history.get_metric('loss')
    print('GE2E loss: %.3f -> %.3f' % (losses[0], losses[-1]))

    # -- 3. the embedding space must separate the voices ---------------------
    embeds = {spk: np.asarray(encoder.embed(
        [{'audio': seg, 'rate': rate} for seg in segments(audio, rate)]))
        for spk, audio in voices.items()}
    centroids = {spk: e.mean(0) / max(np.linalg.norm(e.mean(0)), 1e-9)
                 for spk, e in embeds.items()}
    within = np.mean([
        float(distance(e, centroids[spk][None], 'cosine', as_matrix = True).mean())
        for spk, e in embeds.items()])
    across = float(distance(centroids['base'][None], centroids['high'][None],
                            'cosine', as_matrix = True)[0, 0])
    print('cosine similarity: within-speaker %.3f vs across-centroids %.3f'
          % (within, across))
    assert within > across, 'the encoder failed to separate the two voices'

    # -- 4. conditioned synthesizer ------------------------------------------
    tts = SV2TTSTacotron2(lang = 'en', name = 'clone_demo_tts',
                          embedding_dim = encoder.embedding_dim,
                          speaker_concat_pos = ('start', 'end'), ** TTS_HP)
    train_rows = [{'text': TEXT, 'audio': voices[spk], 'rate': rate,
                   'embedding': centroids[spk]}
                  for spk in voices for _ in range(8)]
    history = tts.fit(train_rows, epochs = tts_epochs, batch_size = 4,
                      valid_size = 0., lr = 1e-3, frame_multiple = 32,
                      token_multiple = 16)
    losses = history.get_metric('loss')
    print('TTS loss: %.2f -> %.2f' % (losses[0], losses[-1]))

    # -- 5./6. synthesize each voice and verify the clone --------------------
    # ground-truth mels through the MODEL's front-end rate (the training
    # pipeline resamples to tts.rate; feeding 16 kHz samples to the 22 kHz
    # mel_fn would shift the whole time/frequency base)
    from text_to_speech_tpu.ops.audio_processing import resample_audio
    gt_mel = {}
    for spk in voices:
        audio_sr, _ = resample_audio(voices[spk], rate, tts.rate)
        gt_mel[spk] = np.asarray(tts.mel_fn(np.asarray(audio_sr,
                                                       np.float32)))[0]
    mcd = get_metric('mcd')
    out_dir = out_dir or os.path.join(tts.pred_dir, 'clone')
    os.makedirs(out_dir, exist_ok = True)

    ok = True
    for spk in voices:
        # cap the decode at ~1.5x the ground-truth length: an undertrained
        # gate otherwise free-runs to max_decoder_steps and the MCD measures
        # the runaway tail instead of the voice
        out = tts.infer(TEXT, embeddings = centroids[spk], max_trial = 3,
                        max_text_length = -1, max_length = 5.)
        mel = np.asarray(out['mel'][0])
        own = mcd(gt_mel[spk], mel, align = 'dtw')
        other = min(mcd(gt_mel[o], mel, align = 'dtw')
                    for o in voices if o != spk)
        wave = np.asarray(tts.mel_fn.inverse(mel, n_iters = 48))[0]
        # the synthesized wave lives at the MODEL's rate (22050), not the
        # source recording's
        who = encoder.identify(
            {'audio': wave, 'rate': tts.rate},
            np.stack([centroids[s] for s in sorted(voices)]),
            labels = sorted(voices))
        path = os.path.join(out_dir, 'clone_{}.wav'.format(spk))
        write_audio(path, wave, rate = tts.rate)
        print('speaker %-5s: %d frames | MCD own %.2f dB vs other %.2f dB | '
              'encoder identifies: %s | %s'
              % (spk, len(mel), own, other, who, path))
        ok = ok and (own < other) and (who == spk)

    print('CLONE VERIFICATION:', 'PASS' if ok else 'FAIL')
    return {'separated': within > across, 'clone_ok': bool(ok)}


if __name__ == '__main__':
    enc_ep = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    tts_ep = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    out = sys.argv[3] if len(sys.argv) > 3 else None
    result = main(enc_ep, tts_ep, out)
    sys.exit(0 if result['clone_ok'] else 1)
