"""Compute ops: STFT/mel front-end (XLA), host DSP, audio I/O."""

from .stft import (
    STFT, MelSTFT, TacotronSTFT, WhisperSTFT, mel_filterbank, hann_window,
    hz_to_mel, mel_to_hz,
)
from .audio_processing import (
    resample_audio, normalize_audio, convert_audio_dtype, trim_silence,
    remove_silence, reduce_noise,
)
from .audio_io import (
    read_audio, write_audio, load_audio, load_mel, play_audio, display_audio,
    record_audio,
)
