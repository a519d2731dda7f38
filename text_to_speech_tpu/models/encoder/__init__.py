from .speaker_encoder import SpeakerEncoder
