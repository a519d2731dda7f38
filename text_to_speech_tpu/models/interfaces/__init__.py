from .base_model import BaseModel, reset_instances
from .base_text_model import BaseTextModel
from .base_audio_model import BaseAudioModel
