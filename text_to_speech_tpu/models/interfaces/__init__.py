from .base_model import BaseModel, reset_instances
from .base_text_model import BaseTextModel
from .base_audio_model import BaseAudioModel
from .base_image_model import BaseImageModel
from .base_classification_model import BaseClassificationModel
