"""Image-capable model mixin.

Capability parity with ``/root/reference/models/interfaces/base_image_model.py:22``
(present from the base project; off the TTS critical path): image loading /
resize config, signatures, persistence hooks.
"""

import numpy as np


class BaseImageModel:
    def _init_image(self, input_size = None, image_channels = 3,
                    image_normalize = '01', resize_method = 'bilinear',
                    keep_aspect = False, ** kwargs):
        if isinstance(input_size, int):
            input_size = (input_size, input_size)
        self.input_size = tuple(input_size) if input_size else None
        self.image_channels = image_channels
        self.image_normalize = image_normalize
        self.resize_method = resize_method
        self.keep_aspect = keep_aspect

    def get_image(self, data, ** kwargs):
        """Load + resize + normalize an image (filename / array / row dict)."""
        from ...utils.image import load_image, normalize_image
        if isinstance(data, dict):
            data = data.get('image', data.get('filename'))
        image = load_image(
            data, size = self.input_size, channels = self.image_channels,
            method = kwargs.pop('method', self.resize_method),
            keep_aspect = kwargs.pop('keep_aspect', self.keep_aspect), ** kwargs,
        )
        return normalize_image(image, self.image_normalize)

    def get_image_batch(self, rows, ** kwargs):
        return np.stack([self.get_image(r, ** kwargs) for r in rows])

    def get_config_image(self):
        return {
            'input_size': self.input_size,
            'image_channels': self.image_channels,
            'image_normalize': self.image_normalize,
            'resize_method': self.resize_method,
            'keep_aspect': self.keep_aspect,
        }

    def _str_image(self):
        return '- image size : {}\n- channels : {}\n'.format(
            self.input_size, self.image_channels)
