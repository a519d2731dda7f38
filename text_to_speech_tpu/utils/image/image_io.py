"""Image I/O + basic processing (PIL-backed).

Capability parity with ``/root/reference/utils/image/image_io.py``
(load/save/resize/normalize — base-project capability surface).
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)


def load_image(filename, *, size = None, dtype = 'float32', channels = 3,
               ** kwargs):
    """Load an image file (or pass through an array) → (H, W, C)."""
    if isinstance(filename, np.ndarray):
        image = filename
    else:
        from PIL import Image
        with Image.open(filename) as img:
            if channels == 1:
                img = img.convert('L')
            elif channels == 4:
                img = img.convert('RGBA')
            else:
                img = img.convert('RGB')
            image = np.asarray(img)
    if image.ndim == 2:
        image = image[..., None]
    if size is not None:
        image = resize_image(image, size)
    if dtype and np.dtype(dtype).kind == 'f' and image.dtype.kind in 'ui':
        image = image.astype(dtype) / 255.
    elif dtype:
        image = image.astype(dtype)
    return image


def save_image(filename, image, ** kwargs):
    from PIL import Image
    image = np.asarray(image)
    if image.dtype.kind == 'f':
        image = (np.clip(image, 0., 1.) * 255).astype(np.uint8)
    if image.ndim == 3 and image.shape[-1] == 1:
        image = image[..., 0]
    Image.fromarray(image).save(filename)
    return filename


def resize_image(image, size, *, method = 'bilinear', keep_aspect = False,
                 pad_value = 0):
    """Resize to `size` (h, w); with `keep_aspect`, letterbox-pad instead of
    stretching."""
    from PIL import Image
    image = np.asarray(image)
    squeeze = image.ndim == 3 and image.shape[-1] == 1
    arr = image[..., 0] if squeeze else image
    was_float = arr.dtype.kind == 'f'
    if was_float:
        arr = (np.clip(arr, 0., 1.) * 255).astype(np.uint8)

    h, w = size
    resample = {'nearest': Image.NEAREST, 'bilinear': Image.BILINEAR,
                'bicubic': Image.BICUBIC}[method]

    if keep_aspect:
        ih, iw = arr.shape[:2]
        scale = min(h / ih, w / iw)
        nh, nw = int(ih * scale), int(iw * scale)
        resized = np.asarray(Image.fromarray(arr).resize((nw, nh), resample))
        canvas_shape = (h, w) + arr.shape[2:]
        fill = int(round(pad_value * 255)) if was_float else pad_value
        canvas = np.full(canvas_shape, fill, dtype = resized.dtype)
        top, left = (h - nh) // 2, (w - nw) // 2
        canvas[top: top + nh, left: left + nw] = resized
        out = canvas
    else:
        out = np.asarray(Image.fromarray(arr).resize((w, h), resample))

    if was_float:
        out = out.astype(np.float32) / 255.
    if squeeze and out.ndim == 2:
        out = out[..., None]
    return out


def normalize_image(image, mode = '01'):
    image = np.asarray(image, np.float32)
    if image.max() > 1.5: image = image / 255.
    if mode == '01':
        return image
    if mode == 'centered':
        return image * 2. - 1.
    if mode == 'imagenet':
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        return (image - mean) / std
    raise ValueError('Unknown normalize mode: {}'.format(mode))
