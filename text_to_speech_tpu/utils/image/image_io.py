"""Image I/O + basic processing (PIL-backed).

Capability parity with ``/root/reference/utils/image/image_io.py``
(load/save/resize, gif/sprite building :463,:503, uint8 conversion :139)
and ``image_processing.py`` (pad :83, output-size inference :140,
rotation :197) and ``image_normalization.py`` (scheme registry :62).
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


def get_image_size(image):
    """(h, w) of a filename, array, or (PIL) image object."""
    if isinstance(image, str):
        from PIL import Image
        with Image.open(image) as img:
            return img.height, img.width
    if hasattr(image, 'size') and hasattr(image, 'height'):
        return image.height, image.width
    shape = np.shape(image)
    if len(shape) == 4: return shape[1], shape[2]
    return shape[0], shape[1]


def convert_to_uint8(image, ** _):
    image = np.asarray(image)
    if image.dtype == np.uint8: return image
    if image.dtype.kind == 'f':
        if image.max() <= 1.5: image = image * 255.
        return np.clip(image, 0, 255).astype(np.uint8)
    return np.clip(image, 0, 255).astype(np.uint8)


def pad_image(image, size, pad_mode = 'after', pad_value = 0):
    """Pad (..., H, W, C) up to `size` = (h, w).  `pad_mode` is one of
    'after', 'before', 'even', 'repeat_last'."""
    image = np.asarray(image)
    pad_h = max(0, size[0] - image.shape[-3])
    pad_w = max(0, size[1] - image.shape[-2])
    if pad_h == 0 and pad_w == 0:
        return image
    if pad_mode == 'repeat_last':
        if pad_w > 0:
            image = np.concatenate(
                [image, np.repeat(image[..., -1:, :], pad_w, axis = -2)],
                axis = -2)
        if pad_h > 0:
            image = np.concatenate(
                [image, np.repeat(image[..., -1:, :, :], pad_h, axis = -3)],
                axis = -3)
        return image
    if pad_mode == 'before':
        padding = [(pad_h, 0), (pad_w, 0), (0, 0)]
    elif pad_mode == 'after':
        padding = [(0, pad_h), (0, pad_w), (0, 0)]
    elif pad_mode == 'even':
        half_h, half_w = pad_h // 2, pad_w // 2
        padding = [(half_h, pad_h - half_h), (half_w, pad_w - half_w), (0, 0)]
    else:
        raise ValueError('Unknown pad_mode: {}'.format(pad_mode))
    padding = [(0, 0)] * (image.ndim - 3) + padding
    return np.pad(image, padding, constant_values = pad_value)


def get_output_size(image, size = None, *, multiples = None, round = False,
                    preserve_aspect_ratio = False):
    """Output (h, w) after resize: `-1`/`None` entries inherit from the
    image (scaled when `preserve_aspect_ratio`); with `multiples`, free
    dims round up (or to nearest with `round = True`) to a multiple."""
    img_size = np.asarray(get_image_size(image), np.int64)
    if isinstance(size, tuple):
        fixed = [s is not None and s > 0 for s in size]
        if all(fixed) and multiples is None: return tuple(size)
        size = tuple((s if f else -1) for s, f in zip(size, fixed))
        if size == (-1, -1): size = None
    if size is None:
        out = img_size.copy()
        size_arr = None
    else:
        size_arr = np.asarray(size, np.int64)
        out = size_arr.copy()
    if np.any(out == -1):
        if not preserve_aspect_ratio:
            out = np.where(out != -1, out, img_size)
        else:
            ratio = np.max(out / img_size)
            out = (img_size * ratio).astype(np.int64)
    if multiples is not None:
        multiples = np.asarray(multiples, np.int64)
        if round:
            snapped = (np.round(out / multiples) * multiples).astype(np.int64)
        else:
            snapped = (out // multiples + 1) * multiples
        out = np.where(out % multiples != 0, snapped, out)
    if size_arr is not None:
        out = np.where(size_arr != -1, size_arr, out)
    return int(out[0]), int(out[1])


def rotate_image(image, angle, *, fill_value = 0, expand = False,
                 method = 'bilinear'):
    """Rotate by `angle` degrees counter-clockwise around the center."""
    from PIL import Image
    image = np.asarray(image)
    squeeze = image.ndim == 3 and image.shape[-1] == 1
    arr = image[..., 0] if squeeze else image
    was_float = arr.dtype.kind == 'f'
    if was_float:
        arr = (np.clip(arr, 0., 1.) * 255).astype(np.uint8)
    resample = {'nearest': Image.NEAREST, 'bilinear': Image.BILINEAR,
                'bicubic': Image.BICUBIC}[method]
    fill = int(round(fill_value * 255)) if was_float else int(fill_value)
    if arr.ndim == 3:
        fill = (fill,) * arr.shape[-1]
    out = np.asarray(Image.fromarray(arr).rotate(
        angle, resample = resample, expand = expand, fillcolor = fill))
    if was_float:
        out = out.astype(np.float32) / 255.
    if squeeze and out.ndim == 2:
        out = out[..., None]
    return out


_NORMALIZATION_FNS = {}


def register_normalization(name):
    def deco(fn):
        _NORMALIZATION_FNS[name] = fn
        return fn
    return deco


@register_normalization('01')
def _normalize_01(image):
    image = np.asarray(image, np.float32)
    if image.max() > 1.5: image = image / 255.
    return image


@register_normalization('centered')
def _normalize_centered(image):
    return _normalize_01(image) * 2. - 1.


def build_mean_normalize(means, std):
    means = np.asarray(means, np.float32)
    std = np.asarray(std, np.float32)

    def normalize(image):
        return (np.asarray(image, np.float32) - means) / std
    return normalize


_NORMALIZATION_FNS['imagenet'] = _NORMALIZATION_FNS['vgg'] = lambda image: (
    build_mean_normalize([0.485, 0.456, 0.406],
                         [0.229, 0.224, 0.225])(_normalize_01(image)))
_NORMALIZATION_FNS['east'] = lambda image: (
    build_mean_normalize([0.5, 0.5, 0.5], [1., 1., 1.])(_normalize_01(image)))
_NORMALIZATION_FNS['identity'] = lambda image: np.asarray(image, np.float32)

# remaining reference scheme set (image_normalization.py:47-59)
_NORMALIZATION_FNS['normal'] = lambda image: (
    lambda x: (x - x.mean()) / max(float(x.std()), 1e-12))(
        np.asarray(image, np.float32))
_NORMALIZATION_FNS['tanh'] = lambda image: _normalize_01(image) * 2. - 1.
_NORMALIZATION_FNS['mobilenet'] = lambda image: (
    np.asarray(image, np.float32) / 127.5 - 1.)
_NORMALIZATION_FNS['clip'] = lambda image: (
    build_mean_normalize([0.48145466, 0.4578275, 0.40821073],
                         [0.26862954, 0.26130258, 0.27577711])(
        _normalize_01(image)))
_NORMALIZATION_FNS['easyocr'] = lambda image: (
    build_mean_normalize(0.5, 0.5)(_normalize_01(image)))
_NORMALIZATION_FNS['vggface'] = lambda image: (
    np.asarray(image, np.float32)[..., ::-1]
    - np.asarray([91.4953, 103.8827, 131.0912], np.float32))


def get_image_normalization_fn(method):
    """Resolve a normalization scheme: a name from the registry, a callable
    (pass-through), a ``(means, std)`` tuple/list, or a
    ``{'means':..., 'std':...}`` dict (the reference's dispatch surface,
    ``image_normalization.py:62``)."""
    if callable(method): return method
    if method is None: return _NORMALIZATION_FNS['identity']
    if isinstance(method, dict):
        return build_mean_normalize(** method)
    if isinstance(method, (list, tuple)):
        return build_mean_normalize(* method)
    if method not in _NORMALIZATION_FNS:
        raise ValueError('Unknown normalization {!r} (known: {})'.format(
            method, sorted(_NORMALIZATION_FNS)))
    return _NORMALIZATION_FNS[method]


def normalize_image(image, mode = '01'):
    return get_image_normalization_fn(mode)(image)
