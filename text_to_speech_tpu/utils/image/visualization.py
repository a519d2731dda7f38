"""Box rasterization / display on images.

Capability parity with
``/root/reference/utils/image/bounding_box/visualization.py``
(`draw_boxes:24` — rectangle/circle/ellipse shapes, per-label colors,
score text; `show_boxes:110` — per-box crops via the plot stack).
Rendering uses cv2 when present and a pure-numpy rectangle painter
otherwise, so the capability never depends on OpenCV.
"""

import numpy as np

from .boxes import BoxFormat, convert_boxes, crop_box

#: default color cycle (RGB, 0-255)
BASE_COLORS = [
    (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
    (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
]


def _as_uint8(image):
    image = np.asarray(image)
    if image.dtype != np.uint8:
        scale = 255. if image.max() <= 1.5 else 1.
        image = np.clip(image * scale, 0, 255).astype(np.uint8)
    if image.ndim == 2:
        image = np.stack([image] * 3, axis = -1)
    return np.ascontiguousarray(image)


def _absolute_xyxy(boxes, shape, source):
    boxes = convert_boxes(boxes, source, BoxFormat.XYXY)
    if boxes.size and boxes.max() <= 1.5:          # relative coordinates
        h, w = shape[:2]
        boxes = boxes * np.array([w, h, w, h], np.float32)
    return boxes.astype(np.int32)


def _paint_rectangle(image, x1, y1, x2, y2, color, thickness):
    """numpy fallback: paint a `thickness`-px rectangle border in place."""
    h, w = image.shape[:2]
    x1, x2 = max(0, x1), min(w, x2)
    y1, y2 = max(0, y1), min(h, y2)
    t = thickness
    image[y1:min(y1 + t, h), x1:x2] = color
    image[max(y2 - t, 0):y2, x1:x2] = color
    image[y1:y2, x1:min(x1 + t, w)] = color
    image[y1:y2, max(x2 - t, 0):x2] = color


def draw_boxes(image,
               boxes,
               *,
               source = BoxFormat.XYXY,
               labels = None,
               scores = None,
               show_text = True,
               shape = 'rectangle',
               color = None,
               thickness = 3,
               ** _):
    """Rasterize `boxes` onto a copy of `image` (uint8 RGB returned).

    Boxes sharing a label share a color; with `show_text` (and cv2
    available) each box gets a `label (score %)` banner.
    `shape`: 'rectangle' | 'circle' | 'ellipse' (circle/ellipse need cv2).
    """
    if isinstance(image, str):
        from .image_io import load_image
        image = load_image(image)
    image = _as_uint8(image).copy()
    boxes = _absolute_xyxy(boxes, image.shape, source)

    colors = color if isinstance(color, list) else ([color] if color else BASE_COLORS)
    try:
        import cv2
    except ImportError:
        cv2 = None

    label_color = {}
    for i, (x1, y1, x2, y2) in enumerate(boxes.tolist()):
        if x2 <= x1 or y2 <= y1:
            continue
        if labels is None:
            c = colors[i % len(colors)]
            text = None
        else:
            label = labels[i] if i < len(labels) else labels[0]
            label_color.setdefault(label, colors[len(label_color) % len(colors)])
            c = label_color[label]
            text = str(label)
            if scores is not None:
                text += ' ({:.1f} %)'.format(100 * float(scores[i]))

        if cv2 is None or shape == 'rectangle' and not (show_text and text):
            _paint_rectangle(image, x1, y1, x2, y2, c, thickness)
            continue

        if shape == 'rectangle':
            cv2.rectangle(image, (x1, y1), (x2, y2), c, thickness)
        elif shape == 'circle':
            r = min(x2 - x1, y2 - y1) // 2
            cv2.circle(image, ((x1 + x2) // 2, (y1 + y2) // 2), r, c, thickness)
        elif shape == 'ellipse':
            cv2.ellipse(image, ((x1 + x2) // 2, (y1 + y2) // 2),
                        ((x2 - x1) // 2, int((y2 - y1) / 1.5)),
                        0, 0, 360, c, thickness)
        else:
            raise ValueError('Unsupported shape {!r}'.format(shape))

        if show_text and text:
            font_scale = max(3e-1, 1e-3 * image.shape[0])
            (tw, th), baseline = cv2.getTextSize(
                text, cv2.FONT_HERSHEY_SIMPLEX, font_scale, 1)
            y0 = max(th + baseline, y1)
            cv2.rectangle(image, (x1, y0 - th - baseline), (x1 + tw, y0), c, -1)
            text_color = (255, 255, 255) if sum(c) / 3 < 110 else (0, 0, 0)
            cv2.putText(image, text, (x1, y0 - baseline // 2),
                        cv2.FONT_HERSHEY_SIMPLEX, font_scale, text_color, 1)
    return image


def show_boxes(image, boxes, *, source = BoxFormat.XYXY, labels = None,
               ncols = 4, ** kwargs):
    """Crop each box out of `image` and plot the crops side by side.
    → the list of crops (so the function is useful headless too)."""
    if isinstance(image, str):
        from .image_io import load_image
        image = load_image(image)
    image = np.asarray(image)
    abs_boxes = _absolute_xyxy(boxes, image.shape, source)

    crops = [crop_box(image, box) for box in abs_boxes]
    crops = [c for c in crops if c.size]
    try:
        from ..plot_utils import plot_multiple
        titles = ['box {}'.format(labels[i] if labels is not None else i)
                  for i in range(len(crops))]
        plot_multiple(* crops, ncols = ncols, titles = titles, ** kwargs)
    except Exception:       # headless / matplotlib missing — crops still returned
        pass
    return crops
