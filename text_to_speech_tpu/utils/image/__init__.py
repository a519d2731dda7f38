from .image_io import load_image, save_image, resize_image, normalize_image
from .boxes import (
    convert_boxes, box_iou, nms, combine_boxes, box_metrics, crop_box, BoxFormat,
)
