from .image_io import (
    load_image, save_image, resize_image, normalize_image, get_image_size,
    convert_to_uint8, pad_image, get_output_size, rotate_image,
    build_mean_normalize, get_image_normalization_fn, register_normalization,
)
from .boxes import (
    convert_boxes, box_iou, nms, combine_boxes, box_metrics, crop_box,
    BoxFormat, lanms, sort_boxes, union_box, compute_groups, group_boxes,
    combine_boxes_horizontal, combine_boxes_vertical, combine_boxes_layout,
    filter_boxes, BoxFilter, SizeFilter, RegionFilter, RepetitionFilter,
)
from .visualization import draw_boxes, show_boxes
from .video import (
    FFMPEGReader, FFMPEGWriter, OpenCVWriter, VideoWriter, HTTPScreenMirror,
    probe_video, get_video_info, set_video_audio, frame_generator,
    stream_camera, build_gif, build_sprite,
)
