"""Bounding-box utilities.

Capability parity with ``/root/reference/utils/image/`` box modules
(format converters, combination, NMS, IoU metrics — base-project capability
surface, vectorized numpy).
"""

import numpy as np


class BoxFormat:
    XYXY = 'xyxy'          # x_min, y_min, x_max, y_max
    XYWH = 'xywh'          # x_min, y_min, width, height
    CXCYWH = 'cxcywh'      # center_x, center_y, width, height


def convert_boxes(boxes, source, target):
    """Convert (N, 4) boxes between formats."""
    boxes = np.atleast_2d(np.asarray(boxes, np.float32))
    if source == target: return boxes

    # normalize to xyxy first
    if source == BoxFormat.XYWH:
        xyxy = np.concatenate([boxes[:, :2], boxes[:, :2] + boxes[:, 2:]], 1)
    elif source == BoxFormat.CXCYWH:
        half = boxes[:, 2:] / 2.
        xyxy = np.concatenate([boxes[:, :2] - half, boxes[:, :2] + half], 1)
    elif source == BoxFormat.XYXY:
        xyxy = boxes
    else:
        raise ValueError('Unknown box format: {}'.format(source))

    if target == BoxFormat.XYXY:
        return xyxy
    if target == BoxFormat.XYWH:
        return np.concatenate([xyxy[:, :2], xyxy[:, 2:] - xyxy[:, :2]], 1)
    if target == BoxFormat.CXCYWH:
        wh = xyxy[:, 2:] - xyxy[:, :2]
        return np.concatenate([xyxy[:, :2] + wh / 2., wh], 1)
    raise ValueError('Unknown box format: {}'.format(target))


def box_area(boxes):
    boxes = np.atleast_2d(boxes)
    return np.maximum(0., boxes[:, 2] - boxes[:, 0]) \
        * np.maximum(0., boxes[:, 3] - boxes[:, 1])


def box_iou(boxes1, boxes2):
    """Pairwise IoU: (N, 4) x (M, 4) xyxy → (N, M)."""
    boxes1 = np.atleast_2d(np.asarray(boxes1, np.float32))
    boxes2 = np.atleast_2d(np.asarray(boxes2, np.float32))
    lt = np.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = np.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = np.maximum(0., rb - lt)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1)[:, None] + box_area(boxes2)[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def nms(boxes, scores, *, iou_threshold = 0.5, max_output = None):
    """Greedy non-maximum suppression → kept indices (descending score)."""
    boxes = np.atleast_2d(np.asarray(boxes, np.float32))
    scores = np.asarray(scores, np.float32)
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for idx in order:
        if suppressed[idx]: continue
        keep.append(int(idx))
        if max_output and len(keep) >= max_output: break
        ious = box_iou(boxes[idx: idx + 1], boxes)[0]
        suppressed |= ious > iou_threshold
    return np.asarray(keep, np.int64)


def combine_boxes(boxes, *, iou_threshold = 0.5):
    """Merge overlapping boxes into their unions (locality-aware NMS-style
    aggregation): returns (merged_boxes, groups)."""
    boxes = np.atleast_2d(np.asarray(boxes, np.float32))
    n = len(boxes)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    ious = box_iou(boxes, boxes)
    for i in range(n):
        for j in range(i + 1, n):
            if ious[i, j] > iou_threshold:
                parent[find(j)] = find(i)

    groups = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)

    merged = []
    group_list = []
    for members in groups.values():
        sub = boxes[members]
        merged.append([sub[:, 0].min(), sub[:, 1].min(),
                       sub[:, 2].max(), sub[:, 3].max()])
        group_list.append(members)
    return np.asarray(merged, np.float32), group_list


def box_metrics(true_boxes, pred_boxes, *, iou_threshold = 0.5):
    """Detection precision/recall/F1 by greedy IoU matching."""
    true_boxes = np.atleast_2d(np.asarray(true_boxes, np.float32))
    pred_boxes = np.atleast_2d(np.asarray(pred_boxes, np.float32))
    if len(true_boxes) == 0 or len(pred_boxes) == 0:
        tp = 0
    else:
        ious = box_iou(pred_boxes, true_boxes)
        matched_true = set()
        tp = 0
        for p in range(len(pred_boxes)):
            best = -1
            best_iou = iou_threshold
            for t in range(len(true_boxes)):
                if t in matched_true: continue
                if ious[p, t] >= best_iou:
                    best, best_iou = t, ious[p, t]
            if best >= 0:
                matched_true.add(best)
                tp += 1
    precision = tp / max(len(pred_boxes), 1)
    recall = tp / max(len(true_boxes), 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return {'precision': precision, 'recall': recall, 'f1': f1, 'tp': tp}


def crop_box(image, box, *, format = BoxFormat.XYXY):
    """Crop a box region from an image (clipped to bounds)."""
    image = np.asarray(image)
    xyxy = convert_boxes(box, format, BoxFormat.XYXY)[0]
    h, w = image.shape[:2]
    x0, y0, x1, y1 = (int(np.clip(v, 0, lim))
                      for v, lim in zip(xyxy, (w, h, w, h)))
    return image[y0:y1, x0:x1]
