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


# ---------------------------------------------------------------------------
# locality-aware NMS + reading-order layout combination
# (reference surface: /root/reference/utils/image/bounding_box/
#  locality_aware_nms.py:27, combination.py:104-341, processing.py:20,
#  filters.py:22-241)
# ---------------------------------------------------------------------------


def lanms(boxes, scores = None, *, merge_threshold = 0.3,
          nms_threshold = 0.25, merge_method = 'union', max_iter = None):
    """Locality-aware NMS: iteratively merge mutually-overlapping boxes
    (IoU >= `merge_threshold`) into unions / score-weighted averages, then
    run standard NMS at `nms_threshold` on the merged set.

    Returns (merged_boxes, merged_scores, keep_mask).  With
    `merge_method='average'` the merged coordinates are the score-weighted
    mean of the contributing boxes (EAST-style); scores accumulate so a
    merged box outranks its parts in the final NMS.
    """
    boxes = np.atleast_2d(np.asarray(boxes, np.float32))
    n = len(boxes)
    if scores is None:
        scores = np.ones((n,), np.float32)
    scores = np.asarray(scores, np.float32).copy()
    if n == 0:
        return boxes, scores, np.zeros((0,), bool)
    if max_iter is None:
        max_iter = n

    alive = np.ones(n, bool)
    cur = boxes.copy()
    for _ in range(max_iter):
        iou = box_iou(cur, cur)
        np.fill_diagonal(iou, 0.)
        iou[~alive] = 0.
        iou[:, ~alive] = 0.
        pairs = np.argwhere(np.triu(iou, 1) >= merge_threshold)
        if len(pairs) == 0:
            break
        merged_this_round = np.zeros(n, bool)
        for i, j in pairs:
            if merged_this_round[i] or merged_this_round[j]:
                continue
            if merge_method == 'average':
                w = scores[i] + scores[j]
                cur[i] = (cur[i] * scores[i] + cur[j] * scores[j]) \
                    / max(w, 1e-9)
                scores[i] = w
            else:
                cur[i] = [min(cur[i, 0], cur[j, 0]), min(cur[i, 1], cur[j, 1]),
                          max(cur[i, 2], cur[j, 2]), max(cur[i, 3], cur[j, 3])]
                scores[i] = max(scores[i], scores[j])
            alive[j] = False
            merged_this_round[i] = merged_this_round[j] = True
    mask = alive.copy()
    if np.any(mask):
        idx = np.where(mask)[0]
        keep = nms(cur[idx], scores[idx], iou_threshold = nms_threshold)
        final = np.zeros(n, bool)
        final[idx[keep]] = True
        mask = final
    return cur, scores, mask


def sort_boxes(boxes, method = 'top', *, threshold = 0.5, columns = 10,
               scores = None, return_indices = False):
    """Sort (N, 4) xyxy boxes by a reading-order criterion.

    Methods: 'x'/'y' (top-left coordinate), 'corner' (x+y), 'center'
    (center x+y), 'area'/'w'/'h' (descending), 'score' (descending,
    `scores` required), 'left' (column bands), 'top' (row clustering with
    `threshold` height tolerance, then left→right inside a row — the
    natural text reading order).
    """
    boxes = np.atleast_2d(np.asarray(boxes, np.float32))
    n = len(boxes)
    if n == 0:
        return np.zeros((0,), np.int64) if return_indices else boxes
    x, y = boxes[:, 0], boxes[:, 1]
    w, h = boxes[:, 2] - x, boxes[:, 3] - y

    if method == 'x':
        indices = np.argsort(x)
    elif method == 'y':
        indices = np.argsort(y)
    elif method == 'w':
        indices = np.argsort(-w)
    elif method == 'h':
        indices = np.argsort(-h)
    elif method == 'area':
        indices = np.argsort(-(w * h))
    elif method == 'corner':
        indices = np.argsort(x + y)
    elif method == 'center':
        indices = np.argsort((x + w / 2.) + (y + h / 2.))
    elif method == 'score':
        if scores is None:
            raise ValueError("method='score' requires scores")
        indices = np.argsort(-np.asarray(scores))
    elif method == 'left':
        indices = np.argsort(np.round(x * columns) + y)
    elif method == 'top':
        yc = y + h / 2.
        same_row = np.abs(yc[None, :] - yc[:, None]) \
            <= h[:, None] * (threshold / 2.)
        same_row |= same_row.T
        indices, placed = [], np.zeros(n, bool)
        for idx in np.argsort(yc):
            if placed[idx]:
                continue
            row = np.where(same_row[idx] & ~placed)[0]
            indices.extend(row[np.argsort(x[row])])
            placed[row] = True
        indices = np.asarray(indices, np.int64)
    else:
        raise ValueError('Unsupported sorting criterion: {}'.format(method))
    return indices if return_indices else boxes[indices]


def union_box(boxes):
    """Union (enclosing box) of (N, 4) xyxy boxes."""
    boxes = np.atleast_2d(np.asarray(boxes, np.float32))
    return np.concatenate([boxes[:, :2].min(0), boxes[:, 2:].max(0)], 0)


def compute_groups(adjacency):
    """Connected components of a boolean (N, N) adjacency matrix →
    list of index lists (union-find)."""
    n = len(adjacency)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i, j in np.argwhere(np.triu(adjacency, 1)):
        parent[find(int(j))] = find(int(i))
    groups = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    return list(groups.values())


def group_boxes(boxes, groups, *, indices = None, sort = None):
    """Union each group of box indexes → (merged, group_indices, rows):
    `rows[i]` holds the member boxes of merged box i (sorted on coordinate
    `sort` if given), `group_indices[i]` their positions in `indices`."""
    if indices is None:
        indices = list(range(len(boxes)))
    merged, out_indices, rows = [], [], []
    for group in groups:
        if sort is not None and len(group) > 1:
            group = sorted(group, key = lambda i: boxes[i, sort])
        sub = boxes[group]
        merged.append(union_box(sub))
        out_indices.append([indices[i] for i in group])
        rows.append(sub)
    return np.asarray(merged, np.float32), out_indices, rows


def combine_boxes_horizontal(boxes, *, indices = None, h_factor = 1.5,
                             x_threshold = None, y_overlap_threshold = 0.55):
    """Merge word boxes into lines: combine boxes whose horizontal gap is
    below `x_threshold` (default: median height × `h_factor`, the width of
    a typical space) AND whose vertical overlap exceeds
    `y_overlap_threshold` of the taller box (same text line)."""
    boxes = np.atleast_2d(np.asarray(boxes, np.float32))
    if indices is None:
        indices = list(range(len(boxes)))
    if len(boxes) <= 1:
        return boxes, [indices], [boxes]

    h = boxes[:, 3] - boxes[:, 1]
    if x_threshold is None:
        x_threshold = np.median(h) * h_factor
    # symmetric interval gap (0 when overlapping) — adjacency must not
    # depend on input index order since compute_groups reads the triangle
    gap = np.maximum(0., np.maximum(
        boxes[None, :, 0] - boxes[:, None, 2],
        boxes[:, None, 0] - boxes[None, :, 2]))
    overlap_y = np.maximum(0., (
        np.minimum(boxes[:, None, 3], boxes[None, :, 3])
        - np.maximum(boxes[:, None, 1], boxes[None, :, 1])))
    max_h = np.maximum(h[:, None], h[None, :])
    adj = (gap <= x_threshold) \
        & (overlap_y / np.maximum(max_h, 1e-9) >= y_overlap_threshold)
    return group_boxes(boxes, compute_groups(adj),
                       indices = indices, sort = 0)


def combine_boxes_vertical(boxes, *, indices = None, y_threshold = None,
                           h_threshold = 0.02, x_overlap_threshold = 0.,
                           shift_factor = 0.5):
    """Merge line boxes into paragraphs: combine boxes whose vertical gap
    is below `y_threshold` (default: median height / 4), whose heights
    differ by less than `h_threshold`, and whose left parts overlap
    horizontally (`shift_factor` trims the right side first, so
    left-aligned lines of different lengths still group)."""
    boxes = np.atleast_2d(np.asarray(boxes, np.float32))
    if indices is None:
        indices = list(range(len(boxes)))
    if len(boxes) <= 1:
        return boxes, [indices], [boxes]

    h = boxes[:, 3] - boxes[:, 1]
    if y_threshold is None:
        y_threshold = max(np.median(h) / 4., 1e-2)
    h_diff = np.abs(h[:, None] - h[None, :])
    # symmetric vertical gap (0 when overlapping), order-independent
    gap = np.maximum(0., np.maximum(
        boxes[None, :, 1] - boxes[:, None, 3],
        boxes[:, None, 1] - boxes[None, :, 3]))

    shifted_w = (boxes[:, 2] - boxes[:, 0]) * shift_factor
    shifted_x_max = boxes[:, 2] - shifted_w
    overlap_x = (np.minimum(shifted_x_max[:, None], shifted_x_max[None, :])
                 - np.maximum(boxes[:, None, 0], boxes[None, :, 0]))
    if x_overlap_threshold == 0.:
        x_mask = overlap_x > 0.
    else:
        x_mask = overlap_x / np.maximum(
            np.minimum(shifted_w[:, None], shifted_w[None, :]), 1e-9) \
            > x_overlap_threshold

    adj = (gap <= y_threshold) & (h_diff <= h_threshold) & x_mask
    return group_boxes(boxes, compute_groups(adj),
                       indices = indices, sort = 1)


def combine_boxes_layout(boxes, *, indices = None, ** kwargs):
    """Words → lines → paragraphs: `combine_boxes_horizontal` then
    `combine_boxes_vertical` on the line unions.  Returns (paragraph_boxes,
    nested original indices, rows-per-paragraph)."""
    h_kw = {k: v for k, v in kwargs.items()
            if k in ('h_factor', 'x_threshold', 'y_overlap_threshold')}
    v_kw = {k: v for k, v in kwargs.items()
            if k in ('y_threshold', 'h_threshold', 'x_overlap_threshold',
                     'shift_factor')}
    lines, line_idx, _ = combine_boxes_horizontal(
        boxes, indices = indices, ** h_kw)
    paras, para_groups, para_rows = combine_boxes_vertical(lines, ** v_kw)
    nested = [[line_idx[i] for i in (g if isinstance(g, list) else [g])]
              for g in para_groups]
    return paras, nested, para_rows


# -- box filtering strategies ------------------------------------------------


class BoxFilter:
    """Filtering strategy: `filter()` returns a bool mask / index list of
    boxes to keep; `start()`/`finish()` bracket each frame (for stateful
    filters over a stream)."""

    def __call__(self, boxes, ** kwargs):
        self.start()
        res = self.filter(boxes = boxes, ** kwargs)
        self.finish()
        if isinstance(res, np.ndarray) and res.dtype == bool:
            res = np.where(res)[0]
        return res

    def start(self):
        pass

    def finish(self):
        pass

    def filter(self, boxes, ** kwargs):
        raise NotImplementedError()


class SizeFilter(BoxFilter):
    """Keep boxes within [min, max) bounds on height / width / area."""

    def __init__(self, min_h = None, max_h = None, min_w = None,
                 max_w = None, min_area = None, max_area = None, ** _):
        self.bounds = {'h': (min_h, max_h), 'w': (min_w, max_w),
                       'area': (min_area, max_area)}

    def filter(self, boxes, ** _):
        boxes = np.atleast_2d(np.asarray(boxes, np.float32))
        h = boxes[:, 3] - boxes[:, 1]
        w = boxes[:, 2] - boxes[:, 0]
        vals = {'h': h, 'w': w, 'area': h * w}
        keep = np.ones(len(boxes), bool)
        for key, (lo, hi) in self.bounds.items():
            if lo is not None:
                keep &= vals[key] >= lo
            if hi is not None:
                keep &= vals[key] < hi
        return keep


class RegionFilter(BoxFilter):
    """Keep boxes overlapping (or centered in) a region [x0, y0, x1, y1]."""

    def __init__(self, region, mode = 'overlap', ** _):
        self.mode = mode
        self.x0, self.y0, self.x1, self.y1 = np.asarray(region, np.float32)

    def filter(self, boxes, ** _):
        boxes = np.atleast_2d(np.asarray(boxes, np.float32))
        if self.mode == 'overlap':
            return ((boxes[:, 0] < self.x1) & (boxes[:, 2] > self.x0)
                    & (boxes[:, 1] < self.y1) & (boxes[:, 3] > self.y0))
        if self.mode == 'center':
            c = (boxes[:, :2] + boxes[:, 2:]) / 2.
            return ((self.x0 <= c[:, 0]) & (c[:, 0] <= self.x1)
                    & (self.y0 <= c[:, 1]) & (c[:, 1] <= self.y1))
        raise ValueError('Unknown region filter mode: {}'.format(self.mode))


class RepetitionFilter(BoxFilter):
    """Keep boxes seen at (roughly) the same position in `n_repeat`
    frames of a stream — rejects one-frame detector flickers.  Boxes
    unseen for `max_unseen` frames are dropped from the wait list; with
    `use_memory`, positions already emitted once are filtered out."""

    def __init__(self, iou_threshold = 0.5, n_repeat = 2, max_unseen = 3,
                 use_memory = False, ** _):
        self.iou_threshold = iou_threshold
        self.n_repeat = n_repeat
        self.max_unseen = max_unseen
        self.use_memory = use_memory
        self.waiting = []       # [box, repetition, unseen, updated]
        self.memory = []

    def __len__(self):
        return len(self.waiting)

    def clear(self):
        self.waiting = []

    def start(self):
        for item in self.waiting:
            item[3] = False

    def finish(self):
        for item in self.waiting:
            item[2] = 0 if item[3] else item[2] + 1
        self.waiting = [it for it in self.waiting
                        if it[2] <= self.max_unseen]

    def _match(self, pool, box):
        for item in pool:
            if box_iou(box[None], item[0][None])[0, 0] > self.iou_threshold:
                return item
        return None

    def filter(self, boxes, ** _):
        boxes = np.atleast_2d(np.asarray(boxes, np.float32))
        keep = np.zeros(len(boxes), bool)
        for i, box in enumerate(boxes):
            if self.use_memory and self._match(self.memory, box) is not None:
                continue
            item = self._match(self.waiting, box)
            if item is None:
                self.waiting.append([box, 1, 0, True])
                keep[i] = self.n_repeat <= 1
                continue
            item[0], item[1], item[3] = box, item[1] + 1, True
            if item[1] >= self.n_repeat:
                self.waiting.remove(item)
                if self.use_memory:
                    self.memory.append(item)
                keep[i] = True
        return keep


def filter_boxes(filters, boxes, *, indices = None, rows = None, ** kwargs):
    """Apply `filters` sequentially; a box survives if every filter keeps
    it.  Returns (boxes, indices, rows) restricted to the survivors."""
    if callable(filters):
        filters = [filters]
    boxes = np.atleast_2d(np.asarray(boxes, np.float32))
    if indices is None:
        indices = list(range(len(boxes)))
    for f in filters:
        if len(boxes) == 0:
            break
        keep = f(boxes = boxes, indices = indices, rows = rows, ** kwargs)
        keep = list(keep)
        if len(keep) < len(boxes):
            boxes = boxes[keep]
            indices = [indices[i] for i in keep]
            if rows is not None:
                rows = [rows[i] for i in keep]
    return boxes, indices, rows
