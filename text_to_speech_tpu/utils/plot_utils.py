"""Plotting helpers (matplotlib, Agg backend).

Capability parity with ``/root/reference/utils/plot_utils.py``
(`plot:177`, `plot_multiple:486`, `plot_audio:711`, `plot_spectrogram:740`,
`plot_boxes:785`, `plot_polygons:763`, `plot_confusion_matrix:798`,
`plot_matrix:826`, `plot_classification:889`, `plot_embedding:918`,
`plot_volume:990` — attention/mel visualization, `History.plot`, detector
overlays, classifier reports).
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)


def _plt():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    return plt


def plot(data,
         *,
         x = None,
         title = None,
         xlabel = None,
         ylabel = None,
         legend = None,
         figsize = (8, 5),
         filename = None,
         show = False,
         plot_type = 'line',
         color = None,
         xlim = None,
         ylim = None,
         logscale = False,
         xlogscale = False,
         with_grid = False,
         gridstyle = ':',
         hlines = None,
         vlines = None,
         xtick_labels = None,
         ytick_labels = None,
         tick_rotation = 0,
         linewidth = None,
         linestyle = None,
         ax = None,
         date_format = '%H:%M:%S',
         plot_3d = False,
         xtick_pos = None,
         ytick_pos = None,
         ytick_rotation = 0,
         ** kwargs
        ):
    """Plot 1-D series (or dict of named series) / 2-D images.

    Overlay/axis options mirror the reference surface
    (``/root/reference/utils/plot_utils.py:177``): `hlines`/`vlines` draw
    reference lines (scalar or list), `logscale`/`xlogscale` switch axes
    to log, `with_grid`+`gridstyle` toggles the grid, `xtick_labels`/
    `ytick_labels` relabel ticks (at `xtick_pos`/`ytick_pos` when given,
    rotated by `tick_rotation`/`ytick_rotation`); `ax` composes into an
    existing axes instead of a new figure; datetime `x` values format
    through `date_format` (the reference's date-axis behavior); `plot_3d`
    renders an (N, 3) point cloud / z-series on a 3-D projection.
    """
    import datetime as _dt
    plt = _plt()
    caller_ax = ax is not None
    if ax is not None:
        fig = ax.figure
    elif plot_3d:
        from mpl_toolkits.mplot3d import Axes3D      # noqa: F401
        fig = plt.figure(figsize = figsize)
        ax = fig.add_subplot(projection = '3d')
    else:
        fig, ax = plt.subplots(figsize = figsize)

    is_dates = (x is not None and len(np.atleast_1d(x))
                and isinstance(np.atleast_1d(np.asarray(x, object))[0],
                               (_dt.datetime, _dt.date, np.datetime64)))

    if plot_3d and not isinstance(data, dict):
        pts = np.asarray(data)
        if pts.ndim == 2 and pts.shape[1] == 3:      # (N, 3) point cloud
            if plot_type == 'scatter':
                ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], color = color)
            else:
                ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], color = color)
        else:                                        # z-series over a grid
            z = np.atleast_2d(pts)
            xs, ys = np.meshgrid(np.arange(z.shape[1]),
                                 np.arange(z.shape[0]))
            ax.plot_surface(xs, ys, z, ** kwargs)
        if title: ax.set_title(title)
        if xlabel: ax.set_xlabel(xlabel)
        if ylabel: ax.set_ylabel(ylabel)
        if caller_ax and filename is None and not show:
            return fig              # composed into a caller-owned figure
        return _finalize(fig, filename, show)

    line_kw = {}
    if linewidth is not None: line_kw['linewidth'] = linewidth
    if linestyle is not None: line_kw['linestyle'] = linestyle

    if isinstance(data, dict):
        for name, series in data.items():
            series = np.asarray(series)
            xs = x if x is not None else np.arange(len(series))
            if plot_type == 'scatter':
                ax.scatter(xs, series, label = str(name))
            else:
                ax.plot(xs, series, label = str(name), ** line_kw)
        ax.legend()
    else:
        data = np.asarray(data)
        if data.ndim == 2 and plot_type != 'line':
            im = ax.imshow(data, aspect = 'auto', origin = 'lower', ** kwargs)
            fig.colorbar(im, ax = ax)
        elif plot_type == 'scatter':
            ax.scatter(x if x is not None else np.arange(len(data)), data,
                       color = color)
        elif plot_type == 'hist':
            ax.hist(data, color = color, ** kwargs)
        elif plot_type == 'bar':
            xs = x if x is not None else np.arange(len(data))
            ax.bar(xs, data, color = color)
        else:
            xs = x if x is not None else np.arange(len(np.atleast_1d(data)))
            ax.plot(xs, data, color = color, ** line_kw)
            if legend: ax.legend([legend])

    for val in _as_seq(hlines):
        ax.axhline(val, color = 'gray', linestyle = '--', linewidth = 1.)
    for val in _as_seq(vlines):
        ax.axvline(val, color = 'gray', linestyle = '--', linewidth = 1.)
    if logscale: ax.set_yscale('log')
    if xlogscale: ax.set_xscale('log')
    if with_grid: ax.grid(True, linestyle = gridstyle, alpha = 0.6)
    if xlim: ax.set_xlim(* xlim)
    if ylim: ax.set_ylim(* ylim)
    if xtick_labels is not None:
        ax.set_xticks(np.asarray(xtick_pos) if xtick_pos is not None
                      else np.arange(len(xtick_labels)))
        ax.set_xticklabels([str(l) for l in xtick_labels],
                           rotation = tick_rotation)
    if ytick_labels is not None:
        ax.set_yticks(np.asarray(ytick_pos) if ytick_pos is not None
                      else np.arange(len(ytick_labels)))
        ax.set_yticklabels([str(l) for l in ytick_labels],
                           rotation = ytick_rotation)
    if is_dates:
        import matplotlib.dates as mdates
        ax.xaxis.set_major_formatter(mdates.DateFormatter(date_format))
        fig.autofmt_xdate()
    if title: ax.set_title(title)
    if xlabel: ax.set_xlabel(xlabel)
    if ylabel: ax.set_ylabel(ylabel)
    if caller_ax and filename is None and not show:
        return fig                  # composed into a caller-owned figure
    return _finalize(fig, filename, show)


def _as_seq(v):
    if v is None: return []
    if isinstance(v, (list, tuple, np.ndarray)): return list(v)
    return [v]


def plot_multiple(* datas, ncols = 2, figsize = (12, 8), filename = None,
                  show = False, titles = None, ** kwargs):
    """Grid of sub-plots: each item is a 1-D series or 2-D image."""
    plt = _plt()
    n = len(datas)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize = figsize, squeeze = False)
    for i, data in enumerate(datas):
        ax = axes[i // ncols][i % ncols]
        data = np.asarray(data)
        if data.ndim == 3:                      # RGB(A) image
            ax.imshow(data)
        elif data.ndim == 2:
            ax.imshow(data, aspect = 'auto', origin = 'lower')
        else:
            ax.plot(data)
        if titles and i < len(titles):
            ax.set_title(titles[i])
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis('off')
    return _finalize(fig, filename, show)


def plot_audio(audio, rate = 22050, *, title = 'waveform', figsize = (10, 3),
               filename = None, show = False, ** kwargs):
    plt = _plt()
    audio = np.asarray(audio).reshape(-1)
    fig, ax = plt.subplots(figsize = figsize)
    t = np.arange(len(audio)) / rate
    ax.plot(t, audio, linewidth = 0.5)
    ax.set_xlabel('time (s)')
    ax.set_title(title)
    return _finalize(fig, filename, show)


def plot_spectrogram(* mels, titles = None, figsize = None, filename = None,
                     show = False, ** kwargs):
    """Plot one or more mel spectrograms / attention maps (frames on x)."""
    plt = _plt()
    n = len(mels)
    fig, axes = plt.subplots(n, 1, figsize = figsize or (10, 3 * n),
                             squeeze = False)
    for i, mel in enumerate(mels):
        mel = np.asarray(mel)
        if mel.ndim == 3: mel = mel[0]
        im = axes[i][0].imshow(mel.T, aspect = 'auto', origin = 'lower',
                               interpolation = 'none')
        fig.colorbar(im, ax = axes[i][0])
        if titles and i < len(titles):
            axes[i][0].set_title(titles[i])
    return _finalize(fig, filename, show)


plot_alignment = plot_spectrogram


def plot_embedding(embeddings, labels = None, *, method = 'pca',
                   figsize = (8, 8), filename = None, show = False, ** kwargs):
    """2-D projection scatter of an (N, D) embedding table."""
    plt = _plt()
    embeddings = np.asarray(embeddings)
    if embeddings.shape[1] > 2:
        if method == 'pca':
            centered = embeddings - embeddings.mean(0)
            _, _, vt = np.linalg.svd(centered, full_matrices = False)
            projected = centered @ vt[:2].T
        else:
            raise ValueError('Unknown projection method: {}'.format(method))
    else:
        projected = embeddings

    fig, ax = plt.subplots(figsize = figsize)
    if labels is not None:
        labels = np.asarray(labels)
        for lab in sorted(set(labels.tolist())):
            m = labels == lab
            ax.scatter(projected[m, 0], projected[m, 1], label = str(lab), s = 12)
        ax.legend()
    else:
        ax.scatter(projected[:, 0], projected[:, 1], s = 12)
    return _finalize(fig, filename, show)


def plot_matrix(matrix, *, x_labels = None, y_labels = None, norm = False,
                annotate = None, fmt = '{:.2f}', cmap = 'magma',
                title = None, figsize = None, filename = None,
                show = False, colorbar = True, ** kwargs):
    """Annotated heatmap of a 2-D matrix.

    `norm` row-normalizes (rows sum to 1); `annotate` writes each cell's
    value (default: on for matrices up to 24x24), colored for contrast
    against the cell background.
    """
    plt = _plt()
    matrix = np.asarray(matrix, np.float64)
    if norm:
        matrix = matrix / np.maximum(matrix.sum(axis = -1, keepdims = True),
                                     1e-12)
    n, m = matrix.shape
    if annotate is None:
        annotate = max(n, m) <= 24
    fig, ax = plt.subplots(figsize = figsize or (max(6, m * 0.5),
                                                 max(5, n * 0.5)))
    im = ax.imshow(matrix, cmap = cmap, aspect = 'auto', ** kwargs)
    if colorbar:
        fig.colorbar(im, ax = ax)
    if x_labels is not None:
        ax.set_xticks(np.arange(m))
        ax.set_xticklabels([str(l) for l in x_labels], rotation = 45,
                           ha = 'right')
    if y_labels is not None:
        ax.set_yticks(np.arange(n))
        ax.set_yticklabels([str(l) for l in y_labels])
    if annotate:
        lo, hi = float(matrix.min()), float(matrix.max())
        mid = (lo + hi) / 2.
        for i in range(n):
            for j in range(m):
                v = matrix[i, j]
                ax.text(j, i, fmt.format(v), ha = 'center', va = 'center',
                        fontsize = 8,
                        color = 'white' if v < mid else 'black')
    if title:
        ax.set_title(title)
    return _finalize(fig, filename, show)


def plot_confusion_matrix(cm = None, *, true = None, pred = None,
                          labels = None, norm = True, title = 'Confusion matrix',
                          ** kwargs):
    """Confusion-matrix heatmap from a precomputed matrix or (true, pred)
    label sequences; `norm` shows per-true-class rates."""
    if cm is None:
        assert true is not None and pred is not None, \
            'provide cm or (true, pred)'
        true = np.asarray(true).reshape(-1)
        pred = np.asarray(pred).reshape(-1)
        if labels is None:
            labels = sorted(set(true.tolist()) | set(pred.tolist()))
        index = {lab: i for i, lab in enumerate(labels)}
        cm = np.zeros((len(labels), len(labels)), np.int64)
        for t, p in zip(true.tolist(), pred.tolist()):
            cm[index[t], index[p]] += 1
    cm = np.asarray(cm)
    if labels is None:
        labels = list(range(len(cm)))
    kwargs.setdefault('fmt', '{:.2f}' if norm else '{:.0f}')
    fig = plot_matrix(cm, x_labels = labels, y_labels = labels, norm = norm,
                      title = title, ** kwargs)
    return fig


def plot_classification(scores, labels = None, *, k = 5, title = None,
                        figsize = (8, 4), filename = None, show = False,
                        ** kwargs):
    """Horizontal bar chart of the top-`k` class scores (best on top)."""
    plt = _plt()
    scores = np.asarray(scores).reshape(-1)
    if labels is None:
        labels = [str(i) for i in range(len(scores))]
    top = np.argsort(-scores)[:k][::-1]
    fig, ax = plt.subplots(figsize = figsize)
    ax.barh(np.arange(len(top)), scores[top])
    ax.set_yticks(np.arange(len(top)))
    ax.set_yticklabels([str(labels[i]) for i in top])
    ax.set_xlabel('score')
    for pos, i in enumerate(top):
        ax.text(scores[i], pos, ' {:.3f}'.format(scores[i]), va = 'center')
    if title:
        ax.set_title(title)
    return _finalize(fig, filename, show)


def plot_boxes(boxes, *, image = None, labels = None, scores = None,
               source = 'xyxy', color = 'lime', linewidth = 1.5,
               with_legend = True, title = None, figsize = (8, 8),
               filename = None, show = False, ** kwargs):
    """Draw bounding boxes, optionally over an image.  Boxes in any format
    `utils.image.boxes.convert_boxes` understands; relative [0, 1]
    coordinates are scaled to the image size when an image is given."""
    from .image.boxes import convert_boxes, BoxFormat

    plt = _plt()
    import matplotlib.patches as patches

    boxes = convert_boxes(boxes, source, BoxFormat.XYXY)
    fig, ax = plt.subplots(figsize = figsize)
    if image is not None:
        image = np.asarray(image)
        ax.imshow(image, origin = 'upper')
        if boxes.size and boxes.max() <= 1.5:     # relative coords
            h, w = image.shape[:2]
            boxes = boxes * np.array([w, h, w, h], np.float32)
    prop_cycle = _plt().rcParams['axes.prop_cycle'].by_key()['color']
    for i, (x0, y0, x1, y1) in enumerate(boxes):
        c = color if labels is None else \
            prop_cycle[hash(str(labels[i])) % len(prop_cycle)]
        ax.add_patch(patches.Rectangle(
            (x0, y0), x1 - x0, y1 - y0, fill = False, edgecolor = c,
            linewidth = linewidth))
        tag = None
        if labels is not None:
            tag = str(labels[i])
        if scores is not None:
            tag = '{} {:.2f}'.format(tag or '', scores[i]).strip()
        if tag and with_legend:
            ax.text(x0, y0 - 2, tag, color = c, fontsize = 8)
    if image is None and len(boxes):
        ax.set_xlim(boxes[:, 0].min() - 1, boxes[:, 2].max() + 1)
        ax.set_ylim(boxes[:, 3].max() + 1, boxes[:, 1].min() - 1)
    if title:
        ax.set_title(title)
    return _finalize(fig, filename, show)


def plot_polygons(polygons, *, image = None, labels = None, color = 'lime',
                  alpha = 0.35, title = None, figsize = (8, 8),
                  filename = None, show = False, ** kwargs):
    """Draw filled polygons ((N_i, 2) vertex arrays), optionally over an
    image (EAST-style quad visualization)."""
    plt = _plt()
    import matplotlib.patches as patches

    fig, ax = plt.subplots(figsize = figsize)
    if image is not None:
        ax.imshow(np.asarray(image), origin = 'upper')
    prop_cycle = plt.rcParams['axes.prop_cycle'].by_key()['color']
    pts_all = []
    for i, poly in enumerate(polygons):
        poly = np.asarray(poly, np.float32).reshape(-1, 2)
        pts_all.append(poly)
        c = color if labels is None else \
            prop_cycle[hash(str(labels[i])) % len(prop_cycle)]
        ax.add_patch(patches.Polygon(poly, closed = True, facecolor = c,
                                     edgecolor = c, alpha = alpha))
        if labels is not None:
            ax.text(poly[:, 0].min(), poly[:, 1].min() - 2, str(labels[i]),
                    color = c, fontsize = 8)
    if image is None and pts_all:
        pts = np.concatenate(pts_all, 0)
        ax.set_xlim(pts[:, 0].min() - 1, pts[:, 0].max() + 1)
        ax.set_ylim(pts[:, 1].max() + 1, pts[:, 1].min() - 1)
    if title:
        ax.set_title(title)
    return _finalize(fig, filename, show)


def plot_volume(volume, *, threshold = 0.5, figsize = (8, 8), title = None,
                cmap = 'viridis', max_points = 20000, filename = None,
                show = False, ** kwargs):
    """3-D scatter of the occupied voxels of a (D, H, W) volume (values
    above `threshold`), colored by value; subsamples to `max_points`."""
    plt = _plt()
    from mpl_toolkits.mplot3d import Axes3D      # noqa: F401

    volume = np.asarray(volume)
    coords = np.argwhere(volume > threshold)
    vals = volume[volume > threshold]
    if len(coords) > max_points:
        sel = np.linspace(0, len(coords) - 1, max_points).astype(np.int64)
        coords, vals = coords[sel], vals[sel]
    fig = plt.figure(figsize = figsize)
    ax = fig.add_subplot(projection = '3d')
    if len(coords):
        p = ax.scatter(coords[:, 2], coords[:, 1], coords[:, 0],
                       c = vals, cmap = cmap, s = 4)
        fig.colorbar(p, ax = ax, shrink = 0.6)
    if title:
        ax.set_title(title)
    return _finalize(fig, filename, show)


def plot_distribution(* datas, labels = None, plot_type = 'violin',
                      title = None, figsize = (8, 5), filename = None,
                      show = False, ** kwargs):
    """Violin / box plots of one or more 1-D samples with per-series
    colors."""
    plt = _plt()
    fig, ax = plt.subplots(figsize = figsize)
    datas = [np.asarray(d).reshape(-1) for d in datas]
    prop_cycle = plt.rcParams['axes.prop_cycle'].by_key()['color']
    if plot_type == 'violin':
        parts = ax.violinplot(datas, showmedians = True)
        for i, body in enumerate(parts['bodies']):
            body.set_facecolor(prop_cycle[i % len(prop_cycle)])
            body.set_alpha(0.6)
    elif plot_type == 'box':
        parts = ax.boxplot(datas, patch_artist = True)
        for i, patch in enumerate(parts['boxes']):
            patch.set_facecolor(prop_cycle[i % len(prop_cycle)])
    else:
        raise ValueError('Unknown distribution plot: {}'.format(plot_type))
    if labels is not None:
        ax.set_xticks(np.arange(1, len(datas) + 1))
        ax.set_xticklabels([str(l) for l in labels])
    if title:
        ax.set_title(title)
    return _finalize(fig, filename, show)


def _finalize(fig, filename, show):
    plt = _plt()
    fig.tight_layout()
    if filename:
        fig.savefig(filename)
    if show:
        plt.show()
    plt.close(fig)
    return filename
