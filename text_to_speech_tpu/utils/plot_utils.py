"""Plotting helpers (matplotlib, Agg backend).

Capability parity with ``/root/reference/utils/plot_utils.py``
(`plot:177`, `plot_multiple:486`, `plot_audio:711`, `plot_spectrogram:740`
used for attention/mel visualization and `History.plot`).
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
         ** kwargs
        ):
    """Plot 1-D series (or dict of named series) / 2-D images."""
    plt = _plt()
    fig, ax = plt.subplots(figsize = figsize)

    if isinstance(data, dict):
        for name, series in data.items():
            series = np.asarray(series)
            xs = x if x is not None else np.arange(len(series))
            ax.plot(xs, series, label = str(name))
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
            ax.hist(data, ** kwargs)
        else:
            xs = x if x is not None else np.arange(len(np.atleast_1d(data)))
            ax.plot(xs, data, color = color)
            if legend: ax.legend([legend])

    if title: ax.set_title(title)
    if xlabel: ax.set_xlabel(xlabel)
    if ylabel: ax.set_ylabel(ylabel)
    return _finalize(fig, filename, show)


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
        if data.ndim == 2:
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


def _finalize(fig, filename, show):
    plt = _plt()
    fig.tight_layout()
    if filename:
        fig.savefig(filename)
    if show:
        plt.show()
    plt.close(fig)
    return filename
