"""Training historian.

Capability parity with ``/root/reference/custom_train_objects/history.py:38``:
per-epoch and per-batch metric logs across train/valid phases, training-config
records per run, ``get_best``, JSON round-trip, plotting.
"""

import time
import logging

from ..utils.file_utils import load_json, dump_json
from ..utils.generic_utils import to_json_serializable

logger = logging.getLogger(__name__)


class History:
    def __init__(self, filename = None):
        self.filename = filename
        self.epoch_logs = []          # [{'epoch': int, 'metrics': {...}, 'time': float}]
        self.batch_logs = []          # current-epoch batch metrics
        self.trainings = []           # [{'config': {...}, 'start_epoch': int, ...}]
        self._epoch_start = None
        self._current_training = None

    # -- properties ------------------------------------------------------------

    @property
    def epochs(self):
        return len(self.epoch_logs)

    @property
    def steps(self):
        return sum(t.get('steps', 0) for t in self.trainings)

    def __len__(self):
        return self.epochs

    def __repr__(self):
        return 'History(epochs={}, trainings={})'.format(self.epochs, len(self.trainings))

    # -- recording -------------------------------------------------------------

    def set_config(self, config):
        """Start a new training run with the given config."""
        self._current_training = {
            'config': to_json_serializable(config),
            'start_epoch': self.epochs,
            'start_time': time.time(),
            'steps': 0,
        }
        self.trainings.append(self._current_training)

    def on_epoch_begin(self, epoch = None):
        self._epoch_start = time.time()
        self.batch_logs = []

    def on_batch_end(self, metrics):
        self.batch_logs.append(to_json_serializable(metrics))
        if self._current_training is not None:
            self._current_training['steps'] = self._current_training.get('steps', 0) + 1

    def on_epoch_end(self, metrics, epoch = None):
        entry = {
            'epoch': epoch if epoch is not None else self.epochs,
            'metrics': to_json_serializable(metrics),
            'time': time.time() - self._epoch_start if self._epoch_start else None,
        }
        self.epoch_logs.append(entry)
        if self.filename:
            self.save(self.filename)
        return entry

    # -- queries ---------------------------------------------------------------

    def get_metric(self, name):
        return [e['metrics'].get(name) for e in self.epoch_logs]

    def get_best(self, metric = 'loss', mode = None):
        """(best_value, best_epoch) for a metric; mode inferred from name
        ('acc' → max, otherwise min)."""
        values = [
            (e['metrics'][metric], e['epoch']) for e in self.epoch_logs
            if metric in e['metrics'] and e['metrics'][metric] is not None
        ]
        if not values: return None, -1
        if mode is None:
            mode = 'max' if any(tag in metric for tag in ('acc', 'f1', 'precision', 'recall')) else 'min'
        fn = max if mode == 'max' else min
        return fn(values, key = lambda v: v[0])

    # -- persistence -----------------------------------------------------------

    def get_config(self):
        return {
            'epoch_logs': self.epoch_logs,
            'trainings': self.trainings,
        }

    def save(self, filename = None):
        filename = filename or self.filename
        return dump_json(filename, self.get_config(), indent = 2)

    @classmethod
    def load(cls, filename):
        hist = cls(filename = filename)
        config = load_json(filename, default = None)
        if config:
            hist.epoch_logs = config.get('epoch_logs', [])
            hist.trainings = config.get('trainings', [])
        return hist

    def plot(self, metrics = None, filename = None, show = False):
        """Plot metric curves over epochs (matplotlib)."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        if not self.epoch_logs: return None
        if metrics is None:
            metrics = sorted({k for e in self.epoch_logs for k in e['metrics']})
        fig, ax = plt.subplots(figsize = (8, 5))
        xs = [e['epoch'] for e in self.epoch_logs]
        for m in metrics:
            ys = self.get_metric(m)
            if any(y is not None for y in ys):
                ax.plot(xs, ys, label = m)
        ax.set_xlabel('epoch')
        ax.legend()
        if filename: fig.savefig(filename)
        if show: plt.show()
        plt.close(fig)
        return filename
