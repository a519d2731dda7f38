"""Label-output model mixin.

Capability parity with
``/root/reference/models/interfaces/base_classification_model.py:19``:
label↔index mapping, one-hot / sparse handling, prediction decoding.
"""

import numpy as np


class BaseClassificationModel:
    def _init_labels(self, labels = None, nb_class = None,
                     multi_label = False, ** kwargs):
        if labels is not None:
            labels = list(labels)
        elif nb_class is not None:
            labels = list(range(nb_class))
        self.labels = labels
        self.multi_label = multi_label
        self._label_to_idx = {l: i for i, l in enumerate(labels)} if labels else {}

    @property
    def nb_class(self):
        return len(self.labels) if self.labels else None

    def encode_label(self, label):
        if isinstance(label, (list, tuple, np.ndarray)) and self.multi_label:
            out = np.zeros((self.nb_class,), np.float32)
            for l in label:
                out[self._label_to_idx[l]] = 1.
            return out
        return np.int32(self._label_to_idx[label])

    def decode_label(self, prediction, * , threshold = 0.5, return_scores = False):
        prediction = np.asarray(prediction)
        if self.multi_label:
            idx = np.where(prediction >= threshold)[0]
            labels = [self.labels[i] for i in idx]
            if return_scores:
                return labels, prediction[idx]
            return labels
        idx = int(np.argmax(prediction))
        if return_scores:
            return self.labels[idx], float(prediction[idx])
        return self.labels[idx]

    def get_config_labels(self):
        return {'labels': self.labels, 'multi_label': self.multi_label}

    def _str_labels(self):
        return '- classes : {}\n'.format(self.nb_class)
