"""Loss functions with named multi-output components.

Capability parity with ``/root/reference/custom_train_objects/losses/``
(`TacotronLoss` ``tacotron_loss.py:18,62,115`` — masked mel MSE/MAE with
weighted variants on decoder + postnet outputs, weighted-BCE gate loss,
per-component values surfaced as metrics through named outputs
``loss_with_multiple_outputs.py``; `TextLoss`/`CTCLoss` ``text_loss.py``;
loss registry ``losses/__init__.py:39``), plus the WaveGlow flow NLL.

Every loss is a pure function returning ``{'loss': (B,), <component>: (B,)}``
so the trainer can log components as metrics and average for the gradient.
"""

import jax
import jax.numpy as jnp

_LOSSES = {}


def register_loss(name):
    def deco(cls):
        _LOSSES[name.lower()] = cls
        return cls
    return deco


def get_loss(loss, ** kwargs):
    """Resolve a loss by name / config dict / instance."""
    if isinstance(loss, dict):
        kwargs = {** loss, ** kwargs}
        loss = kwargs.pop('name', kwargs.pop('class_name', None))
    if callable(loss) and not isinstance(loss, str):
        return loss
    key = str(loss).lower()
    if key not in _LOSSES:
        raise ValueError('Unknown loss {!r} (known: {})'.format(loss, sorted(_LOSSES)))
    return _LOSSES[key](** kwargs)


def list_losses():
    return sorted(_LOSSES)


def binary_crossentropy(y_true, y_pred, from_logits = False, epsilon = 1e-7):
    if from_logits:
        return jnp.maximum(y_pred, 0.) - y_pred * y_true + jnp.log1p(jnp.exp(-jnp.abs(y_pred)))
    y_pred = jnp.clip(y_pred, epsilon, 1. - epsilon)
    return -(y_true * jnp.log(y_pred) + (1. - y_true) * jnp.log(1. - y_pred))


@register_loss('TacotronLoss')
class TacotronLoss:
    """loss = mel_loss(decoder) + mel_loss(postnet) + weighted-BCE(gate).

    Mel losses are averaged over *valid* frames × channels (masked by the
    gate target) — matching the reference normalization
    (``tacotron_loss.py:104-113``).
    """

    def __init__(self,
                 mel_loss = 'mse',
                 mask_mel_padding = True,
                 from_logits = False,
                 label_smoothing = 0.,
                 finish_weight = 1.,
                 not_finish_weight = 1.,
                 name = 'tacotron_loss',
                 ** kwargs
                ):
        self.mel_loss = mel_loss if isinstance(mel_loss, (list, tuple)) else [mel_loss]
        self.mask_mel_padding = mask_mel_padding
        self.from_logits = from_logits
        self.label_smoothing = label_smoothing
        self.finish_weight = finish_weight
        self.not_finish_weight = not_finish_weight
        self.name = name

    @property
    def output_names(self):
        names = ['loss']
        names += ['{}_mel_loss'.format(l) for l in self.mel_loss]
        names += ['{}_mel_postnet_loss'.format(l) for l in self.mel_loss]
        return names + ['gate_loss']

    def compute_mel_loss(self, y_true, y_pred, loss, mask = None):
        if 'mse' in loss:
            err = jnp.square(y_true - y_pred)
        elif 'mae' in loss:
            err = jnp.abs(y_true - y_pred)
        else:
            raise ValueError('Unknown mel loss: {}'.format(loss))
        if 'weighted' in loss:
            w = y_true - jnp.min(y_true, axis = (1, 2), keepdims = True) + 1.
            w = w / jnp.max(w, axis = (1, 2), keepdims = True)
            err = err * w
        err = jnp.sum(err, axis = 2)                         # (B, T)
        n_ch = y_pred.shape[2]
        if mask is None:
            denom = y_pred.shape[1] * n_ch
            return jnp.sum(err, axis = 1) / denom
        denom = jnp.maximum(jnp.sum(mask, axis = 1) * n_ch, 1.)
        return jnp.sum(err * mask, axis = 1) / denom

    def __call__(self, y_true, y_pred):
        mel_target, gate_target = y_true
        mel_pred, mel_postnet_pred, gate_pred = y_pred[:3]

        gate_weight = (gate_target * self.finish_weight
                       + (1. - gate_target) * self.not_finish_weight)
        target = gate_target
        if self.label_smoothing:
            target = target * (1. - self.label_smoothing) + 0.5 * self.label_smoothing
        gate_loss = binary_crossentropy(target, gate_pred, self.from_logits)
        gate_loss = jnp.mean(gate_loss * gate_weight, axis = 1)

        mask = (1. - gate_target) if self.mask_mel_padding else None

        components = {}
        total = gate_loss
        for l in self.mel_loss:
            ml = self.compute_mel_loss(mel_target, mel_pred, l, mask)
            pl = self.compute_mel_loss(mel_target, mel_postnet_pred, l, mask)
            components['{}_mel_loss'.format(l)] = ml
            components['{}_mel_postnet_loss'.format(l)] = pl
            total = total + ml + pl

        return {'loss': total, ** components, 'gate_loss': gate_loss}

    def get_config(self):
        return {
            'class_name': 'TacotronLoss',
            'mel_loss': list(self.mel_loss),
            'mask_mel_padding': self.mask_mel_padding,
            'from_logits': self.from_logits,
            'label_smoothing': self.label_smoothing,
            'finish_weight': self.finish_weight,
            'not_finish_weight': self.not_finish_weight,
        }


@register_loss('WaveGlowLoss')
class WaveGlowLoss:
    """Flow NLL: ||z||²/2σ² − Σ log s − Σ log|det W|, per element."""

    def __init__(self, sigma = 1.0, name = 'waveglow_loss', ** kwargs):
        self.sigma = sigma
        self.name = name

    @property
    def output_names(self):
        return ['loss']

    def __call__(self, y_true, y_pred):
        z, log_s_total, log_det_total = y_pred
        loss = (jnp.sum(z * z) / (2 * self.sigma * self.sigma)
                - log_s_total - log_det_total) / z.size
        return {'loss': loss[None] if loss.ndim == 0 else loss}

    def get_config(self):
        return {'class_name': 'WaveGlowLoss', 'sigma': self.sigma}


@register_loss('FastSpeech2Loss')
class FastSpeech2Loss:
    """Non-autoregressive TTS objective (FastSpeech 2, Ren et al., 2021):

    loss = mel(decoder) + mel(postnet) + MSE(log-duration) + MSE(pitch)
           + MSE(energy), each averaged over VALID frames / tokens only
    (masks come from the model output — no silent padding dilution).

    Counterpart of the reference's TacotronLoss normalization strategy
    (``/root/reference/custom_train_objects/losses/tacotron_loss.py:104``)
    for the parallel synthesizer this framework adds beyond the reference.
    """

    def __init__(self, mel_loss = 'mae', duration_weight = 1.,
                 pitch_weight = 1., energy_weight = 1.,
                 name = 'fastspeech2_loss', ** kwargs):
        self.mel_loss = mel_loss
        self.duration_weight = duration_weight
        self.pitch_weight = pitch_weight
        self.energy_weight = energy_weight
        self.name = name

    @property
    def output_names(self):
        return ['loss', 'mel_loss', 'mel_postnet_loss', 'duration_loss',
                'pitch_loss', 'energy_loss']

    def _mel_err(self, y_true, y_pred, frame_mask):
        err = jnp.abs(y_true - y_pred) if self.mel_loss == 'mae' \
            else jnp.square(y_true - y_pred)
        err = jnp.sum(err, axis = 2) * frame_mask
        denom = jnp.maximum(jnp.sum(frame_mask, axis = 1), 1.) * y_pred.shape[2]
        return jnp.sum(err, axis = 1) / denom

    @staticmethod
    def _masked_mse(target, pred, mask):
        err = jnp.square(target - pred) * mask
        return jnp.sum(err, axis = 1) / jnp.maximum(jnp.sum(mask, axis = 1), 1.)

    def __call__(self, y_true, y_pred):
        mel_target, durations, pitch_target, energy_target = (
            list(y_true) + [None, None])[:4]
        (mel, mel_post, log_d_pred, pitch_pred, energy_pred,
         frame_mask, token_mask) = y_pred[:7]
        frame_mask = frame_mask.astype(mel.dtype)
        token_mask = token_mask.astype(mel.dtype)

        T = min(mel.shape[1], mel_target.shape[1])
        mel_l = self._mel_err(mel_target[:, :T], mel[:, :T], frame_mask[:, :T])
        post_l = self._mel_err(mel_target[:, :T], mel_post[:, :T],
                               frame_mask[:, :T])

        log_d_target = jnp.log1p(durations.astype(jnp.float32))
        dur_l = self._masked_mse(log_d_target, log_d_pred, token_mask)

        zero = jnp.zeros_like(dur_l)
        # phoneme-level variances mask by token, frame-level by frame
        def _var_loss(target, pred):
            if target is None or pred is None:
                return zero
            mask = token_mask if pred.shape[1] == token_mask.shape[1] \
                else frame_mask
            return self._masked_mse(target, pred, mask)

        pitch_l = _var_loss(pitch_target, pitch_pred)
        energy_l = _var_loss(energy_target, energy_pred)

        total = (mel_l + post_l + self.duration_weight * dur_l
                 + self.pitch_weight * pitch_l + self.energy_weight * energy_l)
        return {'loss': total, 'mel_loss': mel_l, 'mel_postnet_loss': post_l,
                'duration_loss': dur_l, 'pitch_loss': pitch_l,
                'energy_loss': energy_l}

    def get_config(self):
        return {
            'class_name': 'FastSpeech2Loss', 'mel_loss': self.mel_loss,
            'duration_weight': self.duration_weight,
            'pitch_weight': self.pitch_weight,
            'energy_weight': self.energy_weight,
        }


@register_loss('TextLoss')
class TextLoss:
    """Padded-token-masked sparse crossentropy over logits (B, T, V)."""

    def __init__(self, pad_value = 0, from_logits = True, name = 'text_loss', ** kwargs):
        self.pad_value = pad_value
        self.from_logits = from_logits
        self.name = name

    @property
    def output_names(self):
        return ['loss']

    def __call__(self, y_true, y_pred):
        if isinstance(y_true, (list, tuple)):
            tokens, lengths = y_true
            mask = jnp.arange(tokens.shape[1])[None, :] < lengths[:, None]
        else:
            tokens = y_true
            mask = tokens != self.pad_value
        logp = jax.nn.log_softmax(y_pred, axis = -1) if self.from_logits else jnp.log(y_pred + 1e-9)
        nll = -jnp.take_along_axis(logp, tokens[..., None], axis = -1)[..., 0]
        mask = mask.astype(nll.dtype)
        loss = jnp.sum(nll * mask, axis = 1) / jnp.maximum(jnp.sum(mask, axis = 1), 1.)
        return {'loss': loss}

    def get_config(self):
        return {'class_name': 'TextLoss', 'pad_value': self.pad_value,
                'from_logits': self.from_logits}


@register_loss('CTCLoss')
class CTCLoss:
    """Connectionist temporal classification (wraps optax.ctc_loss)."""

    def __init__(self, blank_id = 0, name = 'ctc_loss', ** kwargs):
        self.blank_id = blank_id
        self.name = name

    @property
    def output_names(self):
        return ['loss']

    def __call__(self, y_true, y_pred):
        """y_true: (labels (B, L), label_lengths); y_pred: (logits (B, T, V),
        logit_lengths) or plain logits."""
        import optax
        if isinstance(y_pred, (list, tuple)):
            logits, logit_lengths = y_pred
        else:
            logits = y_pred
            logit_lengths = jnp.full((logits.shape[0],), logits.shape[1])
        labels, label_lengths = y_true
        logit_pad = (jnp.arange(logits.shape[1])[None] >= logit_lengths[:, None]).astype(jnp.float32)
        label_pad = (jnp.arange(labels.shape[1])[None] >= label_lengths[:, None]).astype(jnp.float32)
        loss = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                              blank_id = self.blank_id)
        return {'loss': loss}

    def get_config(self):
        return {'class_name': 'CTCLoss', 'blank_id': self.blank_id}


@register_loss('mse')
class MSELoss:
    def __init__(self, name = 'mse', ** kwargs):
        self.name = name

    @property
    def output_names(self):
        return ['loss']

    def __call__(self, y_true, y_pred):
        axes = tuple(range(1, jnp.ndim(y_pred)))
        return {'loss': jnp.mean(jnp.square(y_true - y_pred), axis = axes)}

    def get_config(self):
        return {'class_name': 'mse'}


@register_loss('mae')
class MAELoss:
    def __init__(self, name = 'mae', ** kwargs):
        self.name = name

    @property
    def output_names(self):
        return ['loss']

    def __call__(self, y_true, y_pred):
        axes = tuple(range(1, jnp.ndim(y_pred)))
        return {'loss': jnp.mean(jnp.abs(y_true - y_pred), axis = axes)}

    def get_config(self):
        return {'class_name': 'mae'}


@register_loss('GE2ELoss')
class GE2ELoss:
    """Generalized end-to-end speaker-verification loss (softmax variant):
    embeddings (N_speakers, M_utterances, D) → similarity to centroids with
    own-utterance exclusion, scaled by learned (w, b) passed as params."""

    def __init__(self, mode = 'softmax', init_w = 10., init_b = -5.,
                 name = 'ge2e_loss', ** kwargs):
        self.mode = mode
        self.init_w = init_w
        self.init_b = init_b
        self.name = name

    @property
    def output_names(self):
        return ['loss']

    def similarity_matrix(self, embeddings):
        n, m, d = embeddings.shape
        centroids = jnp.mean(embeddings, axis = 1)                       # (N, D)
        sum_per_spk = jnp.sum(embeddings, axis = 1, keepdims = True)     # (N, 1, D)
        excl = (sum_per_spk - embeddings) / (m - 1)                      # (N, M, D)

        def cos(a, b):
            num = jnp.sum(a * b, axis = -1)
            return num / (jnp.linalg.norm(a, axis = -1) * jnp.linalg.norm(b, axis = -1) + 1e-9)

        sim = cos(embeddings[:, :, None, :], centroids[None, None, :, :])  # (N, M, N)
        own = cos(embeddings, excl)                                        # (N, M)
        eye = jnp.eye(n, dtype = bool)[:, None, :]
        sim = jnp.where(eye, own[:, :, None], sim)
        return sim

    def __call__(self, y_true, y_pred, w = None, b = None):
        # y_pred: (N, M, D) normalized embeddings, or (emb, w, b) with the
        # learned scale params; y_true unused (labels are implicit)
        if isinstance(y_pred, tuple):
            y_pred, w, b = y_pred
        if w is None: w = self.init_w
        if b is None: b = self.init_b
        w = jnp.maximum(w, 1e-3)  # keep the similarity scale positive
        sim = w * self.similarity_matrix(y_pred) + b
        n, m, _ = sim.shape
        logp = jax.nn.log_softmax(sim, axis = -1)
        # one-hot contraction, NOT take_along_axis: the gather's backward
        # lowers to a TPU scatter that costs ~0.5s on even tiny shapes
        one_hot = jnp.eye(n, dtype = logp.dtype)[:, None, :]     # (N, 1, N)
        nll = -jnp.sum(logp * one_hot, axis = -1)                # (N, M)
        return {'loss': jnp.mean(nll, axis = 1)}

    def get_config(self):
        return {'class_name': 'GE2ELoss', 'mode': self.mode}
