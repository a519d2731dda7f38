"""BERT-style task heads over the generic `Transformer` encoder.

Capability parity with the reference's BERT task classes
(``/root/reference/architectures/transformers/bert_arch.py:43-199``:
``BertMLM``, ``BertClassifier``, ``BertNSP``, ``BertQA``, ``BertEmbedding``,
``DPR``) — re-founded as pure functions over the pytree encoder: each head is
an ``init_*``/apply pair that composes with ``Transformer.encode``, plus HF
state-dict converters so published torch checkpoints import directly
(``convert_bert_mlm_state_dict`` etc., verified numerically in
``tests/test_transformers.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ...nn.layers import dense, init_dense, layer_norm, init_layer_norm
from ...nn.activations import get_activation, l2_norm
from .families import convert_bert_state_dict, _t, _norm_params


# -- pooler ---------------------------------------------------------------------

def init_pooler(key, dim):
    """HF/reference BERT pooler: dense + tanh on the first ([CLS]) token."""
    return {'dense': init_dense(key, dim, dim)}


def pooler(params, hidden):
    """hidden (B, T, D) → pooled (B, D) = tanh(dense(hidden[:, 0]))."""
    return jnp.tanh(dense(params['dense'], hidden[:, 0]))


# -- masked language modeling ----------------------------------------------------

def init_mlm_head(key, dim, vocab_size):
    """Reference ``BertMLM`` (`bert_arch.py:47-77`): transform dense +
    activation + layer norm, then tied-embedding logits + free bias."""
    return {
        'transform': init_dense(key, dim, dim),
        'transform_norm': init_layer_norm(dim),
        'bias': jnp.zeros((vocab_size,)),
    }


def mlm_logits(params, head, hidden, *, activation = 'gelu_exact',
               epsilon = 1e-12):
    """hidden (B, T, D) → vocab logits (B, T, V), decoder tied to the input
    embedding matrix (``self.embeddings.linear`` in the reference)."""
    act = get_activation(activation)
    x = act(dense(head['transform'], hidden))
    x = layer_norm(head['transform_norm'], x, epsilon = epsilon)
    return x @ params['embedding']['embeddings'].T + head['bias']


# -- sequence classification / NSP ------------------------------------------------

def init_classifier_head(key, dim, num_classes, use_pooler = True):
    """Reference ``BertClassifier``/``BertNSP`` (`bert_arch.py:79-136`):
    (pooled or first-token) hidden → dense(num_classes)."""
    k1, k2 = jax.random.split(key)
    head = {'classifier': init_dense(k1, dim, num_classes)}
    if use_pooler:
        head['pooler'] = init_pooler(k2, dim)
    return head


def classify(head, hidden, *, activation = None, rng = None, drop_rate = 0.):
    """hidden (B, T, D) → class logits (B, num_classes).  Uses the tanh
    pooler when the head has one, else the raw first token."""
    x = pooler(head['pooler'], hidden) if 'pooler' in head else hidden[:, 0]
    if drop_rate and rng is not None:
        keep = jax.random.bernoulli(rng, 1. - drop_rate, x.shape)
        x = jnp.where(keep, x / (1. - drop_rate), 0.)
    logits = dense(head['classifier'], x)
    if activation is not None:
        logits = get_activation(activation)(logits)
    return logits


# -- extractive question answering -------------------------------------------------

def init_qa_head(key, dim):
    """Reference ``BertQA`` (`bert_arch.py:158-171`): per-token dense(2)."""
    return {'qa': init_dense(key, dim, 2)}


def qa_spans(head, hidden, mask = None):
    """hidden (B, T, D) → (start_probs, end_probs), each (B, T): softmax over
    the sequence axis of the two per-token logits (matching the reference's
    ``tf.nn.softmax(output, axis=1)``), with padded positions masked out."""
    logits = dense(head['qa'], hidden)                       # (B, T, 2)
    if mask is not None:
        mask = jnp.reshape(mask, (logits.shape[0], -1))       # (B, T)
        logits = jnp.where(mask[..., None] > 0, logits, -1e9)
    probs = jax.nn.softmax(logits, axis = 1)
    return probs[..., 0], probs[..., 1]


# -- sentence / dense-passage embeddings --------------------------------------------

def init_embedding_head(key, dim, output_dim = None):
    """Reference ``BertEmbedding``/``DPR`` (`bert_arch.py:137-156,173-198`):
    optional projection to `output_dim` over a pooled sentence vector."""
    if output_dim is None or output_dim == dim:
        return {}
    return {'project': init_dense(key, dim, output_dim)}


def embed_sentences(head, hidden, mask = None, *, mode = 'first',
                    normalize = True):
    """hidden (B, T, D) → sentence embeddings (B, output_dim).

    mode: 'first' (CLS token — the DPR convention) or 'mean' (masked mean
    pooling).  L2-normalized by default so cosine search works directly.
    """
    if mode == 'first':
        x = hidden[:, 0]
    elif mode == 'mean':
        if mask is None:
            x = jnp.mean(hidden, axis = 1)
        else:
            m = jnp.reshape(mask, (hidden.shape[0], -1, 1)).astype(hidden.dtype)
            x = jnp.sum(hidden * m, axis = 1) / jnp.maximum(
                jnp.sum(m, axis = 1), 1.)
    else:
        raise ValueError('unknown pooling mode: {}'.format(mode))
    if 'project' in head:
        x = dense(head['project'], x)
    return l2_norm(x) if normalize else x


# -- HF checkpoint import -----------------------------------------------------------

def convert_bert_mlm_state_dict(sd):
    """torch ``BertForMaskedLM`` state dict → (encoder params, mlm head)."""
    params = convert_bert_state_dict(sd)
    head = {
        'transform': {
            'kernel': _t(sd['cls.predictions.transform.dense.weight']),
            'bias': np.asarray(sd['cls.predictions.transform.dense.bias']),
        },
        'transform_norm': _norm_params('cls.predictions.transform.LayerNorm', sd),
        'bias': np.asarray(sd['cls.predictions.bias']),
    }
    return params, head


def convert_bert_pooler_state_dict(sd, prefix = 'bert.pooler.'):
    return {'dense': {'kernel': _t(sd[prefix + 'dense.weight']),
                      'bias': np.asarray(sd[prefix + 'dense.bias'])}}


def convert_bert_classifier_state_dict(sd):
    """torch ``BertForSequenceClassification`` / ``BertForNextSentence
    Prediction`` state dict → (encoder params, classifier head)."""
    params = convert_bert_state_dict(sd)
    head = {'pooler': convert_bert_pooler_state_dict(sd)}
    if 'classifier.weight' in sd:                 # SequenceClassification
        head['classifier'] = {'kernel': _t(sd['classifier.weight']),
                              'bias': np.asarray(sd['classifier.bias'])}
    else:                                          # NSP: cls.seq_relationship
        head['classifier'] = {
            'kernel': _t(sd['cls.seq_relationship.weight']),
            'bias': np.asarray(sd['cls.seq_relationship.bias'])}
    return params, head


def convert_bert_qa_state_dict(sd):
    """torch ``BertForQuestionAnswering`` state dict → (encoder, qa head)."""
    params = convert_bert_state_dict(sd)
    head = {'qa': {'kernel': _t(sd['qa_outputs.weight']),
                   'bias': np.asarray(sd['qa_outputs.bias'])}}
    return params, head


def convert_dpr_state_dict(sd):
    """torch ``DPRQuestionEncoder``/``DPRContextEncoder`` state dict →
    (encoder params, embedding head).  DPR checkpoints prefix the BERT tree
    with ``*_encoder.bert_model.`` and may add ``encode_proj``."""
    clean = {}
    for k, v in sd.items():
        for p in ('question_encoder.bert_model.', 'ctx_encoder.bert_model.',
                  'bert_model.'):
            if k.startswith(p):
                k = k[len(p):]
                break
        clean[k.replace('question_encoder.', '').replace('ctx_encoder.', '')] = v
    params = convert_bert_state_dict(clean)
    head = {}
    if 'encode_proj.weight' in clean:
        head['project'] = {'kernel': _t(clean['encode_proj.weight']),
                           'bias': np.asarray(clean['encode_proj.bias'])}
    return params, head
