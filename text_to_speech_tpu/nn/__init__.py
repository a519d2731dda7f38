"""Pure-functional NN layer library (pytree params, jit/pjit/grad-composable)."""

from .layers import (
    glorot_uniform, orthogonal,
    init_dense, dense, init_embedding, embedding,
    init_conv1d, conv1d, init_conv1d_transpose, conv1d_transpose,
    init_batch_norm, batch_norm,
    init_lstm_cell, lstm_cell, lstm, bilstm, init_bilstm, lstm_init_carry,
    dropout, init_layer_norm, layer_norm, init_rms_norm, rms_norm,
)
from .activations import get_activation, l2_norm, glu, gelu_new, quick_gelu
