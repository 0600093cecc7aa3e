"""IMDB CNN-LSTM (bnn-hmc model zoo).

Reference: make_cnn_lstm / make_smooth_cnn_lstm
(google-bnn-hmc/bnn_hmc/utils/models.py:199-259): Embed(20000, 128) ->
Conv1D(64, k5, VALID) -> relu|swish -> [max-pool 4] -> LSTM(128) over
time -> last hidden -> Dense(classes).

TPU-native notes: the reference unrolls the LSTM statically
(hk.static_unroll), which bloats the XLA graph for long sequences; here
the recurrence is a compiled ``lax.scan`` (flax nn.RNN over an
OptimizedLSTMCell) whose per-step gate matmuls are batched onto the MXU.
The smooth variant (swish, no max-pool) is the paper's
differentiable-everywhere version for HMC."""
from __future__ import annotations

import jax
from flax import linen as nn


class CNNLSTM(nn.Module):
    classes: int = 2
    max_features: int = 20000
    embedding_size: int = 128
    cell_size: int = 128
    num_filters: int = 64
    kernel_size: int = 5
    pool_size: int = 4
    use_swish: bool = False
    use_maxpool: bool = True

    @nn.compact
    def __call__(self, tokens, train: bool = True):
        del train
        x = nn.Embed(self.max_features, self.embedding_size)(tokens)  # [B, T, E]
        x = nn.Conv(
            self.num_filters, (self.kernel_size,), padding="VALID"
        )(x)
        x = jax.nn.swish(x) if self.use_swish else jax.nn.relu(x)
        if self.use_maxpool:
            x = nn.max_pool(
                x, (self.pool_size,), strides=(self.pool_size,), padding="VALID"
            )
        x = nn.RNN(nn.OptimizedLSTMCell(self.cell_size))(x)  # lax.scan over T
        return nn.Dense(self.classes)(x[:, -1])


def smooth_cnn_lstm(classes: int = 2, **kw) -> CNNLSTM:
    """The swish / no-maxpool variant HMC chains use
    (reference models.py:242-259)."""
    return CNNLSTM(classes=classes, use_swish=True, use_maxpool=False, **kw)
