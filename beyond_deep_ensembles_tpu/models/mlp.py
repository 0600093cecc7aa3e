"""UCI regression MLP: in -> 50 -> ReLU -> 1 -> GaussLayer
(reference experiments/uci/models.py:43-51).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ..nn.dropout import FixableDropout
from ..nn.gauss import GaussLayer
from .layers import call_layer, make_dense


class RegressionMLP(nn.Module):
    hidden: int = 50
    out_dim: int = 1
    dense_kind: str = "plain"  # 'plain' | 'bbb' | 'rank1'
    dropout_p: float = 0.0  # >0 selects the MC-Dropout variant
    components: int = 1
    std_init: float = 1.0
    learn_var: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, component: Optional[int] = None):
        h = call_layer(
            make_dense(self.dense_kind, self.hidden, components=self.components),
            x,
            train,
            component,
        )
        if self.dropout_p > 0:
            h = FixableDropout(self.dropout_p)(h, train=train)
        h = nn.relu(h)
        out = call_layer(
            make_dense(self.dense_kind, self.out_dim, components=self.components),
            h,
            train,
            component,
        )
        return GaussLayer(self.std_init, self.learn_var)(out, train=train)
