"""Multi-layer (bi)directional GRU/LSTM stacks on ``jax.lax.scan``.

Replaces torch's cuDNN ``nn.GRU``/``nn.LSTM`` used by the regression
backbones (reference: model/video_regression.py:124-141). Weight layout and
gate order follow torch exactly (see ops/scan.py) so reference checkpoints
port weight-for-weight. Inter-layer dropout matches torch semantics (applied
to the outputs of every layer except the last).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.scan import gru_scan, lstm_scan


class RNNStack(nn.Module):
    cell: str  # "gru" | "lstm"
    d_model: int
    n_layers: int = 1
    bidirectional: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        H = self.d_model
        gates = 3 if self.cell == "gru" else 4
        B = x.shape[0]

        def init(key, shape, dtype=jnp.float32):
            # torch RNN default: U(-1/sqrt(H), 1/sqrt(H)). The centering must
            # happen INSIDE the initializer — subtracting after self.param
            # would also shift weights restored from checkpoints.
            scale = H ** -0.5
            return jax.random.uniform(key, shape, dtype, -scale, scale)

        directions = 2 if self.bidirectional else 1

        for layer in range(self.n_layers):
            in_dim = x.shape[-1]
            outs = []
            for direction in range(directions):
                sfx = f"_l{layer}" + ("_reverse" if direction else "")
                w_ih = self.param(f"weight_ih{sfx}", init, (gates * H, in_dim))
                w_hh = self.param(f"weight_hh{sfx}", init, (gates * H, H))
                b_ih = self.param(f"bias_ih{sfx}", init, (gates * H,))
                b_hh = self.param(f"bias_hh{sfx}", init, (gates * H,))
                h0 = jnp.zeros((B, H), x.dtype)
                if self.cell == "gru":
                    y = gru_scan(x, h0, w_ih, w_hh, b_ih, b_hh,
                                 reverse=bool(direction))
                else:
                    c0 = jnp.zeros((B, H), x.dtype)
                    y = lstm_scan(x, h0, c0, w_ih, w_hh, b_ih, b_hh,
                                  reverse=bool(direction))
                outs.append(y)
            x = jnp.concatenate(outs, axis=-1) if directions == 2 else outs[0]
            if layer < self.n_layers - 1 and self.dropout_rate > 0.0:
                x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x
