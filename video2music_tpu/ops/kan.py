"""KANLinear — Kolmogorov-Arnold layer with B-spline basis.

Port of the ``efficient_kan`` layer the reference depends on (imported at
model/moe.py:17, model/mamba.py:12; used as the V2.3 MoE expert,
model/video_music_transformer.py:385-386). The forward math matches
efficient-kan: ``silu(x) @ W_base + B(x) @ W_spline`` where B(x) are
Cox-de-Boor B-spline bases of order ``spline_order`` on a uniform grid over
``grid_range`` extended by ``spline_order`` knots on each side.

Deviation: efficient-kan initializes the spline weights by least-squares
fitting random noise (``curve2coeff``) and supports on-line grid refinement;
we initialize with small normal noise and keep the grid fixed — both only
affect training-from-scratch dynamics, not the function class.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
import jax


class KANLinear(nn.Module):
    in_features: int
    out_features: int
    grid_size: int = 5
    spline_order: int = 3
    grid_range: tuple = (-1.0, 1.0)

    def _grid(self) -> np.ndarray:
        lo, hi = self.grid_range
        h = (hi - lo) / self.grid_size
        knots = (
            np.arange(-self.spline_order, self.grid_size + self.spline_order + 1)
            * h + lo
        )
        return knots.astype(np.float32)  # (grid_size + 2*spline_order + 1,)

    def b_splines(self, x):
        """x: (..., in) -> bases (..., in, grid_size + spline_order)."""
        grid = jnp.asarray(self._grid())  # (G,)
        x = x[..., None]  # (..., in, 1)
        bases = ((x >= grid[:-1]) & (x < grid[1:])).astype(x.dtype)
        for k in range(1, self.spline_order + 1):
            left = (x - grid[: -(k + 1)]) / (grid[k:-1] - grid[: -(k + 1)])
            right = (grid[k + 1:] - x) / (grid[k + 1:] - grid[1:-k])
            bases = left * bases[..., :-1] + right * bases[..., 1:]
        return bases

    @nn.compact
    def __call__(self, x):
        n_coeff = self.grid_size + self.spline_order
        base_w = self.param(
            "base_weight",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.in_features, self.out_features),
        )
        spline_w = self.param(
            "spline_weight",
            nn.initializers.normal(stddev=0.1 / self.grid_size),
            (self.in_features, n_coeff, self.out_features),
        )
        base_out = jax.nn.silu(x) @ base_w
        bases = self.b_splines(x)  # (..., in, n_coeff)
        spline_out = jnp.einsum("...ik,iko->...o", bases, spline_w)
        return base_out + spline_out
