"""Normalization layers (LayerNorm / RMSNorm).

RMSNorm mirrors the reference's Llama-style implementation
(reference: model/custom_transformer.py:27-49): fp32 accumulation for the
mean-square, optional elementwise affine, eps inside rsqrt.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        out = xf * jax.lax.rsqrt(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps
        )
        if self.elementwise_affine:
            weight = self.param("weight", nn.initializers.ones, (self.dim,))
            out = out * weight
        return out.astype(dtype)


def make_norm(kind: str, dim: int):
    """Factory used by the transformer stacks: "layernorm" | "rmsnorm"."""
    if kind == "layernorm":
        return nn.LayerNorm(epsilon=1e-5)
    if kind == "rmsnorm":
        return RMSNorm(dim=dim, eps=1e-6)
    raise ValueError(f"unknown norm kind: {kind!r}")
