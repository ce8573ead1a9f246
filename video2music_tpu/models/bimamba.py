"""Bidirectional Mamba encoders (reference: model/bimamba.py).

Two layer flavors:
  * ``BiMambaEncoderLayer`` — Bi-Mamba4TS style: independent forward/backward
    MambaBlocks, each with its own Add&Norm and FFN (reference :34-100).
    QUIRK reproduced from the reference live path (flagged in SURVEY.md §7):
    the backward branch's FFN consumes the *forward* branch's features
    (``x_b = self.ffn2(x_f)``, reference :92). Set
    ``reproduce_reference_quirk=False`` for the corrected behavior.
  * ``BiMambaEncoderLayerV1`` — Bi-Mamba+ style: shared FFN (optionally an
    MoE layer), pre/post-norm switch (reference :103-191).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..core.config import MambaBackboneConfig
from .mamba import MambaBlock


class _ReluFFN(nn.Module):
    d_model: int
    d_ff: int
    dropout_rate: float

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.relu(nn.Dense(self.d_ff)(x))
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.d_model)(h)


class BiMambaEncoderLayer(nn.Module):
    cfg: MambaBackboneConfig
    d_ff: int = 1024
    dropout_rate: float = 0.2
    reproduce_reference_quirk: bool = True

    @nn.compact
    def __call__(self, x, deterministic=True):
        d = deterministic
        drop = lambda v: nn.Dropout(self.dropout_rate, deterministic=d)(v)
        x_flip = jnp.flip(x, axis=1)

        # forward branch
        x_f = MambaBlock(self.cfg, name="mamba_forward")(x, deterministic=d)
        x_f = nn.LayerNorm(name="norm1")(drop(x_f) + x)
        res_f = x_f
        x_f = _ReluFFN(self.cfg.d_model, self.d_ff, self.dropout_rate,
                       name="ffn1")(x_f, deterministic=d)
        x_f = nn.LayerNorm(name="norm2")(drop(x_f) + res_f)

        # backward branch
        x_b = MambaBlock(self.cfg, name="mamba_backward")(x_flip,
                                                          deterministic=d)
        x_b = jnp.flip(x_b, axis=1)
        x_b = nn.LayerNorm(name="norm3")(drop(x_b) + x)
        res_b = x_b
        ffn2_in = x_f if self.reproduce_reference_quirk else x_b
        x_b2 = _ReluFFN(self.cfg.d_model, self.d_ff, self.dropout_rate,
                        name="ffn2")(ffn2_in, deterministic=d)
        x_b = nn.LayerNorm(name="norm4")(drop(x_b2) + res_b)

        return x_f + x_b


class BiMambaEncoderLayerV1(nn.Module):
    """Bi-Mamba+ layer: fwd/bwd MambaBlocks (use_version=1) + shared FFN."""

    cfg: MambaBackboneConfig
    d_ff: int = 1024
    dropout_rate: float = 0.2
    norm_first: bool = False
    moe_maker: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        d = deterministic
        drop = lambda v: nn.Dropout(self.dropout_rate, deterministic=d)(v)
        x_flip = jnp.flip(x, axis=1)
        fwd = MambaBlock(self.cfg, name="mamba_forward")
        bwd = MambaBlock(self.cfg, name="mamba_backward")
        if self.moe_maker is not None:
            ffn = self.moe_maker("ffn")
        else:
            ffn = _ReluFFN(self.cfg.d_model, self.d_ff, self.dropout_rate,
                           name="ffn")

        if self.norm_first:
            x_f = x + drop(fwd(nn.LayerNorm(name="norm1")(x), deterministic=d))
            x_b = x + drop(jnp.flip(
                bwd(nn.LayerNorm(name="norm2")(x_flip), deterministic=d),
                axis=1))
            x = x_f + x_b
            res = x
            x = res + drop(ffn(nn.LayerNorm(name="norm3")(x),
                               deterministic=d))
        else:
            x_f = nn.LayerNorm(name="norm1")(drop(fwd(x, deterministic=d)) + x)
            x_b = nn.LayerNorm(name="norm2")(
                drop(jnp.flip(bwd(x_flip, deterministic=d), axis=1)) + x)
            x = x_f + x_b
            res = x
            x = nn.LayerNorm(name="norm3")(
                drop(ffn(x, deterministic=d)) + res)
        return x


class BiMambaEncoder(nn.Module):
    """Stack of BiMamba layers (reference: bimamba.py:9-31)."""

    cfg: MambaBackboneConfig
    d_ff: int = 1024
    n_layers: int = 2
    dropout_rate: float = 0.2
    norm_first: bool = False
    moe_maker: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        for i in range(self.n_layers):
            if self.cfg.use_version == 0:
                x = BiMambaEncoderLayer(self.cfg, self.d_ff,
                                        self.dropout_rate,
                                        name=f"layer_{i}")(x, deterministic)
            else:
                x = BiMambaEncoderLayerV1(
                    self.cfg, self.d_ff, self.dropout_rate,
                    norm_first=self.norm_first, moe_maker=self.moe_maker,
                    name=f"layer_{i}")(x, deterministic)
        if self.norm_first:
            x = nn.LayerNorm(name="final_norm")(x)
        return x
