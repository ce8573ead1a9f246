"""Mamba selective-state-space blocks (reference: model/mamba.py).

The reference's hot path — the Blelloch PScan autograd function
(model/pscan.py:37-226) or the optional mamba_ssm CUDA kernel
(model/mamba.py:242-248) — becomes :func:`video2music_tpu.ops.scan.
selective_scan`, built on ``jax.lax.associative_scan`` (autodiff for free,
XLA-fused on TPU). A Pallas fused kernel backs the same interface for large
shapes (ops/scan_pallas.py).

Reproduced details:
  * depthwise causal conv1d of width d_conv (reference mamba.py:175-178,
    applied with left padding then truncation to L);
  * dt_proj initialization: uniform(+-dt_rank^-0.5) weights and
    softplus-inverse bias over log-uniform [dt_min, dt_max] (:190-206);
  * S4D-real A init: A_log = log(1..d_state) per channel (:210-221);
  * "mamba+" (use_version=1) extra branch y*z + x*(1-sigmoid(z)) where z is
    already silu'd (:284-287).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.config import MambaBackboneConfig
from ..ops.kan import KANLinear
from ..ops.norms import RMSNorm
from ..ops.scan import selective_scan


def _dt_proj_bias_init(cfg: MambaBackboneConfig):
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, dtype)
            * (math.log(cfg.dt_max) - math.log(cfg.dt_min))
            + math.log(cfg.dt_min)
        )
        dt = jnp.clip(dt, min=1e-4)
        # inverse softplus
        return dt + jnp.log(-jnp.expm1(-dt))

    return init


def _a_log_init(cfg: MambaBackboneConfig):
    def init(key, shape, dtype=jnp.float32):
        a = jnp.tile(jnp.arange(1, cfg.d_state + 1, dtype=dtype),
                     (cfg.d_inner, 1))
        return jnp.log(a)

    return init


class MambaBlock(nn.Module):
    cfg: MambaBackboneConfig
    use_kan: bool = False

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        if self.use_kan:
            in_proj = KANLinear(cfg.d_model, 2 * cfg.d_inner, name="in_proj")
            x_proj = KANLinear(cfg.d_inner,
                               cfg.resolved_dt_rank + 2 * cfg.d_state,
                               name="x_proj")
            out_proj = KANLinear(cfg.d_inner, cfg.d_model, name="out_proj")
        else:
            in_proj = nn.Dense(2 * cfg.d_inner, use_bias=cfg.bias,
                               name="in_proj")
            x_proj = nn.Dense(cfg.resolved_dt_rank + 2 * cfg.d_state,
                              use_bias=False, name="x_proj")
            out_proj = nn.Dense(cfg.d_model, use_bias=cfg.bias,
                                name="out_proj")

        xz = in_proj(x)
        xb, z = jnp.split(xz, 2, axis=-1)  # (B, L, ED) each

        # depthwise causal conv over time
        conv_kernel = self.param(
            "conv_kernel",
            nn.initializers.lecun_normal(),
            (cfg.d_conv, 1, cfg.d_inner),
        )
        xb = jax.lax.conv_general_dilated(
            xb, conv_kernel,
            window_strides=(1,),
            padding=[(cfg.d_conv - 1, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=cfg.d_inner,
        )
        if cfg.conv_bias:
            conv_b = self.param("conv_bias", nn.initializers.zeros,
                                (cfg.d_inner,))
            xb = xb + conv_b
        xb = nn.silu(xb)

        # SSM
        dbc = x_proj(xb)
        delta, B, C = jnp.split(
            dbc, [cfg.resolved_dt_rank, cfg.resolved_dt_rank + cfg.d_state],
            axis=-1)
        dt_w = self.param(
            "dt_proj_kernel",
            nn.initializers.uniform(scale=2 * cfg.resolved_dt_rank ** -0.5),
            (cfg.resolved_dt_rank, cfg.d_inner))
        # uniform(scale=s) samples [0, s); shift to [-s/2, s/2)
        dt_w = dt_w - cfg.resolved_dt_rank ** -0.5
        dt_b = self.param("dt_proj_bias", _dt_proj_bias_init(cfg),
                          (cfg.d_inner,))
        delta = jax.nn.softplus(delta @ dt_w + dt_b)
        A = -jnp.exp(self.param("A_log", _a_log_init(cfg),
                                (cfg.d_inner, cfg.d_state)))
        D = self.param("D", nn.initializers.ones, (cfg.d_inner,))
        y = selective_scan(xb, delta, A, B, C, D)

        z = nn.silu(z)
        if cfg.use_version == 1:  # mamba+
            out = y * z + xb * (1.0 - jax.nn.sigmoid(z))
        else:
            out = y * z
        out = out_proj(out)
        if cfg.dropout > 0.0:
            out = nn.Dropout(cfg.dropout)(out, deterministic=deterministic)
        return out


class ResidualBlock(nn.Module):
    cfg: MambaBackboneConfig
    use_kan: bool = False

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = RMSNorm(self.cfg.d_model, self.cfg.rms_norm_eps, name="norm")(x)
        return MambaBlock(self.cfg, self.use_kan, name="mixer")(
            h, deterministic=deterministic) + x


class Mamba(nn.Module):
    """Stack of residual Mamba blocks (reference: mamba.py:77-104)."""

    cfg: MambaBackboneConfig
    n_layers: int = 2
    use_kan: bool = False

    @nn.compact
    def __call__(self, x, deterministic=True):
        for i in range(self.n_layers):
            x = ResidualBlock(self.cfg, self.use_kan, name=f"layer_{i}")(
                x, deterministic=deterministic)
        return x


class MoEMamba(nn.Module):
    """Residual Mamba block followed by a residual MoE per layer
    (reference: mamba.py:106-132)."""

    cfg: MambaBackboneConfig
    n_layers: int = 2
    use_kan: bool = False
    moe_maker: object = None  # callable (name) -> nn.Module

    @nn.compact
    def __call__(self, x, deterministic=True):
        for i in range(self.n_layers):
            x = ResidualBlock(self.cfg, self.use_kan, name=f"mamba_{i}")(
                x, deterministic=deterministic)
            h = RMSNorm(self.cfg.d_model, self.cfg.rms_norm_eps,
                        name=f"moe_norm_{i}")(x)
            x = self.moe_maker(f"moe_{i}")(h, deterministic=deterministic) + x
        return x
