"""VideoRegression — per-second note-density/loudness regression + 40-way
instrument classification over a backbone registry.

Reference: model/video_regression.py:104-245. Input features are
[semantic | emotion] (774-d; scene/motion are excluded on the live path,
:208-224) projected to d_model, run through one of:

  bilstm / bigru / lstm / gru      — RNNStack (torch-parity cells)
  cnngru / cnnbigru                — Conv1d(k=7)+SiLU+dropout then GRU
  mamba / mamba+ / moemamba        — Mamba residual stacks
  bimamba / bimamba+               — BiMambaEncoder (v0 / v1)
  moe_bimamba+ / sharedmoe_bimamba+ — BiMamba+ with (Shared)MoE FFN
  mingru                           — MinGRULM-style stack (present in the
                                     reference's head-dimension dispatch
                                     :196-206 but unreachable in its ctor;
                                     supported here)

Heads: Dense(d or 2d -> 2) regressor and Dense(-> 40)+sigmoid classifier.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from ..core import constants as C
from ..core.config import MambaBackboneConfig, MoEConfig, RegressionConfig
from ..ops.moe import MoELayer
from .mamba import Mamba, MoEMamba
from .bimamba import BiMambaEncoder
from .mingru import MinGRU, _LMRMSNorm
from .rnn import RNNStack

BACKBONES = (
    "bilstm", "bigru", "lstm", "gru", "cnngru", "cnnbigru",
    "mamba", "mamba+", "moemamba", "bimamba", "bimamba+",
    "moe_bimamba+", "sharedmoe_bimamba+", "mingru",
)


class CNNGRU(nn.Module):
    """Conv1d(k=7, same) + SiLU + dropout -> GRU (reference :86-104)."""

    d_model: int
    n_layers: int = 1
    dropout_rate: float = 0.1
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Conv(self.d_model, kernel_size=(7,), padding="SAME",
                    name="cnn")(x)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return RNNStack("gru", self.d_model, self.n_layers,
                        bidirectional=self.bidirectional,
                        dropout_rate=self.dropout_rate, name="gru")(
            h, deterministic=deterministic)


def _moe_maker(cfg: RegressionConfig, shared: bool):
    """MoE FFN factory for the *_bimamba+/moemamba variants. The reference
    expert is GLUExpert(d_model, 2*d_model+1) (video_regression.py:166-183)."""

    def maker(name):
        moe_cfg = MoEConfig(n_experts=6, n_experts_per_token=2, expert="glu",
                            shared_expert=shared)
        return MoELayer(cfg=moe_cfg, d_model=cfg.d_model,
                        d_ff=2 * cfg.d_model + 1, dropout_rate=cfg.dropout,
                        name=name)

    return maker


class VideoRegression(nn.Module):
    cfg: RegressionConfig

    def _backbone(self):
        cfg = self.cfg
        rm = cfg.reg_model
        mamba_cfg = lambda **kw: MambaBackboneConfig(
            d_model=cfg.d_model, dropout=cfg.dropout, bias=True, **kw)
        if rm in ("bilstm", "bigru", "lstm", "gru"):
            return RNNStack("lstm" if "lstm" in rm else "gru", cfg.d_model,
                            cfg.n_layers, bidirectional=rm.startswith("bi"),
                            dropout_rate=cfg.dropout, name="model")
        if rm in ("cnngru", "cnnbigru"):
            return CNNGRU(cfg.d_model, cfg.n_layers, cfg.dropout,
                          bidirectional=(rm == "cnnbigru"), name="model")
        if rm == "mamba":
            return Mamba(mamba_cfg(), cfg.n_layers, cfg.use_kan, name="model")
        if rm == "mamba+":
            return Mamba(mamba_cfg(use_version=1), cfg.n_layers, cfg.use_kan,
                         name="model")
        if rm == "moemamba":
            return MoEMamba(
                mamba_cfg(d_state=cfg.d_hidden, d_conv=8), cfg.n_layers,
                cfg.use_kan, moe_maker=_moe_maker(cfg, shared=True),
                name="model")
        if rm == "bimamba":
            return BiMambaEncoder(mamba_cfg(), cfg.d_hidden, cfg.n_layers,
                                  cfg.dropout, name="model")
        if rm == "bimamba+":
            return BiMambaEncoder(mamba_cfg(use_version=1), cfg.d_hidden,
                                  cfg.n_layers, cfg.dropout, name="model")
        if rm == "moe_bimamba+":
            return BiMambaEncoder(mamba_cfg(use_version=1), cfg.d_hidden,
                                  cfg.n_layers, cfg.dropout,
                                  moe_maker=_moe_maker(cfg, shared=False),
                                  name="model")
        if rm == "sharedmoe_bimamba+":
            return BiMambaEncoder(mamba_cfg(use_version=1), cfg.d_hidden,
                                  cfg.n_layers, cfg.dropout,
                                  moe_maker=_moe_maker(cfg, shared=True),
                                  name="model")
        if rm == "mingru":
            return _MinGRUBackbone(cfg.d_model, cfg.n_layers, name="model")
        raise ValueError(f"unknown regression backbone {rm!r}")

    @nn.compact
    def __call__(self, semantic, scene_offset, motion, emotion,
                 deterministic: bool = True):
        cfg = self.cfg
        dt = semantic.dtype if jnp.issubdtype(semantic.dtype,
                                              jnp.floating) else jnp.float32
        # live-path features: semantic + emotion only (reference :208-224)
        vf = jnp.concatenate(
            [semantic.astype(dt), emotion.astype(dt)], axis=-1)
        vf = nn.Dense(cfg.d_model, name="in_proj")(vf)
        vf = nn.Dropout(cfg.dropout)(vf, deterministic=deterministic)
        out = self._backbone()(vf, deterministic=deterministic)
        d_out = out.shape[-1]
        loudness_notedensity = nn.Dense(2, name="regressor")(out)
        instrument = nn.sigmoid(
            nn.Dense(C.INSTRUMENT_SIZE, name="classifier")(out))
        return loudness_notedensity, instrument


class _MinGRUBackbone(nn.Module):
    """Norm+minGRU+FF residual blocks at (B, L, d) (no logits head)."""

    d_model: int
    depth: int = 2

    @nn.compact
    def __call__(self, x, deterministic=True):
        for i in range(self.depth):
            h = _LMRMSNorm(self.d_model, name=f"norm_{i}")(x)
            x = MinGRU(self.d_model, 1.5, name=f"mingru_{i}")(h) + x
            h = _LMRMSNorm(self.d_model, name=f"ff_norm_{i}")(x)
            h = nn.gelu(nn.Dense(self.d_model * 4, name=f"ff1_{i}")(h))
            x = nn.Dense(self.d_model, name=f"ff2_{i}")(h) + x
        return x
