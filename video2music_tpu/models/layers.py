"""Transformer encoder/decoder layers assembled from LayerSpec.

Replaces the reference's wrapper zoo (model/custom_transformer.py:1220-1433:
TransformerEncoderLayer/DecoderLayer/Encoder/Decoder/EncoderShorter/
DecoderShorter, plus the torch-forked RPR layers in model/rpr.py:17-109) with
two modules driven by config.

Residual/norm orders reproduced:
  * post-norm (reference custom_transformer.py:1230-1248):
      x = norm1(x + attn(x)); x = norm2(x + ffn(x))
  * pre-norm (:1241-1248): x = x + attn(norm1(x)); x = x + ffn(norm2(x))
  * the original torch layers used by the base AMT additionally apply dropout
    on each sublayer output (residual_dropout=True).
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..core.config import AMTConfig, LayerSpec
from ..ops.attention import MultiHeadAttention
from ..ops.moe import MoELayer
from ..ops.norms import make_norm


def _seq_shard(x, cfg: AMTConfig):
    """Megatron sequence parallelism: pin the residual stream to
    (batch over "data", sequence over "model"). Under TP weight shardings
    GSPMD then turns each layer's closing all-reduce into a
    reduce-scatter and all-gathers only at the matmul entrances, while
    LN/dropout/residual math runs on sequence shards. No-op unless
    ``cfg.sequence_parallel`` (and requires a ``jax.sharding.set_mesh``
    context at trace time)."""
    if not cfg.sequence_parallel:
        return x
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty:
        # no mesh context (e.g. model.init outside set_mesh) — the
        # constraint would be meaningless anyway, skip it
        return x
    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
    shape = dict(mesh.shape)
    if MODEL_AXIS not in shape or DATA_AXIS not in shape:
        # mesh with foreign axis names (user set_mesh outside
        # parallel.mesh) — the P("data", "model", None) constraint would
        # raise an unbound-axis trace error, so stay unconstrained
        return x
    axis = shape[MODEL_AXIS]
    if x.shape[1] % axis:
        # sequence not divisible by the model axis (the AMT chord stream
        # is 299 = max_seq_chord - 1, odd) — stay on plain TP there; the
        # 300-token video/encoder stream still sequence-shards
        return x
    return jax.lax.with_sharding_constraint(x, P(DATA_AXIS, MODEL_AXIS, None))


class ReluFFN(nn.Module):
    """torch TransformerEncoderLayer feed-forward: Dense-ReLU-drop-Dense."""

    d_model: int
    d_ff: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.relu(nn.Dense(self.d_ff)(x))
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.d_model)(h)


class SwiGLU(nn.Module):
    """GLUExpert (reference: model/moe.py:36-49)."""

    d_model: int
    d_ff: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.d_ff, name="linear1")(x)
        g = nn.Dense(self.d_ff, name="gate")(x)
        h = h * nn.silu(g)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, name="linear2")(h)


def make_ffn(spec: LayerSpec, cfg: AMTConfig, name: str):
    if spec.ffn == "relu_mlp":
        return ReluFFN(cfg.d_model, cfg.d_ff, cfg.dropout, name=name)
    if spec.ffn == "swiglu":
        return SwiGLU(cfg.d_model, cfg.d_ff, cfg.dropout, name=name)
    if spec.ffn == "moe":
        return MoELayer(cfg=cfg.moe, d_model=cfg.d_model, d_ff=cfg.d_ff,
                        dropout_rate=cfg.dropout, name=name)
    raise ValueError(f"unknown ffn kind {spec.ffn!r}")


class EncoderLayer(nn.Module):
    spec: LayerSpec
    cfg: AMTConfig
    depth: int = 0
    residual_dropout: bool = False

    def setup(self):
        self.self_attn = MultiHeadAttention(
            cfg=self.spec.attn, d_model=self.cfg.d_model,
            dropout_rate=self.cfg.dropout, depth=self.depth,
            max_cache_len=self.cfg.max_seq_video,
            remat=self.cfg.remat_attention, name="self_attn")
        self.ffn = make_ffn(self.spec, self.cfg, "ffn")
        self.norm1 = make_norm(self.cfg.norm, self.cfg.d_model)
        self.norm2 = make_norm(self.cfg.norm, self.cfg.d_model)
        self.res_drop = nn.Dropout(self.cfg.dropout)

    def _drop(self, x, deterministic):
        if self.residual_dropout:
            return self.res_drop(x, deterministic=deterministic)
        return x

    def __call__(self, x, deterministic=True, emotion_ids=None):
        d = deterministic
        sp = lambda h: _seq_shard(h, self.cfg)
        ffn = lambda h: (self.ffn(h, deterministic=d,
                                  emotion_ids=emotion_ids)
                         if isinstance(self.ffn, MoELayer)
                         else self.ffn(h, deterministic=d))
        if not self.cfg.pre_norm:
            x = sp(self.norm1(x + self._drop(
                self.self_attn(x, deterministic=d), d)))
            x = sp(self.norm2(x + self._drop(ffn(x), d)))
        else:
            x = sp(x + self._drop(
                self.self_attn(self.norm1(x), deterministic=d), d))
            x = sp(x + self._drop(ffn(self.norm2(x)), d))
        return x


class DecoderLayer(nn.Module):
    spec: LayerSpec
    cfg: AMTConfig
    depth: int = 0
    residual_dropout: bool = False

    def setup(self):
        cross_spec = self.spec.cross_attn or self.spec.attn
        self.self_attn = MultiHeadAttention(
            cfg=self.spec.attn, d_model=self.cfg.d_model,
            dropout_rate=self.cfg.dropout, depth=self.depth,
            max_cache_len=self.cfg.max_seq_chord,
            remat=self.cfg.remat_attention, name="self_attn")
        self.cross_attn = MultiHeadAttention(
            cfg=cross_spec, d_model=self.cfg.d_model, is_cross=True,
            dropout_rate=self.cfg.dropout, depth=self.depth,
            max_cache_len=self.cfg.max_seq_video,
            max_query_len=self.cfg.max_seq_chord,
            remat=self.cfg.remat_attention, name="cross_attn")
        self.ffn = make_ffn(self.spec, self.cfg, "ffn")
        self.norm1 = make_norm(self.cfg.norm, self.cfg.d_model)
        self.norm2 = make_norm(self.cfg.norm, self.cfg.d_model)
        self.norm3 = make_norm(self.cfg.norm, self.cfg.d_model)
        self.res_drop = nn.Dropout(self.cfg.dropout)

    def _drop(self, x, deterministic):
        if self.residual_dropout:
            return self.res_drop(x, deterministic=deterministic)
        return x

    def prime(self, memory):
        """Project and cache encoder memory K/V for cached decoding."""
        self.cross_attn(memory, memory, mode="prime")

    def __call__(self, x, memory=None, deterministic=True, mode="full",
                 decode_pos=None, emotion_ids=None):
        d = deterministic
        sa = lambda q: self.self_attn(q, causal=True, deterministic=d,
                                      mode=mode, decode_pos=decode_pos)
        ca = lambda q: self.cross_attn(q, memory, deterministic=d,
                                       mode=mode, decode_pos=decode_pos)
        ffn = lambda h: (self.ffn(h, deterministic=d,
                                  emotion_ids=emotion_ids)
                         if isinstance(self.ffn, MoELayer)
                         else self.ffn(h, deterministic=d))
        # sequence-parallel constraints only make sense on (B, L, D)
        # streams — cached single-token decode steps skip them
        sp = (lambda h: _seq_shard(h, self.cfg)) if mode == "full" \
            else (lambda h: h)
        if not self.cfg.pre_norm:
            x = sp(self.norm1(x + self._drop(sa(x), d)))
            x = sp(self.norm2(x + self._drop(ca(x), d)))
            x = sp(self.norm3(x + self._drop(ffn(x), d)))
        else:
            x = sp(x + self._drop(sa(self.norm1(x)), d))
            x = sp(x + self._drop(ca(self.norm2(x)), d))
            x = sp(x + self._drop(ffn(self.norm3(x)), d))
        return x
