"""Mixture-of-experts feed-forward with dense TPU-friendly dispatch.

The reference routes tokens with a per-expert boolean-gather python loop
(reference: model/moe.py:191-200,291-298) — shape-dynamic and serial. On TPU
we compute every expert for every token as one batched einsum over stacked
expert weights and combine with the (tokens, experts) routing-weight matrix.
With 6 experts / top-2 this trades ~3x expert FLOPs (dense MXU work) for zero
gathers, zero host sync, and a fully static graph; at d_ff=1024 this is a
large wall-clock win over the reference's loop.

Reproduced semantics (reference: model/moe.py):
  * top-k gate over ``gate(x)`` logits, softmax over the selected logits
    (:183-189,288)
  * SharedMoE always-on shared expert scaled by 1/k (:300-302)
  * aux-loss-free balancing: a non-gradient bias is added to the gate logits
    for *selection only* during training; weights come from the raw logits;
    the bias moves by update_rate * (mean(count) - count) each train step
    (:256-280). The buffer mutation becomes a flax "moe_state" variable.
  * TopKScheduler annealing k from n_experts down to n_experts_per_token
    every ``update_step`` training steps (:66-82) — implemented with a
    *dynamic* k so the jitted graph is static: expert e participates iff its
    rank among the gate logits is < k.
  * expert-load observability: per-call selection counts are accumulated in
    the "metrics" collection instead of the reference's global mutable
    counters (third_party/log_experts.py, log_maxvio.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import MoEConfig
from .kan import KANLinear


class GLUExpertStack(nn.Module):
    """n_experts SwiGLU experts evaluated densely (reference GLUExpert,
    model/moe.py:36-49)."""

    n_experts: int
    d_model: int
    d_ff: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        # x: (B, L, D) -> (B, L, E, D)
        E, D, F = self.n_experts, self.d_model, self.d_ff
        init = nn.initializers.lecun_normal()
        w1 = self.param("w1", init, (E, D, F))
        b1 = self.param("b1", nn.initializers.zeros, (E, F))
        wg = self.param("wg", init, (E, D, F))
        bg = self.param("bg", nn.initializers.zeros, (E, F))
        w2 = self.param("w2", init, (E, F, D))
        b2 = self.param("b2", nn.initializers.zeros, (E, D))
        h = jnp.einsum("bld,edf->blef", x, w1) + b1
        g = jnp.einsum("bld,edf->blef", x, wg) + bg
        h = h * jax.nn.silu(g)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return jnp.einsum("blef,efd->bled", h, w2) + b2


class MLPExpertStack(nn.Module):
    """n_experts SiLU MLP experts: D -> 2D -> D (reference:
    model/video_music_transformer.py:82-88)."""

    n_experts: int
    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        E, D = self.n_experts, self.d_model
        init = nn.initializers.lecun_normal()
        w1 = self.param("w1", init, (E, D, 2 * D))
        b1 = self.param("b1", nn.initializers.zeros, (E, 2 * D))
        w2 = self.param("w2", init, (E, 2 * D, D))
        b2 = self.param("b2", nn.initializers.zeros, (E, D))
        h = jax.nn.silu(jnp.einsum("bld,edf->blef", x, w1) + b1)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return jnp.einsum("blef,efd->bled", h, w2) + b2


class KANExpertStack(nn.Module):
    """n_experts single KANLinear(D, D) experts (reference V2.3 expert,
    model/video_music_transformer.py:385-386)."""

    n_experts: int
    d_model: int

    @nn.compact
    def __call__(self, x, deterministic=True):
        outs = []
        for e in range(self.n_experts):
            outs.append(KANLinear(self.d_model, self.d_model, name=f"kan_{e}")(x))
        return jnp.stack(outs, axis=-2)  # (B, L, E, D)


def _expert_stack(cfg: MoEConfig, d_model: int, d_ff: int, dropout: float,
                  n: int, name: str):
    if cfg.expert == "glu":
        return GLUExpertStack(n, d_model, d_ff, dropout, name=name)
    if cfg.expert == "mlp":
        return MLPExpertStack(n, d_model, dropout, name=name)
    if cfg.expert == "kan":
        return KANExpertStack(n, d_model, name=name)
    raise ValueError(f"unknown expert type {cfg.expert!r}")


class MoELayer(nn.Module):
    """Top-k MoE FFN; covers both reference MoELayer and SharedMoELayer."""

    cfg: MoEConfig
    d_model: int
    d_ff: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True, emotion_ids=None):
        cfg = self.cfg
        E = cfg.n_experts
        gate = nn.Dense(E, name="gate")
        gate_logits = gate(x).astype(jnp.float32)  # (B, L, E)

        is_training = not deterministic

        # -- dynamic k (TopKScheduler, reference moe.py:66-82). The scheduler
        # only applies while training; eval uses the floor k (moe.py:172-176).
        if cfg.topk_schedule and is_training:
            step_var = self.variable("moe_state", "sched_step",
                                     lambda: jnp.zeros((), jnp.int32))
            k = jnp.maximum(
                cfg.n_experts_per_token,
                E - (step_var.value + 1) // cfg.topk_update_step,
            )
            if not self.is_initializing():
                step_var.value = step_var.value + 1
        else:
            if cfg.topk_schedule:
                # keep the variable present so train/eval pytrees match
                self.variable("moe_state", "sched_step",
                              lambda: jnp.zeros((), jnp.int32))
            k = jnp.asarray(cfg.n_experts_per_token, jnp.int32)

        # -- selection logits (optionally biased for balancing) --
        select_logits = gate_logits
        if cfg.balancing:
            bias_var = self.variable("moe_state", "balance_bias",
                                     lambda: jnp.zeros((E,), jnp.float32))
            if is_training:
                select_logits = gate_logits + bias_var.value

        # Rank experts per token: expert participates iff rank < k. This is
        # exactly torch.topk + softmax-over-selected, with a dynamic k.
        order = jnp.argsort(-select_logits, axis=-1)  # (B, L, E)
        ranks = jnp.argsort(order, axis=-1)  # rank of each expert
        selected = ranks < k  # (B, L, E) bool

        # routing weights: softmax over the *raw* gate logits of selected
        # experts (reference uses gather(gate_logits) when balancing,
        # moe.py:265-267; unbiased logits otherwise)
        masked = jnp.where(selected, gate_logits, -jnp.inf)

        # -- TemperatureScheduler (reference moe.py:84-97): anneal the
        # routing-softmax temperature t from min to max by +step per call.
        # Dead in the reference live path (always None); quirk kept: the
        # SharedMoELayer steps/applies it during eval too (moe.py:238-240),
        # the plain MoELayer is training-only (moe.py:174-176). Division by
        # a positive scalar never changes the top-k selection, so only the
        # softmax sees t — same math as both reference layers.
        if cfg.temperature_schedule:
            t_var = self.variable("moe_state", "temp_step",
                                  lambda: jnp.zeros((), jnp.int32))
            applies = is_training or cfg.shared_expert
            if applies and not self.is_initializing():
                t_var.value = t_var.value + 1  # step() before getT()
            if applies:
                t = jnp.minimum(
                    cfg.temperature_min
                    + t_var.value.astype(jnp.float32) * cfg.temperature_step,
                    cfg.temperature_max)
                masked = masked / t

        weights = jax.nn.softmax(masked, axis=-1)  # zeros at unselected

        # -- dense expert evaluation & combine --
        experts = _expert_stack(cfg, self.d_model, self.d_ff,
                                self.dropout_rate, E, "experts")
        expert_out = experts(x, deterministic=deterministic)  # (B, L, E, D)
        expert_out = nn.Dropout(self.dropout_rate)(
            expert_out, deterministic=deterministic)
        out = jnp.einsum("ble,bled->bld", weights.astype(expert_out.dtype),
                         expert_out)

        if cfg.shared_expert:
            shared = _expert_stack(cfg, self.d_model, self.d_ff,
                                   self.dropout_rate, 1, "shared_expert")
            out = out + shared(x, deterministic=deterministic)[..., 0, :] / k

        # -- load counts: balancing update + observability --
        counts = jnp.sum(selected, axis=(0, 1)).astype(jnp.float32)  # (E,)
        if cfg.balancing and is_training and not self.is_initializing():
            err = jnp.mean(counts) - counts
            bias_var.value = bias_var.value + cfg.balancing_update_rate * err

        count_metric = self.variable("metrics", "expert_counts",
                                     lambda: jnp.zeros((E,), jnp.float32))
        if not self.is_initializing():
            count_metric.value = count_metric.value + counts
        maxvio = self.variable("metrics", "maxvio",
                               lambda: jnp.zeros((), jnp.float32))
        if not self.is_initializing():
            mean_c = jnp.maximum(jnp.mean(counts), 1e-6)
            maxvio.value = (jnp.max(counts) - mean_c) / mean_c

        # expert-emotion attribution: per-(dominant emotion, expert)
        # selection counts, eval only — the functional replacement for the
        # global counters of third_party/log_experts.py:50-76 (hooked at
        # moe.py:188,286). emotion_ids: (B, L') ints in [-1, 5].
        if emotion_ids is not None:
            ee = self.variable("metrics", "expert_emotion_counts",
                               lambda: jnp.zeros((6, E), jnp.float32))
            if deterministic and not self.is_initializing():
                L = min(x.shape[1], emotion_ids.shape[1])
                onehot = (emotion_ids[:, :L, None]
                          == jnp.arange(6)[None, None, :])
                ee.value = ee.value + jnp.einsum(
                    "blc,ble->ce", onehot.astype(jnp.float32),
                    selected[:, :L].astype(jnp.float32))

        return out
