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
    model/moe.py:36-49); with ``expert_idx`` only the selected experts'
    weights are gathered and evaluated (the decode fast path)."""

    n_experts: int
    d_model: int
    d_ff: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True, expert_idx=None,
                 per_expert=False):
        # x: (B, L, D) -> (B, L, E, D); with expert_idx (B, L, K) int ->
        # (B, L, K, D); with per_expert, x is an (E, C, D) dispatch buffer
        E, D, F = self.n_experts, self.d_model, self.d_ff
        init = nn.initializers.lecun_normal()
        w1 = self.param("w1", init, (E, D, F))
        b1 = self.param("b1", nn.initializers.zeros, (E, F))
        wg = self.param("wg", init, (E, D, F))
        bg = self.param("bg", nn.initializers.zeros, (E, F))
        w2 = self.param("w2", init, (E, F, D))
        b2 = self.param("b2", nn.initializers.zeros, (E, D))
        if per_expert:
            # x: (E, C, D) capacity dispatch buffer -> (E, C, D)
            h = jnp.einsum("ecd,edf->ecf", x, w1) + b1[:, None, :]
            g = jnp.einsum("ecd,edf->ecf", x, wg) + bg[:, None, :]
            h = h * jax.nn.silu(g)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
            return jnp.einsum("ecf,efd->ecd", h, w2) + b2[:, None, :]
        if expert_idx is not None:
            # Single-token decode: per-slot scalar dynamic_slice reads ONLY
            # the selected experts' weights from HBM (a fancy-index gather
            # materializes the slabs and measured *slower* than dense).
            # linear1 and gate fuse into one (D, 2F) matmul per slot.
            B, L, K = expert_idx.shape
            assert B * L == 1, "gathered path requires a single token"
            w1g = jnp.concatenate([w1, wg], axis=-1)  # (E, D, 2F), hoisted
            b1g = jnp.concatenate([b1, bg], axis=-1)  # (E, 2F), hoisted
            xv = x.reshape(1, D)
            idx = expert_idx.reshape(K)
            outs = []
            for j in range(K):
                e = idx[j]
                wj = jax.lax.dynamic_slice_in_dim(w1g, e, 1, 0)[0]
                bj = jax.lax.dynamic_slice_in_dim(b1g, e, 1, 0)[0]
                hj, gj = jnp.split(xv @ wj + bj, 2, axis=-1)
                hj = hj * jax.nn.silu(gj)
                w2j = jax.lax.dynamic_slice_in_dim(w2, e, 1, 0)[0]
                b2j = jax.lax.dynamic_slice_in_dim(b2, e, 1, 0)[0]
                outs.append(hj @ w2j + b2j)
            return jnp.stack(outs, axis=1).reshape(B, L, K, D)
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
    def __call__(self, x, deterministic=True, expert_idx=None,
                 per_expert=False):
        E, D = self.n_experts, self.d_model
        init = nn.initializers.lecun_normal()
        w1 = self.param("w1", init, (E, D, 2 * D))
        b1 = self.param("b1", nn.initializers.zeros, (E, 2 * D))
        w2 = self.param("w2", init, (E, 2 * D, D))
        b2 = self.param("b2", nn.initializers.zeros, (E, D))
        if per_expert:
            h = jax.nn.silu(jnp.einsum("ecd,edf->ecf", x, w1)
                            + b1[:, None, :])
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
            return jnp.einsum("ecf,efd->ecd", h, w2) + b2[:, None, :]
        if expert_idx is not None:
            # see GLUExpertStack: per-slot dynamic_slice, single-token only
            B, L, K = expert_idx.shape
            assert B * L == 1, "gathered path requires a single token"
            xv = x.reshape(1, D)
            idx = expert_idx.reshape(K)
            outs = []
            for j in range(K):
                e = idx[j]
                wj = jax.lax.dynamic_slice_in_dim(w1, e, 1, 0)[0]
                bj = jax.lax.dynamic_slice_in_dim(b1, e, 1, 0)[0]
                hj = jax.nn.silu(xv @ wj + bj)
                w2j = jax.lax.dynamic_slice_in_dim(w2, e, 1, 0)[0]
                b2j = jax.lax.dynamic_slice_in_dim(b2, e, 1, 0)[0]
                outs.append(hj @ w2j + b2j)
            return jnp.stack(outs, axis=1).reshape(B, L, K, D)
        h = jax.nn.silu(jnp.einsum("bld,edf->blef", x, w1) + b1)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return jnp.einsum("blef,efd->bled", h, w2) + b2


class KANExpertStack(nn.Module):
    """n_experts single KANLinear(D, D) experts (reference V2.3 expert,
    model/video_music_transformer.py:385-386)."""

    n_experts: int
    d_model: int

    @nn.compact
    def __call__(self, x, deterministic=True, expert_idx=None,
                 per_expert=False):
        assert expert_idx is None, "KAN experts have no gathered fast path"
        kans = [KANLinear(self.d_model, self.d_model, name=f"kan_{e}")
                for e in range(self.n_experts)]
        if per_expert:  # x: (E, C, D) -> (E, C, D)
            return jnp.stack([kan(x[e]) for e, kan in enumerate(kans)])
        return jnp.stack([kan(x) for kan in kans], axis=-2)  # (B, L, E, D)


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

        # -- TemperatureScheduler (reference moe.py:84-97): anneal the
        # routing-softmax temperature t from min to max by +step per call.
        # Dead in the reference live path (always None); quirk kept: the
        # SharedMoELayer steps/applies it during eval too (moe.py:238-240),
        # the plain MoELayer is training-only (moe.py:174-176). Division by
        # a positive scalar never changes the top-k selection, so only the
        # softmax sees t — same math as both reference layers.
        t_div = None
        if cfg.temperature_schedule:
            t_var = self.variable("moe_state", "temp_step",
                                  lambda: jnp.zeros((), jnp.int32))
            applies = is_training or cfg.shared_expert
            if applies and not self.is_initializing():
                t_var.value = t_var.value + 1  # step() before getT()
            if applies:
                t_div = jnp.minimum(
                    cfg.temperature_min
                    + t_var.value.astype(jnp.float32) * cfg.temperature_step,
                    cfg.temperature_max)

        experts = _expert_stack(cfg, self.d_model, self.d_ff,
                                self.dropout_rate, E, "experts")

        # Decode fast path: when only a handful of tokens route (B*L*k < E,
        # i.e. single-token cached decode), gather the selected experts'
        # weights instead of evaluating all E densely — HBM weight traffic
        # and FLOPs drop from E to k experts. Same math: top-k selection ==
        # rank < k for a static k (eval always uses the floor k,
        # reference moe.py:172-176).
        k_static = cfg.n_experts_per_token
        use_gather = (deterministic and cfg.expert != "kan"
                      and x.shape[0] * x.shape[1] == 1 and k_static < E)

        # Capacity-based sparse dispatch (training-scale): needs a static
        # k, so an actively-annealing TopKScheduler falls back to dense.
        use_capacity = (not use_gather and cfg.dispatch == "capacity"
                        and not (cfg.topk_schedule and is_training))

        if use_gather:
            _, idx = jax.lax.top_k(select_logits, k_static)  # (B, L, K)
            gsel = jnp.take_along_axis(gate_logits, idx, axis=-1)
            if t_div is not None:
                gsel = gsel / t_div
            weights_k = jax.nn.softmax(gsel, axis=-1)  # (B, L, K)
            expert_out = experts(x, deterministic=True, expert_idx=idx)
            out = jnp.einsum("blk,blkd->bld",
                             weights_k.astype(expert_out.dtype), expert_out)
            selected = jnp.any(
                idx[..., None] == jnp.arange(E)[None, None, None], axis=2)
        elif use_capacity:
            out, selected = self._capacity_dispatch(
                experts, x, gate_logits, select_logits, t_div,
                deterministic)
        else:
            # Rank experts per token: expert participates iff rank < k.
            # This is exactly torch.topk + softmax-over-selected, with a
            # dynamic k.
            order = jnp.argsort(-select_logits, axis=-1)  # (B, L, E)
            ranks = jnp.argsort(order, axis=-1)  # rank of each expert
            selected = ranks < k  # (B, L, E) bool

            # routing weights: softmax over the *raw* gate logits of
            # selected experts (reference uses gather(gate_logits) when
            # balancing, moe.py:265-267; unbiased logits otherwise)
            masked = jnp.where(selected, gate_logits, -jnp.inf)
            if t_div is not None:
                masked = masked / t_div
            weights = jax.nn.softmax(masked, axis=-1)  # zeros at unselected

            expert_out = experts(x, deterministic=deterministic)
            expert_out = nn.Dropout(self.dropout_rate)(
                expert_out, deterministic=deterministic)
            out = jnp.einsum("ble,bled->bld",
                             weights.astype(expert_out.dtype), expert_out)

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

    def _capacity_dispatch(self, experts, x, gate_logits, select_logits,
                           t_div, deterministic):
        """Sparse dispatch: scatter each token's top-k assignments into
        per-expert buffers of capacity ceil(T*k/E * capacity_factor),
        run each expert once over its buffer, scatter-add back. Expert
        FLOPs scale with k*capacity_factor instead of E; assignments
        beyond an expert's capacity are dropped (contribute zero) — the
        standard capacity trade, documented in MoEConfig."""
        import math

        cfg = self.cfg
        B, L, D = x.shape
        E, k = cfg.n_experts, cfg.n_experts_per_token
        T = B * L
        cap = max(1, math.ceil(T * k / E * cfg.capacity_factor))

        xf = x.reshape(T, D)
        _, idx = jax.lax.top_k(select_logits.reshape(T, E), k)  # (T, k)
        gsel = jnp.take_along_axis(gate_logits.reshape(T, E), idx, axis=-1)
        if t_div is not None:
            gsel = gsel / t_div
        w = jax.nn.softmax(gsel, axis=-1)  # (T, k)

        flat_e = idx.reshape(-1)                      # (T*k,)
        flat_w = w.reshape(-1)
        flat_tok = jnp.repeat(jnp.arange(T), k)
        onehot = jax.nn.one_hot(flat_e, E, dtype=jnp.int32)
        # position of each assignment within its expert's buffer
        pos = jnp.sum((jnp.cumsum(onehot, axis=0) - onehot) * onehot,
                      axis=1)                          # (T*k,)
        keep = (pos < cap).astype(x.dtype)

        buf = jnp.zeros((E, cap, D), x.dtype)
        buf = buf.at[flat_e, pos].add(
            xf[flat_tok] * keep[:, None], mode="drop")
        expert_out = experts(buf, deterministic=deterministic,
                             per_expert=True)          # (E, cap, D)
        expert_out = nn.Dropout(self.dropout_rate)(
            expert_out, deterministic=deterministic)
        gathered = expert_out[flat_e, jnp.minimum(pos, cap - 1)]
        comb_w = (flat_w.astype(expert_out.dtype)
                  * keep.astype(expert_out.dtype))
        out = jnp.zeros((T, D), expert_out.dtype).at[flat_tok].add(
            gathered * comb_w[:, None])
        selected = jnp.any(
            idx.reshape(B, L, k)[..., None]
            == jnp.arange(E)[None, None, None], axis=2)
        return out.reshape(B, L, D), selected
