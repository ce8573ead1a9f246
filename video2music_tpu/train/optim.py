"""Optimizers and LR schedules as optax transforms.

The reference's optimizer menu (reference: ``train.py:236-250``):
Adam / AdamW / RAdam / RAdamW / RAdanW / Lion, driven by a Noam LR schedule
through ``LambdaLR`` (reference: ``utilities/lr_scheduling.py:4-45``).
Everything here is a pure ``optax.GradientTransformation`` so it jits into
the train step; there is no per-parameter Python loop at update time.

RAdanW — the reference's custom 4-beta hybrid of RAdam (variance
rectification) and Adan (gradient-difference momentum) with decoupled weight
decay (reference: ``model/RAdanW.py:226-320``) — is implemented from its
single-tensor update math. Two documented deviations where the reference's
in-place torch ops corrupt their own state (single-tensor path only):

  * ``exp_diff.mul_(eta)`` (RAdanW.py:316) scales the stored Adan momentum
    by the adaptive step size as a side effect of computing the update; we
    keep ``d_t`` intact (matching the reference's *multi-tensor* path).
  * ``grad.add_(...)`` (RAdanW.py:311) mutates the gradient before the n_t
    update; we compute ``n_t`` from ``(g + (1-beta3)·(g - g_prev))²`` —
    the Adan paper's definition, which that in-place expression evaluates to.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax

from ..core import constants as C
from ..core.config import TrainConfig


def noam_schedule(d_model: int, warmup_steps: int = C.SCHEDULER_WARMUP_STEPS,
                  init_steps: int = 0):
    """lr(step) = d_model^-0.5 * min(step^-0.5, step * warmup^-1.5).

    Matches LrStepTracker (reference: utilities/lr_scheduling.py:30-45)
    including the LambdaLR convention that the first update uses step=0
    (lr 0). ``init_steps`` offsets the schedule on resume
    (reference: train.py:188-193).
    """
    inv_dim = d_model ** -0.5
    inv_warm = warmup_steps ** -1.5

    def schedule(count):
        step = jnp.asarray(count, jnp.float32) + init_steps
        warm = inv_dim * inv_warm * step
        decay = inv_dim * jax.lax.rsqrt(jnp.maximum(step, 1.0))
        return jnp.where(step <= warmup_steps, warm, decay)

    return schedule


class RAdanWState(NamedTuple):
    count: chex.Array
    exp_avg: optax.Updates       # m_t
    exp_avg_sq: optax.Updates    # v_t
    exp_diff: optax.Updates      # d_t
    exp_diff_sq: optax.Updates   # n_t
    prev_grad: optax.Updates     # g_{t-1}


def radanw(learning_rate, betas=(0.9, 0.999, 0.92, 0.99),
           eps: float = 1e-8, weight_decay: float = 0.01):
    """The reference's RAdanW as one fused optax transformation."""
    b1, b2, b3, b4 = betas
    lr_fn = learning_rate if callable(learning_rate) else (
        lambda _: jnp.asarray(learning_rate, jnp.float32))

    def init(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return RAdanWState(count=jnp.zeros((), jnp.int32), exp_avg=zeros(),
                           exp_avg_sq=zeros(), exp_diff=zeros(),
                           exp_diff_sq=zeros(), prev_grad=zeros())

    def update(grads, state, params):
        if params is None:
            raise ValueError("radanw requires params (decoupled weight decay)")
        count = state.count + 1
        step = count.astype(jnp.float32)
        lr = lr_fn(state.count)

        bc1 = 1.0 - b1 ** step
        bc2 = 1.0 - b2 ** step

        # first step: prev_grad = g_1 so the Adan diff term starts at zero
        # (reference: RAdanW.py:103-104 seeds neg_prev_grad with -g)
        is_first = (count == 1).astype(jnp.float32)
        prev = jax.tree_util.tree_map(
            lambda pg, g: is_first * g + (1.0 - is_first) * pg,
            state.prev_grad, grads)

        m = jax.tree_util.tree_map(lambda m_, g: m_ + (1 - b1) * (g - m_),
                                   state.exp_avg, grads)
        v = jax.tree_util.tree_map(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                                   state.exp_avg_sq, grads)

        # RAdam rectification (reference: RAdanW.py:276-297)
        rho_inf = 2.0 / (1.0 - b2) - 1.0
        rho_t = rho_inf - 2.0 * step * (b2 ** step) / bc2
        rect = jnp.sqrt(jnp.abs(
            (rho_t - 4.0) * (rho_t - 2.0) * rho_inf
            / ((rho_inf - 4.0) * (rho_inf - 2.0) * jnp.maximum(rho_t, 1e-6))))
        use_rect = (rho_t > 5.0).astype(jnp.float32)
        rect = use_rect * rect + (1.0 - use_rect)

        def adam_term(m_, v_):
            adaptive = jnp.sqrt(bc2) / (jnp.sqrt(v_) + eps)
            adaptive = use_rect * adaptive + (1.0 - use_rect)
            return -lr * rect * adaptive * (m_ / bc1)

        # Adan gradient-difference branch (reference: RAdanW.py:303-318)
        diff = jax.tree_util.tree_map(lambda g, pg: g - pg, grads, prev)
        d = jax.tree_util.tree_map(lambda d_, df: b3 * d_ + (1 - b3) * df,
                                   state.exp_diff, diff)
        n = jax.tree_util.tree_map(
            lambda n_, g, df: b4 * n_ + (1 - b4) * (g + (1 - b3) * df) ** 2,
            state.exp_diff_sq, grads, diff)

        def adan_term(d_, n_):
            return -(1 - b3) * lr * d_ / (jnp.sqrt(n_) + eps)

        updates = jax.tree_util.tree_map(
            lambda p, m_, v_, d_, n_:
                -lr * weight_decay * p + adam_term(m_, v_) + adan_term(d_, n_),
            params, m, v, d, n)

        new_state = RAdanWState(count=count, exp_avg=m, exp_avg_sq=v,
                                exp_diff=d, exp_diff_sq=n, prev_grad=grads)
        return updates, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(tcfg: TrainConfig, d_model: int, init_steps: int = 0):
    """Optimizer + schedule matching train.py:236-255.

    With ``tcfg.lr is None`` the Noam schedule drives the LR (scaled by
    LR_DEFAULT_START=1.0); otherwise the fixed LR is used as-is.
    """
    if tcfg.lr is None:
        lr = noam_schedule(d_model, tcfg.warmup_steps, init_steps)
    else:
        lr = tcfg.lr
    name = tcfg.optimizer.lower()
    betas = (C.ADAM_BETA_1, C.ADAM_BETA_2)
    eps = C.ADAM_EPSILON
    if name == "adam":
        return optax.adam(lr, *betas, eps=eps)
    if name == "adamw":
        return optax.adamw(lr, *betas, eps=eps)
    if name == "radam":
        return optax.radam(lr, *betas, eps=eps)
    if name == "radamw":
        # RAdam + decoupled weight decay (reference: train.py:244-245)
        return optax.chain(
            optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps),
            optax.add_decayed_weights(0.01),
            optax.scale_by_learning_rate(lr))
    if name == "radanw":
        return radanw(lr, betas=(betas[0], betas[1], 0.92, 0.99), eps=eps,
                      weight_decay=0.01)
    if name == "lion":
        # reference: train.py:249-250 — lr/4, betas (0.95, 0.98), wd 1.0
        quarter = (lambda c: lr(c) / 4.0) if callable(lr) else lr / 4.0
        return optax.lion(quarter, b1=0.95, b2=0.98, weight_decay=1.0)
    raise ValueError(f"unknown optimizer {tcfg.optimizer!r}")
