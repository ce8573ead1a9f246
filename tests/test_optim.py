"""Optimizer / schedule parity tests.

The Noam schedule is checked against a pure-python transcription of the
reference LrStepTracker (reference: utilities/lr_scheduling.py:30-45); the
RAdanW transform is checked against a step-by-step numpy oracle of its
update math (reference: model/RAdanW.py:226-320, multi-tensor-path Adan
state handling — see train/optim.py docstring for the two documented
deviations).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video2music_tpu.core.config import TrainConfig
from video2music_tpu.train.optim import make_optimizer, noam_schedule, radanw


def reference_noam(step, d_model=512, warmup=4000, init_steps=0):
    step += init_steps
    inv_dim = 1 / math.sqrt(d_model)
    if step <= warmup:
        return inv_dim * (1 / (warmup * math.sqrt(warmup))) * step
    return inv_dim * (1 / math.sqrt(step))


def test_noam_schedule_matches_reference():
    sched = noam_schedule(512, 4000)
    for step in [0, 1, 10, 3999, 4000, 4001, 20000]:
        np.testing.assert_allclose(float(sched(step)),
                                   reference_noam(step, 512, 4000), rtol=1e-6)


def test_noam_schedule_resume_offset():
    sched = noam_schedule(512, 4000, init_steps=5000)
    np.testing.assert_allclose(float(sched(0)),
                               reference_noam(0, init_steps=5000), rtol=1e-6)


def _radanw_oracle(param, grads, lr=0.01, betas=(0.9, 0.999, 0.92, 0.99),
                   eps=1e-8, wd=0.01):
    """Numpy transcription of the RAdanW update (intended math)."""
    b1, b2, b3, b4 = betas
    m = np.zeros_like(param)
    v = np.zeros_like(param)
    d = np.zeros_like(param)
    n = np.zeros_like(param)
    prev = None
    p = param.copy()
    for t, g in enumerate(grads, start=1):
        if prev is None:
            prev = g.copy()
        bc1 = 1 - b1 ** t
        bc2 = 1 - b2 ** t
        p = p * (1 - lr * wd)
        m = m + (1 - b1) * (g - m)
        v = b2 * v + (1 - b2) * g * g
        rho_inf = 2 / (1 - b2) - 1
        rho_t = rho_inf - 2 * t * (b2 ** t) / bc2
        if rho_t > 5.0:
            rect = math.sqrt((rho_t - 4) * (rho_t - 2) * rho_inf
                             / ((rho_inf - 4) * (rho_inf - 2) * rho_t))
            adaptive = math.sqrt(bc2) / (np.sqrt(v) + eps)
        else:
            rect, adaptive = 1.0, 1.0
        p = p - lr * rect * adaptive * (m / bc1)
        diff = g - prev
        d = b3 * d + (1 - b3) * diff
        n = b4 * n + (1 - b4) * (g + (1 - b3) * diff) ** 2
        p = p - (1 - b3) * lr * d / (np.sqrt(n) + eps)
        prev = g.copy()
    return p


def test_radanw_matches_oracle():
    rng = np.random.default_rng(0)
    param = rng.standard_normal(5).astype(np.float32)
    grads = [rng.standard_normal(5).astype(np.float32) for _ in range(6)]

    tx = radanw(0.01)
    p = jnp.asarray(param)
    state = tx.init(p)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, p)
        p = p + updates
    expected = _radanw_oracle(param, grads)
    np.testing.assert_allclose(np.asarray(p), expected, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("name", ["adam", "adamw", "radam", "radamw",
                                  "radanw", "lion"])
def test_make_optimizer_all_names(name):
    tcfg = TrainConfig(optimizer=name, lr=None)
    tx = make_optimizer(tcfg, d_model=16)
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    state = tx.init(params)
    grads = {"w": jnp.full((3,), 0.5), "b": jnp.full((2,), -0.1)}
    updates, state = tx.update(grads, state, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    for leaf in jax.tree_util.tree_leaves(new):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_fixed_lr_bypasses_schedule():
    tcfg = TrainConfig(optimizer="adam", lr=3e-4)
    tx = make_optimizer(tcfg, d_model=16)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((3,))}
    updates, _ = tx.update(grads, state, params)
    # first adam step with fixed lr moves by ~lr (unit grad, bias-corrected)
    assert abs(float(updates["w"][0])) > 1e-5
