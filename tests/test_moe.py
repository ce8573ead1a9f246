"""MoE dense dispatch must equal a naive per-expert gather loop."""

import jax
import jax.numpy as jnp
import numpy as np

from video2music_tpu.core.config import MoEConfig
from video2music_tpu.ops.moe import MoELayer


def _apply_glu_expert(params, e, x):
    """Evaluate stacked GLU expert e on (T, D) tokens."""
    w1, b1 = params["w1"][e], params["b1"][e]
    wg, bg = params["wg"][e], params["bg"][e]
    w2, b2 = params["w2"][e], params["b2"][e]
    h = x @ w1 + b1
    g = x @ wg + bg
    return (h * jax.nn.silu(g)) @ w2 + b2


def _naive_moe(variables, x, cfg, t=1.0):
    """Reference-style loop: topk gate, softmax over selected (optionally
    temperature-divided, model/moe.py:288), gathered experts
    (model/moe.py:183-200)."""
    p = variables["params"]
    gate_logits = x @ p["gate"]["kernel"] + p["gate"]["bias"]
    B, L, E = gate_logits.shape
    k = cfg.n_experts_per_token
    out = np.zeros_like(np.asarray(x))
    ep = p["experts"]
    for b in range(B):
        for l in range(L):
            logits = np.asarray(gate_logits[b, l])
            sel = np.argsort(-logits)[:k]
            z = logits[sel] / t
            w = np.exp(z - z.max())
            w = w / w.sum()
            for wi, e in zip(w, sel):
                out[b, l] += wi * np.asarray(
                    _apply_glu_expert(ep, int(e), x[b, l][None])[0])
    if cfg.shared_expert:
        sh = p["shared_expert"]
        shared = np.asarray(_apply_glu_expert(
            {k2: v for k2, v in sh.items()}, 0, x.reshape(-1, x.shape[-1])))
        out += shared.reshape(out.shape) / k
    return out


def test_dense_dispatch_matches_loop(rng):
    cfg = MoEConfig(n_experts=4, n_experts_per_token=2, expert="glu",
                    shared_expert=False)
    layer = MoELayer(cfg=cfg, d_model=8, d_ff=16, dropout_rate=0.0)
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    got, _ = layer.apply(variables, x, mutable=["metrics"])
    want = _naive_moe(variables, x, cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_shared_expert_matches_loop(rng):
    cfg = MoEConfig(n_experts=4, n_experts_per_token=2, expert="glu",
                    shared_expert=True)
    layer = MoELayer(cfg=cfg, d_model=8, d_ff=16, dropout_rate=0.0)
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    got, _ = layer.apply(variables, x, mutable=["metrics"])
    want = _naive_moe(variables, x, cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_balancing_bias_updates(rng):
    cfg = MoEConfig(n_experts=4, n_experts_per_token=2, expert="glu",
                    shared_expert=True, balancing=True)
    layer = MoELayer(cfg=cfg, d_model=8, d_ff=16, dropout_rate=0.0)
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    # training call mutates the balance bias toward under-loaded experts
    _, mutated = layer.apply(
        variables, x, deterministic=False, mutable=["moe_state", "metrics"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    bias = np.asarray(mutated["moe_state"]["balance_bias"])
    counts = np.asarray(mutated["metrics"]["expert_counts"])
    assert bias.shape == (4,)
    assert counts.sum() == 2 * 5 * cfg.n_experts_per_token
    err = counts.mean() - counts
    np.testing.assert_allclose(bias, 0.001 * err, rtol=1e-5, atol=1e-7)
    # eval call must NOT move the bias
    _, mutated2 = layer.apply(
        variables, x, deterministic=True, mutable=["moe_state", "metrics"])
    np.testing.assert_allclose(
        np.asarray(mutated2["moe_state"]["balance_bias"]), 0.0)


def test_topk_scheduler_anneals(rng):
    cfg = MoEConfig(n_experts=4, n_experts_per_token=2, expert="glu",
                    shared_expert=True, topk_schedule=True, topk_update_step=2)
    layer = MoELayer(cfg=cfg, d_model=8, d_ff=16, dropout_rate=0.0)
    x = jnp.asarray(rng.standard_normal((1, 3, 8)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    state = variables
    for step in range(6):
        out, mutated = layer.apply(
            state, x, deterministic=False, mutable=["moe_state", "metrics"],
            rngs={"dropout": jax.random.PRNGKey(step)})
        state = {**variables, "moe_state": mutated["moe_state"]}
    # after 6 steps with update_step=2, k = max(2, 4 - 3) = 2
    assert int(state["moe_state"]["sched_step"]) == 6
    counts = np.asarray(mutated["metrics"]["expert_counts"])
    assert counts.sum() == 3 * 2  # 3 tokens * k=2 at the last step


def test_temperature_scheduler_train(rng):
    """TemperatureScheduler (reference moe.py:84-97): t steps before use and
    divides the routing softmax; plain MoELayer applies it in training only
    (moe.py:174-176)."""
    cfg = MoEConfig(n_experts=4, n_experts_per_token=2, expert="glu",
                    shared_expert=False, temperature_schedule=True,
                    temperature_min=0.5, temperature_max=2.0,
                    temperature_step=0.25)
    layer = MoELayer(cfg=cfg, d_model=8, d_ff=16, dropout_rate=0.0)
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    out, mutated = layer.apply(
        variables, x, deterministic=False, mutable=["moe_state", "metrics"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert int(mutated["moe_state"]["temp_step"]) == 1
    # first training call: t = min + 1*step = 0.75
    want = _naive_moe(variables, x, cfg, t=0.75)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)
    # eval on the plain MoELayer: no step, no temperature
    out_e, mutated2 = layer.apply(
        variables, x, deterministic=True, mutable=["moe_state", "metrics"])
    assert int(mutated2["moe_state"]["temp_step"]) == 0
    np.testing.assert_allclose(np.asarray(out_e), _naive_moe(variables, x, cfg),
                               rtol=1e-4, atol=1e-5)


def test_temperature_scheduler_shared_steps_in_eval(rng):
    """Quirk parity: SharedMoELayer steps/applies the temperature scheduler
    during eval too (reference moe.py:238-240)."""
    cfg = MoEConfig(n_experts=4, n_experts_per_token=2, expert="glu",
                    shared_expert=True, temperature_schedule=True,
                    temperature_min=0.5, temperature_max=2.0,
                    temperature_step=0.25)
    layer = MoELayer(cfg=cfg, d_model=8, d_ff=16, dropout_rate=0.0)
    x = jnp.asarray(rng.standard_normal((1, 4, 8)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    out, mutated = layer.apply(
        variables, x, deterministic=True, mutable=["moe_state", "metrics"])
    assert int(mutated["moe_state"]["temp_step"]) == 1
    want = _naive_moe(variables, x, cfg, t=0.75)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_temperature_clamps_at_max(rng):
    cfg = MoEConfig(n_experts=4, n_experts_per_token=2, expert="glu",
                    shared_expert=False, temperature_schedule=True,
                    temperature_min=0.5, temperature_max=0.6,
                    temperature_step=0.25)
    layer = MoELayer(cfg=cfg, d_model=8, d_ff=16, dropout_rate=0.0)
    x = jnp.asarray(rng.standard_normal((1, 3, 8)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    state = variables
    for step in range(3):
        out, mutated = layer.apply(
            state, x, deterministic=False, mutable=["moe_state", "metrics"],
            rngs={"dropout": jax.random.PRNGKey(step)})
        state = {**variables, "moe_state": mutated["moe_state"]}
    # after 3 steps t would be 1.25 unclamped; must equal max=0.6
    want = _naive_moe(variables, x, cfg, t=0.6)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_gathered_decode_path_matches_dense(rng):
    """Single-token eval (B*L*k < E) takes the gathered-expert fast path;
    it must agree with the dense dispatch and the naive loop exactly."""
    cfg = MoEConfig(n_experts=6, n_experts_per_token=2, expert="glu",
                    shared_expert=True)
    layer = MoELayer(cfg=cfg, d_model=8, d_ff=16, dropout_rate=0.0)
    x_full = jnp.asarray(rng.standard_normal((1, 5, 8)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x_full)
    # one token at a time (gathered) vs the whole sequence (dense)
    dense, _ = layer.apply(variables, x_full, mutable=["metrics"])
    for t in range(5):
        got, mut = layer.apply(variables, x_full[:, t:t + 1],
                               mutable=["metrics"])
        np.testing.assert_allclose(np.asarray(got)[0, 0],
                                   np.asarray(dense)[0, t],
                                   rtol=1e-5, atol=1e-6)
        counts = np.asarray(mut["metrics"]["expert_counts"])
        assert counts.sum() == cfg.n_experts_per_token  # k selections logged


def test_capacity_dispatch_matches_dense_when_no_drop(rng):
    """capacity_factor >= E/k guarantees no expert overflows, so the sparse
    dispatch must equal dense dispatch exactly (routing, weights, shared
    expert, metrics counts)."""
    import dataclasses

    base = MoEConfig(n_experts=4, n_experts_per_token=2, expert="glu",
                     shared_expert=True)
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    dense = MoELayer(cfg=base, d_model=8, d_ff=16, dropout_rate=0.0)
    variables = dense.init(jax.random.PRNGKey(0), x)
    want, mu_d = dense.apply(variables, x, mutable=["metrics"])

    cfg = dataclasses.replace(base, dispatch="capacity",
                              capacity_factor=10.0)
    sparse = MoELayer(cfg=cfg, d_model=8, d_ff=16, dropout_rate=0.0)
    got, mu_s = sparse.apply(variables, x, mutable=["metrics"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(mu_s["metrics"]["expert_counts"]),
        np.asarray(mu_d["metrics"]["expert_counts"]))


def test_capacity_dispatch_drops_overflow(rng):
    """With a tiny capacity, overflowing assignments contribute zero but
    the layer still yields finite outputs and gradients."""
    import dataclasses

    cfg = MoEConfig(n_experts=4, n_experts_per_token=2, expert="glu",
                    shared_expert=True, dispatch="capacity",
                    capacity_factor=0.3)
    layer = MoELayer(cfg=cfg, d_model=8, d_ff=16, dropout_rate=0.0)
    x = jnp.asarray(rng.standard_normal((2, 6, 8)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    out, _ = layer.apply(variables, x, mutable=["metrics"])
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        y, _ = layer.apply({**variables, "params": params}, x,
                           deterministic=False, mutable=["metrics"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    # dense output differs (tokens were dropped)
    import dataclasses as dc
    dense = MoELayer(cfg=dc.replace(cfg, dispatch="dense"), d_model=8,
                     d_ff=16, dropout_rate=0.0)
    want, _ = dense.apply(variables, x, mutable=["metrics"])
    assert not np.allclose(np.asarray(out), np.asarray(want))
