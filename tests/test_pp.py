"""Pipeline-parallelism tests: GPipe combinator parity, AMT pp train step.

The reference has no distributed machinery (SURVEY §2.5); these cover the
TPU framework's added pipeline strategy on the 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_train import _amt_batch
from video2music_tpu.core.config import TrainConfig, amt_config
from video2music_tpu.models import VideoMusicTransformer
from video2music_tpu.parallel import (create_mesh, microbatch,
                                      pipeline_apply, shard_batch,
                                      stack_layer_params, unmicrobatch)
from video2music_tpu.train import (create_train_state, make_amt_pp_train_step,
                                   make_amt_train_step, make_optimizer)


def _tiny4_amt():
    """4-layer tiny base AMT (stacks divisible by 4 pipeline stages)."""
    return VideoMusicTransformer(cfg=amt_config(
        None, n_layers=4, num_heads=2, d_model=16, d_ff=32,
        max_seq_video=12, max_seq_chord=12, total_vf_dim=11, dropout=0.0))


def _toy(rng, n_layers=8, B=8, L=6, D=16):
    Ws = jnp.asarray(rng.standard_normal((n_layers, D, D)) * 0.3, jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    return Ws, x, mem


def _toy_layer(w, h, ride, rng):
    del rng
    return jnp.tanh(h @ w) + 0.1 * ride["m"]


def _toy_ref(Ws, x, mem):
    h = x
    for i in range(Ws.shape[0]):
        h = jnp.tanh(h @ Ws[i]) + 0.1 * mem
    return h


@pytest.mark.parametrize("mesh_shape,n_micro", [((2, 4), 4), ((1, 2), 8)])
def test_pipeline_combinator_matches_sequential(rng, mesh_shape, n_micro):
    mesh = create_mesh(mesh_shape)
    Ws, x, mem = _toy(rng)

    def run(Ws, x, mem):
        out = pipeline_apply(_toy_layer, Ws, microbatch(x, n_micro),
                             ride={"m": microbatch(mem, n_micro)}, mesh=mesh)
        return unmicrobatch(out)

    out = jax.jit(run)(Ws, x, mem)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_toy_ref(Ws, x, mem)), atol=1e-6)


def test_pipeline_combinator_gradients(rng):
    mesh = create_mesh((2, 4))
    Ws, x, mem = _toy(rng)

    def loss_pp(Ws):
        out = pipeline_apply(_toy_layer, Ws, microbatch(x, 4),
                             ride={"m": microbatch(mem, 4)}, mesh=mesh,
                             remat=True)
        return jnp.sum(unmicrobatch(out) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(Ws)
    g_ref = jax.jit(jax.grad(lambda W: jnp.sum(_toy_ref(W, x, mem) ** 2)))(Ws)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_pipeline_rejects_indivisible_stack(rng):
    mesh = create_mesh((2, 4))
    Ws, x, mem = _toy(rng, n_layers=6)
    with pytest.raises(ValueError, match="divisible"):
        pipeline_apply(_toy_layer, Ws, microbatch(x, 4),
                       ride={"m": microbatch(mem, 4)}, mesh=mesh)


def test_stack_layer_params_roundtrip(rng):
    params = {f"enc_{i}": {"w": jnp.full((3,), float(i)),
                           "b": jnp.full((2, 2), float(-i))}
              for i in range(4)}
    stacked = stack_layer_params(params, "enc_", 4)
    assert stacked["w"].shape == (4, 3)
    np.testing.assert_array_equal(np.asarray(stacked["b"][2]),
                                  np.asarray(params["enc_2"]["b"]))


def test_amt_pp_step_matches_plain_step(rng):
    """dp x pp sharded step == single-device step (dropout=0 -> exact
    semantics, fp tolerance for the microbatch reduction order)."""
    mesh = create_mesh((2, 4))
    model = _tiny4_amt()
    tcfg = TrainConfig(optimizer="adamw", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    batch = _amt_batch(rng, B=8)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)

    pp_step = jax.jit(make_amt_pp_train_step(model, tx, tcfg, mesh,
                                             n_microbatches=4))
    plain_step = jax.jit(make_amt_train_step(model, tx, tcfg))

    s_pp, m_pp = pp_step(state, shard_batch(mesh, batch))
    s_plain, m_plain = plain_step(state, batch)
    assert np.isfinite(float(m_pp["loss"]))
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_plain["loss"]),
                               rtol=1e-5)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_pp.params, s_plain.params)
    # adamw normalizes by sqrt(v): microbatch-order fp noise in the grads
    # can move a near-zero-variance step by O(lr), hence the loose bound
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-3


def test_amt_pp_step_trains(rng):
    mesh = create_mesh((2, 4))
    model = _tiny4_amt()
    tcfg = TrainConfig(optimizer="adamw", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    batch = shard_batch(mesh, _amt_batch(rng, B=8))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_amt_pp_train_step(model, tx, tcfg, mesh,
                                          n_microbatches=2, remat=True))
    state, m0 = step(state, batch)
    for _ in range(8):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])


def test_pp_rejects_indivisible_segments_and_differential():
    tcfg = TrainConfig(optimizer="adamw", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    # V2 6 layers = 3 shallow + 3 deep segments: 3 % 2 stages != 0
    model = VideoMusicTransformer(cfg=amt_config(
        "2.2", n_layers=6, num_heads=2, d_model=16, d_ff=32,
        max_seq_video=12, max_seq_chord=12, total_vf_dim=11, dropout=0.0))
    with pytest.raises(ValueError, match="divisible"):
        make_amt_pp_train_step(model, tx, tcfg, create_mesh((2, 4)))
    # V3 differential attention is depth-dependent
    model3 = VideoMusicTransformer(cfg=amt_config(
        "3.1", n_layers=4, num_heads=2, d_model=16, d_ff=32,
        max_seq_video=12, max_seq_chord=12, total_vf_dim=11, dropout=0.0))
    with pytest.raises(ValueError, match="differential"):
        make_amt_pp_train_step(model3, tx, tcfg, create_mesh((2, 4)))


def test_amt_pp_step_v2_flagship_matches_microbatched_oracle(rng):
    """The V2 flagship (3 SwiGLU + 3 SharedMoE segments, balancing bias)
    pipelines on a 3-stage model axis. MoE state steps once per microbatch
    (stage-local, the reference's per-forward-call semantics), so the
    oracle is M sequential small-batch forwards threading moe_state — pp
    must match its loss, gradients, and updated balancing bias."""
    import jax

    mesh = create_mesh((2, 3))
    cfg = amt_config("2.2", balancing=True, n_layers=6, num_heads=2,
                     d_model=16, d_ff=32, max_seq_video=12, max_seq_chord=12,
                     total_vf_dim=11, dropout=0.0)
    model = VideoMusicTransformer(cfg=cfg)
    tcfg = TrainConfig(optimizer="adamw", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    batch = _amt_batch(rng, B=4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)

    from video2music_tpu.train.step import amt_loss

    M, mb = 2, 2

    def oracle(params):
        ms = state.moe_state
        parts = []
        for i in range(M):
            sl = {k: v[i * mb:(i + 1) * mb] for k, v in batch.items()}
            logits, mut = model.apply(
                {"params": params, "moe_state": ms}, sl["x"], sl["x_root"],
                sl["x_attr"], sl["semantic"], sl["key"], sl["scene_offset"],
                sl["motion"], sl["emotion"], deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(7)},
                mutable=["moe_state", "metrics"])
            ms = mut["moe_state"]
            parts.append(logits)
        total, _ = amt_loss(jnp.concatenate(parts, 0), batch, tcfg)
        return total, ms

    o_loss = jax.jit(lambda p: oracle(p)[0])(state.params)
    o_ms = jax.jit(lambda p: oracle(p)[1])(state.params)

    pp_step = jax.jit(make_amt_pp_train_step(model, tx, tcfg, mesh,
                                             n_microbatches=M))
    s_pp, m_pp = pp_step(state, shard_batch(mesh, batch))
    np.testing.assert_allclose(float(m_pp["loss"]), float(o_loss),
                               rtol=1e-5)
    # balancing bias after the step matches the per-microbatch oracle
    got_bias = s_pp.moe_state["dec_5"]["ffn"]["balance_bias"]
    want_bias = o_ms["dec_5"]["ffn"]["balance_bias"]
    np.testing.assert_allclose(np.asarray(got_bias), np.asarray(want_bias),
                               atol=1e-6)
    # scheduler steps advanced once per microbatch
    if "sched_step" in o_ms.get("dec_5", {}).get("ffn", {}):
        assert int(s_pp.moe_state["dec_5"]["ffn"]["sched_step"]) == \
            int(o_ms["dec_5"]["ffn"]["sched_step"])
