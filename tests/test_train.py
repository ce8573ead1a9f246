"""Train-step tests: loss decreases, MoE state threads, mesh sharding works."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video2music_tpu.core import constants as C
from video2music_tpu.core.config import (RegressionConfig, TrainConfig,
                                         amt_config)
from video2music_tpu.core.vocab import emotion_chord_targets
from video2music_tpu.models import (MusicTransformer, VideoMusicTransformer,
                                    VideoRegression)
from video2music_tpu.parallel import (create_mesh, param_shardings,
                                      replicated, shard_batch)
from video2music_tpu.train import (create_train_state, make_amt_eval_step,
                                   make_amt_train_step, make_optimizer,
                                   make_regression_eval_step,
                                   make_regression_train_step)
from video2music_tpu.train.step import regression_init

VF = dict(sem=7, emo=2)  # tiny feature dims


def _amt_batch(rng, B=4, L=12):
    rows = emotion_chord_targets()
    eid = rng.integers(0, 6, (B, L))
    return dict(
        x=jnp.asarray(rng.integers(0, C.CHORD_END, (B, L))),
        x_root=jnp.asarray(rng.integers(0, 13, (B, L))),
        x_attr=jnp.asarray(rng.integers(0, 14, (B, L))),
        tgt=jnp.asarray(rng.integers(0, C.CHORD_END, (B, L))),
        tgt_emotion=jnp.asarray(rows[eid]),
        tgt_emotion_prob=jnp.asarray(
            rng.uniform(0.5, 1.0, (B, L)).astype(np.float32)),
        semantic=jnp.asarray(
            rng.standard_normal((B, L, VF["sem"])).astype(np.float32)),
        key=jnp.asarray(rng.integers(0, 2, (B, 1)).astype(np.float32)),
        scene_offset=jnp.asarray(
            rng.integers(0, 12, (B, L)).astype(np.float32)),
        motion=jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)),
        emotion=jnp.asarray(
            rng.uniform(size=(B, L, VF["emo"])).astype(np.float32)),
    )


def _tiny_amt(version=None, **kw):
    return VideoMusicTransformer(cfg=amt_config(
        version, n_layers=2, num_heads=2, d_model=16, d_ff=32,
        max_seq_video=12, max_seq_chord=12,
        total_vf_dim=VF["sem"] + 1 + 1 + VF["emo"], dropout=0.0, **kw))


def test_amt_train_step_decreases_loss(rng):
    model = _tiny_amt()
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    batch = _amt_batch(rng)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_amt_train_step(model, tx, tcfg))
    state, first = step(state, batch)
    for _ in range(12):
        state, last = step(state, batch)
    assert float(last["loss"]) < float(first["loss"])
    assert int(state.step) == 13


def test_amt_eval_step_metrics(rng):
    model = _tiny_amt()
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    batch = _amt_batch(rng)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    ev = jax.jit(make_amt_eval_step(model, tcfg))
    m = ev(state.params, state.moe_state, batch)
    for k in ("loss", "accuracy", "hits@1", "hits@3", "hits@5",
              "correspondence"):
        assert np.isfinite(float(m[k])), k
    assert 0.0 <= float(m["accuracy"]) <= 1.0
    assert float(m["hits@1"]) <= float(m["hits@3"]) <= float(m["hits@5"])


def test_moe_balance_bias_updates(rng):
    """V3.1 uses aux-loss-free balancing: the moe_state bias must move during
    training steps (reference: moe.py:256-280)."""
    model = _tiny_amt("3.1")
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    batch = _amt_batch(rng)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    before = jax.tree_util.tree_leaves(state.moe_state)
    step = jax.jit(make_amt_train_step(model, tx, tcfg))
    state2, _ = step(state, batch)
    after = jax.tree_util.tree_leaves(state2.moe_state)
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(before, after))
    assert moved


def test_drop_loss_step_runs(rng):
    model = _tiny_amt()
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    batch = _amt_batch(rng)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_amt_train_step(model, tx, tcfg, drop_loss=True))
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def _reg_batch(rng, B=4, L=12):
    return dict(
        semantic=jnp.asarray(
            rng.standard_normal((B, L, VF["sem"])).astype(np.float32)),
        scene_offset=jnp.asarray(
            rng.integers(0, 12, (B, L)).astype(np.float32)),
        motion=jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)),
        emotion=jnp.asarray(
            rng.uniform(size=(B, L, VF["emo"])).astype(np.float32)),
        note_density=jnp.asarray(
            rng.uniform(0, 4, (B, L)).astype(np.float32)),
        loudness=jnp.asarray(rng.uniform(0, 1, (B, L)).astype(np.float32)),
        instrument=jnp.asarray(
            rng.integers(0, 2, (B, L, C.INSTRUMENT_SIZE)).astype(np.float32)),
    )


def test_regression_train_and_eval(rng):
    cfg = RegressionConfig(reg_model="bigru", n_layers=1, d_model=8,
                           d_hidden=16, total_vf_dim=VF["sem"] + VF["emo"])
    model = VideoRegression(cfg=cfg)
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=8)
    batch = _reg_batch(rng)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch,
                               init_fn=regression_init)
    step = jax.jit(make_regression_train_step(model, tx, tcfg))
    state, first = step(state, batch)
    for _ in range(8):
        state, last = step(state, batch)
    assert float(last["loss"]) < float(first["loss"])
    ev = jax.jit(make_regression_eval_step(model))
    m = ev(state.params, state.moe_state, batch)
    assert np.isfinite(float(m["se_note_density"]))
    assert np.isfinite(float(m["bce_instrument"]))


def test_sharded_train_step_matches_single_device(rng):
    """dp=4 x ep=2 mesh: the sharded jitted step must agree with the
    unsharded one (XLA inserts the collectives; math is identical)."""
    model = _tiny_amt("2.2")  # has MoE expert stacks to shard over "model"
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    batch = _amt_batch(rng, B=8)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)

    step = make_amt_train_step(model, tx, tcfg)
    ref_state, ref_metrics = jax.jit(step)(state, batch)

    mesh = create_mesh((4, 2))
    p_sh = param_shardings(mesh, state.params)
    sharded_params = jax.tree_util.tree_map(jax.device_put, state.params, p_sh)
    rep = replicated(mesh)
    sharded_state = state.replace(
        params=sharded_params,
        moe_state=jax.device_put(state.moe_state, rep),
        opt_state=jax.device_put(state.opt_state, rep),
        rng=jax.device_put(state.rng, rep),
        step=jax.device_put(state.step, rep))
    sharded_batch = shard_batch(mesh, batch)
    got_state, got_metrics = jax.jit(step)(sharded_state, sharded_batch)
    np.testing.assert_allclose(float(got_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-4)
    ref_leaf = jax.tree_util.tree_leaves(ref_state.params)[0]
    got_leaf = jax.tree_util.tree_leaves(got_state.params)[0]
    np.testing.assert_allclose(np.asarray(got_leaf), np.asarray(ref_leaf),
                               rtol=1e-3, atol=1e-5)


def test_tensor_parallel_train_step_matches_single_device(rng):
    """dp=2 x (tp+ep)=4 mesh with Megatron column/row shardings: the TP
    step must agree with the unsharded one (GSPMD annotations are
    semantics-preserving), and the TP rules must actually shard dense
    attention/FFN kernels (guard against a silent replicate-everything)."""
    from jax.sharding import PartitionSpec as P

    model = _tiny_amt("2.2")
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    batch = _amt_batch(rng, B=8)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)

    step = make_amt_train_step(model, tx, tcfg)
    ref_state, ref_metrics = jax.jit(step)(state, batch)

    mesh = create_mesh((2, 4))
    p_sh = param_shardings(mesh, state.params, tp=True)
    specs = {jax.tree_util.keystr(p): s.spec
             for p, s in jax.tree_util.tree_leaves_with_path(p_sh)}
    # column-parallel: heads sharded on the qkv output features
    assert specs["['dec_0']['self_attn']['q_proj']['kernel']"] == \
        P(None, "model")
    # row-parallel: out-proj input features sharded, bias replicated
    assert specs["['dec_0']['self_attn']['out_proj']['kernel']"] == \
        P("model", None)
    assert specs["['dec_0']['self_attn']['out_proj']['bias']"] == P()
    # FFN up/down
    assert specs["['enc_0']['ffn']['linear1']['kernel']"] == P(None, "model")
    assert specs["['enc_0']['ffn']['linear2']['kernel']"] == P("model", None)
    # shared expert falls back to inner-d_ff TP (E=1 can't EP-shard)
    assert specs["['enc_1']['ffn']['shared_expert']['w1']"] == \
        P(None, None, "model")
    assert specs["['enc_1']['ffn']['shared_expert']['w2']"] == \
        P(None, "model", None)
    # 6 experts on a 4-wide axis: EP indivisible -> inner-dim TP fallback
    assert specs["['enc_1']['ffn']['experts']['w1']"] == \
        P(None, None, "model")

    sharded_params = jax.tree_util.tree_map(jax.device_put, state.params,
                                            p_sh)
    rep = replicated(mesh)
    sharded_state = state.replace(
        params=sharded_params,
        moe_state=jax.device_put(state.moe_state, rep),
        opt_state=jax.device_put(state.opt_state, rep),
        rng=jax.device_put(state.rng, rep),
        step=jax.device_put(state.step, rep))
    sharded_batch = shard_batch(mesh, batch)
    got_state, got_metrics = jax.jit(step)(sharded_state, sharded_batch)
    np.testing.assert_allclose(float(got_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-4)
    ref_leaf = jax.tree_util.tree_leaves(ref_state.params)[0]
    got_leaf = jax.tree_util.tree_leaves(got_state.params)[0]
    np.testing.assert_allclose(np.asarray(got_leaf), np.asarray(ref_leaf),
                               rtol=1e-3, atol=1e-5)


def test_music_transformer_train_step(rng):
    from video2music_tpu.core.config import MusicTransformerConfig
    from video2music_tpu.models import MusicTransformer
    from video2music_tpu.train.step import (make_music_transformer_eval_step,
                                            make_music_transformer_train_step,
                                            music_transformer_init)

    cfg = MusicTransformerConfig(n_layers=2, num_heads=2, d_model=16,
                                 d_ff=32, max_seq_chord=12, dropout=0.0)
    model = MusicTransformer(cfg=cfg)
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    batch = _amt_batch(rng)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch,
                               init_fn=music_transformer_init)
    step = jax.jit(make_music_transformer_train_step(model, tx, tcfg))
    state, first = step(state, batch)
    for _ in range(10):
        state, last = step(state, batch)
    assert float(last["loss"]) < float(first["loss"])
    ev = jax.jit(make_music_transformer_eval_step(model, tcfg))
    m = ev(state.params, {}, batch)
    assert np.isfinite(float(m["accuracy"]))


def test_amt_separated_train_step(rng):
    model = VideoMusicTransformer(cfg=amt_config(
        None, n_layers=2, num_heads=2, d_model=16, d_ff=32,
        max_seq_video=12, max_seq_chord=12,
        total_vf_dim=VF["sem"] + 1 + 1 + VF["emo"], dropout=0.0,
        separated=True))
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    batch = _amt_batch(rng)
    batch["tgt_root"] = jnp.asarray(
        np.random.default_rng(3).integers(0, 13, batch["tgt"].shape))
    batch["tgt_attr"] = jnp.asarray(
        np.random.default_rng(4).integers(0, 14, batch["tgt"].shape))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_amt_train_step(model, tx, tcfg))
    state, first = step(state, batch)
    for _ in range(8):
        state, last = step(state, batch)
    assert float(last["loss"]) < float(first["loss"])


def test_remat_attention_matches(rng):
    """remat_attention must not change values or gradients."""
    batch = _amt_batch(rng)
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    outs = []
    for remat in (False, True):
        model = _tiny_amt(remat_attention=remat)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        step = jax.jit(make_amt_train_step(model, tx, tcfg))
        state, m = step(state, batch)
        outs.append((float(m["loss"]),
                     np.asarray(jax.tree_util.tree_leaves(state.params)[0])))
    assert outs[0][0] == outs[1][0]
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-6)


def test_amt_separated_eval_metrics(rng):
    """Separated models score via the root x attr reconstruction
    (reference _root_attr metric variants)."""
    model = VideoMusicTransformer(cfg=amt_config(
        None, n_layers=2, num_heads=2, d_model=16, d_ff=32,
        max_seq_video=12, max_seq_chord=12,
        total_vf_dim=VF["sem"] + 1 + 1 + VF["emo"], dropout=0.0,
        separated=True))
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    batch = _amt_batch(rng)
    batch["tgt_root"] = jnp.asarray(
        np.random.default_rng(3).integers(0, 13, batch["tgt"].shape))
    batch["tgt_attr"] = jnp.asarray(
        np.random.default_rng(4).integers(0, 14, batch["tgt"].shape))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    ev = jax.jit(make_amt_eval_step(model, tcfg))
    m = ev(state.params, state.moe_state, batch)
    for k in ("loss", "accuracy", "hits@1", "hits@5", "correspondence"):
        assert np.isfinite(float(m[k])), k
    assert float(m["hits@1"]) <= float(m["hits@5"])


def test_sequence_parallel_train_step_matches_single_device(rng):
    """Megatron-SP: sequence-sharded residual stream + TP weights
    (cfg.sequence_parallel) must match the unsharded step, and the
    partitioned program must actually use reduce-scatter (the SP
    signature) instead of plain all-reduce everywhere."""
    model_sp = _tiny_amt("2.2", sequence_parallel=True)
    model_ref = _tiny_amt("2.2")
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=16)
    batch = _amt_batch(rng, B=8)
    state = create_train_state(model_ref, tx, jax.random.PRNGKey(0), batch)

    ref_state, ref_metrics = jax.jit(
        make_amt_train_step(model_ref, tx, tcfg))(state, batch)

    mesh = create_mesh((2, 4))
    p_sh = param_shardings(mesh, state.params, tp=True)
    rep = replicated(mesh)
    sharded_state = state.replace(
        params=jax.tree_util.tree_map(jax.device_put, state.params, p_sh),
        moe_state=jax.device_put(state.moe_state, rep),
        opt_state=jax.device_put(state.opt_state, rep),
        rng=jax.device_put(state.rng, rep),
        step=jax.device_put(state.step, rep))
    sharded_batch = shard_batch(mesh, batch)
    with jax.sharding.set_mesh(mesh):
        step = jax.jit(make_amt_train_step(model_sp, tx, tcfg))
        lowered = step.lower(sharded_state, sharded_batch)
        compiled = lowered.compile()
        got_state, got_metrics = step(sharded_state, sharded_batch)
    np.testing.assert_allclose(float(got_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-4)
    ref_leaf = jax.tree_util.tree_leaves(ref_state.params)[0]
    got_leaf = jax.tree_util.tree_leaves(got_state.params)[0]
    np.testing.assert_allclose(np.asarray(got_leaf), np.asarray(ref_leaf),
                               rtol=1e-3, atol=1e-5)
    # the residual stream must actually carry the (batch over data,
    # sequence over model) constraint — guard against it silently no-oping.
    # jax 0.9 lowers through the Shardy dialect; the TPU partitioner then
    # emits reduce-scatter, the CPU one may lower the same spec
    # differently, so assert the annotation, not the collective.
    assert ('sharding_constraint' in lowered.as_text()
            and '<@mesh, [{"data"}, {"model"}, {}]>' in lowered.as_text())
    del compiled


def test_wire_bf16_batch_matches_in_graph_cast(rng):
    """Shipping bf16 float inputs (wire_bf16_batch) is bit-identical to
    shipping f32 and casting in-graph (_maybe_bf16_batch): both round
    f32->bf16 once, nearest-even. Targets stay f32 on the wire."""
    from video2music_tpu.train import wire_bf16_batch

    model = _tiny_amt()
    tcfg = TrainConfig(optimizer="adam", lr=1e-3, mixed_precision=True)
    tx = make_optimizer(tcfg, d_model=16)
    batch_np = {k: np.asarray(v) for k, v in _amt_batch(rng).items()}
    wired = wire_bf16_batch(batch_np)
    assert wired["semantic"].dtype == jnp.bfloat16
    assert wired["tgt_emotion_prob"].dtype == np.float32
    assert wired["x"].dtype == batch_np["x"].dtype

    state_a = create_train_state(model, tx, jax.random.PRNGKey(0), batch_np)
    state_b = create_train_state(model, tx, jax.random.PRNGKey(0), batch_np)
    step = make_amt_train_step(model, tx, tcfg)
    losses_a, losses_b = [], []
    for _ in range(3):
        state_a, m = jax.jit(step)(state_a, jax.device_put(batch_np))
        losses_a.append(float(m["loss"]))
        state_b, m = jax.jit(step)(state_b, jax.device_put(wired))
        losses_b.append(float(m["loss"]))
    np.testing.assert_array_equal(losses_a, losses_b)


def test_train_put_wraps_only_mixed(rng):
    from video2music_tpu.train.loop import _train_put

    plain = TrainConfig(optimizer="adam", lr=1e-3)
    assert _train_put(plain, None) is None
    mixed = TrainConfig(optimizer="adam", lr=1e-3, mixed_precision=True)
    put = _train_put(mixed, None)
    out = put({"semantic": np.ones((2, 3), np.float32),
               "tgt": np.ones((2,), np.float32)})
    assert out["semantic"].dtype == jnp.bfloat16
    assert out["tgt"].dtype == jnp.float32


# ---------------------------------------------------------------------------
# Train->eval convergence round-trip (VERDICT r4 item 6): the bench.py
# convergence guard only overfits one batch; this round-trip trains on a
# LEARNABLE synthetic rule and asserts the EVAL metrics (loss + hits@k on a
# held-out batch) move the right way — so a subtly wrong loss weighting or a
# broken eval metric fails the suite, not just a dead gradient path.
# ---------------------------------------------------------------------------

def _markov_batch(rng, B=8, L=12):
    """Synthetic LEARNABLE stream: tgt[t] = (x[t]*7 + 3) % 156 + 1 with x
    teacher-forced as tgt shifted right. (root, attr) of a chord id is
    unique (core/vocab), so the decoder's root/attr embeddings see enough
    to learn the rule exactly; video features are noise (the rule rides the
    token path, which is what the CE term trains)."""
    from video2music_tpu.core.vocab import chord_to_root_attr_tables

    root_tab, attr_tab = chord_to_root_attr_tables()
    rows = emotion_chord_targets()
    x = np.zeros((B, L), np.int64)
    tgt = np.zeros((B, L), np.int64)
    x[:, 0] = rng.integers(1, C.CHORD_END, B)
    for t in range(L):
        tgt[:, t] = (x[:, t] * 7 + 3) % 156 + 1
        if t + 1 < L:
            x[:, t + 1] = tgt[:, t]
    eid = rng.integers(0, 6, (B, L))
    base = _amt_batch(rng, B=B, L=L)
    base.update(
        x=jnp.asarray(x), x_root=jnp.asarray(np.asarray(root_tab)[x]),
        x_attr=jnp.asarray(np.asarray(attr_tab)[x]), tgt=jnp.asarray(tgt),
        tgt_emotion=jnp.asarray(rows[eid]))
    return base


def _train_eval_roundtrip(loss_lambda, n_steps=200):
    """Train a tiny flagship-wiring AMT on the Markov rule for n_steps and
    return (init_metrics, trained_metrics) evaluated on a HELD-OUT batch.
    Eval always scores with the production loss weighting so the two arms
    are comparable; ``loss_lambda`` only changes what is OPTIMIZED."""
    model = _tiny_amt("2.2")
    tcfg = TrainConfig(optimizer="adam", lr=3e-3, loss_lambda=loss_lambda)
    tx = make_optimizer(tcfg, d_model=16)
    batches = [_markov_batch(np.random.default_rng(s)) for s in range(4)]
    held_out = _markov_batch(np.random.default_rng(99))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batches[0])
    train = jax.jit(make_amt_train_step(model, tx, tcfg))
    ev = jax.jit(make_amt_eval_step(
        model, TrainConfig(optimizer="adam", lr=3e-3)))
    init = jax.tree_util.tree_map(float,
                                  ev(state.params, state.moe_state, held_out))
    for i in range(n_steps):
        state, _ = train(state, batches[i % len(batches)])
    trained = jax.tree_util.tree_map(
        float, ev(state.params, state.moe_state, held_out))
    return init, trained


def test_train_eval_roundtrip_improves():
    """Healthy loss weighting: held-out loss drops and hits@1/3/5 climb
    well above the ~1/157 init chance level after 200 steps."""
    init, trained = _train_eval_roundtrip(loss_lambda=C.LOSS_LAMBDA)
    assert trained["loss"] < 0.9 * init["loss"], (init, trained)
    assert trained["hits@1"] > init["hits@1"] + 0.15, (init, trained)
    assert trained["hits@3"] > init["hits@3"] + 0.15, (init, trained)
    assert trained["hits@5"] > init["hits@5"] + 0.15, (init, trained)
    assert -1.0 <= trained["correspondence"] <= 1.0


def test_train_eval_roundtrip_detects_flipped_loss():
    """Sensitivity proof: with the chord-CE weight SIGN-FLIPPED (the
    canonical lambda bug) the same round-trip must NOT satisfy the healthy
    test's criteria — i.e. this guard demonstrably catches a loss-weighting
    regression, which per-step loss curves alone would not."""
    init, trained = _train_eval_roundtrip(loss_lambda=-C.LOSS_LAMBDA)
    healthy = (trained["loss"] < 0.9 * init["loss"]
               and trained["hits@1"] > init["hits@1"] + 0.15)
    assert not healthy, (init, trained)
