"""Epoch-loop drivers end to end on a synthetic dataset (CPU)."""

import csv
import os

import numpy as np
import pytest

from tests.test_data import _write_fixture_tree
from video2music_tpu.core.config import (MusicTransformerConfig,
                                         RegressionConfig, TrainConfig,
                                         amt_config)
from video2music_tpu.data import create_vevo_datasets
from video2music_tpu.models import (MusicTransformer, VideoMusicTransformer,
                                    VideoRegression)
from video2music_tpu.train.loop import (CSV_HEADER, LoopConfig, train_amt,
                                        train_music_transformer,
                                        train_regression)


@pytest.fixture(scope="module")
def datasets(tmp_path_factory):
    root = tmp_path_factory.mktemp("vevo")
    _write_fixture_tree(str(root), ["aaa", "bbb", "ccc", "ddd"])
    return create_vevo_datasets(str(root), max_seq_chord=10,
                                max_seq_video=10)


def test_train_amt_loop(datasets, tmp_path):
    train_ds, val_ds, _ = datasets
    cfg = amt_config("2.2", n_layers=2, num_heads=2, d_model=16, d_ff=32,
                     max_seq_video=10, max_seq_chord=10,
                     total_vf_dim=8 + 1 + 1 + 6, dropout=0.0)
    model = VideoMusicTransformer(cfg=cfg)
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    out = tmp_path / "amt"
    loop = LoopConfig(epochs=2, batch_size=2, output_dir=str(out),
                      log_fn=lambda *_: None)
    train_amt(model, tcfg, loop, train_ds, val_ds)
    with open(out / "results.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0] == CSV_HEADER
    assert len(rows) == 3  # header + 2 epochs
    assert os.path.isdir(out / "weights" / "best_loss_weights")
    assert os.path.isdir(out / "weights" / "epoch_0002")


def test_train_music_transformer_loop(datasets, tmp_path):
    train_ds, val_ds, _ = datasets
    cfg = MusicTransformerConfig(n_layers=1, num_heads=2, d_model=16,
                                 d_ff=32, max_seq_chord=10, dropout=0.0)
    out = tmp_path / "mt"
    loop = LoopConfig(epochs=1, batch_size=2, output_dir=str(out),
                      log_fn=lambda *_: None)
    train_music_transformer(MusicTransformer(cfg=cfg),
                            TrainConfig(optimizer="adam", lr=1e-3), loop,
                            train_ds, val_ds)
    assert os.path.isfile(out / "results.csv")
    assert os.path.isdir(out / "weights" / "best_loss_weights")


def test_train_regression_loop(datasets, tmp_path):
    train_ds, val_ds, _ = datasets
    cfg = RegressionConfig(reg_model="gru", n_layers=1, d_model=8,
                           d_hidden=16, total_vf_dim=8 + 6, dropout=0.0)
    out = tmp_path / "reg"
    loop = LoopConfig(epochs=1, batch_size=2, output_dir=str(out),
                      log_fn=lambda *_: None)
    train_regression(VideoRegression(cfg=cfg),
                     TrainConfig(optimizer="adam", lr=1e-3), loop,
                     train_ds, val_ds)
    with open(out / "results.csv") as f:
        rows = list(csv.reader(f))
    assert len(rows) == 2
    assert float(rows[1][4]) >= 0  # RMSE note density column


def test_separated_train_metric_is_optimized_total(datasets):
    """For separated models metrics['loss'] must be the optimized total
    (CE(root)+CE(attr)), not a lambda-mix with the -1.0 emotion sentinel."""
    import jax
    from video2music_tpu.data.dataset import batches as make_batches
    from video2music_tpu.train import (create_train_state, make_optimizer,
                                       make_amt_train_step)

    train_ds, _, _ = datasets
    cfg = amt_config("1.0", n_layers=1, num_heads=2, d_model=16, d_ff=32,
                     max_seq_video=10, max_seq_chord=10,
                     total_vf_dim=8 + 1 + 1 + 6, dropout=0.0,
                     separated=True)
    model = VideoMusicTransformer(cfg=cfg)
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    tx = make_optimizer(tcfg, d_model=cfg.d_model)
    batch = next(make_batches(train_ds, 2, shuffle=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_amt_train_step(model, tx, tcfg))
    _, m = step(state, batch)
    lc = float(m["loss_chord"])
    assert float(m["loss_emotion"]) == -1.0  # sentinel reported separately
    assert abs(float(m["loss"]) - lc) < 1e-6  # loss == the optimized total
    assert float(m["loss"]) > 0.0


def test_train_regression_loop_with_mixup(tmp_path):
    """Regression epoch with mixup augmentation active: the (l-1)
    negative-weight quirk combination must still train to a finite loss
    (reference: vevo_dataset.py:193-224)."""
    root = tmp_path / "vevo"
    _write_fixture_tree(str(root), ["aaa", "bbb", "ccc", "ddd"])
    train_ds, val_ds, _ = create_vevo_datasets(
        str(root), max_seq_chord=10, max_seq_video=10, augmentation=True)
    # augmented split = base + 2x mixup pairs
    assert len(train_ds) == 3 * len(train_ds.ids)
    # mixup sample sanity: float features combine a*l + b*(l-1)
    n = len(train_ds.ids)
    i, j, l = train_ds._aug[0]
    mixed = train_ds[n]
    want = train_ds[i]["semantic"] * l + train_ds[j]["semantic"] * (l - 1)
    np.testing.assert_allclose(mixed["semantic"], want, rtol=1e-6)

    cfg = RegressionConfig(reg_model="gru", n_layers=1, d_model=8,
                           d_hidden=16, total_vf_dim=8 + 6, dropout=0.0)
    out = tmp_path / "reg_mix"
    loop = LoopConfig(epochs=1, batch_size=2, output_dir=str(out),
                      log_fn=lambda *_: None)
    state = train_regression(VideoRegression(cfg=cfg),
                             TrainConfig(optimizer="adam", lr=1e-3), loop,
                             train_ds, val_ds)
    with open(out / "results.csv") as f:
        rows = list(csv.reader(f))
    train_loss = float(rows[1][2])
    assert np.isfinite(train_loss)


def test_params_only_resume_warns_about_lr_restart(datasets, tmp_path):
    """continue_from a weights-only checkpoint restarts the Noam warmup;
    the loop must surface that (or accept LoopConfig.init_steps)."""
    import jax
    from video2music_tpu.data.dataset import batches as make_batches
    from video2music_tpu.train import (checkpoint as ckpt,
                                       create_train_state, make_optimizer)

    train_ds, val_ds, _ = datasets
    cfg = amt_config("2.2", n_layers=1, num_heads=2, d_model=16, d_ff=32,
                     max_seq_video=10, max_seq_chord=10,
                     total_vf_dim=8 + 1 + 1 + 6, dropout=0.0)
    model = VideoMusicTransformer(cfg=cfg)
    tcfg = TrainConfig(optimizer="adamw", lr=None)  # Noam schedule
    tx = make_optimizer(tcfg, d_model=cfg.d_model)
    batch = next(make_batches(train_ds, 2, shuffle=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    wpath = tmp_path / "weights_only"
    ckpt.save_checkpoint(str(wpath), state, params_only=True)

    logs = []
    out = tmp_path / "resume"
    loop = LoopConfig(epochs=1, batch_size=2, output_dir=str(out),
                      continue_from=str(wpath), log_fn=logs.append)
    train_amt(model, tcfg, loop, train_ds, val_ds)
    assert any("warmup" in m for m in logs), logs


def test_auto_resume_from_latest_snapshot(datasets, tmp_path):
    """auto_resume picks up the newest epoch_NNNN snapshot and continues
    epoch numbering (2 new epochs on top of the restored 2)."""
    train_ds, val_ds, _ = datasets
    cfg = amt_config("2.2", n_layers=1, num_heads=2, d_model=16, d_ff=32,
                     max_seq_video=10, max_seq_chord=10,
                     total_vf_dim=8 + 1 + 1 + 6, dropout=0.0)
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    out = tmp_path / "resume"
    loop = LoopConfig(epochs=2, batch_size=2, output_dir=str(out),
                      log_fn=lambda *_: None)
    train_amt(VideoMusicTransformer(cfg=cfg), tcfg, loop, train_ds, val_ds)
    assert os.path.isdir(out / "weights" / "epoch_0002")

    logs = []
    loop2 = LoopConfig(epochs=4, batch_size=2, output_dir=str(out),
                       auto_resume=True, log_fn=logs.append)
    state = train_amt(VideoMusicTransformer(cfg=cfg), tcfg, loop2,
                      train_ds, val_ds)
    assert any("auto-resume: epoch 2" in m for m in logs), logs
    assert os.path.isdir(out / "weights" / "epoch_0004")
    with open(out / "results.csv") as f:
        rows = list(csv.reader(f))
    assert len(rows) == 5  # header + 2 + 2 epochs
    # the restored step counter carried over: 4 epochs of batches total
    assert int(state.step) > int(state.step) // 2


def test_train_amt_cli_parallel_pp(tmp_path):
    """End-to-end: train CLI on a mesh with GPipe pipeline stages."""
    from video2music_tpu.cli.train_amt import main

    root = tmp_path / "data"
    _write_fixture_tree(str(root), ["aaa", "bbb", "ccc", "ddd"])
    out = tmp_path / "out_pp"
    main(["-dataset_dir", str(root), "-output_dir", str(out),
          "-epochs", "1", "-batch_size", "4", "-n_layers", "2",
          "-d_model", "16", "-dim_feedforward", "32", "-num_heads", "2",
          "-mesh", "2x2", "-parallel", "pp", "-microbatches", "2"])
    rows = list(csv.reader(open(out / "results.csv")))
    assert rows[0] == CSV_HEADER and len(rows) == 2
    assert np.isfinite(float(rows[1][8]))


def test_train_amt_cli_parallel_sp(tmp_path):
    """End-to-end: train CLI with tp weights + sequence-parallel stream."""
    from video2music_tpu.cli.train_amt import main

    root = tmp_path / "data"
    _write_fixture_tree(str(root), ["aaa", "bbb", "ccc", "ddd"])
    out = tmp_path / "out_sp"
    main(["-dataset_dir", str(root), "-output_dir", str(out),
          "-epochs", "1", "-batch_size", "4", "-n_layers", "2",
          "-d_model", "16", "-dim_feedforward", "32", "-num_heads", "2",
          "-music_gen_version", "2.2", "-mesh", "4x2", "-parallel", "sp"])
    rows = list(csv.reader(open(out / "results.csv")))
    assert rows[0] == CSV_HEADER and len(rows) == 2
    assert np.isfinite(float(rows[1][8]))


def test_full_batches_drops_ragged():
    from video2music_tpu.train.loop import _full_batches

    batches = [{"x": np.zeros((4, 3))}, {"x": np.zeros((4, 3))},
               {"x": np.zeros((2, 3))}]
    msgs = []
    out = list(_full_batches(iter(batches), 4, msgs.append))
    assert len(out) == 2
    assert len(msgs) == 1 and "ragged" in msgs[0]


def test_train_amt_mesh_rejects_indivisible_batch(tmp_path):
    import jax
    from video2music_tpu.core.config import TrainConfig, amt_config
    from video2music_tpu.models import VideoMusicTransformer
    from video2music_tpu.parallel import create_mesh

    root = tmp_path / "d"
    _write_fixture_tree(str(root), ["aaa", "bbb", "ccc", "ddd"])
    train_ds, val_ds, _ = create_vevo_datasets(str(root), max_seq_chord=10,
                                               max_seq_video=10)
    cfg = amt_config(None, n_layers=2, num_heads=2, d_model=16, d_ff=32,
                     max_seq_video=10, max_seq_chord=10,
                     total_vf_dim=776, dropout=0.0)
    model = VideoMusicTransformer(cfg=cfg)
    tcfg = TrainConfig(optimizer="adam", lr=1e-3)
    loop = LoopConfig(epochs=1, batch_size=3, output_dir=str(tmp_path / "o"))
    with pytest.raises(ValueError, match="divisible"):
        train_amt(model, tcfg, loop, train_ds, val_ds,
                  mesh=create_mesh((2, 2)), parallel="dp")


def test_step_profiler_writes_trace(tmp_path):
    """-profile N: StepProfiler traces steps 1..N once and flushes a
    profiler artifact directory (jax.profiler works on the CPU backend)."""
    import jax.numpy as jnp
    from video2music_tpu.train.loop import StepProfiler

    out = tmp_path / "prof"
    msgs = []
    p = StepProfiler(1, str(out), log_fn=msgs.append)
    p.maybe_start(0)           # step 0 is the compile step — not traced
    assert not p._active
    p.maybe_start(1)
    assert p._active
    x = jnp.arange(4) * 2      # some device work inside the trace
    p.maybe_stop(1, x)
    assert p._done and not p._active
    assert msgs and "profiled steps 1..1" in msgs[0]
    # a plugins/profile/<ts>/ tree with at least one artifact
    found = [f for root, _, files in os.walk(out) for f in files]
    assert found, "profiler trace produced no files"
    # a finished profiler is inert
    p.maybe_start(1)
    assert not p._active
