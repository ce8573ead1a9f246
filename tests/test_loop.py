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
