"""Observability tests: expert-emotion counts, MaxVio log, plots, key detection."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video2music_tpu.core.config import amt_config
from video2music_tpu.models import VideoMusicTransformer
from video2music_tpu.obs import (MaxVioLog, collect_moe_metrics,
                                 plot_expert_emotion_heatmaps,
                                 save_expert_emotion)


@pytest.fixture(scope="module")
def moe_eval_metrics():
    cfg = amt_config("2.2", n_layers=2, num_heads=2, d_model=16, d_ff=32,
                     max_seq_video=12, max_seq_chord=12, total_vf_dim=11,
                     dropout=0.0)
    model = VideoMusicTransformer(cfg=cfg)
    rng = np.random.default_rng(0)
    B, L = 2, 12
    emotion = rng.uniform(size=(B, L, 2)).astype(np.float32)
    emotion[0, -2:] = 0.0  # PAD rows -> emotion id -1, excluded from counts
    args = (jnp.asarray(rng.integers(0, 100, (B, L - 1))),
            jnp.asarray(rng.integers(0, 13, (B, L - 1))),
            jnp.asarray(rng.integers(0, 14, (B, L - 1))),
            jnp.asarray(rng.standard_normal((B, L, 7)).astype(np.float32)),
            jnp.ones((B, 1), jnp.float32),
            jnp.asarray(rng.integers(0, 5, (B, L)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)),
            jnp.asarray(emotion))
    variables = model.init({"params": jax.random.PRNGKey(0)}, *args)
    _, mutated = model.apply(variables, *args, deterministic=True,
                             mutable=["moe_state", "metrics"])
    return mutated["metrics"]


def test_expert_emotion_counts_present(moe_eval_metrics):
    layers = collect_moe_metrics(moe_eval_metrics)
    ee = [v for v in layers.values() if "expert_emotion_counts" in v]
    assert len(ee) >= 2  # encoder + decoder deep MoE layers
    counts = ee[0]["expert_emotion_counts"]
    assert counts.shape == (6, 6)
    assert counts.sum() > 0
    # top-2 routing: each counted token contributes 2 selections
    assert counts.sum() % 2 == 0


def test_save_and_plot_expert_emotion(moe_eval_metrics, tmp_path):
    paths = save_expert_emotion(moe_eval_metrics, out_dir=str(tmp_path))
    assert len(paths) >= 2
    with open(paths[0]) as f:
        data = json.load(f)
    assert len(data["counts"]) == 6
    pngs = plot_expert_emotion_heatmaps(moe_eval_metrics,
                                        out_dir=str(tmp_path))
    assert all(os.path.getsize(p) > 1000 for p in pngs)


def test_maxvio_log(moe_eval_metrics, tmp_path):
    log = MaxVioLog()
    log.update(moe_eval_metrics)
    log.update(moe_eval_metrics)
    p = log.save(str(tmp_path / "maxvio.npy"))
    arr = np.load(p)
    assert arr.ndim == 1 and len(arr) > 0
    assert np.isfinite(arr).all()


def test_key_detection_on_synthetic(tmp_path):
    """Key detection learns a separable synthetic emotion->key mapping."""
    from video2music_tpu.cli.key_detection import run_key_detection

    rng = np.random.default_rng(0)

    class FakeDS:
        def __init__(self, n, seed):
            self.rng = np.random.default_rng(seed)
            self.samples = []
            for _ in range(n):
                key_val = float(self.rng.integers(0, 3))
                emo = self.rng.uniform(size=(20, 6)).astype(np.float32)
                emo[:, int(key_val)] += 2.0  # make classes separable
                self.samples.append({"emotion": emo,
                                     "key_val": np.asarray([key_val])})

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            return self.samples[i]

    from sklearn.naive_bayes import GaussianNB
    results = run_key_detection(
        FakeDS(30, 0), FakeDS(10, 1), FakeDS(10, 2),
        model_dir=str(tmp_path / "models"),
        results_path=str(tmp_path / "results.json"),
        models={"GaussianNB": GaussianNB()}, log=lambda *a: None)
    assert results["GaussianNB"]["Acc"] > 0.8
    assert os.path.exists(tmp_path / "models" / "GaussianNB.pkl")
