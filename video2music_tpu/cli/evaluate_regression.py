"""CLI: evaluate a trained regression model on the test split
(``python -m video2music_tpu.cli.evaluate_regression``).

Rebuild of ``evaluate_regression.py`` (reference: :33-114): per-head RMSE
(note density, loudness) + instrument BCE on the test split, written to
``eval_results.json``.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from ..core.config import RegressionConfig, TrainConfig
from ..data import create_vevo_datasets
from ..data.dataset import batches as make_batches
from ..models import VideoRegression
from ..train import checkpoint as ckpt
from ..train import make_optimizer
from ..train.step import (create_train_state, make_regression_eval_step,
                          regression_init)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Evaluate VideoRegression on the test split")
    p.add_argument("-dataset_dir", default="./dataset")
    p.add_argument("-model_weights", required=True)
    p.add_argument("-regModel", default="bilstm")
    p.add_argument("-n_layers", type=int, default=2)
    p.add_argument("-d_model", type=int, default=64)
    p.add_argument("-dim_feedforward", type=int, default=1024)
    p.add_argument("-batch_size", type=int, default=8)
    p.add_argument("-output_dir", default="./eval_out_reg")
    args = p.parse_args(argv)

    _, _, test_ds = create_vevo_datasets(dataset_root=args.dataset_dir)
    if not len(test_ds):
        raise SystemExit(f"no complete samples under {args.dataset_dir}")
    sample = test_ds[0]
    cfg = RegressionConfig(
        reg_model=args.regModel, n_layers=args.n_layers,
        d_model=args.d_model, d_hidden=args.dim_feedforward, dropout=0.0,
        total_vf_dim=(sample["semantic"].shape[-1]
                      + sample["emotion"].shape[-1]))
    model = VideoRegression(cfg=cfg)
    tx = make_optimizer(TrainConfig(), d_model=cfg.d_model)
    first = next(make_batches(test_ds, args.batch_size, shuffle=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), first,
                               init_fn=regression_init)
    state = ckpt.restore_checkpoint(args.model_weights, state)

    eval_step = jax.jit(make_regression_eval_step(model))
    rows = [eval_step(state.params, state.moe_state, b)
            for b in make_batches(test_ds, args.batch_size, shuffle=False)]
    se_nd = sum(float(r["se_note_density"]) for r in rows)
    se_ln = sum(float(r["se_loudness"]) for r in rows)
    n = sum(float(r["count"]) for r in rows)
    metrics = {
        "rmse_note_density": float(np.sqrt(se_nd / max(n, 1.0))),
        "rmse_loudness": float(np.sqrt(se_ln / max(n, 1.0))),
        "bce_instrument": float(np.mean([float(r["bce_instrument"])
                                         for r in rows])),
        "loss": float(np.mean([float(r["loss"]) for r in rows])),
    }
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "eval_results.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
