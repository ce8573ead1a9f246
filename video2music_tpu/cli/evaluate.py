"""CLI: evaluate a trained AMT on the test split
(``python -m video2music_tpu.cli.evaluate``).

Re-build of ``evaluate.py`` (reference: ``evaluate.py:39-176``): loss,
accuracy, hits@1/3/5, correspondence on the test split, plus optional
chord/root/quality confusion matrices saved as ``.npy``
(reference: ``utilities/run_model_vevo.py:454-566``).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from ..core import constants as C
from ..core.config import TrainConfig, amt_config
from ..data import create_vevo_datasets
from ..data.dataset import batches as make_batches
from ..models import VideoMusicTransformer
from ..train import checkpoint as ckpt
from ..train import make_optimizer
from ..train.loop import _mean_metrics
from ..train.step import create_train_state, make_amt_eval_step
from .train_amt import total_vf_dim


def confusion_matrices(model, params, moe_state, dataset, batch_size=8):
    """(chord 159x159, root 14x14, quality 14x14) count matrices over
    non-PAD targets (reference: run_model_vevo.py:454-566)."""
    from ..core.vocab import chord_to_root_attr_tables
    root_tab, attr_tab = chord_to_root_attr_tables()

    cm = np.zeros((C.CHORD_SIZE, C.CHORD_SIZE), np.int64)

    @jax.jit
    def predict(params, moe_state, batch):
        logits, _ = model.apply(
            {"params": params, "moe_state": moe_state},
            batch["x"], batch["x_root"], batch["x_attr"], batch["semantic"],
            batch["key"], batch["scene_offset"], batch["motion"],
            batch["emotion"], deterministic=True,
            mutable=["moe_state", "metrics"])
        return jax.numpy.argmax(logits, axis=-1)

    for batch in make_batches(dataset, batch_size, shuffle=False):
        pred = np.asarray(predict(params, moe_state, batch))
        tgt = np.asarray(batch["tgt"])
        mask = tgt != C.CHORD_PAD
        np.add.at(cm, (tgt[mask], pred[mask]), 1)
    n_root, n_attr = 14, 14  # reference clamps to N..END rows
    cm_root = np.zeros((15, 15), np.int64)
    cm_attr = np.zeros((16, 16), np.int64)
    ids = np.arange(C.CHORD_SIZE)
    np.add.at(cm_root, (root_tab[ids][:, None].repeat(C.CHORD_SIZE, 1),
                        root_tab[ids][None, :].repeat(C.CHORD_SIZE, 0)), cm)
    np.add.at(cm_attr, (attr_tab[ids][:, None].repeat(C.CHORD_SIZE, 1),
                        attr_tab[ids][None, :].repeat(C.CHORD_SIZE, 0)), cm)
    return cm, cm_root, cm_attr


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate AMT on the test split")
    p.add_argument("-dataset_dir", default="./dataset")
    p.add_argument("-model_weights", required=True)
    p.add_argument("-music_gen_version", default=None)
    p.add_argument("-motion_type", type=int, default=0)
    p.add_argument("-n_layers", type=int, default=6)
    p.add_argument("-num_heads", type=int, default=8)
    p.add_argument("-d_model", type=int, default=512)
    p.add_argument("-dim_feedforward", type=int, default=1024)
    p.add_argument("-batch_size", type=int, default=8)
    p.add_argument("-output_dir", default="./eval_out")
    p.add_argument("-ce_smoothing", type=float, default=None,
                   help="must match training for comparable loss values")
    p.add_argument("-confusion", action="store_true",
                   help="also save chord/root/quality confusion .npy files")
    p.add_argument("-expert_plots", action="store_true",
                   help="save MoE expert-emotion count json + heatmaps "
                        "(reference: third_party/log_experts.py)")
    args = p.parse_args(argv)

    _, _, test_ds = create_vevo_datasets(dataset_root=args.dataset_dir,
                                         motion_type=args.motion_type)
    if not len(test_ds):
        raise SystemExit(f"no complete samples under {args.dataset_dir}")
    cfg = amt_config(args.music_gen_version, n_layers=args.n_layers,
                     num_heads=args.num_heads, d_model=args.d_model,
                     d_ff=args.dim_feedforward, dropout=0.0,
                     total_vf_dim=total_vf_dim(test_ds[0], args.motion_type))
    model = VideoMusicTransformer(cfg=cfg)
    tcfg = TrainConfig(ce_smoothing=args.ce_smoothing)
    tx = make_optimizer(tcfg, d_model=cfg.d_model)
    first = next(make_batches(test_ds, args.batch_size, shuffle=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), first)
    state = ckpt.restore_checkpoint(args.model_weights, state)

    eval_step = jax.jit(make_amt_eval_step(model, tcfg))
    rows = [eval_step(state.params, state.moe_state, b)
            for b in make_batches(test_ds, args.batch_size, shuffle=False)]
    metrics = _mean_metrics(rows)

    if args.expert_plots:
        # run the forward with the metrics collection mutable so MoE layers
        # accumulate per-(emotion, expert) counts (obs/logging.py)
        from ..obs import plot_expert_emotion_heatmaps, save_expert_emotion
        acc = None
        for b in make_batches(test_ds, args.batch_size, shuffle=False):
            _, mut = model.apply(
                {"params": state.params, "moe_state": state.moe_state},
                b["x"], b["x_root"], b["x_attr"], b["semantic"], b["key"],
                b["scene_offset"], b["motion"], b["emotion"],
                deterministic=True, mutable=["moe_state", "metrics"])
            m = mut.get("metrics", {})
            acc = m if acc is None else jax.tree_util.tree_map(
                lambda a, c: a + c, acc, m)
        if acc:
            os.makedirs(args.output_dir, exist_ok=True)
            save_expert_emotion(acc, out_dir=args.output_dir)
            plot_expert_emotion_heatmaps(acc, out_dir=args.output_dir)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "eval_results.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))

    if args.confusion:
        cm, cm_root, cm_attr = confusion_matrices(
            model, state.params, state.moe_state, test_ds, args.batch_size)
        np.save(os.path.join(args.output_dir, "confusion_chord.npy"), cm)
        np.save(os.path.join(args.output_dir, "confusion_root.npy"), cm_root)
        np.save(os.path.join(args.output_dir, "confusion_quality.npy"),
                cm_attr)


if __name__ == "__main__":
    main()
