"""CLI: train the AMT (``python -m video2music_tpu.cli.train_amt``).

Flag names mirror the reference's ``parse_train_args``
(reference: ``utilities/argument_funcs.py:22-75``, dashes kept).
"""

from __future__ import annotations

import argparse
import os

from ..core import constants as C
from ..core.config import TrainConfig, amt_config
from ..data import create_vevo_datasets
from ..models import MusicTransformer, VideoMusicTransformer
from ..train.loop import LoopConfig, train_amt, train_music_transformer


def total_vf_dim(sample, motion_type: int) -> int:
    """768 semantic + 1 scene + {1,512,768} motion + emotion dim
    (reference: train.py:110-130)."""
    sem = sample["semantic"].shape[-1]
    emo = sample["emotion"].shape[-1]
    motion = {0: 1, 1: 512, 2: 768}[motion_type]
    return sem + 1 + motion + emo


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the AMT on TPU")
    p.add_argument("-dataset_dir", default="./dataset")
    p.add_argument("-output_dir", default="./saved_models/AMT")
    p.add_argument("-music_gen_version", default=None,
                   help="None=base AMT; '1.1'..'3.2' fork variants")
    p.add_argument("-epochs", type=int, default=50)
    p.add_argument("-batch_size", type=int, default=32)
    p.add_argument("-lr", type=float, default=None)
    p.add_argument("-ce_smoothing", type=float, default=None)
    p.add_argument("-optimizer", default="adam")
    p.add_argument("-auxiliary_loss", action="store_true")
    p.add_argument("-drop_loss", action="store_true")
    p.add_argument("-augmentation", action="store_true")
    p.add_argument("-motion_type", type=int, default=0)
    p.add_argument("-n_layers", type=int, default=6)
    p.add_argument("-num_heads", type=int, default=8)
    p.add_argument("-d_model", type=int, default=512)
    p.add_argument("-dim_feedforward", type=int, default=1024)
    p.add_argument("-dropout", type=float, default=0.1)
    p.add_argument("-weight_modulus", type=int, default=1)
    p.add_argument("-continue_weights", default=None)
    p.add_argument("-seed", type=int, default=0)
    p.add_argument("-music_only", action="store_true",
                   help="train the no-video MusicTransformer baseline "
                        "(reference IS_VIDEO=False)")
    p.add_argument("-moe_dispatch", default="dense",
                   choices=["dense", "capacity"],
                   help="MoE expert dispatch for batched calls: 'dense' "
                        "(exact, default) or 'capacity' (sparse per-expert "
                        "buffers; wins at large d_ff — see ops/moe.py)")
    p.add_argument("-moe_capacity_factor", type=float, default=1.25)
    p.add_argument("-mesh", default=None, metavar="DATAxMODEL",
                   help="multi-chip device mesh, e.g. '4x2' (data x model "
                        "axes over jax.devices()); single device when unset")
    p.add_argument("-parallel", default="dp",
                   choices=["dp", "tp", "sp", "pp"],
                   help="strategy on the mesh: dp (batch; EP expert "
                        "stacks), tp (+Megatron column/row weights), sp "
                        "(tp + sequence-parallel residual stream), pp "
                        "(GPipe pipeline stages, homogeneous stacks only)")
    p.add_argument("-profile", type=int, default=0, metavar="N",
                   help="capture a jax.profiler trace of train steps 1..N "
                        "(step 0 compiles) into -profile_dir; view with "
                        "TensorBoard's profile plugin / xprof")
    p.add_argument("-profile_dir", default="./profile")
    p.add_argument("-no_tensorboard", action="store_true",
                   help="disable the TensorBoard scalar stream (written by "
                        "the first-party event writer in obs/tensorboard.py "
                        "to <output_dir>/tensorboard; on by default like "
                        "the reference train.py:91-96)")
    p.add_argument("-microbatches", type=int, default=4,
                   help="pipeline microbatches per step (-parallel pp)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    train_ds, val_ds, _ = create_vevo_datasets(
        dataset_root=args.dataset_dir, motion_type=args.motion_type,
        augmentation=args.augmentation)
    if not len(train_ds):
        raise SystemExit(f"no complete samples under {args.dataset_dir}")
    tcfg = TrainConfig(
        batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
        ce_smoothing=args.ce_smoothing, optimizer=args.optimizer,
        auxiliary_loss=args.auxiliary_loss, seed=args.seed)
    loop = LoopConfig(epochs=args.epochs, batch_size=args.batch_size,
                      output_dir=args.output_dir,
                      weight_modulus=args.weight_modulus,
                      eval_train_subset=not args.augmentation,
                      continue_from=args.continue_weights, seed=args.seed,
                      profile_steps=args.profile,
                      profile_dir=args.profile_dir,
                      tensorboard_dir=(
                          None if args.no_tensorboard else
                          os.path.join(args.output_dir, "tensorboard")))
    if args.music_only:
        from ..core.config import MusicTransformerConfig
        mcfg = MusicTransformerConfig(
            n_layers=args.n_layers, num_heads=args.num_heads,
            d_model=args.d_model, d_ff=args.dim_feedforward,
            dropout=args.dropout)
        train_music_transformer(MusicTransformer(cfg=mcfg), tcfg, loop,
                                train_ds, val_ds)
        return
    cfg = amt_config(
        args.music_gen_version, n_layers=args.n_layers,
        num_heads=args.num_heads, d_model=args.d_model,
        d_ff=args.dim_feedforward, dropout=args.dropout,
        total_vf_dim=total_vf_dim(train_ds[0], args.motion_type))
    import dataclasses
    if args.moe_dispatch != "dense":
        cfg = dataclasses.replace(cfg, moe=dataclasses.replace(
            cfg.moe, dispatch=args.moe_dispatch,
            capacity_factor=args.moe_capacity_factor))
    mesh = None
    if args.mesh:
        from ..parallel import create_mesh
        data, model_ax = (int(v) for v in args.mesh.lower().split("x"))
        mesh = create_mesh((data, model_ax))
        if args.parallel == "sp":
            cfg = dataclasses.replace(cfg, sequence_parallel=True)
    elif args.parallel != "dp":
        raise SystemExit(
            f"-parallel {args.parallel} requires -mesh (e.g. -mesh 4x2); "
            "without a mesh the run would silently train single-device")
    model = VideoMusicTransformer(cfg=cfg)
    train_amt(model, tcfg, loop, train_ds, val_ds, drop_loss=args.drop_loss,
              mesh=mesh, parallel=args.parallel,
              n_microbatches=args.microbatches)


if __name__ == "__main__":
    main()
