#!/usr/bin/env python
"""Convert a reference torch ``state_dict`` pickle into an orbax checkpoint.

    python tools/convert_reference_checkpoint.py \
        --weights best_loss_weights.pickle --kind amt --out ckpt/amt_base

Kinds: ``amt`` (base VideoMusicTransformer, rpr=True) and ``regression``
(RNN backbones). The fork's V1-V3 variants need their name maps added to
video2music_tpu/train/convert.py first.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--kind", choices=["amt", "amt_v2", "regression"], default="amt")
    p.add_argument("--n_layers", type=int, default=6)
    p.add_argument("--reg_model", default="bilstm")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import torch
    import orbax.checkpoint as ocp

    from video2music_tpu.train.convert import (convert_reference_amt,
                                               convert_reference_amt_v2,
                                               convert_reference_regression)

    sd = torch.load(args.weights, map_location="cpu")
    if args.kind == "amt":
        params = convert_reference_amt(sd, args.n_layers)
    elif args.kind == "amt_v2":
        params = convert_reference_amt_v2(sd, args.n_layers)
    else:
        params = convert_reference_regression(sd, args.reg_model)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(args.out), {"params": params}, force=True)
    print("wrote orbax checkpoint", args.out)


if __name__ == "__main__":
    main()
