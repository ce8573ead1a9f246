#!/usr/bin/env python
"""Export torchvision MaxViT-T ImageNet weights for the TPU framework.

Run once where torchvision + its checkpoint are available (the reference's
motion embedder, reference: ``video2music.py:298-305``):

    python tools/convert_maxvit.py --out weights/maxvit_t_params.npy
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="weights/maxvit_t_params.npy")
    args = p.parse_args()

    from torchvision import models

    from video2music_tpu.features.maxvit import convert_torchvision_maxvit

    tv = models.maxvit_t(weights=models.MaxVit_T_Weights.DEFAULT).eval()
    params = convert_torchvision_maxvit(tv.state_dict())
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.save(args.out, params, allow_pickle=True)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
