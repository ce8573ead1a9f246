#!/usr/bin/env python
"""Export OpenAI CLIP ViT-L/14@336px weights for the TPU framework.

Run once in an environment where the HuggingFace checkpoint
``openai/clip-vit-large-patch14-336`` (the reference's CLIP weights,
reference: ``video2music.py:151``) is available:

    python tools/convert_clip.py --out weights/clip_l14_336

Writes:
  * ``<out>_params.npy``      — flax params for features.clip.CLIP
  * ``<out>_text_embeds.npy`` — (6, 768) UNNORMALIZED text embeddings of the
    emotion prompts (tokenizer-free runtime)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="openai/clip-vit-large-patch14-336")
    p.add_argument("--out", default="weights/clip_l14_336")
    args = p.parse_args()

    import torch
    from transformers import CLIPModel, CLIPTokenizer

    from video2music_tpu.features.clip import (EMOTION_PROMPTS,
                                               clip_vit_l14_336_config,
                                               convert_hf_clip)

    hf = CLIPModel.from_pretrained(args.model).eval()
    tok = CLIPTokenizer.from_pretrained(args.model)
    cfg = clip_vit_l14_336_config()
    params = convert_hf_clip(hf.state_dict(), cfg)

    ids = tok(list(EMOTION_PROMPTS), padding=True, return_tensors="pt")
    with torch.no_grad():
        text_embeds = hf.get_text_features(**ids).numpy()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.save(args.out + "_params.npy", params, allow_pickle=True)
    np.save(args.out + "_text_embeds.npy", text_embeds)
    print("wrote", args.out + "_params.npy", "and text embeds",
          text_embeds.shape)


if __name__ == "__main__":
    main()
