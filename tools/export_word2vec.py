#!/usr/bin/env python
"""Export the reference's frozen Word2Vec chord-embedding table.

The fork's ``chord_embed`` variants load a gensim model at construction
time (reference: ``model/video_music_transformer.py:20,47-50``,
``word2vec_filled.bin``, vector_size=512, trained in ChordEmbedding.ipynb).
Run this where gensim + the .bin exist:

    python tools/export_word2vec.py --model word2vec_filled.bin \
        --out weights/chord_word2vec.npy

The output .npy is a (CHORD_SIZE, 512) table loadable into the
``chord_embedding`` frozen param of models/amt.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--out", default="weights/chord_word2vec.npy")
    args = p.parse_args()

    try:
        from gensim.models import Word2Vec
    except ImportError:
        raise SystemExit("gensim is required to read the .bin "
                         "(pip install gensim where this tool runs)")

    from video2music_tpu.core.constants import CHORD_SIZE

    w2v = Word2Vec.load(args.model)
    vectors = np.asarray(w2v.wv.vectors, np.float32)
    if vectors.shape[0] < CHORD_SIZE:
        # pad missing ids (END/PAD) with zeros, as the reference's frozen
        # Embedding.from_pretrained would error on OOV lookups otherwise
        pad = np.zeros((CHORD_SIZE - vectors.shape[0], vectors.shape[1]),
                       np.float32)
        vectors = np.concatenate([vectors, pad])
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.save(args.out, vectors[:CHORD_SIZE])
    print("wrote", args.out, vectors[:CHORD_SIZE].shape)


if __name__ == "__main__":
    main()
