#!/usr/bin/env python
"""Convert a gensim ``Word2Vec.save()`` chord-embedding model into the
packaged ``assets/chord_word2vec.npz`` artifact — WITHOUT gensim.

The reference ships its trained table as ``word2vec_filled.bin`` (512-d,
203 chord symbols in frequency order; load site:
``model/video_music_transformer.py:20,47-50``). This tool reads it with
the restricted unpickler in ``features/chord2vec.py`` (only numpy array
reconstruction is allowed — the pickle is not trusted) and stores the raw
vectors + keys; id alignment happens at load time
(``features.chord2vec.word2vec_chord_table``), so both the reference's
positional-indexing quirk and the symbol-corrected table come from one
artifact.

    python tools/import_word2vec.py --model /path/to/word2vec_filled.bin
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   help="gensim Word2Vec.save() file (e.g. the reference's "
                        "word2vec_filled.bin)")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "video2music_tpu", "assets",
        "chord_word2vec.npz"))
    args = p.parse_args()

    from video2music_tpu.features.chord2vec import load_gensim_word2vec

    vectors, keys = load_gensim_word2vec(args.model)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(args.out, vectors=vectors, keys=np.array(keys))
    print(f"wrote {args.out}: {vectors.shape} vectors, "
          f"{len(keys)} keys ({keys[:5]}...)")


if __name__ == "__main__":
    main()
