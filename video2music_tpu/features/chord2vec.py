"""Chord embedding tables for the ``chord_embed`` model variants.

The reference loads a frozen 512-d gensim Word2Vec table trained over the
chord corpus in ChordEmbedding.ipynb (``word2vec_filled.bin``,
vector_size=512; load site reference:
``model/video_music_transformer.py:47-50``). Neither the binary nor the
corpus ships with the repo, so this module provides two first-party
replacements:

  * :func:`deterministic_chord_table` — a music-theory-informed table,
    generated from code (no binary asset): each chord id maps to features
    (circle-of-fifths + chromatic root coordinates, quality one-hot, the
    chord-tone pitch-class set from the ezchord voicer) projected to the
    target dim by a seeded Gaussian. Deterministic across runs/platforms,
    and musically structured: chords sharing tones/roots are closer than
    unrelated ones. This is the default frozen table for ``chord_embed``
    models (wired in models/amt.py).
  * :func:`train_skipgram` — a small numpy skip-gram/negative-sampling
    trainer (the same objective gensim's Word2Vec optimizes) for users who
    have a chord ``.lab`` corpus and want a data-driven table;
    :func:`corpus_from_labs` turns .lab files into id sentences.
"""

from __future__ import annotations

import functools
from typing import Iterable, List, Sequence

import numpy as np

from ..core import constants as C
from ..core.vocab import QUALITIES, chord_symbol
from ..midi.ezchord import Chord


@functools.lru_cache(maxsize=None)
def chord_feature_matrix() -> np.ndarray:
    """(CHORD_SIZE, 31) float32: [cof sin/cos, chromatic sin/cos,
    quality one-hot(13), pitch-class set(12), is_N/is_END/is_PAD would be
    degenerate rows -> encoded as zeros plus the id-specific flags]."""
    n_q = len(QUALITIES)
    F = 4 + n_q + 12 + 2
    out = np.zeros((C.CHORD_SIZE, F), np.float32)
    for cid in range(C.CHORD_SIZE):
        if cid in (C.CHORD_END, C.CHORD_PAD):
            out[cid, -1] = 1.0 if cid == C.CHORD_PAD else -1.0
            continue
        sym = chord_symbol(cid)
        if sym == "N":
            out[cid, -2] = 1.0
            continue
        root_txt = sym.split(":")[0]
        quality = sym.split(":")[1] if ":" in sym else "maj"
        from ..core.vocab import ROOTS
        pc = ROOTS.index(root_txt)
        cof = (pc * 7) % 12
        out[cid, 0] = np.sin(2 * np.pi * cof / 12)
        out[cid, 1] = np.cos(2 * np.pi * cof / 12)
        out[cid, 2] = np.sin(2 * np.pi * pc / 12)
        out[cid, 3] = np.cos(2 * np.pi * pc / 12)
        out[cid, 4 + QUALITIES.index(quality)] = 1.0
        # chord tones from the same voicer the renderer uses
        for note in Chord(sym.replace(":", "")).getMIDI("c", 4):
            out[cid, 4 + n_q + (note % 12)] = 1.0
    return out


def deterministic_chord_table(dim: int = 512, seed: int = 0) -> np.ndarray:
    """(CHORD_SIZE, dim) float32 frozen chord embedding: standardized
    music-theory features through a seeded Gaussian projection."""
    feats = chord_feature_matrix().copy()
    mu = feats.mean(axis=0, keepdims=True)
    sd = feats.std(axis=0, keepdims=True)
    feats = (feats - mu) / np.maximum(sd, 1e-6)
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((feats.shape[1], dim)).astype(np.float32)
    table = feats @ proj / np.sqrt(feats.shape[1])
    return table.astype(np.float32)


def corpus_from_labs(lab_texts: Iterable[str]) -> List[List[int]]:
    """Chord ``.lab`` file contents -> sentences of chord ids (one sentence
    per file), the corpus format ChordEmbedding.ipynb trains on."""
    from ..core.vocab import chord_dict

    cd = chord_dict()
    sentences = []
    for text in lab_texts:
        sent = []
        for line in text.splitlines():
            parts = line.strip().split(" ")
            if len(parts) < 2 or not parts[0].isdigit():
                continue
            cid = cd.get(parts[1])
            if cid is not None:
                sent.append(cid)
        if sent:
            sentences.append(sent)
    return sentences


def train_skipgram(sentences: Sequence[Sequence[int]], *, dim: int = 512,
                   vocab_size: int = C.CHORD_SIZE, window: int = 5,
                   negatives: int = 5, lr: float = 0.025, epochs: int = 5,
                   seed: int = 0) -> np.ndarray:
    """Skip-gram with negative sampling (gensim Word2Vec sg=1 objective),
    plain numpy. Returns the (vocab_size, dim) input-vector table; ids that
    never occur keep their random init."""
    rng = np.random.default_rng(seed)
    w_in = (rng.standard_normal((vocab_size, dim)) / np.sqrt(dim)).astype(
        np.float32)
    w_out = np.zeros((vocab_size, dim), np.float32)

    counts = np.zeros(vocab_size, np.float64)
    for sent in sentences:
        for t in sent:
            counts[t] += 1
    probs = counts ** 0.75
    total = probs.sum()
    if total == 0:
        return w_in
    probs = probs / total

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))

    for _ in range(epochs):
        for sent in sentences:
            n = len(sent)
            for i, center in enumerate(sent):
                w = 1 + int(rng.integers(window))
                for j in range(max(0, i - w), min(n, i + w + 1)):
                    if j == i:
                        continue
                    ctx = sent[j]
                    targets = [ctx] + list(
                        rng.choice(vocab_size, negatives, p=probs))
                    labels = [1.0] + [0.0] * negatives
                    v = w_in[center]
                    grad_v = np.zeros_like(v)
                    for t, label in zip(targets, labels):
                        u = w_out[t]
                        g = (sigmoid(v @ u) - label) * lr
                        grad_v += g * u
                        w_out[t] = u - g * v
                    w_in[center] = v - grad_v
    return w_in
