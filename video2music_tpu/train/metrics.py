"""Evaluation metrics as vectorized jnp — no per-token Python loops.

The reference computes every metric with Python loops over tokens plus JSON
dict lookups loaded per call (reference: ``dataset/vevo_dataset.py:653-963``).
Here each metric is a pure function over whole (B, L) batches so eval runs
inside jit; the chord-quality lookup is a precomputed int32 table.

All semantics reproduce the reference exactly, including its quirks:
  * accuracy/hits@k return 1.0 when every target is PAD;
  * correspondence returns -1.0 when no frame passes the emotion filter;
  * an emitted "N" chord counts as quality "maj" in correspondence
    (the ``len(chord_arr)==1 -> out_quality=1`` branch, vevo_dataset.py:794);
  * the root×attr reconstruction applies a second softmax to the product
    distribution before top-k (vevo_dataset.py:721).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C
from ..core.vocab import chord_to_root_attr_tables


def compute_vevo_accuracy(logits, tgt):
    """Masked top-1 accuracy (reference: vevo_dataset.py:653-673).

    logits: (B, L, CHORD_SIZE); tgt: (B, L) int. Returns scalar f32.
    """
    pred = jnp.argmax(logits, axis=-1)
    mask = (tgt != C.CHORD_PAD).astype(jnp.float32)
    right = (pred == tgt).astype(jnp.float32) * mask
    denom = jnp.sum(mask)
    return jnp.where(denom == 0, 1.0, jnp.sum(right) / jnp.maximum(denom, 1.0))


def compute_hits_k(logits, tgt, k: int):
    """Hits@k: top-k containment over non-PAD targets
    (reference: vevo_dataset.py:675-701)."""
    _, topk = jax.lax.top_k(logits, k)  # (B, L, k)
    mask = (tgt != C.CHORD_PAD).astype(jnp.float32)
    hit = jnp.any(topk == tgt[..., None], axis=-1).astype(jnp.float32) * mask
    denom = jnp.sum(mask)
    return jnp.where(denom == 0, 1.0, jnp.sum(hit) / jnp.maximum(denom, 1.0))


def root_attr_to_chord_logits(logits_root, logits_attr):
    """Reconstruct a 159-way distribution from root (15) and attr (16) heads.

    chord i>0,<157 -> root 1+(i-1)//13, attr 1+(i-1)%13; 0 -> (0,0);
    END -> (13,14); PAD -> (14,15) (reference: vevo_dataset.py:708-721).
    Returns *probabilities* renormalized by a second softmax over products,
    reproducing the reference's double-softmax.
    """
    p_root = jax.nn.softmax(logits_root.astype(jnp.float32), axis=-1)
    p_attr = jax.nn.softmax(logits_attr.astype(jnp.float32), axis=-1)
    ids = np.arange(C.CHORD_SIZE)
    root_idx = np.where(ids == 0, 0, np.where(
        ids == C.CHORD_END, C.CHORD_ROOT_END, np.where(
            ids == C.CHORD_PAD, C.CHORD_ROOT_PAD, (ids - 1) // 13 + 1)))
    attr_idx = np.where(ids == 0, 0, np.where(
        ids == C.CHORD_END, C.CHORD_ATTR_END, np.where(
            ids == C.CHORD_PAD, C.CHORD_ATTR_PAD, (ids - 1) % 13 + 1)))
    prod = p_root[..., jnp.asarray(root_idx)] * p_attr[..., jnp.asarray(attr_idx)]
    return jax.nn.softmax(prod, axis=-1)


def compute_vevo_accuracy_root_attr(logits_root, logits_attr, tgt):
    probs = root_attr_to_chord_logits(logits_root, logits_attr)
    return compute_vevo_accuracy(jnp.log(probs + 1e-20), tgt)


def compute_hits_k_root_attr(logits_root, logits_attr, tgt, k: int):
    probs = root_attr_to_chord_logits(logits_root, logits_attr)
    return compute_hits_k(jnp.log(probs + 1e-20), tgt, k)


def _chord_quality_table():
    """chord id -> quality id in 0..13 ("N" -> 1 = maj, matching the
    reference's single-part-symbol branch, vevo_dataset.py:790-794)."""
    _, attr_tab = chord_to_root_attr_tables()
    return jnp.asarray(attr_tab)


def compute_vevo_correspondence(logits, tgt, tgt_emotion, tgt_emotion_prob,
                                emotion_threshold: float = C.EMOTION_THRESHOLD):
    """Fraction of emitted chords whose quality the frame's dominant emotion
    allows (reference: vevo_dataset.py:747-810).

    logits: (B, L, CHORD_SIZE) or already-argmaxed (B, L) int predictions;
    tgt_emotion: (B, L, CHORD_SIZE) allowed-chord map rows;
    tgt_emotion_prob: (B, L) dominant-emotion probability.
    Returns scalar; -1.0 when no frame passes the filter.
    """
    if logits.ndim >= 3:
        pred = jnp.argmax(logits, axis=-1)
    else:
        pred = logits
    quality = _chord_quality_table()[jnp.clip(pred, 0, C.CHORD_SIZE - 1)]

    is_pad_row = tgt_emotion[..., -1] == 1
    all_zero = jnp.all(tgt_emotion[..., 0:14] == 0, axis=-1)
    passes = jnp.logical_not(is_pad_row) & jnp.logical_not(all_zero) & (
        tgt_emotion_prob >= emotion_threshold)

    emittable = (pred != C.CHORD_END) & (pred != C.CHORD_PAD)
    allowed = jnp.take_along_axis(
        tgt_emotion[..., 0:14], quality[..., None], axis=-1)[..., 0] == 1
    right = (passes & emittable & allowed).astype(jnp.float32)

    pt = jnp.sum(passes.astype(jnp.float32))
    return jnp.where(pt == 0, -1.0, jnp.sum(right) / jnp.maximum(pt, 1.0))


def compute_vevo_correspondence_root_attr(logits_root, logits_attr, tgt,
                                          tgt_emotion, tgt_emotion_prob,
                                          emotion_threshold=C.EMOTION_THRESHOLD):
    probs = root_attr_to_chord_logits(logits_root, logits_attr)
    return compute_vevo_correspondence(jnp.log(probs + 1e-20), tgt,
                                       tgt_emotion, tgt_emotion_prob,
                                       emotion_threshold)


def regression_eval(pred_ln_nd, note_density, loudness, inst_probs,
                    instrument):
    """RMSE per head + instrument BCE sums for the regression model
    (reference: run_model_regression.py:70-125). Returns per-batch sums and
    counts so an epoch loop can aggregate exactly."""
    nd_pred = pred_ln_nd[..., 0]
    ln_pred = pred_ln_nd[..., 1]
    se_nd = jnp.sum((nd_pred - note_density) ** 2)
    se_ln = jnp.sum((ln_pred - loudness) ** 2)
    n = jnp.asarray(np.prod(note_density.shape), jnp.float32)
    eps = 1e-7
    p = jnp.clip(inst_probs.astype(jnp.float32), eps, 1 - eps)
    bce = -jnp.mean(instrument * jnp.log(p) + (1 - instrument) * jnp.log1p(-p))
    return {"se_note_density": se_nd, "se_loudness": se_ln, "count": n,
            "bce_instrument": bce}
