"""Vectorized metric parity vs token-loop oracles that transcribe the
reference's semantics (reference: dataset/vevo_dataset.py:653-963)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video2music_tpu.core import constants as C
from video2music_tpu.core.vocab import (chord_attr_dict, chord_inv_dict,
                                        chord_to_root_attr_tables)
from video2music_tpu.train import metrics as M


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def oracle_accuracy(logits, tgt):
    out = np.argmax(_softmax(logits), axis=-1).flatten()
    tgt = tgt.flatten()
    mask = tgt != C.CHORD_PAD
    out, tgt = out[mask], tgt[mask]
    if len(tgt) == 0:
        return 1.0
    return float((out == tgt).sum() / len(tgt))


def oracle_hits_k(logits, tgt, k):
    probs = _softmax(logits).reshape(-1, logits.shape[-1])
    tgt = tgt.flatten()
    topk = np.argsort(-probs, axis=-1)[:, :k]
    num_right = pt = 0
    for i in range(len(tgt)):
        if tgt[i] == C.CHORD_PAD:
            continue
        pt += 1
        if tgt[i] in topk[i]:
            num_right += 1
    return float(num_right / pt) if pt else 1.0


def oracle_correspondence(logits, tgt, tgt_emotion, tgt_emotion_prob, thr):
    """Direct transcription of compute_vevo_correspondence
    (reference: vevo_dataset.py:747-810) using the in-repo vocab dicts."""
    inv = chord_inv_dict()
    attr_dic = chord_attr_dict()
    out = np.argmax(_softmax(logits), axis=-1).flatten()
    te = tgt_emotion.reshape(-1, tgt_emotion.shape[-1])
    tp = tgt_emotion_prob.flatten()
    quality = te[:, 0:14]
    num_right = pt = 0
    for i, o in enumerate(out):
        if te[i][-1] == 1 or np.all(quality[i] == 0) or tp[i] < thr:
            continue
        pt += 1
        if o not in (C.CHORD_END, C.CHORD_PAD):
            sym = inv[int(o)]
            parts = sym.split(":")
            q = 1 if len(parts) == 1 else attr_dic[parts[1]]
            if quality[i][q] == 1:
                num_right += 1
    if pt == 0:
        return -1.0
    return float(num_right / pt)


@pytest.fixture
def batch(rng):
    B, L = 2, 17
    logits = rng.standard_normal((B, L, C.CHORD_SIZE)).astype(np.float32)
    tgt = rng.integers(0, C.CHORD_END, (B, L))
    tgt[0, -3:] = C.CHORD_PAD  # some PAD positions
    return logits, tgt


def test_accuracy_matches_oracle(batch):
    logits, tgt = batch
    got = float(M.compute_vevo_accuracy(jnp.asarray(logits), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, oracle_accuracy(logits, tgt), rtol=1e-6)


def test_accuracy_all_pad_returns_one():
    logits = np.zeros((1, 4, C.CHORD_SIZE), np.float32)
    tgt = np.full((1, 4), C.CHORD_PAD)
    assert float(M.compute_vevo_accuracy(jnp.asarray(logits),
                                         jnp.asarray(tgt))) == 1.0


@pytest.mark.parametrize("k", [1, 3, 5])
def test_hits_k_matches_oracle(batch, k):
    logits, tgt = batch
    got = float(M.compute_hits_k(jnp.asarray(logits), jnp.asarray(tgt), k))
    np.testing.assert_allclose(got, oracle_hits_k(logits, tgt, k), rtol=1e-6)


def test_correspondence_matches_oracle(rng):
    B, L = 2, 23
    logits = rng.standard_normal((B, L, C.CHORD_SIZE)).astype(np.float32)
    tgt = rng.integers(0, C.CHORD_END, (B, L))
    # build emotion rows: random emotion ids incl. neutral(5) and PAD rows
    from video2music_tpu.core.vocab import emotion_chord_targets
    rows = emotion_chord_targets()
    eid = rng.integers(0, 8, (B, L))
    tgt_emotion = rows[eid]
    prob = rng.uniform(0.5, 1.0, (B, L)).astype(np.float32)
    got = float(M.compute_vevo_correspondence(
        jnp.asarray(logits), jnp.asarray(tgt), jnp.asarray(tgt_emotion),
        jnp.asarray(prob), C.EMOTION_THRESHOLD))
    want = oracle_correspondence(logits, tgt, tgt_emotion, prob,
                                 C.EMOTION_THRESHOLD)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_correspondence_no_valid_frames_returns_minus_one():
    from video2music_tpu.core.vocab import emotion_chord_targets
    rows = emotion_chord_targets()
    B, L = 1, 5
    logits = np.zeros((B, L, C.CHORD_SIZE), np.float32)
    tgt = np.zeros((B, L), np.int64)
    tgt_emotion = np.tile(rows[7], (B, L, 1))  # all PAD rows
    prob = np.ones((B, L), np.float32)
    got = float(M.compute_vevo_correspondence(
        jnp.asarray(logits), jnp.asarray(tgt), jnp.asarray(tgt_emotion),
        jnp.asarray(prob)))
    assert got == -1.0


def test_root_attr_reconstruction_layout(rng):
    """Product reconstruction must place mass exactly where the reference's
    index arithmetic does (vevo_dataset.py:708-721)."""
    B, L = 1, 3
    lr_ = rng.standard_normal((B, L, C.CHORD_ROOT_SIZE)).astype(np.float32)
    la_ = rng.standard_normal((B, L, C.CHORD_ATTR_SIZE)).astype(np.float32)
    probs = np.asarray(M.root_attr_to_chord_logits(jnp.asarray(lr_),
                                                   jnp.asarray(la_)))
    p_root = _softmax(lr_)
    p_attr = _softmax(la_)
    want = np.zeros((B, L, C.CHORD_SIZE), np.float32)
    for i in range(C.CHORD_SIZE):
        if i == 0:
            want[..., i] = p_root[..., 0] * p_attr[..., 0]
        elif i == C.CHORD_END:
            want[..., i] = p_root[..., 13] * p_attr[..., 14]
        elif i == C.CHORD_PAD:
            want[..., i] = p_root[..., 14] * p_attr[..., 15]
        else:
            want[..., i] = (p_root[..., (i - 1) // 13 + 1]
                            * p_attr[..., (i - 1) % 13 + 1])
    want = _softmax(want)
    np.testing.assert_allclose(probs, want, rtol=1e-5, atol=1e-7)


def test_quality_table_n_maps_to_maj():
    _, attr_tab = chord_to_root_attr_tables()
    assert attr_tab[0] == 1  # "N" counts as maj in correspondence
