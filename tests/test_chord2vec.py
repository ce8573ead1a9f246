"""Chord embedding tables (features/chord2vec.py)."""

import numpy as np

from video2music_tpu.core import constants as C
from video2music_tpu.core.vocab import chord_dict
from video2music_tpu.features.chord2vec import (chord_feature_matrix,
                                                corpus_from_labs,
                                                deterministic_chord_table,
                                                train_skipgram)


def _cos(a, b):
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def test_table_shape_and_determinism():
    t1 = deterministic_chord_table(64)
    t2 = deterministic_chord_table(64)
    np.testing.assert_array_equal(t1, t2)
    assert t1.shape == (C.CHORD_SIZE, 64)
    assert np.isfinite(t1).all()
    # distinct chords get distinct vectors
    assert np.linalg.matrix_rank(t1[:20]) > 10


def test_table_is_musically_structured():
    cd = chord_dict()
    t = deterministic_chord_table(128)
    c = t[cd["C"]]
    # C major shares two tones + a fifth-related root with G major, none
    # with F# major — theory features must order the similarities
    assert _cos(c, t[cd["G"]]) > _cos(c, t[cd["F#"]])
    # same root, different quality: closer than an unrelated chord
    assert _cos(c, t[cd["C:maj7"]]) > _cos(c, t[cd["F#:dim"]])


def test_feature_matrix_tones():
    cd = chord_dict()
    f = chord_feature_matrix()
    n_q = 13
    tones = f[cd["C"], 4 + n_q:4 + n_q + 12]
    # C major triad: C, E, G (pitch classes 0, 4, 7)
    for pc in (0, 4, 7):
        assert tones[pc] == 1.0, tones
    assert tones[1] == 0.0


def test_corpus_from_labs_and_skipgram():
    lab = "key C major\n0 C\n1 G\n2 A:min\n3 F\n"
    sents = corpus_from_labs([lab, lab, lab])
    cd = chord_dict()
    assert sents[0] == [cd["C"], cd["G"], cd["A:min"], cd["F"]]
    table = train_skipgram(sents * 20, dim=16, window=2, negatives=3,
                           epochs=3, seed=0)
    assert table.shape == (C.CHORD_SIZE, 16)
    # co-occurring chords move together: C is closer to G (same corpus
    # context) than to an id that never occurs
    c, g = table[cd["C"]], table[cd["G"]]
    other = table[cd["D#:hdim7"]]
    assert _cos(c, g) > _cos(c, other)


def test_chord_embed_model_uses_table():
    import jax
    import jax.numpy as jnp

    from video2music_tpu.core.config import amt_config
    from video2music_tpu.models import VideoMusicTransformer

    cfg = amt_config("1.1", n_layers=1, num_heads=2, d_model=16, d_ff=32,
                     max_seq_video=10, max_seq_chord=10,
                     total_vf_dim=7 + 1 + 1 + 2, dropout=0.0,
                     chord_embed=True, chord_embed_dim=16)
    model = VideoMusicTransformer(cfg=cfg)
    B, L = 1, 10
    z = jnp.zeros((B, L - 1), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, z, z, z,
        jnp.zeros((B, L, 7)), jnp.ones((B, 1)), jnp.zeros((B, L)),
        jnp.zeros((B, L)), jnp.zeros((B, L, 2)))
    emb = np.asarray(variables["params"]["chord_embedding"]["embedding"])
    np.testing.assert_allclose(emb, deterministic_chord_table(16), rtol=1e-6)
