"""Chord embedding tables (features/chord2vec.py)."""

import io
import pickle

import numpy as np
import pytest

from video2music_tpu.core import constants as C
from video2music_tpu.core.vocab import chord_dict
from video2music_tpu.features.chord2vec import (align_chord_table,
                                                chord_feature_matrix,
                                                corpus_from_labs,
                                                deterministic_chord_table,
                                                load_gensim_word2vec,
                                                train_skipgram,
                                                word2vec_chord_table)


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


class _FakeKV:
    """Pickles under gensim's module path (below) to produce a synthetic
    Word2Vec.save()-format file for the restricted loader."""

    def __init__(self, vectors, keys):
        self.vectors = vectors
        self.index_to_key = keys


class _FakeW2V:
    def __init__(self, wv):
        self.wv = wv


def _gensim_style_bytes(vectors, keys):
    """Pickle the fakes under gensim.* names, exactly the layout
    ``Word2Vec.save()`` writes when arrays stay inline (< sep_limit).
    Fake gensim modules are registered in sys.modules so the stock
    pickler accepts the classes, then removed."""
    import sys
    import types

    _FakeKV.__module__ = "gensim.models.keyedvectors"
    _FakeKV.__qualname__ = _FakeKV.__name__ = "KeyedVectors"
    _FakeW2V.__module__ = "gensim.models.word2vec"
    _FakeW2V.__qualname__ = _FakeW2V.__name__ = "Word2Vec"
    mods = {}
    for name in ("gensim", "gensim.models", "gensim.models.keyedvectors",
                 "gensim.models.word2vec"):
        mods[name] = types.ModuleType(name)
        sys.modules.setdefault(name, mods[name])
    sys.modules["gensim.models.keyedvectors"].KeyedVectors = _FakeKV
    sys.modules["gensim.models.word2vec"].Word2Vec = _FakeW2V
    try:
        buf = io.BytesIO()
        pickle.Pickler(buf, protocol=2).dump(
            _FakeW2V(_FakeKV(vectors, keys)))
        return buf.getvalue()
    finally:
        for name, mod in mods.items():
            if sys.modules.get(name) is mod:
                del sys.modules[name]


def test_load_gensim_word2vec_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((5, 8)).astype(np.float32)
    keys = ["C", "G", "A:min", "X", "F:7"]
    path = tmp_path / "w2v.bin"
    path.write_bytes(_gensim_style_bytes(vectors, keys))
    got_v, got_k = load_gensim_word2vec(str(path))
    np.testing.assert_array_equal(got_v, vectors)
    assert got_k == keys


def test_loader_refuses_malicious_pickle(tmp_path):
    # anything outside numpy/gensim/stdlib-whitelist must raise, not run
    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    path = tmp_path / "evil.bin"
    path.write_bytes(pickle.dumps(Evil()))
    with pytest.raises(pickle.UnpicklingError):
        load_gensim_word2vec(str(path))


def test_align_chord_table_modes():
    cd = chord_dict()
    vectors = np.arange(12, dtype=np.float32).reshape(3, 4)
    keys = ["G", "C", "not-a-chord"]
    pos = align_chord_table(vectors, keys, positional=True)
    assert pos.shape == (C.CHORD_SIZE, 4)
    np.testing.assert_array_equal(pos[:3], vectors)  # reference quirk
    assert np.abs(pos[3:]).sum() == 0
    keyed = align_chord_table(vectors, keys, positional=False)
    np.testing.assert_array_equal(keyed[cd["G"]], vectors[0])
    np.testing.assert_array_equal(keyed[cd["C"]], vectors[1])
    # unmatched key contributes nothing; END/PAD rows stay zero
    assert np.abs(keyed[C.CHORD_END]).sum() == 0
    assert np.abs(keyed[C.CHORD_PAD]).sum() == 0


def test_shipped_word2vec_asset():
    """The converted reference artifact: 512-d, covers the whole 157-chord
    vocab under key alignment, differs between the two alignments (the
    reference's positional indexing really is misaligned)."""
    pos = word2vec_chord_table(512, positional=True)
    keyed = word2vec_chord_table(512, positional=False)
    assert pos.shape == keyed.shape == (C.CHORD_SIZE, 512)
    nz = (np.abs(keyed).sum(axis=1) > 0)
    assert int(nz.sum()) == 157  # all real chords; END/PAD zero
    assert not np.allclose(pos, keyed)
    with pytest.raises(ValueError):
        word2vec_chord_table(64)


def test_chord_embed_model_uses_trained_table():
    import jax
    import jax.numpy as jnp

    from video2music_tpu.core.config import amt_config
    from video2music_tpu.models import VideoMusicTransformer

    cfg = amt_config("1.1", n_layers=1, num_heads=2, d_model=16, d_ff=32,
                     max_seq_video=6, max_seq_chord=6,
                     total_vf_dim=7 + 1 + 1 + 2, dropout=0.0,
                     chord_embed=True)  # chord_embed_dim stays 512
    model = VideoMusicTransformer(cfg=cfg)
    B, L = 1, 6
    z = jnp.zeros((B, L - 1), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, z, z, z,
        jnp.zeros((B, L, 7)), jnp.ones((B, 1)), jnp.zeros((B, L)),
        jnp.zeros((B, L)), jnp.zeros((B, L, 2)))
    emb = np.asarray(variables["params"]["chord_embedding"]["embedding"])
    np.testing.assert_allclose(emb, word2vec_chord_table(512), rtol=1e-6)


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
