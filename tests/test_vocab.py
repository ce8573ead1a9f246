"""Vocab tables must match the reference's JSON dictionaries exactly."""

import json
import os

import numpy as np
import pytest

from video2music_tpu.core import constants as C
from video2music_tpu.core import vocab

REF_META = "/root/reference/dataset/vevo_meta"


def test_sizes():
    assert C.CHORD_SIZE == 159
    assert C.CHORD_ROOT_SIZE == 15
    assert C.CHORD_ATTR_SIZE == 16
    assert len(vocab.chord_dict()) == C.CHORD_END == 157
    assert len(vocab.INSTRUMENTS) == C.INSTRUMENT_SIZE == 40


@pytest.mark.skipif(not os.path.isdir(REF_META), reason="reference not mounted")
def test_chord_dict_matches_reference_json():
    with open(os.path.join(REF_META, "chord.json")) as f:
        ref = json.load(f)
    assert vocab.chord_dict() == ref

    with open(os.path.join(REF_META, "chord_root.json")) as f:
        assert vocab.chord_root_dict() == json.load(f)
    with open(os.path.join(REF_META, "chord_attr.json")) as f:
        assert vocab.chord_attr_dict() == json.load(f)
    with open(os.path.join(REF_META, "instrument.json")) as f:
        ref_inst = json.load(f)
    assert {k: i for i, k in enumerate(vocab.INSTRUMENTS)} == ref_inst


def test_root_attr_tables():
    root_tab, attr_tab = vocab.chord_to_root_attr_tables()
    # N -> root N(0), attr maj(1) per the generate path convention
    assert root_tab[0] == 0 and attr_tab[0] == 1
    # C -> root C(1), attr maj(1)
    cid = vocab.chord_dict()["C"]
    assert root_tab[cid] == 1 and attr_tab[cid] == 1
    # B:maj7 -> root B(12), attr maj7(13)
    cid = vocab.chord_dict()["B:maj7"]
    assert root_tab[cid] == 12 and attr_tab[cid] == 13
    # END/PAD map to their own sentinels
    assert root_tab[C.CHORD_END] == C.CHORD_ROOT_END
    assert attr_tab[C.CHORD_PAD] == C.CHORD_ATTR_PAD
    # round-trip every real chord through its symbol
    for cid in range(1, C.CHORD_END):
        sym = vocab.chord_symbol(cid)
        cid2, rid, aid = vocab.parse_chord_ids(sym)
        assert cid2 == cid
        assert rid == root_tab[cid]
        assert aid == attr_tab[cid]


def test_emotion_targets():
    rows = vocab.emotion_chord_targets()
    assert rows.shape == (8, C.CHORD_SIZE)
    # exciting allows maj/sus4/7 for every root
    exciting = rows[0]
    assert exciting[vocab.chord_dict()["C"]] == 1
    assert exciting[vocab.chord_dict()["C:sus4"]] == 1
    assert exciting[vocab.chord_dict()["G:7"]] == 1
    assert exciting[vocab.chord_dict()["C:min"]] == 0
    assert exciting[0] == 0  # N never allowed
    # neutral allows nothing
    assert rows[5].sum() == 0
    # END/PAD one-hots
    assert rows[6][C.CHORD_END] == 1 and rows[6].sum() == 1
    assert rows[7][C.CHORD_PAD] == 1 and rows[7].sum() == 1


def test_key_dic():
    assert vocab.KEY_DIC["C major"] == 0
    assert vocab.KEY_DIC["A minor"] == 0
    assert vocab.KEY_DIC["F major"] == -7
    assert len(vocab.KEY_DIC) == 34
