"""Dataset pipeline tests on synthetic feature-file fixtures mirroring the
reference formats (reference: dataset/vevo_dataset.py:241-554)."""

import os

import numpy as np
import pytest

from video2music_tpu.core import constants as C
from video2music_tpu.core.vocab import emotion_chord_targets
from video2music_tpu.data import (VevoDataset, batches, make_sample,
                                  mixup_samples, parse_chord_lab,
                                  parse_emotion_lab, parse_instrument_csv,
                                  parse_scalar_lab)

CHORD_LAB = [
    "key C major",
    "0 C",
    "1 A:min",
    "2 F",
    "3 G:7",
    "4 N",
]
CHORD_LAB_NO_NORM = ["key D major", "0 D"]
EMOTION_LAB = [
    "time exciting fearful tense sad relaxing neutral",
    "0 0.7 0.1 0.05 0.05 0.05 0.05",
    "1 0.1 0.1 0.1 0.6 0.05 0.05",
    "2 0.2 0.2 0.2 0.2 0.1 0.1",
]
SCENE_LAB = ["0 0", "1 0", "2 1"]
SCALAR_LAB = ["0 0.5", "1 0.25", "2 1.0"]
INSTR_CSV = (["piano," + ",".join(f"c{i}" for i in range(39))]
             + [",".join(["1"] + ["0"] * 39)] * 3)


def test_parse_chord_lab():
    chord, root, attr, key, last = parse_chord_lab(CHORD_LAB, 10)
    assert key == "C major"
    assert last == 4
    # "C" = id 1 (root C=1, attr maj=1)
    assert chord[0] == 1 and root[0] == 1 and attr[0] == 1
    # "A:min" root A=10, attr min=5
    assert root[1] == 10 and attr[1] == 5
    # "N" -> (0, 0, 0)
    assert chord[4] == 0 and root[4] == 0 and attr[4] == 0
    assert chord[5] == C.CHORD_PAD and root[5] == C.CHORD_ROOT_PAD


def test_parse_chord_lab_truncates():
    chord, *_ , last = parse_chord_lab(CHORD_LAB, 3)
    assert chord.shape == (3,)
    assert last == 2


def test_parse_scalar_and_scene_offset():
    v = parse_scalar_lab(SCALAR_LAB, 5)
    np.testing.assert_allclose(v[:3], [0.5, 0.25, 1.0])
    assert v[3] == 0.0
    s = parse_scalar_lab(SCENE_LAB, 5, offset=1.0)
    np.testing.assert_allclose(s[:3], [1.0, 1.0, 2.0])  # sceneID + 1


def test_parse_emotion_lab_skips_header():
    e = parse_emotion_lab(EMOTION_LAB, 5)
    assert e.shape == (5, 6)
    np.testing.assert_allclose(e[0, 0], 0.7)
    np.testing.assert_allclose(e[3], 0.0)


def test_parse_instrument_csv_skips_header():
    m = parse_instrument_csv(INSTR_CSV, 5)
    assert m.shape == (5, 40)
    assert m[0, 0] == 1.0 and m[0, 1] == 0.0
    assert m[3].sum() == 0.0


@pytest.fixture
def sample():
    sem = np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32)
    return make_sample(
        chord_lab=CHORD_LAB, chord_lab_no_norm=CHORD_LAB_NO_NORM,
        emotion_lab=EMOTION_LAB, motion_src=SCALAR_LAB,
        scene_offset_lab=SCENE_LAB, loudness_lab=SCALAR_LAB,
        note_density_lab=SCALAR_LAB, instrument_csv=INSTR_CSV,
        semantic_npy=sem, max_seq_chord=10, max_seq_video=10)


def test_make_sample_shapes_and_shift(sample):
    assert sample["x"].shape == (9,)
    assert sample["tgt"].shape == (9,)
    # x = chord[:-1], tgt = chord[1:]
    np.testing.assert_array_equal(sample["x"][:4], sample["chord"][:4])
    np.testing.assert_array_equal(sample["tgt"][:3], sample["chord"][1:4])
    # END inserted at tgt[last_time]
    assert sample["tgt"][4] == C.CHORD_END
    assert sample["tgt_root"][4] == C.CHORD_ROOT_END
    assert sample["tgt_attr"][4] == C.CHORD_ATTR_END
    # key: "C major" -> 0; key_val from no-norm "D major" -> +2
    assert sample["key"][0] == 0.0
    assert sample["key_val"][0] == 2.0


def test_make_sample_emotion_map(sample):
    rows = emotion_chord_targets()
    # position 0: chord C present, dominant emotion 0 (exciting)
    np.testing.assert_array_equal(sample["tgt_emotion"][0], rows[3])
    # tgt_emotion is mapped[1:]: position 0 of tgt corresponds to time 1
    # where dominant emotion is sad (3)
    # position 5+ (chord PAD): PAD row
    np.testing.assert_array_equal(sample["tgt_emotion"][6], rows[7])
    assert sample["tgt_emotion_prob"].shape == (9,)
    np.testing.assert_allclose(sample["tgt_emotion_prob"][0], 0.6)


def test_mixup_quirk(sample):
    """The reference combines a*l + b*(l-1) — second weight NEGATIVE
    (reference: vevo_dataset.py:200-221)."""
    other = {k: (v.copy() if isinstance(v, np.ndarray) else v)
             for k, v in sample.items()}
    mixed = mixup_samples(sample, other, 0.5)
    np.testing.assert_allclose(mixed["semantic"],
                               sample["semantic"] * 0.5
                               + other["semantic"] * (-0.5))
    # "key" passes through from a
    np.testing.assert_array_equal(mixed["key"], sample["key"])


def _write_fixture_tree(root, ids):
    dirs = {
        "chord": os.path.join(root, "vevo_chord", "lab_v2_norm", "origin"),
        "chord_nn": os.path.join(root, "vevo_chord", "lab_v2", "origin"),
        "emotion": os.path.join(root, "vevo_emotion", "6c_l14p", "origin"),
        "motion": os.path.join(root, "vevo_motion", "origin"),
        "scene": os.path.join(root, "vevo_scene_offset", "origin"),
        "loud": os.path.join(root, "vevo_loudness", "origin"),
        "nd": os.path.join(root, "vevo_note_density", "origin"),
        "instr": os.path.join(root, "vevo_instrument", "thresholding"),
        "sem": os.path.join(root, "vevo_semantic", "origin", "2d", "clip_l14p"),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    for split in ("train", "val", "test"):
        sdir = os.path.join(root, "vevo_meta", "split", "v1")
        os.makedirs(sdir, exist_ok=True)
        with open(os.path.join(sdir, split + ".txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
    rng = np.random.default_rng(0)
    for fid in ids:
        for key, lines in [("chord", CHORD_LAB), ("chord_nn",
                                                  CHORD_LAB_NO_NORM),
                           ("emotion", EMOTION_LAB), ("motion", SCALAR_LAB),
                           ("scene", SCENE_LAB), ("loud", SCALAR_LAB),
                           ("nd", SCALAR_LAB)]:
            with open(os.path.join(dirs[key], fid + ".lab"), "w") as f:
                f.write("\n".join(lines) + "\n")
        with open(os.path.join(dirs["instr"], fid + ".csv"), "w") as f:
            f.write("\n".join(INSTR_CSV) + "\n")
        np.save(os.path.join(dirs["sem"], fid + ".npy"),
                rng.standard_normal((4, 8)).astype(np.float32))


def test_vevo_dataset_and_batches(tmp_path):
    ids = ["aaa", "bbb", "ccc"]
    _write_fixture_tree(str(tmp_path), ids)
    ds = VevoDataset(dataset_root=str(tmp_path), split="train",
                     max_seq_chord=10, max_seq_video=10, augmentation=True)
    assert len(ds) == 3 + 6  # 2x mixup pairs
    s = ds[0]
    assert s["x"].shape == (9,)
    assert ds.ids == ids
    batch = next(batches(ds, 4, shuffle=True, seed=1))
    assert batch["x"].shape == (4, 9)
    assert batch["semantic"].shape == (4, 10, 8)
    assert batch["instrument"].shape == (4, 10, 40)


def test_end_insertion_skipped_when_lab_reaches_last_slot():
    """A chord lab whose last line is second max_seq-1 must not crash or
    insert END out of range (reference dead-path IndexError fixed)."""
    lab = ["key C major"] + [f"{t} C" for t in range(10)]
    sem = np.zeros((10, 4), np.float32)
    s = make_sample(
        chord_lab=lab, chord_lab_no_norm=["key C major"],
        emotion_lab=EMOTION_LAB, motion_src=SCALAR_LAB,
        scene_offset_lab=SCENE_LAB, loudness_lab=SCALAR_LAB,
        note_density_lab=SCALAR_LAB, instrument_csv=INSTR_CSV,
        semantic_npy=sem, max_seq_chord=10, max_seq_video=10)
    assert s["tgt"].shape == (9,)
    assert (s["tgt"] != C.CHORD_END).all()  # no room for END


def test_dataset_cache_is_bounded(tmp_path):
    """The lazy sample cache is a bounded LRU — a tiny capacity must evict
    rather than grow, while repeated access to one index stays cached."""
    ids = ["aaa", "bbb", "ccc", "ddd"]
    _write_fixture_tree(str(tmp_path), ids)
    ds = VevoDataset(str(tmp_path), split="train", max_seq_chord=10,
                     max_seq_video=10, cache_size=2)
    n = len(ds)
    assert n >= 3
    for i in range(n):
        ds[i]
    assert len(ds._cache) <= 2
    # LRU order: most recently used survive
    a = ds[0]
    b = ds[1]
    assert 0 in ds._cache and 1 in ds._cache
    ds[0]
    ds[2]  # evicts 1 (least recently used), not 0
    assert 0 in ds._cache and 2 in ds._cache and 1 not in ds._cache
    np.testing.assert_array_equal(ds[0]["x"], a["x"])
