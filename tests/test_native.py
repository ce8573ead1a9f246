"""Native C++ parser parity vs the pure-Python parsers, + prefetch loader."""

import os

import numpy as np
import pytest

from video2music_tpu.core import constants as C
from video2music_tpu.data import native as N
from video2music_tpu.data import parsers as P
from video2music_tpu.data.loader import PrefetchLoader

pytestmark = pytest.mark.skipif(not N.available(),
                                reason="native toolchain unavailable")

CHORD_LAB = "key C major\n0 C\n1 A:min\n2 F\n3 G:7\n4 N\n"
SCALAR_LAB = "0 0.5\n1 0.25\n2 1.0\n"
EMOTION_LAB = ("time a b c d e f\n"
               "0 0.7 0.1 0.05 0.05 0.05 0.05\n"
               "1 0.1 0.1 0.1 0.6 0.05 0.05\n")
INSTR_CSV = "\n".join(["h," * 39 + "h"] + [",".join(["1"] + ["0"] * 39)] * 3)


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    return str(p)


def test_chord_lab_parity(tmp_path):
    p = _write(tmp_path, "c.lab", CHORD_LAB)
    chord, root, attr, key, last = N.parse_chord_lab(p, 10)
    pc, pr, pa, pkey, plast = P.parse_chord_lab(p, 10)
    np.testing.assert_array_equal(chord, pc)
    np.testing.assert_array_equal(root, pr)
    np.testing.assert_array_equal(attr, pa)
    assert key == (0 if "major" in pkey else 1)
    assert last == plast


def test_chord_lab_minor_key(tmp_path):
    p = _write(tmp_path, "m.lab", "key A minor\n0 A:min\n")
    *_ , key, last = N.parse_chord_lab(p, 10)
    assert key == 1 and last == 0


def test_scalar_lab_parity(tmp_path):
    p = _write(tmp_path, "s.lab", SCALAR_LAB)
    got = N.parse_scalar_lab(p, 6, pad=0.0, offset=1.0)
    want = P.parse_scalar_lab(p, 6, pad=0.0, offset=1.0)
    np.testing.assert_allclose(got, want)


def test_emotion_lab_parity(tmp_path):
    p = _write(tmp_path, "e.lab", EMOTION_LAB)
    got = N.parse_emotion_lab(p, 5)
    want = P.parse_emotion_lab(p, 5)
    np.testing.assert_allclose(got, want)


def test_instrument_csv_parity(tmp_path):
    p = _write(tmp_path, "i.csv", INSTR_CSV)
    got = N.parse_instrument_csv(p, 5)
    want = P.parse_instrument_csv(p, 5)
    np.testing.assert_allclose(got, want)


def test_truncation(tmp_path):
    p = _write(tmp_path, "t.lab", "0 C\n1 F\n2 G\n3 C\n")
    chord, *_ , last = N.parse_chord_lab(p, 2)
    assert chord.shape == (2,)
    assert last == 1


def test_missing_file_returns_none():
    assert N.parse_scalar_lab("/nonexistent/x.lab", 5) is None


class _SyntheticDS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {"x": rng.standard_normal(4).astype(np.float32),
                "idx": np.asarray([i])}


def test_prefetch_loader_covers_dataset():
    ds = _SyntheticDS(10)
    loader = PrefetchLoader(ds, 4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    seen = sorted(int(i) for b in batches for i in b["idx"].ravel())
    assert seen == list(range(10))
    # second epoch reshuffles
    batches2 = list(loader)
    assert len(batches2) == 3


def test_device_prefetch_preserves_order_and_content():
    """device_prefetch must yield every batch once, in order, with the
    values intact (staged through jax.device_put by default)."""
    from video2music_tpu.data.loader import device_prefetch

    batches = [{"x": np.full((2,), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches)))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]),
                                      np.full((2,), i, np.float32))
    # custom put callables are honored (mesh shard_batch stand-in)
    calls = []
    def put(b):
        calls.append(1)
        return b
    assert len(list(device_prefetch(iter(batches), put))) == 5
    assert len(calls) == 5
    # empty iterators terminate cleanly
    assert list(device_prefetch(iter([]))) == []


def test_chord_lab_no_key_header_defaults_minor(tmp_path):
    """No 'key' header -> minor (1), matching the Python 'major' in ''
    test (dataset.py) on both parser paths."""
    p = _write(tmp_path, "nokey.lab", "0 C\n1 F\n")
    *_, key, _ = N.parse_chord_lab(p, 10)
    assert key == 1


def test_emotion_lab_short_row_stays_line_bounded(tmp_path):
    """A row with fewer than n_emotions values (e.g. a 5-class file read as
    6-class) must leave missing columns at the PAD prefill instead of
    consuming the next line's timestamp as a probability."""
    p = _write(tmp_path, "short.lab",
               "time a b c d e f\n"
               "0 0.7 0.1 0.05 0.05 0.05\n"     # 5 values, not 6
               "1 0.1 0.2 0.3 0.2 0.1 0.1\n")
    got = N.parse_emotion_lab(p, 3, n_emotions=6)
    # row 0: five parsed values + PAD in the missing sixth column
    np.testing.assert_allclose(got[0, :5], [0.7, 0.1, 0.05, 0.05, 0.05])
    assert got[0, 5] == C.EMOTION_PAD
    # row 1 must be intact (its timestamp was NOT eaten by row 0)
    np.testing.assert_allclose(got[1], [0.1, 0.2, 0.3, 0.2, 0.1, 0.1])


def _python_render(midi_chords, offsets, densities, velocities, emotion_idx,
                   inst_bin, correct_panning):
    """The exact Python render loop from pipeline/api._postprocess — the
    byte-identity oracle for the native renderer."""
    import io

    from video2music_tpu.midi import MIDIFile, add_chord
    from video2music_tpu.pipeline.api import (ARPEGGIO_INSTRUMENTS,
                                              BASE_TEMPO,
                                              CHORD_DURATION_BEATS,
                                              CENTER_PAN, LEFT_PAN,
                                              LOW_VELOCITY_INSTRUMENTS,
                                              PAN_VALS)

    generated = MIDIFile(1)
    generated.addTempo(0, 0, BASE_TEMPO)
    track_files = {}
    for i, chord in enumerate(midi_chords):
        add_chord(generated, chord, offsets[i], densities[i], 0,
                  i * CHORD_DURATION_BEATS, CHORD_DURATION_BEATS,
                  velocities[i], int(emotion_idx[i]), arpeggio_chord=True)
        for inst_id in np.nonzero(inst_bin[i])[0]:
            inst_id = int(inst_id)
            if inst_id not in track_files:
                mf = MIDIFile(1)
                mf.addTempo(0, 0, BASE_TEMPO)
                pan = (PAN_VALS["left"] if inst_id in LEFT_PAN else
                       PAN_VALS["center"] if inst_id in CENTER_PAN else
                       PAN_VALS["right"])
                if correct_panning:
                    mf.addControllerEvent(0, 0, 0, 10, pan)
                else:
                    mf.addControllerEvent(0, 0, 0, pan, 0)
                track_files[inst_id] = mf
            arp = (inst_id in ARPEGGIO_INSTRUMENTS
                   or int(emotion_idx[i]) in (0, 1, 2))
            vel = velocities[i] * (
                1.15 if inst_id in LOW_VELOCITY_INSTRUMENTS else 1.0)
            add_chord(track_files[inst_id], chord, offsets[i], densities[i],
                      0, i * CHORD_DURATION_BEATS, CHORD_DURATION_BEATS,
                      vel, int(emotion_idx[i]), arpeggio_chord=arp)
    buf = io.BytesIO()
    generated.writeFile(buf)
    stems = {}
    for inst_id, mf in track_files.items():
        b = io.BytesIO()
        mf.writeFile(b)
        stems[inst_id] = b.getvalue()
    return buf.getvalue(), stems


@pytest.mark.parametrize("correct_panning", [False, True])
def test_native_render_clip_byte_identical(correct_panning):
    """v2m_render_clip must emit byte-identical SMF files (main + every
    instrument stem) to the Python midi/arpeggio + midi/writer loop —
    covering all densities, run offsets, 4/5-note and skipped (<4) chords,
    both pan quirk modes, emotion-forced arpeggios, and the low-velocity
    1.15 factor."""
    if not N.available():
        pytest.skip("native toolchain unavailable")
    from video2music_tpu.pipeline.api import _INST_POLICY

    rng = np.random.default_rng(7)
    n_sec, n_inst = 60, 40
    # voiced chords: lengths 0 (skip), 3 (skip), 4, 5, and 6/7 — >5-note
    # chords exercise the eff_len mapping where the fifth plays ONLY when
    # len(chord) == 5 exactly (arpeggio.add_chord's len check), truncated
    # to the first five notes
    midi_chords = []
    for i in range(n_sec):
        n = rng.choice([0, 3, 4, 5, 5, 4, 6, 7])
        midi_chords.append(list(rng.integers(-3, 131, n)))  # incl. clamps
    offsets = rng.integers(0, 7, n_sec)
    densities = rng.integers(0, 5, n_sec)
    velocities = rng.integers(-5, 130, n_sec)  # incl. clamp edges
    emotion_idx = rng.integers(0, 6, n_sec)
    inst_bin = (rng.uniform(size=(n_sec, n_inst)) < 0.25)

    want_main, want_stems = _python_render(
        midi_chords, list(offsets), list(densities), list(velocities),
        emotion_idx, inst_bin, correct_panning)
    got = N.render_clip(
        midi_chords, offsets, densities, velocities,
        np.isin(emotion_idx, (0, 1, 2)), inst_bin,
        arp_inst=_INST_POLICY["arp"], vel_factor=_INST_POLICY["vel"],
        pan_ctrl=(_INST_POLICY["pan_ctrl_correct"] if correct_panning
                  else _INST_POLICY["pan_ctrl_quirk"]),
        pan_param=(_INST_POLICY["pan_param_correct"] if correct_panning
                   else _INST_POLICY["pan_param_quirk"]),
        chord_dur=2, tempo=120)
    assert got is not None
    got_main, got_stems = got
    assert got_main == want_main
    assert set(got_stems) == set(want_stems)
    for inst_id in want_stems:
        assert got_stems[inst_id] == want_stems[inst_id], inst_id
