"""MIDI event codec tests (reference: third_party/midi_processor/processor.py)."""

import numpy as np
import pytest

from video2music_tpu.core import constants as C
from video2music_tpu.midi.processor import (START_IDX, decode_midi,
                                            encode_midi)
from video2music_tpu.midi.reader import ControlChange, MidiData, Note


def test_vocab_layout_matches_constants():
    assert START_IDX["note_off"] == C.RANGE_NOTE_ON
    assert START_IDX["time_shift"] == C.RANGE_NOTE_ON + C.RANGE_NOTE_OFF
    assert START_IDX["velocity"] == C.TOKEN_END - C.RANGE_VEL


def _md(notes, ccs=()):
    return MidiData(notes=list(notes), control_changes=list(ccs),
                    ticks_per_quarter=960)


def test_encode_simple_sequence():
    md = _md([Note(0.0, 0.5, 60, 80), Note(1.0, 1.5, 64, 80)])
    events = encode_midi(md)
    # velocity(80//4=20), on 60, shift 0.5s, off 60, shift 0.5s, on 64...
    assert events[0] == START_IDX["velocity"] + 20
    assert events[1] == 60
    assert events[2] == START_IDX["time_shift"] + 49  # 50 ticks of 10ms
    assert events[3] == START_IDX["note_off"] + 60
    assert START_IDX["note_off"] + 64 in events


def test_time_shift_chunks_above_one_second():
    md = _md([Note(0.0, 2.55, 60, 40)])
    events = encode_midi(md)
    shifts = [e - START_IDX["time_shift"] for e in events
              if START_IDX["time_shift"] <= e < START_IDX["velocity"]]
    # 2.55 s = 255 ticks = 99+99 (two full) + 55 -> values 99, 99, 54
    assert shifts == [99, 99, 54]


def test_roundtrip_preserves_notes():
    rng = np.random.default_rng(0)
    notes = []
    t = 0.0
    for _ in range(12):
        t += float(rng.uniform(0.05, 0.4))
        dur = float(rng.uniform(0.1, 0.8))
        notes.append(Note(round(t, 2), round(t + dur, 2),
                          int(rng.integers(40, 90)),
                          int(rng.integers(20, 120))))
    events = encode_midi(_md(notes))
    decoded = decode_midi(events)
    assert len(decoded.notes) == len(notes)
    got = sorted((n.pitch, round(n.start, 2)) for n in decoded.notes)
    want = sorted((n.pitch, round(n.start, 2)) for n in notes)
    for (gp, gs), (wp, ws) in zip(got, want):
        assert gp == wp
        assert abs(gs - ws) <= 0.011  # 10 ms quantization
    # velocity binned to multiples of 4
    for n in decoded.notes:
        assert n.velocity % 4 == 0


def test_sustain_extends_notes():
    notes = [Note(0.0, 0.2, 60, 80), Note(1.0, 1.2, 62, 80)]
    ccs = [ControlChange(0.0, 64, 127), ControlChange(0.5, 64, 0)]
    events = encode_midi(_md(notes, ccs))
    decoded = decode_midi(events)
    n60 = [n for n in decoded.notes if n.pitch == 60][0]
    assert n60.end >= 0.5 - 0.011  # extended to pedal-up


def test_decode_writes_midi_file(tmp_path):
    md = _md([Note(0.0, 0.5, 60, 80)])
    events = encode_midi(md)
    out = tmp_path / "d.mid"
    decode_midi(events, str(out))
    from video2music_tpu.midi.reader import read_midi
    back = read_midi(str(out))
    assert len(back.notes) == 1
    assert back.notes[0].pitch == 60
    np.testing.assert_allclose(back.notes[0].end - back.notes[0].start, 0.5,
                               atol=0.02)
