"""ezchord / MIDI-writer / arpeggio tests with hand-derived oracles
(reference semantics: utilities/chord_to_midi.py, video2music.py:476-585)."""

import io

import numpy as np
import pytest

from video2music_tpu.midi import (Chord, MIDIFile, add_chord, chord_offsets,
                                  density_bucket, pitch_to_text,
                                  text_to_pitch, voice)
from video2music_tpu.midi.arpeggio import velocity_from_loudness


# Hand-derived from the reference parser semantics (chord_to_midi.py:199-316)
# for key "c", octave 4. Includes the documented quirks (hdim7 -> dom7,
# dim7 keeps the minor 7th).
EXPECTED = {
    "C": [48, 60, 64, 67],
    "Cmin": [48, 60, 63, 67],
    "Cdim": [48, 60, 63, 66],
    "Caug": [48, 60, 64, 68],
    "C7": [48, 60, 64, 67, 70],
    "Cmaj7": [48, 60, 64, 67, 71],
    "Cmin7": [48, 60, 63, 67, 70],
    "Cdim7": [48, 60, 63, 66, 70],
    "Chdim7": [48, 60, 64, 67, 70],  # parser quirk: falls through to DOM
    "Cmaj6": [48, 60, 64, 67, 69],
    "Cmin6": [48, 60, 63, 67, 69],
    "Csus4": [48, 60, 65, 67, 65],
    "Csus2": [48, 60, 62, 67, 62],
    # note: the reference pitch table is A=9 .. G=19 with C=12, so A sits
    # BELOW C (chord_to_midi.py:45-52)
    "F#min7": [54, 66, 69, 73, 76],
    "A7": [45, 57, 61, 64, 67],
}


@pytest.mark.parametrize("symbol,expected", sorted(EXPECTED.items()))
def test_chord_getmidi(symbol, expected):
    assert Chord(symbol).getMIDI("c", 4) == expected


def test_text_to_pitch():
    assert text_to_pitch("c") == 12
    assert text_to_pitch("f#") == 18
    assert text_to_pitch("bb") == 10
    assert pitch_to_text(60) == "C5"


def test_roman_numeral_chords():
    # ii in C = D; lowercase -> minor
    c = Chord("ii")
    midi = c.getMIDI("c", 4)
    assert midi[1] == 48 + 14  # root D
    assert midi[2] - midi[1] == 3  # minor third


def test_slash_chord_bass():
    midi = Chord("C/g").getMIDI("c", 4)
    assert midi[0] == 48 + 7  # bass G below


def test_voice_reduces_movement():
    chords = [Chord(s).getMIDI("c", 4) for s in ("C", "G7", "Amin", "F")]
    voiced = voice(chords)
    assert voiced[0] == chords[0]  # first chord unchanged

    def movement(seq):
        tot = 0
        for a, b in zip(seq, seq[1:]):
            tot += sum(abs(x - y) for x, y in zip(sorted(a), sorted(b)))
        return tot

    assert movement(voiced) <= movement(chords)


def test_voice_empty_chords_pass_through():
    out = voice([[], [48, 60, 64, 67], []])
    assert out[0] == [] and out[2] == []


def test_midifile_writes_valid_smf():
    m = MIDIFile(1)
    m.addTempo(0, 0, 120)
    m.addNote(0, 0, 60, 0.0, 1.0, 100)
    m.addNote(0, 0, 64, 1.0, 1.0, 200)  # velocity clamps to 127
    buf = io.BytesIO()
    m.writeFile(buf)
    data = buf.getvalue()
    assert data[:4] == b"MThd"
    assert data[14:18] == b"MTrk"
    # tempo meta 120bpm = 500000 usec
    assert bytes([0xFF, 0x51, 0x03]) + (500000).to_bytes(3, "big") in data
    # note-on C4 at velocity 100
    assert bytes([0x90, 60, 100]) in data
    assert bytes([0x90, 64, 127]) in data  # clamped
    assert data.endswith(bytes([0xFF, 0x2F, 0x00]))


def test_add_chord_arpeggio_counts():
    chord = [48, 60, 64, 67, 70]
    for density, n_notes in [(0, 3), (1, 4), (2, 5), (3, 7), (4, 9)]:
        m = MIDIFile(1)
        add_chord(m, chord, 0, density, 0, 0.0, 2.0, 80, 5,
                  arpeggio_chord=True)
        n_on = sum(1 for _, _, p in m._events[0] if p[0] == 0x90)
        assert n_on == n_notes, density


def test_add_chord_block_and_short_chord():
    m = MIDIFile(1)
    add_chord(m, [48, 60, 64, 67], 0, 2, 0, 0.0, 2.0, 80, 5)
    n_on = sum(1 for _, _, p in m._events[0] if p[0] == 0x90)
    assert n_on == 4
    # diminished velocity
    vels = [p[2] for _, _, p in m._events[0] if p[0] == 0x90]
    assert max(vels) <= int(80 * 1.1 * 0.6) + 1
    m2 = MIDIFile(1)
    add_chord(m2, [48, 60, 64], 0, 2, 0, 0.0, 2.0, 80, 5)  # len<4 skipped
    assert not m2._events[0]


def test_chord_offsets():
    assert chord_offsets([5, 5, 5, 2, 2, 5]) == [0, 1, 2, 0, 1, 0]


def test_density_bucket_and_velocity():
    assert density_bucket(5, 5) == 0
    assert density_bucket(5, 0) == 1   # +3 exciting -> 8
    assert density_bucket(10, 1) == 1  # -3 fearful -> 7, just above 6
    assert density_bucket(40, 5) == 4
    # velocity formula: loudness 50 -> max 112 (+ emotion bump)
    assert velocity_from_loudness(50, 5) == 111  # neutral -1
    assert velocity_from_loudness(50, 0) == 114  # exciting +2
    assert velocity_from_loudness(0, 3) == 49
