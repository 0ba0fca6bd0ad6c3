"""Render/behavior parity for the corpus scripts that have no plain
"render Song for N seconds" shape (VERDICT r3 missing #1):

* testprograms.a2s — exports one-shot programs (for the reference's
  rendertest/wavestress); rendered against reference goldens
  produced by tools/golden_dump.c with explicit args.
* midi.a2s / testconstants.a2s — pure definition modules (no
  programs): parity is the exported constant VALUES.
* miditest2.a2s — a MIDI-handler instrument bank.  The reference
  CANNOT load it in any offline config buildable here: megastrings'
  compile-time `wave` rendering needs a2_RenderWave, which the
  reference returns NOTIMPLEMENTED for outside realtime configs
  (reference stream.c:48, render.c; our rebuild intentionally
  supports it offline — PARITY.md known deltas).  So reference
  render-goldens are impossible; verification here is cross-PATH
  exactness inside the rebuild (host record/replay vs device
  superblock mixer) driving the handler with a deterministic
  timestamped MIDI sequence, plus non-silence.
"""

import os

import numpy as np
import pytest

from conftest import DATA_DIR, load_golden, render_song

import audiality2_tpu as a2


@pytest.mark.parametrize("prog,args,golden", [
    ("PlayTestWave2", (0.0, 0.8), "data-testprograms-ptw2-2s-44100"),
    ("PlayTestNote", (0.0, 0.8), "data-testprograms-note-2s-44100"),
    ("PlayBlip", (2.0, 0.7), "data-testprograms-blip-2s-44100"),
])
def test_testprograms_render_parity(prog, args, golden):
    out = render_song(os.path.join(DATA_DIR, "testprograms.a2s"),
                      program=prog, seconds=2.0, args=args)
    gold = load_golden(golden + ".raw")
    m = min(len(out), len(gold))
    assert m >= 2 * 44100 - 4096
    assert (out[:m] == gold[:m]).all(), prog
    assert np.abs(gold).max() > (1 << 20)     # not a silent golden


@pytest.mark.parametrize("prog,golden", [
    ("FSweep", "data-test-fsweep-3s-44100"),
    ("PhattPig", "data-test-phattpig-3s-44100"),
    ("RampTest", "data-test-ramptest-3s-44100"),
])
def test_testa2s_render_parity(prog, golden):
    # test.a2s is the interactive a2test bank (reference
    # test/a2test.c); its programs take (P V) args like keyboard
    # notes, so plain arg-started renders golden-compare fine.
    # (Programs whose audible output crosses pulse1's uninitialized
    # stale sample — reference waves.c:643-647 UB — can't be golden'd
    # across golden_dump rebuilds; these three avoid it.)
    out = render_song(os.path.join(DATA_DIR, "test.a2s"),
                      program=prog, seconds=3.0, args=(0.0, 1.0))
    gold = load_golden(golden + ".raw")
    m = min(len(out), len(gold))
    assert m >= 3 * 44100 - 4096
    assert (out[:m] == gold[:m]).all(), prog
    assert np.abs(gold).max() > (1 << 20)


def test_midi_module_constants():
    # midi.a2s is a definitions module (reference test/data/midi.a2s)
    i = a2.open_engine(44100, 4096, 1, batched=False)
    h = i.load(os.path.join(DATA_DIR, "midi.a2s"))
    want = {"NOTEOFF": 0, "NOTEON": 1, "AFTERTOUCH": 2,
            "CONTROLCHANGE": 3, "PROGRAMCHANGE": 4,
            "CHANNELPRESSURE": 5, "PITCHBEND": 6, "SYSTEM": 7,
            "RPN": 8, "NRPN": 9, "BANK_SELECT": 0, "MODULATION": 1}
    for name, v in want.items():
        ch = i.get(h, name)
        assert i.value_of(ch) == float(v), name


def test_testconstants_values():
    i = a2.open_engine(44100, 4096, 1, batched=False)
    h = i.load(os.path.join(DATA_DIR, "testconstants.a2s"))
    assert i.value_of(i.get(h, "THE_CONSTANT")) == 42.0
    pi = i.value_of(i.get(h, "PI"))
    assert abs(pi - 3.141593) < 2e-5


# (frames, Msg, Ch, Arg1, Arg2) — Msg 1=NOTEON 0=NOTEOFF; channels
# pick instruments per miditest2's handler (0=Bass1, 5=SineBeep,
# 7=SawBeep, 8=SawPluck).  Channels 2-4 (megastrings) are covered by
# compilation, not by this sequence.
MIDI_SEQ = [
    (0, 1, 0, 60, 1.0), (4410, 1, 5, 64, 0.9),
    (8820, 0, 0, 60, 0.5), (13230, 1, 7, 48, 1.0),
    (22050, 0, 7, 48, 0.6), (30870, 1, 8, 72, 0.8),
    (39690, 0, 5, 64, 0.4), (48510, 0, 8, 72, 0.5),
]


def _drive(r):
    r.timestamp_reset()
    i = r.i if hasattr(r, "i") else None
    prev = 0
    vh = None
    for t, msg, ch, a1, a2_ in MIDI_SEQ:
        if vh is None:
            vh = r.start(0, _drive.prog)
        r.timestamp_bump((t - prev) << 8)
        prev = t
        r.send(vh, 7, float(msg), float(ch), float(a1), float(a2_))
    return vh


def test_miditest2_cross_path_exact():
    from audiality2_tpu.engine.device_render import DeviceRenderer
    from audiality2_tpu.native import NativeRenderer
    frames = 2 * 44100 // 64 * 64

    i1 = a2.open_engine(44100, 4096, 1, batched=False)
    _drive.prog = i1.get(i1.load(
        os.path.join(DATA_DIR, "miditest2.a2s")), "Song")
    rn = NativeRenderer(i1, channels=1)
    _drive(rn)
    ref = np.asarray(rn.run(frames))
    rn.close()

    i2 = a2.open_engine(44100, 4096, 1, batched=False)
    _drive.prog = i2.get(i2.load(
        os.path.join(DATA_DIR, "miditest2.a2s")), "Song")
    rd = DeviceRenderer(i2, channels=1, interpret=True)
    _drive(rd)
    dev = np.asarray(rd.run(frames))
    fell = rd.fell_back
    rd.close()

    assert np.abs(ref).max() > (1 << 18), "miditest2 rendered silence"
    assert not fell, "miditest2 fell back off the device path"
    assert (ref == dev).all(), "device render != native render"
