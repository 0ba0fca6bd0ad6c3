"""Reference test-strategy analogs (SURVEY.md §4): stress and
behavioral programs — voicestress/wavestress/timingtest/rtsubstate
patterns — plus the MIDI bridge and statistics properties."""

import numpy as np
import pytest

import audiality2_tpu as a2
from audiality2_tpu.constants import SampleFormat, WaveType


def _engine(**kw):
    return a2.open_engine(44100, 1024, 1, **kw)


def _drain(i, seconds):
    out = []
    i.sink_callback(lambda bufs, frames: out.append(np.array(bufs[0])))
    n = 0
    while n < int(seconds * 44100):
        i.run(1024)
        n += 1024
    return np.concatenate(out) if out else np.zeros(0, np.int32)


# ---- timingtest analog (reference test/timingtest.c:2-19) ----

def test_timing_regular_rhythm():
    """Notes fired at close, fractional intervals must produce a
    perfectly regular rhythm: onsets at exact expected samples."""
    src = """
Click() { struct { wtosc } w square; a 1; set a; d 1; a 0; set a; d 1; end }
export P() { 20 { :Click; d 7.37 } d 100; end }
"""
    i = _engine()
    i.timestamp_reset()
    i.starta(i.root_voice(), i.get(i.load_string(src), "P"), [])
    out = _drain(i, 0.3)
    # detect click onsets
    loud = np.abs(out) > 100000
    onsets = np.nonzero(loud[1:] & ~loud[:-1])[0] + 1
    assert len(onsets) >= 15
    deltas = np.diff(onsets[:15])
    # 7.37 ms at 44.1 kHz = 325.02 frames; subsample-accurate timing
    # means onset spacing never drifts by more than 1 frame
    assert deltas.min() >= 324
    assert deltas.max() <= 326


# ---- voicestress analog (voicestress.c:2-5) ----

def test_voicestress_rapid_start_release():
    src = """
V(F) { struct { wtosc } w sine; p F; a .05; set a; d 10000; end }
"""
    i = _engine()
    h = i.load_string(src)
    prog = i.get(h, "V")
    i.timestamp_reset()
    handles = []
    for k in range(100):
        vh = i.starta(i.root_voice(), prog, [k << 12])
        handles.append(vh)
        i.timestamp_bump(40 << 8)
        if len(handles) > 10:
            i.kill(handles.pop(0))
    _drain(i, 0.3)
    for vh in handles:
        i.kill(vh)
    for _ in range(20):
        i.run(1024)
    assert i.state.core.activevoices == 1    # only the root remains


# ---- wavestress analog (wavestress.c:2-5) ----

def test_wavestress_render_upload_play_unload():
    i = _engine()
    player = i.get(i.load_string(
        "export P(W) { struct { wtosc } w W; a .5; set a; d 30; end }\n"),
        "P")
    for k in range(20):
        data = (np.sin(np.arange(512) * (k + 1) * 2 * np.pi / 512)
                * 20000).astype(np.int16)
        wh = i.upload_wave(WaveType.MIPWAVE, 512, 0x100,
                           SampleFormat.I16, data)
        i.timestamp_reset()
        i.playa(i.root_voice(), player, [wh << 16])
        i.run(1024)
        i.release(wh)
    out = _drain(i, 0.1)
    assert i.state.core.activevoices >= 1


# ---- rtsubstate analog (rtsubstate.c:2-8) ----

def test_substates_run_concurrently():
    i = _engine()
    src = "export P() { struct { wtosc } w sine; a .5; set a; d 500; end }\n"
    h = i.load_string(src)
    sub = i.state.substate()
    si = sub.interface
    # same bank visible in both; both render independently
    o1 = []
    i.sink_callback(lambda bufs, frames: o1.append(np.array(bufs[0])))
    o2 = []
    si.sink_callback(lambda bufs, frames: o2.append(np.array(bufs[0])))
    i.timestamp_reset()
    si.timestamp_reset()
    i.starta(i.root_voice(), i.get(h, "P"), [])
    si.starta(si.root_voice(), si.get(h, "P"), [])
    for _ in range(8):
        i.run(1024)
        si.run(1024)
    a1 = np.concatenate(o1)
    a2_ = np.concatenate(o2)
    assert np.abs(a1).max() > 0
    assert np.array_equal(a1, a2_)     # same program, same seeds
    sub.close()


# ---- MIDI bridge ----

def test_midi_bridge_noteon():
    from audiality2_tpu.engine.midi import MidiBridge, MIDI_NOTEON
    src = """
Tone(P V) { struct { wtosc } w sine; p P; a V; set a; d 2000; end }
export H() {
  struct { }
  d 100000
  end
  7(Msg Ch A1 A2) {
    ifg (Msg - .5) {
      ifl (Msg - 1.5) { :Tone (A1 - 5) A2 }
    }
  }
}
"""
    i = _engine()
    h = i.load_string(src)
    i.timestamp_reset()
    vh = i.starta(i.root_voice(), i.get(h, "H"), [])
    b = MidiBridge(i, vh)
    i.run(1024)
    i.timestamp_bump(1024 << 8)
    b.note_on(0, 60, 100)
    out = _drain(i, 0.2)
    assert np.abs(out).max() > 0


def test_smf_parser(tmp_path):
    from audiality2_tpu.engine.midi import parse_smf
    import struct
    # one-track SMF: tempo + note on/off
    track = (b"\x00\xff\x51\x03\x07\xa1\x20"     # tempo 500000
             b"\x00\x90\x3c\x64"                 # note on C4
             b"\x60\x80\x3c\x00"                 # note off after 96 ticks
             b"\x00\xff\x2f\x00")                # end of track
    data = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96)
            + b"MTrk" + struct.pack(">I", len(track)) + track)
    p = tmp_path / "t.mid"
    p.write_bytes(data)
    ev = parse_smf(str(p))
    assert len(ev) == 2
    assert ev[0][1] & 0xF0 == 0x90
    assert abs(ev[1][0] - 0.5) < 1e-6    # 96 ticks at 500 ms/quarter


# ---- statistics ----

def test_cpu_and_voice_stats():
    i = _engine()
    h = i.load_string("export P() { struct { wtosc } w saw; a .5; set a;"
                      " d 500; end }\n")
    i.timestamp_reset()
    i.starta(i.root_voice(), i.get(h, "P"), [])
    for _ in range(8):
        i.run(1024)
    assert i.get_state_property("cputimeavg") > 0
    assert i.get_state_property("activevoicesmax") >= 2
    assert i.get_state_property("instructions") > 0


def test_late_message_clamped():
    from audiality2_tpu.errors import A2Error
    i = _engine()
    h = i.load_string("export P() { struct { wtosc } w sine; a .5; set a;"
                      " d 500; end }\n")
    i.run(1024)
    i.timestamp = 0                      # deliberately stale timestamp
    i.starta(i.root_voice(), i.get(h, "P"), [])
    out = _drain(i, 0.1)
    assert i.state.last_rt_error == A2Error.LATEMESSAGE
    assert np.abs(out).max() > 0         # clamped to "now", still played


def test_tsmargin_stats():
    """Timestamp deadline margin statistics (a2_properties.h:89-91,
    measured per pumped message like interface.c:146-155)."""
    i = _engine()
    h = i.load_string("export P() { struct { wtosc } w sine; a .5;"
                      " set a; d 500; end }\n")
    i.run(1024)
    i.timestamp_reset()
    i.timestamp_bump(2048 << 8)
    i.starta(i.root_voice(), i.get(h, "P"), [])
    i.run(1024)
    # message was 2048 frames (24:8 = 2048<<8) ahead of the deadline
    assert i.get_state_property("tsmarginmin") == 2048 << 8
    assert i.get_state_property("tsmarginmax") == 2048 << 8
    assert i.get_state_property("tsmarginavg") == 2048 << 8
    i.set_state_property("tsmarginavg", 0)      # any write resets
    i.run(1024)
    assert i.get_state_property("tsmarginavg") == 0
