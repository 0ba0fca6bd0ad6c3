"""Engine behavioral tests: voices, events, timing, waves, properties.

Patterned on the reference test strategy (SURVEY.md §4): stress
programs and behavioral checks rather than mocks."""

import numpy as np
import pytest

import audiality2_tpu as a2
from audiality2_tpu.constants import A2_MIPLEVELS, WaveType, SampleFormat
from audiality2_tpu.objects.waves import upload_wave


def _engine():
    return a2.open_engine(44100, 1024, 1)


def _render(i, prog, seconds=0.2, args=()):
    out = []
    i.sink_callback(lambda bufs, frames: out.append(np.array(bufs[0])))
    i.timestamp_reset()
    vh = i.starta(i.root_voice(), prog, [int(a * 65536) for a in args])
    n = 0
    while n < int(seconds * 44100):
        i.run(1024)
        n += 1024
    return np.concatenate(out), vh


def test_silence_program():
    i = _engine()
    h = i.load_string("export P() { d 100; end }\n")
    out, _ = _render(i, i.get(h, "P"))
    assert np.all(out == 0)


def test_sine_tone_amplitude():
    i = _engine()
    h = i.load_string(
        "export P() { struct { wtosc } w sine; a 1; set a; d 500; end }\n")
    out, _ = _render(i, i.get(h, "P"), 0.1)
    peak = np.abs(out).max() / 8388608.0
    assert 0.4 < peak < 1.1        # sine at a=1 (interp doubles -> ~0.5 FS)


def test_subsample_timing_determinism():
    """timingtest analog: two renders with identical seeds are equal."""
    src = ("export P() { struct { wtosc } w square; 20 { a .5; d 1.7;"
           " a 0; d 3.3 } end }\n")
    i1 = _engine()
    o1, _ = _render(i1, i1.get(i1.load_string(src), "P"), 0.2)
    i2 = _engine()
    o2, _ = _render(i2, i2.get(i2.load_string(src), "P"), 0.2)
    assert np.array_equal(o1, o2)


def test_voice_spawn_kill():
    """voicestress analog: spawn/message/kill at high rate."""
    src = """
Child(F) {
  struct { wtosc }
  w sine; p F; a .1
  d 1000
.die
  a 0; d 1
  end
  1() { force die }
}
export P() {
  50 {
    1:Child 0.1; 2:Child 0.3
    d 2
    1<1; 2<1
    d 2
  }
  end
}
"""
    i = _engine()
    out, vh = _render(i, i.get(i.load_string(src), "P"), 0.3)
    assert np.abs(out).max() > 0
    # releasing the start handle detaches the voice; once it and its
    # subvoices finish, everything is freed (only the root remains)
    i.timestamp_reset()
    i.release(vh)
    for _ in range(40):
        i.run(1024)
    assert i.state.core.activevoices == 1


def test_detached_voice_waits_for_subvoices():
    src = """
Sub() { struct { wtosc } w sine; a .2; d 50; a 0; d 10; end }
export P() { :Sub; end }
"""
    i = _engine()
    out, _ = _render(i, i.get(i.load_string(src), "P"), 0.1)
    assert np.abs(out).max() > 0


def test_vm_overload_kills_voice():
    i = _engine()
    h = i.load_string("export P() { !v 0\n.x\n +v 1; jump x }\n")
    out, _ = _render(i, i.get(h, "P"), 0.05)
    from audiality2_tpu.errors import A2Error
    assert i.state.last_rt_error == A2Error.OVERLOAD
    assert i.state.core.activevoices <= 1   # voice killed


def test_tempo_and_ticks():
    """tempo 120 4 -> tick = 125 ms; td 8 = 1 s of audio."""
    src = ("export P() { struct { wtosc } tempo 120 4\n"
           "  w sine; a 1; set a; td 4; a 0; set a; td 4; end }\n")
    i = _engine()
    out, _ = _render(i, i.get(i.load_string(src), "P"), 1.2)
    # amplitude on for ~0.5 s (4 ticks at 125 ms)
    on = np.abs(out[:int(0.45 * 44100)])
    off = np.abs(out[int(0.6 * 44100):int(0.9 * 44100)])
    assert on.max() > 0
    assert off.max() == 0


def test_rand_seeded_determinism():
    src = "export P() { struct { wtosc } w noise; a .5; set a; d 100; end }\n"
    i1, i2 = _engine(), _engine()
    o1, _ = _render(i1, i1.get(i1.load_string(src), "P"), 0.1)
    o2, _ = _render(i2, i2.get(i2.load_string(src), "P"), 0.1)
    assert np.array_equal(o1, o2)
    assert np.abs(o1).max() > 0


def test_send_message_to_started_voice():
    src = """
export P(F=0) {
  struct { wtosc } w sine; p F; a .5; set a
  d 10000
  end
  1(NA) { a NA; set a }
}
"""
    i = _engine()
    h = i.load_string(src)
    out = []
    i.sink_callback(lambda bufs, frames: out.append(np.array(bufs[0])))
    i.timestamp_reset()
    vh = i.starta(i.root_voice(), i.get(h, "P"), [])
    i.run(1024)
    i.timestamp_bump(1024 << 8)
    i.send(vh, 1, 0.0)            # mute via message
    for _ in range(10):
        i.run(1024)
    full = np.concatenate(out)
    assert np.abs(full[:1024]).max() > 0
    assert np.abs(full[-1024:]).max() == 0


def test_wave_upload_and_play():
    i = _engine()
    data = (np.sin(np.arange(2048) * 2 * np.pi / 2048)
            * 30000).astype(np.int16)
    wh = i.upload_wave(WaveType.MIPWAVE, 2048, 0x100,
                       SampleFormat.I16, data)
    w = i.get_wave(wh)
    assert w.size[0] == 2048
    assert w.size[A2_MIPLEVELS - 1] == 4
    h = i.load_string("export P(W) { struct { wtosc } w W; a 1; set a;"
                      " d 100; end }\n")
    out = []
    i.sink_callback(lambda bufs, frames: out.append(np.array(bufs[0])))
    i.timestamp_reset()
    i.starta(i.root_voice(), i.get(h, "P"), [wh << 16])
    for _ in range(5):
        i.run(1024)
    assert np.abs(np.concatenate(out)).max() > 0


def test_mipmap_decimation_rule():
    data = np.zeros(16, dtype=np.int16)
    data[4] = 1000
    w = upload_wave(WaveType.MIPWAVE, 16, 0, SampleFormat.I16, data)
    # level 1: d[k] = (2*s[2k] + s[2k-1] + s[2k+1]) >> 2; only k=2
    # sees s[4] (through the 2*s[2k] term).
    lvl1 = w.data[1][1:1 + 8]
    assert lvl1[2] == (2 * 1000 + 0 + 0) >> 2
    assert lvl1[1] == 0
    assert lvl1[3] == 0


def test_offline_render_wave():
    i = _engine()
    h = i.load_string(
        "export W() { struct { wtosc } w sine; a 1; set a; d 50; end }\n")
    wh = i.render_wave(WaveType.WAVE, 0, 0, 44100, 1000, 1, 1,
                       i.get(h, "W"), [])
    w = i.get_wave(wh)
    assert w.size[0] == 1000
    assert np.abs(w.data[0][1:1001].astype(np.int64)).max() > 0


def test_substate_shares_banks():
    i = _engine()
    h = i.load_string("export P() { d 10; end }\n")
    sub = i.state.substate()
    assert sub.interface.get(h, "P") > 0
    sub.close()


def test_properties():
    i = _engine()
    assert i.get_state_property("samplerate") == 44100
    i.set_state_property("noiseseed", 12345)
    assert i.get_state_property("noiseseed") == 12345


def test_group_volume_control():
    i = _engine()
    g = i.new_group()
    h = i.load_string("export P() { struct { wtosc } w sine; a 1; set a;"
                      " d 10000; end }\n")
    out = []
    i.sink_callback(lambda bufs, frames: out.append(np.array(bufs[0])))
    i.run(1024)
    i.timestamp_reset()
    i.starta(g, i.get(h, "P"), [])
    for _ in range(4):
        i.run(1024)
    loud = np.abs(np.concatenate(out[-2:])).max()
    i.timestamp_reset()
    i.send(g, 2, 0.0)     # group volume -> 0 (EP 2 of groupdriver)
    for _ in range(8):
        i.run(1024)
    quiet = np.abs(np.concatenate(out[-2:])).max()
    assert loud > 0
    assert quiet == 0


def test_api_surface_utilities():
    """The remaining small API-parity methods (a2_Timestamp*, a2_Rand,
    a2_GetExport*, a2_Name/Size, a2_UnloadAll)."""
    import audiality2_tpu as a2
    i = a2.open_engine(44100, 1024, 1)
    h = i.load_string(
        "export P() { struct { wtosc } w sine; a .5; set a; d 50; end }\n",
        "apisurface")
    assert i.timestamp_set(1000) == 1000
    assert i.timestamp_get() == 1000
    ts = i.ms2timestamp(10)
    assert abs(i.timestamp2ms(ts) - 10.0) < 1e-6
    r1, r2 = i.rand(1.0), i.rand(1.0)
    assert 0.0 <= r1 < 1.0 and 0.0 <= r2 < 1.0 and r1 != r2
    assert i.get_export_name(h, 0) == "P"
    assert i.get_export(h, 0) == i.get(h, "P")
    assert i.name_of(h) == "apisurface"
    assert i.size_of(h) == 1
    assert i.size_of(i.get(0, "sine")) == 2048
    i.timestamp_now()
    i.timestamp_nudge(0, 0.5)
    assert i.unload_all() == 0


def test_runtime_error_codes():
    """Engine-context error parity: BADVOICE for messages to dead
    voices (interface.c error path), DIVBYZERO from the VM DIVR
    instruction (core.c)."""
    import audiality2_tpu as a2
    from audiality2_tpu.errors import A2Error
    i = a2.open_engine(44100, 1024, 1)
    h = i.load_string("export P() { struct { wtosc } w sine; a .5;"
                      " set a; d 200; end }\n")
    v = i.starta(i.root_voice(), i.get(h, "P"), [])
    i.run(1024)
    i.kill(v)
    for _ in range(4):
        i.run(1024)
    i.send(v, 1)
    i.run(1024)
    assert i.state.last_rt_error == A2Error.BADVOICE
    h2 = i.load_string("export D() { !x 0; !y 1; /y x; end }\n")
    i.starta(i.root_voice(), i.get(h2, "D"), [])
    for _ in range(3):
        i.run(1024)
    assert i.state.last_rt_error == A2Error.DIVBYZERO
