"""Driver registry (engine/drivers.py), custom unit registration
(a2_RegisterUnit analog, units.c:79-157), and interface logging
(a2_types.h:86-107)."""

import struct

import numpy as np
import pytest

import audiality2_tpu as a2
from audiality2_tpu.constants import A2_LOG_DEBUG, A2_LOG_INFO, A2_PROCADD
from audiality2_tpu.errors import A2Exception


SRC = "export Q() { struct { wtosc; panmix } w sine; a 1; set a;" \
      " d 500; end }\n"


def test_driver_spec_parsing():
    from audiality2_tpu.engine.drivers import parse_driver_spec
    assert parse_driver_spec("buffer") == ("buffer", [])
    assert parse_driver_spec("jack,in,out") == ("jack", ["in", "out"])
    assert parse_driver_spec(None) == (None, [])


def test_buffer_driver_renders():
    i = a2.open_engine(44100, 1024, 1, audiodriver="buffer")
    h = i.load_string(SRC)
    i.timestamp_reset()
    i.starta(i.root_voice(), i.get(h, "Q"), [])
    bufs = i.audio_driver.run(2048)
    assert len(bufs) == 1
    assert bufs[0].shape == (2048,)
    assert np.abs(bufs[0]).max() > 0


def test_callback_driver():
    from audiality2_tpu.engine.drivers import CallbackDriver
    i = a2.open_engine(44100, 1024, 1)
    h = i.load_string(SRC)
    got = []
    drv = CallbackDriver(i.state, process=lambda bufs, n: got.append(
        np.abs(bufs[0]).max()))
    i.timestamp_reset()
    i.starta(i.root_voice(), i.get(h, "Q"), [])
    drv.run(1024)
    assert got and max(got) > 0


def test_unknown_driver_rejected():
    from audiality2_tpu.engine.drivers import new_driver
    i = a2.open_engine(44100, 1024, 1)
    with pytest.raises(A2Exception):
        new_driver("audio", "nonexistent", i.state)


def test_register_custom_unit():
    from audiality2_tpu.units.descriptors import UnitDesc
    from audiality2_tpu.units.host_units import HostUnit

    class HalfGain(HostUnit):
        record_kind = "proc"
        queue_writes = False

        def initialize(self, flags):
            self.flags = flags
            return 0

        def write_callbacks(self):
            return []

        def process(self, offset, frames):
            sl = slice(offset, offset + frames)
            o = self.inputs[0][sl] >> 1
            if self.flags & A2_PROCADD:
                self.outputs[0][sl] += o
            else:
                self.outputs[0][sl] = o

    i = a2.open_engine(44100, 1024, 1)
    i.register_unit(UnitDesc("halfgain", 0, (), (), (), 1, 1, 1, 1),
                    HalfGain)
    src = ("export P() { struct { wtosc; halfgain; panmix } w sine;"
           " a 1; set a; d 500; end }\n" + SRC)
    h = i.load_string(src)
    outs = {}
    for prog in ("P", "Q"):
        o = []
        i.sink_callback(lambda bufs, frames, o=o: o.append(
            np.array(bufs[0])))
        i.timestamp_reset()
        vh = i.starta(i.root_voice(), i.get(h, prog), [])
        for _ in range(4):
            i.run(1024)
        i.kill(vh)
        i.state.core.sinks.clear()
        outs[prog] = np.concatenate(o)
    # halfgain halves the oscillator before panmix
    assert abs(outs["P"].max() * 2 - outs["Q"].max()) \
        <= outs["Q"].max() * 0.01

    # duplicate name refused
    with pytest.raises(A2Exception):
        i.register_unit(UnitDesc("halfgain", 0, (), (), (), 1, 1, 1, 1),
                        HalfGain)
    # refused once substates exist (units.c:127-133)
    sub = i.state.substate()
    with pytest.raises(A2Exception):
        i.register_unit(UnitDesc("other", 0, (), (), (), 1, 1, 1, 1),
                        HalfGain)
    sub.close()


def test_smf_midi_driver(tmp_path):
    track = (b"\x00\xff\x51\x03\x07\xa1\x20"
             b"\x00\x90\x3c\x64"
             b"\x60\x80\x3c\x00"
             b"\x00\xff\x2f\x00")
    data = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96)
            + b"MTrk" + struct.pack(">I", len(track)) + track)
    p = tmp_path / "t.mid"
    p.write_bytes(data)
    msrc = """
Tone(P V) { struct { wtosc } w sine; p P; a V; set a; d 2000; end }
export H() { struct { } d 100000; end
  7(Msg Ch A1 A2) { ifg (Msg - .5) { ifl (Msg - 1.5) { :Tone (A1 - 5) A2 } } }
}
"""
    i = a2.open_engine(44100, 1024, 1)
    h = i.load_string(msrc)
    i.timestamp_reset()
    vh = i.starta(i.root_voice(), i.get(h, "H"), [])
    i.set_midi_driver(f"smf,{p}", handler_voice=vh)
    out = []
    i.sink_callback(lambda bufs, frames: out.append(np.array(bufs[0])))
    for _ in range(20):
        i.run(1024)
    assert np.abs(np.concatenate(out)).max() > 0


def test_loglevels(capsys):
    i = a2.open_engine(44100, 1024, 1)
    i.log(A2_LOG_INFO, "visible")
    i.log(A2_LOG_DEBUG, "hidden")
    cap = capsys.readouterr()
    assert "visible" in cap.out and "hidden" not in cap.out
    i.set_state_property("loglevels",
                         i.get_state_property("loglevels")
                         | A2_LOG_DEBUG)
    i.log(A2_LOG_DEBUG, "now visible")
    assert "now visible" in capsys.readouterr().out


def test_hardware_audio_drivers_registered():
    """sdl/jack hardware backends exist in the registry and fail with
    a clean DEVICEOPEN on this audio-less image (the reference's own
    behavior when no device can be opened)."""
    import pytest
    from audiality2_tpu.engine.state import open_engine
    from audiality2_tpu.engine import drivers as D
    from audiality2_tpu.errors import A2Exception, A2Error
    i = open_engine(44100, 1024, 1)
    for name in ("sdl", "jack"):
        with pytest.raises(A2Exception) as ei:
            D.new_driver("audio", name, i.state)
        assert ei.value.code == A2Error.DEVICEOPEN


def test_alsa_midi_driver_registered():
    """The hardware MIDI input backend (reference alsamididrv.c)
    exists in the registry and fails with a clean DEVICEOPEN on this
    soundless image."""
    import pytest
    from audiality2_tpu.engine.state import open_engine
    from audiality2_tpu.engine import drivers as D
    from audiality2_tpu.errors import A2Exception, A2Error
    assert "alsa" in D.driver_names("midi")
    i = open_engine(44100, 1024, 1)
    with pytest.raises(A2Exception) as ei:
        D.new_driver("midi", "alsa", i.state)
    assert ei.value.code == A2Error.DEVICEOPEN


def test_live_midi_pitch_bend_center():
    """A center pitch bend (raw 14-bit 8192) through the live driver
    must deliver bend 0.0 to the handler (regression: the dispatch
    pre-biased the raw value, shifting center to -1)."""
    import numpy as np
    src = """
export H() { struct { wtosc; panmix } w sine; a 0.2; p 1; set a
  d 100000; end
  7(Msg Ch A1 A2) { ifg (Msg - 5.5) { p (1 + A1); set p } }
}
"""
    sr = 44100
    outs = {}
    for bend, key in ((8192, "center"), (16383, "up")):
        i = a2.open_engine(sr, 1024, 1)
        h = i.load_string(src)
        i.timestamp_reset()
        vh = i.starta(i.root_voice(), i.get(h, "H"), [])
        drv = i.set_midi_driver("live", handler_voice=vh)
        drv.inject(0xE0, bend & 0x7F, bend >> 7, when=0.0)
        out = []
        i.sink_callback(lambda bufs, n, o=out: o.append(np.array(bufs[0])))
        for _ in range(8):
            i.run(1024)
        outs[key] = np.concatenate(out)

    def dom_freq(x):
        sp = np.abs(np.fft.rfft(x[2048:].astype(np.float64)))
        return np.argmax(sp) * sr / len(x[2048:])

    fc, fu = dom_freq(outs["center"]), dom_freq(outs["up"])
    # center = unbent p 1 (one octave up from middle); full-up bend
    # approaches +1 octave on top of that
    assert abs(fc - 2 * 261.63) < 15.0, fc
    assert fu > fc * 1.8, (fc, fu)
