"""apistress/streamstress analogs (reference test/apistress.c,
streamstress.c): sustained API traffic and stream churn must not
leak handles, corrupt state, or stop producing audio."""

import numpy as np
import pytest

import audiality2_tpu as a2
from audiality2_tpu.constants import SampleFormat, WaveType


def test_api_stress():
    """Rapid-fire timestamped starts/sends/kills across many voices
    (apistress.c pattern)."""
    i = a2.open_engine(44100, 1024, 1)
    src = """
Tone(P A=1) { struct { wtosc; panmix } w saw; p P; a A; set a; d 10000;
  end
.stop	a 0; d 5; kill
	1() { force stop }
}
export H() { struct { } d 1000000; end }
"""
    h = i.load_string(src)
    prog = i.get(h, "Tone")
    i.timestamp_reset()
    rng = np.random.default_rng(42)
    live = []
    for k in range(400):
        vh = i.starta(i.root_voice(), prog,
                      [int((rng.random() * 2 - 1) * 65536), 3277])
        live.append(vh)
        i.timestamp_bump(int(rng.integers(1, 50)) << 8)
        if len(live) > 20:
            victim = live.pop(int(rng.integers(0, len(live))))
            if rng.random() < 0.5:
                i.send(victim, 1)
                i.release(victim)   # voice ends itself; drop handle
            else:
                i.kill(victim)
        if k % 50 == 0:
            i.run(1024)
    for vh in live:
        i.kill(vh)
    for _ in range(30):
        i.run(1024)
    assert i.state.core.activevoices == 1       # only the root
    assert i.get_state_property("apimessages") >= 400


def test_stream_stress():
    """Repeated wave create/upload/stream-write/release cycles
    (streamstress.c pattern)."""
    i = a2.open_engine(44100, 1024, 1)
    player = i.get(i.load_string(
        "export P(W) { struct { wtosc } w W; a .3; set a; d 40; end }\n"),
        "P")
    for k in range(60):
        data = (np.sin(np.arange(256) * (k % 7 + 1) * 2 * np.pi / 256)
                * 25000).astype(np.int16)
        wh = i.new_wave(WaveType.WAVE, 256, 0)
        sh = i.open_stream(wh)
        i.stream_write(sh, SampleFormat.I16, data)
        i.stream_flush(sh)
        i.stream_close(sh)
        i.timestamp_reset()
        i.playa(i.root_voice(), player, [wh << 16])
        i.run(512)
        i.release(wh)
    for _ in range(10):
        i.run(1024)
    assert i.state.core.activevoices >= 1
