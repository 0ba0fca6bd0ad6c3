"""Native C++ runtime tests: bit-exactness vs the goldens and vs the
Python engine, plus API behavior through the ctypes bindings."""

import os

import numpy as np
import pytest

import audiality2_tpu as a2
from conftest import BENCH_DIR, load_golden

_LIB = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                    "native", "liba2rt.so")

pytestmark = pytest.mark.skipif(
    not os.path.exists(_LIB) and not os.path.exists(
        os.path.join(os.path.dirname(_LIB), "build.sh")),
    reason="native runtime not available")


def _native_render(path, program="Song", seconds=2.0, args=()):
    from audiality2_tpu.native import render_native
    i = a2.open_engine(44100, 4096, 1, batched=False)
    prog = i.get(i.load(path), program)
    return render_native(i, prog, args=args, seconds=seconds)


SONGS = ["dctest", "wstest", "fmtest3", "fmtest4", "k2trance",
         "k2intro", "k2epilogue", "k2loader", "pulsetronic"]


@pytest.mark.parametrize("song", SONGS)
def test_native_bit_exact(song):
    out = _native_render(f"{BENCH_DIR}/{song}.a2s", seconds=2.0)
    gold = load_golden(f"{song}-5s-44100.raw", len(out))
    diff = np.nonzero(out != gold)[0]
    assert len(diff) == 0, f"first diff at {diff[0] if len(diff) else 0}"


def test_native_bit_exact_deep():
    # full-depth golden: 30 s of k2trance covers the whole arrangement
    # (every instrument/effect entry) at native speed (<1 s to render)
    out = _native_render(f"{BENCH_DIR}/k2trance.a2s", seconds=30.0)
    gold = load_golden("k2trance-30s-44100.raw", len(out))
    diff = np.nonzero(out != gold)[0]
    assert len(diff) == 0, (
        f"{song}: {len(diff)} diffs, first at {diff[0]}")


def test_native_send_kill():
    from audiality2_tpu.native import NativeRenderer
    i = a2.open_engine(44100, 1024, 1, batched=False)
    h = i.load_string(
        "export P(F=0) {\n struct { wtosc }\n w sine; p F; a .5; set a\n"
        " d 10000; end\n 1(NA) { a NA; set a }\n}\n")
    prog = i.get(h, "P")
    r = NativeRenderer(i, channels=1)
    r.timestamp_reset()
    vh = r.start(0, prog)
    assert vh > 0
    loud = r.run(1024)[0]
    assert np.abs(loud).max() > 0
    r.timestamp_bump(1024 << 8)
    r.send(vh, 1, 0.0)
    for _ in range(8):
        quiet = r.run(1024)[0]
    assert np.abs(quiet).max() == 0
    r.close()


def test_native_voice_stats():
    from audiality2_tpu.native import NativeRenderer
    i = a2.open_engine(44100, 1024, 1, batched=False)
    h = i.load_string("export P() { d 1000; end }\n")
    r = NativeRenderer(i, channels=1)
    r.timestamp_reset()
    r.start(0, i.get(h, "P"))
    r.run(1024)
    assert r.activevoices >= 2        # root + P
    r.close()
