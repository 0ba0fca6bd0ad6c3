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


def test_record_run_compression_regression():
    """Guard the record pass's run compression level: the device
    path's upload floor is proportional to emitted rows, so a silent
    compression regression (e.g. in the ramp-extension gate,
    rec_commit or sim_predict_match) would tank device throughput
    without failing any exactness test.  Measured on k2trance's first
    24 s at 12 s superblocks: 317,960 rows / 16,536 fragments =
    19.2 rows per fragment (~2.5x slice-level compression).  Bound
    set ~8% above; lower is better."""
    from audiality2_tpu.native import NativeRenderer
    i = a2.open_engine(44100, 4096, 1, batched=False)
    song = i.get(i.load(f"{BENCH_DIR}/k2trance.a2s"), "Song")
    r = NativeRenderer(i, channels=1)
    r.timestamp_reset()
    r.start(0, song)
    sb = 12 * 44100 // 64 * 64
    rows = frags = 0
    for _ in range(2):
        res = r.record(sb)
        rows += len(res[0])
        frags += res[3]
    r.close()
    assert rows / frags < 20.8, (
        f"run compression regressed: {rows} rows / {frags} fragments "
        f"= {rows / frags:.1f} rows/fragment (expected ~19.2)")
