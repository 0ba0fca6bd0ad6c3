"""Native record -> TPU mixer end-to-end parity (engine/device_render).

The production device path: C++ control plane in record mode
(native/a2rt_record.inc) feeding the TPU superblock mixer.  Output
must be bit-identical to the C reference goldens; songs with
device-unsupported units must transparently fall back to the pure
native path and stay golden."""

import numpy as np
import pytest

import audiality2_tpu as a2
from audiality2_tpu.engine.device_render import DeviceRenderer

BENCH = "/root/reference/benchmark"
GOLD = "/root/repo/goldens"


def _render(song, secs, bufsize=4096):
    i = a2.open_engine(44100, 4096, 1, batched=False)
    prog = i.get(i.load(f"{BENCH}/{song}.a2s"), "Song")
    r = DeviceRenderer(i, channels=1)
    r.timestamp_reset()
    r.start(0, prog)
    out = []
    n = 0
    while n < int(secs * 44100):
        out.append(r.run(bufsize))
        n += bufsize
    fb = r.fell_back
    r.close()
    return np.concatenate(out, axis=1)[0], fb


@pytest.mark.parametrize("song,big", [("k2trance", False),
                                      ("k2trance", True),
                                      ("k2intro", True),
                                      ("pulsetronic", True),
                                      ("fmtest3", True),
                                      ("dctest", True),
                                      ("k2epilogue", True)])
def test_device_render_golden(song, big):
    buf = 1376 * 64 if big else 4096      # ~2 s superblocks when big
    mine, fb = _render(song, 2.5, bufsize=buf)
    gold = np.fromfile(f"{GOLD}/{song}-5s-44100.raw", np.int32)
    m = min(len(gold), len(mine))
    m -= m % 4096       # ragged final fragments legitimately differ
    assert not fb
    assert (mine[:m] == gold[:m]).all()


@pytest.mark.parametrize("song", ["k2trance", "k2loader"])
def test_device_render_pipelined_profiled(song):
    # the production render() path: profile pass -> single unified
    # jit signature -> pipelined record/dispatch/fetch, with the
    # final superblock recorded full-size and trimmed
    i = a2.open_engine(44100, 4096, 1, batched=False)
    prog = i.get(i.load(f"{BENCH}/{song}.a2s"), "Song")
    r = DeviceRenderer(i, channels=1)
    r.timestamp_reset()
    r.start(0, prog)
    total = int(2.5 * 44100)
    out = r.render(total, bufsize=31 * 64)
    nsigs = len(r.mixer._fns)
    fb = r.fell_back
    r.close()
    assert not fb
    assert out.shape == (1, total)
    assert nsigs == 1, f"profiled render compiled {nsigs} signatures"
    gold = np.fromfile(f"{GOLD}/{song}-5s-44100.raw", np.int32)
    m = total - total % 4096
    assert (out[0][:m] == gold[:m]).all()


def test_device_render_fallback_golden():
    # wstest uses waveshaper (no device kernel): the renderer must
    # restart on the pure native path and stay golden
    mine, fb = _render("wstest", 1.0)
    gold = np.fromfile(f"{GOLD}/wstest-5s-44100.raw", np.int32)
    m = min(len(gold), len(mine))
    assert fb
    assert (mine[:m] == gold[:m]).all()
