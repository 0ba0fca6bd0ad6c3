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
                                      ("k2epilogue", True),
                                      ("wstest", True),
                                      ("k2loader", True)])
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
    r.wait_device()      # render() would bridge natively while the
    r.timestamp_reset()  # per-process kernel warmup runs; this test
    r.start(0, prog)     # is about the device pipeline, so wait
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


@pytest.mark.parametrize("song", ["k2trance", "fmtest3"])
def test_device_render_chained_bit_exact(song):
    """chain_dispatch > 1: groups of consecutive superblocks run as
    ONE device call with ring/filter state threading INSIDE the jit
    (DeviceMixer.dispatch_chain).  Output must equal the solo
    per-superblock render bit-exactly — k2trance covers fbdelay ring
    threading and the partial tail group, fmtest3 the fm per-op
    state."""
    i = a2.open_engine(44100, 4096, 1, batched=False)
    prog = i.get(i.load(f"{BENCH}/{song}.a2s"), "Song")
    r = DeviceRenderer(i, channels=1, chain_dispatch=3)
    r.wait_device()
    r.timestamp_reset()
    r.start(0, prog)
    total = int(2.5 * 44100)
    out = r.render(total, bufsize=31 * 64)
    fb = r.fell_back
    chained = any(isinstance(k, tuple) and k and k[0] == "chain"
                  for k in r.mixer._chain_fns)
    r.close()
    assert not fb
    assert chained, "dispatch_chain never engaged"
    gold = np.fromfile(f"{GOLD}/{song}-5s-44100.raw", np.int32)
    m = total - total % 4096
    assert (out[0][:m] == gold[:m]).all()


_MONOFBD_SCRIPT = """
Song(V=1)
{
	struct { wtosc; fbdelay; panmix }
	drygain .5; fbgain .4; lgain .4; rgain .4
	w saw; a (V * .3); p 0n
	d 1100
	a 0
	d 100
}

export SongMain(V=1)
{
	struct { inline; panmix }
	1:Song V
	d 1300
}
"""


def test_device_render_mono_fbdelay():
    # a mono fbdelay mid-chain of a leaf voice: exercises the mono
    # (x0+x1)>>1 output mix (fbdelay.c mono variant) and the
    # gen-stash -> fbdelay -> panmix stage chain on the device
    import audiality2_tpu as a2
    from audiality2_tpu.native import NativeRenderer

    def render(cls, **kw):
        i = a2.open_engine(44100, 4096, 1, batched=False)
        prog = i.get(i.load_string(_MONOFBD_SCRIPT, "mfb"), "SongMain")
        r = cls(i, **kw)
        r.timestamp_reset()
        r.start(0, prog)
        out = []
        n = 0
        while n < int(1.2 * 44100):
            out.append(np.asarray(r.run(5 * 4096)))
            n += 5 * 4096
        fb = getattr(r, "fell_back", None)
        r.close()
        return np.concatenate(out, axis=1)[0], fb

    native, _ = render(NativeRenderer, channels=1)
    dev, fb = render(DeviceRenderer, channels=1, interpret=True)
    assert not fb
    assert (dev == native).all()


_MIDFALL_SCRIPT = """
Song(V=1)
{
	struct { wtosc; fbdelay; panmix }
	drygain .5; fbgain .4; lgain .4; rgain .4
	w saw; a (V * .3); p 0n
	d 600
	fbdelay 1; ldelay 1; rdelay 1
	d 500
	a 0
	d 100
}

export SongMain(V=1)
{
	struct { inline; panmix }
	1:Song V
	d 1300
}
"""


def test_device_render_midrender_fallback():
    # the fbdelay goes sub-fragment only at t=0.6s: the device path
    # renders the first superblocks, then the record pass fails and
    # the renderer restarts natively, skipping what was already
    # emitted — the seam must be sample-exact
    import audiality2_tpu as a2
    from audiality2_tpu.native import NativeRenderer

    def render(cls, **kw):
        i = a2.open_engine(44100, 4096, 1, batched=False)
        prog = i.get(i.load_string(_MIDFALL_SCRIPT, "mf"), "SongMain")
        r = cls(i, **kw)
        r.timestamp_reset()
        r.start(0, prog)
        total = int(1.2 * 44100)
        if cls is DeviceRenderer:
            out = r.render(total, bufsize=5 * 4096)
        else:
            chunks = []
            n = 0
            while n < total:
                chunks.append(np.asarray(r.run(5 * 4096)))
                n += 5 * 4096
            out = np.concatenate(chunks, axis=1)[:, :total]
        fb = getattr(r, "fell_back", None)
        r.close()
        return out[0], fb

    native, _ = render(NativeRenderer, channels=1)
    dev, fb = render(DeviceRenderer, channels=1, interpret=True)
    assert fb
    assert (dev == native[:len(dev)]).all()


_TINYDELAY_SCRIPT = """
Song(V=1)
{
	struct { wtosc; fbdelay; panmix }
	fbdelay 1; ldelay 1; rdelay 1
	drygain .5; fbgain .4; lgain .4; rgain .4
	w saw; a (V * .3); p 0n
	d 900
	a 0
	d 100
}

export SongMain(V=1)
{
	struct { inline; panmix }
	1:Song V
	d 1100
}
"""


def test_device_render_96k_golden():
    # rate coverage: fbdelay tap lengths, msdur and the mip selector
    # all scale with the sample rate
    i = a2.open_engine(96000, 4096, 1, batched=False)
    prog = i.get(i.load(f"{BENCH}/k2trance.a2s"), "Song")
    r = DeviceRenderer(i, channels=1, interpret=True)
    r.timestamp_reset()
    r.start(0, prog)
    total = int(2.0 * 96000)
    out = r.render(total, bufsize=43 * 64)
    fb = r.fell_back
    r.close()
    assert not fb
    gold = np.fromfile(f"{GOLD}/k2trance-10s-96000.raw", np.int32)
    m = total - total % 4096
    assert (out[0][:m] == gold[:m]).all()


def test_device_render_stereo_golden():
    # stereo device render (2-channel master slots, stereo rows with
    # pan, stereo bus tree) against the reference's interleaved
    # stereo golden
    i = a2.open_engine(44100, 4096, 2, batched=False)
    prog = i.get(i.load(f"{BENCH}/k2trance.a2s"), "Song")
    r = DeviceRenderer(i, channels=2)
    r.wait_device()
    r.timestamp_reset()
    r.start(0, prog)
    total = int(2.5 * 44100)
    out = r.render(total, bufsize=43 * 64)
    fb = r.fell_back
    nsigs = len(r.mixer._fns)
    r.close()
    assert not fb
    assert r.bridged_frames == 0 and nsigs == 1
    gold = np.fromfile(f"{GOLD}/k2trance-30s-44100-st.raw",
                       np.int32).reshape(-1, 2)
    m = total - total % 4096
    assert (out[0][:m] == gold[:m, 0]).all()
    assert (out[1][:m] == gold[:m, 1]).all()


def test_device_render_fallback_golden():
    # an fbdelay whose delay taps are shorter than a fragment cannot
    # run in the device mixer's chunked scan (a tap would read its own
    # chunk) — the renderer must transparently restart on the pure
    # native path and the two paths must agree bit-exactly
    import audiality2_tpu as a2

    def render(cls, **kw):
        i = a2.open_engine(44100, 4096, 1, batched=False)
        prog = i.get(i.load_string(_TINYDELAY_SCRIPT, "ins"),
                     "SongMain")
        r = cls(i, **kw)
        r.timestamp_reset()
        r.start(0, prog)
        out = []
        n = 0
        while n < 44100:
            out.append(np.asarray(r.run(4096)))
            n += 4096
        fb = getattr(r, "fell_back", None)
        r.close()
        return np.concatenate(out, axis=1)[0], fb

    from audiality2_tpu.native import NativeRenderer
    native, _ = render(NativeRenderer, channels=1)
    dev, fb = render(DeviceRenderer, channels=1, interpret=True)
    assert fb
    assert (dev == native).all()


def test_device_render_precompile_bit_exact():
    """DeviceMixer.precompile (AOT compile from shape skeletons) must
    leave dispatch output bit-identical and must not add a second
    compile: after precompile, the signature's cached executable is a
    Compiled object, and a profiled render reuses it."""
    from audiality2_tpu.engine.device_render import DeviceRenderer

    def render(pre):
        i = a2.open_engine(44100, 4096, 1, batched=False)
        prog = i.get(i.load(f"{BENCH}/k2trance.a2s"), "Song")
        r = DeviceRenderer(i, channels=1)
        r.timestamp_reset()
        r.start(0, prog)
        frames = 4 * 4096
        r._profile(frames, 4096)
        if pre:
            assert r.mixer.precompile(r._profiled_prog)
            nsig = len(r.mixer._fns)
        out = []
        n = 0
        while n < frames:
            out.append(r.run(4096))
            n += 4096
        if pre:
            assert len(r.mixer._fns) == nsig, \
                "dispatch recompiled after precompile"
        assert not r.fell_back
        r.close()
        return np.concatenate(out, axis=1)[0]

    a = render(False)
    b = render(True)
    assert (a == b).all()
