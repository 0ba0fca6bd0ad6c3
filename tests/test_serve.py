"""Multi-stream serving parity (audiality2_tpu.serve).

Concurrent streams on the device path must each be bit-exact with the
C reference goldens — no cross-stream state leaks (rings, signatures,
atlases are per-renderer; only the chip is shared)."""

import numpy as np
import pytest

import audiality2_tpu as a2
from audiality2_tpu.serve import StreamJob, render_many

BENCH = "/root/reference/benchmark"
GOLD = "/root/repo/goldens"


def _job(song, secs):
    i = a2.open_engine(44100, 4096, 1, batched=False)
    prog = i.get(i.load(f"{BENCH}/{song}.a2s"), "Song")
    return StreamJob(i, prog, int(secs * 44100), channels=1)


def test_render_many_bit_exact():
    songs = ["k2trance", "k2loader"]
    jobs = [_job(s, 1.0) for s in songs]
    render_many(jobs, bufsize=31 * 64, interpret=True)
    for song, j in zip(songs, jobs):
        assert j.error is None
        assert not j.renderer.fell_back
        gold = np.fromfile(f"{GOLD}/{song}-5s-44100.raw", np.int32)
        m = j.frames - j.frames % 4096
        assert (j.output[0][:m] == gold[:m]).all(), song


def test_render_many_sink_streaming():
    chunks = []
    i = a2.open_engine(44100, 4096, 1, batched=False)
    prog = i.get(i.load(f"{BENCH}/dctest.a2s"), "Song")
    job = StreamJob(i, prog, 22528, channels=1,
                    sink=lambda bufs, n: chunks.append(
                        np.array(bufs[0][:n])))
    render_many([job], bufsize=16 * 64, interpret=True)
    out = np.concatenate(chunks)
    assert len(out) == 22528
    gold = np.fromfile(f"{GOLD}/dctest-5s-44100.raw", np.int32)
    assert (out == gold[:22528]).all()


def test_render_multiplexed_bit_exact():
    """Time-division-multiplexed fleet (shared mixer): per-stream
    output must equal the solo goldens; device state (rings, filter
    state), atlas entries and shape high-water marks are namespaced
    per stream — each stream compiles at most ONE signature sized to
    its own content (a fat fm stream must not inflate the others'
    uploads), and all dispatches share one transfer in flight."""
    from audiality2_tpu.serve import render_multiplexed
    # fmtest3: device fm stages — per-op `last` state must be
    # namespaced per stream on the fleet-shared mixer
    songs = ["k2trance", "k2loader", "dctest", "fmtest3"]
    jobs = [_job(s, 1.0) for s in songs]
    render_multiplexed(jobs, bufsize=31 * 64, interpret=True)
    assert len(jobs[0].renderer.mixer._fns) <= len(songs)
    for song, j in zip(songs, jobs):
        assert not j.renderer.fell_back
        gold = np.fromfile(f"{GOLD}/{song}-5s-44100.raw", np.int32)
        m = j.frames - j.frames % 4096
        assert (j.output[0][:m] == gold[:m]).all(), song


def test_render_multiplexed_batched_bit_exact():
    """Batched dispatch (dispatch_many): groups of streams whose
    superblocks run as ONE chained device call must stay bit-exact
    per stream — state threading through the chain is identical to
    K separate dispatches.  Mixed group sizes (batch 3 over 4
    streams: one whole group, one partial) cover both the chained
    and the leftover-singles paths."""
    from audiality2_tpu.serve import render_multiplexed
    songs = ["k2trance", "k2loader", "dctest", "fmtest3"]
    jobs = [_job(s, 1.0) for s in songs]
    render_multiplexed(jobs, bufsize=31 * 64, interpret=True,
                       batch=3)
    mixer = jobs[0].renderer.mixer
    assert mixer._chain_fns, "batched path never engaged"
    for song, j in zip(songs, jobs):
        assert not j.renderer.fell_back
        gold = np.fromfile(f"{GOLD}/{song}-5s-44100.raw", np.int32)
        m = j.frames - j.frames % 4096
        assert (j.output[0][:m] == gold[:m]).all(), song


def test_render_multiplexed_batched_dispatch_fault_bridges(
        monkeypatch):
    """A fault inside a chained batch dispatch must bridge every
    member of the group sample-exactly and leave other groups
    untouched."""
    from audiality2_tpu.serve import render_multiplexed
    from audiality2_tpu.tpu.superblock import DeviceMixer
    orig = DeviceMixer._dispatch_many
    calls = [0]

    def flaky(self, progs):
        calls[0] += 1
        if calls[0] == 3:
            raise RuntimeError("injected batch dispatch fault")
        return orig(self, progs)

    monkeypatch.setattr(DeviceMixer, "_dispatch_many", flaky)
    songs = ["k2trance", "k2loader", "dctest", "fmtest3"]
    jobs = [_job(s, 1.0) for s in songs]
    render_multiplexed(jobs, bufsize=31 * 64, interpret=True,
                       batch=2)
    assert calls[0] >= 3
    for song, j in zip(songs, jobs):
        assert j.error is None
        gold = np.fromfile(f"{GOLD}/{song}-5s-44100.raw", np.int32)
        m = j.frames - j.frames % 4096
        assert (j.output[0][:m] == gold[:m]).all(), song


def test_fleet_hbm_plan_and_guard():
    """The serving path must compute a device-memory plan before the
    window opens and REFUSE fleets that cannot fit HBM (VERDICT r3
    weak #7): per-stream persistent state (rings, filter state) is
    summed, transients are budgeted per in-flight superblock."""
    from audiality2_tpu.serve import (A2HbmBudgetError, fleet_hbm_plan,
                                      render_multiplexed)
    songs = ["k2trance", "k2trance"]
    jobs = [_job(s, 0.5) for s in songs]
    render_multiplexed(jobs, bufsize=31 * 64, interpret=True)
    mixer = jobs[0].renderer.mixer
    progs = [j.renderer._profiled_prog for j in jobs]
    plan = fleet_hbm_plan(mixer, progs)
    # k2trance has one fbdelay -> dense tail ring = 2*2^17*4 = 1 MB
    # persistent per stream; everything else is small
    assert 2 * (1 << 20) <= plan["persistent"] < 64 * (1 << 20)
    assert plan["total"] < plan["budget"]
    with pytest.raises(A2HbmBudgetError):
        fleet_hbm_plan(mixer, progs, hbm_budget=plan["persistent"])
    # and the serving entry point itself enforces it
    jobs2 = [_job("dctest", 0.25)]
    with pytest.raises(A2HbmBudgetError):
        render_multiplexed(jobs2, bufsize=31 * 64, interpret=True,
                           hbm_budget=1024)


def test_render_multiplexed_dispatch_fault_bridges(monkeypatch):
    """A stream whose dispatch dies mid-run must bridge to the native
    path at its emitted frontier, sample-exactly, without disturbing
    the other streams' device pipelines (serve.render_multiplexed's
    4-slot pipeline: the fault can land while the victim has another
    superblock in flight)."""
    from audiality2_tpu.serve import render_multiplexed
    from audiality2_tpu.tpu import superblock as sb

    songs = ["k2trance", "k2loader", "dctest"]
    jobs = [_job(s, 0.6) for s in songs]
    calls = {"n": 0}
    seen = []        # distinct ns in first-dispatch order = stream
    orig = sb.DeviceMixer.dispatch     # order (round-robin rotation)

    def flaky(self, prog):
        ns = getattr(prog, "ns", 0)
        if ns not in seen:
            seen.append(ns)
        # kill stream 1's SECOND superblock (its first already
        # emitted, so the bridge must continue mid-song)
        if seen.index(ns) == 1:
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected dispatch fault")
        return orig(self, prog)

    monkeypatch.setattr(sb.DeviceMixer, "dispatch", flaky)
    render_multiplexed(jobs, bufsize=31 * 64, interpret=True)
    assert [j.renderer.fell_back for j in jobs] == [False, True,
                                                    False]
    for song, j in zip(songs, jobs):
        assert j.error is None
        gold = np.fromfile(f"{GOLD}/{song}-5s-44100.raw", np.int32)
        m = j.frames - j.frames % 4096
        assert (j.output[0][:m] == gold[:m]).all(), song


def test_render_multiplexed_fetch_fault_bridges(monkeypatch):
    """Same contract when a FETCH dies: whichever stream owned the
    failed readback bridges; every stream's output stays bit-exact."""
    from audiality2_tpu.serve import render_multiplexed
    from audiality2_tpu.tpu import superblock as sb

    songs = ["k2trance", "dctest"]
    jobs = [_job(s, 0.6) for s in songs]
    calls = {"n": 0}
    orig = sb.DeviceMixer.fetch

    def flaky(self, handle):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected fetch fault")
        return orig(self, handle)

    monkeypatch.setattr(sb.DeviceMixer, "fetch", flaky)
    render_multiplexed(jobs, bufsize=31 * 64, interpret=True)
    assert sum(j.renderer.fell_back for j in jobs) == 1
    for song, j in zip(songs, jobs):
        assert j.error is None
        gold = np.fromfile(f"{GOLD}/{song}-5s-44100.raw", np.int32)
        m = j.frames - j.frames % 4096
        assert (j.output[0][:m] == gold[:m]).all(), song


@pytest.mark.slow
def test_render_multiplexed_soak():
    """Deep tier: a 6-stream fleet (mixed songs incl. fm + filters +
    dc) over 4 s each through the TDM pipeline — scale/stability
    check; every stream bit-exact vs its solo golden."""
    from audiality2_tpu.serve import render_multiplexed
    songs = ["k2trance", "k2loader", "dctest", "fmtest3",
             "pulsetronic", "k2intro"]
    jobs = [_job(s, 4.0) for s in songs]
    render_multiplexed(jobs, bufsize=43 * 64, interpret=True)
    for song, j in zip(songs, jobs):
        assert j.error is None
        assert not j.renderer.fell_back, song
        gold = np.fromfile(f"{GOLD}/{song}-5s-44100.raw", np.int32)
        m = j.frames - j.frames % 4096
        assert (j.output[0][:m] == gold[:m]).all(), song


def test_render_multiplexed_record_pool_bit_exact(monkeypatch):
    """Thread-parallel group record (A2_RECORD_POOL > 1): each
    stream's record runs on its own thread (the native a2rt_record
    call releases the GIL — on a multi-core host the aggregate
    record ceiling scales with cores instead of pinning at one
    core's rate).  Bit-exactness and bridging bookkeeping must be
    unchanged vs the serial path."""
    from audiality2_tpu.serve import render_multiplexed
    monkeypatch.setenv("A2_RECORD_POOL", "4")
    songs = ["k2trance", "dctest", "fmtest3", "k2loader"]
    jobs = [_job(s, 1.0) for s in songs]
    render_multiplexed(jobs, bufsize=31 * 64, interpret=True,
                       batch=2)
    for song, j in zip(songs, jobs):
        assert j.error is None
        assert not j.renderer.fell_back, song
        gold = np.fromfile(f"{GOLD}/{song}-5s-44100.raw", np.int32)
        m = j.frames - j.frames % 4096
        assert (j.output[0][:m] == gold[:m]).all(), song
