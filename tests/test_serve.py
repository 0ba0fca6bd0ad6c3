"""Multi-stream serving parity (audiality2_tpu.serve).

Concurrent streams on the device path must each be bit-exact with the
C reference goldens — no cross-stream state leaks (rings, signatures,
atlases are per-renderer; only the chip is shared)."""

import numpy as np

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
    songs = ["k2trance", "k2loader", "dctest"]
    jobs = [_job(s, 1.0) for s in songs]
    render_multiplexed(jobs, bufsize=31 * 64, interpret=True)
    assert len(jobs[0].renderer.mixer._fns) <= len(songs)
    for song, j in zip(songs, jobs):
        assert not j.renderer.fell_back
        gold = np.fromfile(f"{GOLD}/{song}-5s-44100.raw", np.int32)
        m = j.frames - j.frames % 4096
        assert (j.output[0][:m] == gold[:m]).all(), song
