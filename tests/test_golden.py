"""Golden parity tests: the host engine must match the C reference
bit-for-bit on offline renders of the benchmark corpus.

Goldens were produced with tools/golden_dump.c (reference engine,
buffer driver, 44.1 kHz mono, sink on the root voice)."""

import os

import numpy as np
import pytest

from conftest import BENCH_DIR, GOLDEN_DIR, load_golden, render_song

# (song, seconds-to-verify) — keep runtimes reasonable; 2 s at 44.1 kHz
# covers thousands of voice spawns, all unit types, and all timing
# paths of each song.
SONGS = [
    ("dctest", 2.0),
    ("wstest", 2.0),
    ("fmtest3", 1.0),
    ("fmtest4", 1.0),
    ("k2trance", 1.0),
    ("k2intro", 1.0),
    ("k2epilogue", 1.0),
    ("k2loader", 1.0),
    ("pulsetronic", 1.0),
]


@pytest.mark.parametrize("batched", [False, True],
                         ids=["interleaved", "batched"])
@pytest.mark.parametrize("song,seconds", SONGS,
                         ids=[s for s, _ in SONGS])
def test_song_bit_exact(song, seconds, batched):
    mine = render_song(f"{BENCH_DIR}/{song}.a2s", seconds=seconds,
                       batched=batched)
    gold = load_golden(f"{song}-5s-44100.raw", len(mine))
    diff = np.nonzero(mine != gold)[0]
    assert len(diff) == 0, (
        f"{song}: {len(diff)} differing samples, first at {diff[0]}")


@pytest.mark.slow
def test_k2trance_stereo_golden():
    """Stereo (2-channel) renders must match the reference's stereo
    output frame-interleaved golden on all three engine paths
    (rootdriver stereo panmix + stereo bus tree)."""
    import os
    import numpy as np
    import audiality2_tpu as a2
    path = os.path.join(GOLDEN_DIR, "k2trance-30s-44100-st.raw")
    gold = np.fromfile(path, dtype=np.int32).reshape(-1, 2)
    N = min(len(gold), 6 * 44100)       # 6 s is plenty for CI
    gold = gold[:N]
    for batched in (False, True):
        i = a2.open_engine(44100, 4096, 2, batched=batched,
                           use_jax=False)
        song = i.get(i.load(os.path.join(BENCH_DIR, "k2trance.a2s")),
                     "Song")
        out = []
        i.sink_callback(lambda bufs, frames: out.append(
            np.stack([np.array(bufs[0]), np.array(bufs[1])], axis=1)))
        i.timestamp_reset()
        i.starta(i.root_voice(), song, [])
        n = 0
        while n < N:
            i.run(4096)
            n += 4096
        assert np.array_equal(np.concatenate(out)[:N], gold), \
            f"stereo mismatch (batched={batched})"


def test_k2trance_multirate_golden():
    """Sample-rate generalization: basepitch/msdur float32 paths
    differ per rate (audiality2.c:397-399, 499).  The 96 kHz case
    caught two real bugs: float32 msdur (6291457 vs double's 6291456)
    and is kept as a regression golden alongside 48 k / 22.05 k."""
    import numpy as np
    import audiality2_tpu as a2
    from audiality2_tpu.native import NativeRenderer
    for rate in (48000, 22050, 96000, 192000):
        secs = 5 if rate == 192000 else 10
        path = os.path.join(GOLDEN_DIR,
                            f"k2trance-{secs}s-{rate}.raw")
        gold = np.fromfile(path, dtype=np.int32)
        # (additional rate coverage for other songs below)
        N = min(len(gold), 4 * rate)
        gold = gold[:N]
        i = a2.open_engine(rate, 4096, 1, batched=False)
        song = i.get(i.load(os.path.join(BENCH_DIR, "k2trance.a2s")),
                     "Song")
        r = NativeRenderer(i, channels=1)
        r.timestamp_reset()
        r.start(0, song)
        out = []
        n = 0
        while n < N:
            out.append(r.run(4096)[0])
            n += 4096
        r.close()
        mine = np.concatenate(out)[:N]
        assert np.array_equal(mine, gold), f"rate {rate}"


def test_k2trance_odd_chunk_golden():
    """The reference's audio callback restarts its <=64-frame fragment
    loop per callback (core.c:1964-1973), so non-64-multiple run sizes
    change control-timing quantization — and the output.  The engine
    reproduces that faithfully: run(431) matches a golden rendered
    with a2_Run(431)."""
    import numpy as np
    import audiality2_tpu as a2
    from audiality2_tpu.native import NativeRenderer
    path = os.path.join(GOLDEN_DIR, "k2trance-5s-44100-chunk431.raw")
    gold = np.fromfile(path, dtype=np.int32)[:3 * 44100]
    i = a2.open_engine(44100, 4096, 1, batched=False)
    song = i.get(i.load(os.path.join(BENCH_DIR, "k2trance.a2s")),
                 "Song")
    r = NativeRenderer(i, channels=1)
    r.timestamp_reset()
    r.start(0, song)
    out = []
    n = 0
    while n < len(gold):
        out.append(r.run(431)[0])
        n += 431
    r.close()
    assert np.array_equal(np.concatenate(out)[:len(gold)], gold)


def test_k2trance_args_golden():
    """Program-argument marshalling parity: Song P=0 V=0.5 (16:16
    args through a2_Starta) vs a reference golden with those args."""
    import numpy as np
    import audiality2_tpu as a2
    from audiality2_tpu.native import NativeRenderer
    path = os.path.join(GOLDEN_DIR, "k2trance-5s-44100-args.raw")
    gold = np.fromfile(path, dtype=np.int32)[:3 * 44100]
    i = a2.open_engine(44100, 4096, 1, batched=False)
    song = i.get(i.load(os.path.join(BENCH_DIR, "k2trance.a2s")),
                 "Song")
    r = NativeRenderer(i, channels=1)
    r.timestamp_reset()
    r.start(0, song, 0.0, 0.5)
    out = []
    n = 0
    while n < len(gold):
        out.append(r.run(4096)[0])
        n += 4096
    r.close()
    assert np.array_equal(np.concatenate(out)[:len(gold)], gold)


def test_a2_render_golden():
    """a2_Render parity (render.c:34-126): offline substate render of
    k2trance, compared to a reference probe that streamed a2_Render
    output into a wave (A2_I24 conversion: 8:24 >> 8 to int16)."""
    import numpy as np
    import audiality2_tpu as a2
    path = os.path.join(GOLDEN_DIR, "k2trance-render-2s-44100.raw")
    gold = np.fromfile(path, dtype=np.int16)
    i = a2.open_engine(44100, 4096, 1, batched=False)
    song = i.get(i.load(os.path.join(BENCH_DIR, "k2trance.a2s")),
                 "Song")
    audio = np.asarray(i.render(song, length=len(gold)))
    assert np.array_equal((audio >> 8).astype(np.int16), gold)


def test_multirate_other_songs():
    """Rate matrix beyond k2trance: pulsetronic at 96 kHz (noise +
    non-mip waves), fmtest3 at 192 kHz (FM stacks + fbdelay)."""
    import numpy as np
    import audiality2_tpu as a2
    from audiality2_tpu.native import NativeRenderer
    for name, rate in (("pulsetronic", 96000), ("fmtest3", 192000)):
        path = os.path.join(GOLDEN_DIR, f"{name}-5s-{rate}.raw")
        gold = np.fromfile(path, dtype=np.int32)[:2 * rate]
        i = a2.open_engine(rate, 4096, 1, batched=False)
        song = i.get(i.load(os.path.join(BENCH_DIR, f"{name}.a2s")),
                     "Song")
        r = NativeRenderer(i, channels=1)
        r.timestamp_reset()
        r.start(0, song)
        out = []
        n = 0
        while n < len(gold):
            out.append(r.run(4096)[0])
            n += 4096
        r.close()
        assert np.array_equal(np.concatenate(out)[:len(gold)], gold), \
            f"{name}@{rate}"


@pytest.mark.slow
@pytest.mark.parametrize("song", ["k2trance", "k2intro"])
def test_song_bit_exact_deep(song):
    """Deep tier: the PYTHON engines' late-song coverage (arrangement
    entries past the fast tier's 1-2 s) — 5 s through the interleaved
    host engine vs the reference golden."""
    mine = render_song(f"{BENCH_DIR}/{song}.a2s", seconds=5.0)
    gold = load_golden(f"{song}-5s-44100.raw", len(mine))
    diff = np.nonzero(mine != gold)[0]
    assert len(diff) == 0, (
        f"{song}: {len(diff)} differing samples, first at {diff[0]}")
