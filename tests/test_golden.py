"""Golden parity tests: the host engine must match the C reference
bit-for-bit on offline renders of the benchmark corpus.

Goldens were produced with tools/golden_dump.c (reference engine,
buffer driver, 44.1 kHz mono, sink on the root voice)."""

import numpy as np
import pytest

from conftest import BENCH_DIR, load_golden, render_song

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
