"""Farm (farm.py): K batched engines, one merged row dispatch.

Each farm engine's output must be bit-exact with a standalone batched
engine running the same program (which is itself bit-exact with the C
reference, tests/test_golden.py)."""

import numpy as np

import audiality2_tpu as a2
from audiality2_tpu.farm import Farm

SONG = "/root/reference/benchmark/k2trance.a2s"
SONG2 = "/root/reference/benchmark/pulsetronic.a2s"


def _mk(path):
    i = a2.open_engine(44100, 4096, 1, batched=True, use_jax=False)
    h = i.load(path)
    i.timestamp_reset()
    i.starta(i.root_voice(), i.get(h, "Song"), [])
    return i


def _run_solo(path, blocks):
    i = _mk(path)
    out = []
    i.sink_callback(lambda bufs, frames: out.append(np.array(bufs[0])))
    for _ in range(blocks):
        i.run(4096)
    return np.concatenate(out)


def test_farm_matches_solo_engines():
    """Mixed fleet: two different songs + a duplicate, all bit-exact
    with their solo renders (atlas offsets must not leak between
    engines)."""
    engines = [_mk(SONG), _mk(SONG2), _mk(SONG)]
    farm = Farm(engines)
    outs = [[] for _ in engines]
    blocks = 6
    for _ in range(blocks):
        res = farm.run(4096)
        for k in range(len(engines)):
            outs[k].append(res[k][0])
    solo1 = _run_solo(SONG, blocks)
    solo2 = _run_solo(SONG2, blocks)
    assert np.array_equal(np.concatenate(outs[0]), solo1)
    assert np.array_equal(np.concatenate(outs[1]), solo2)
    assert np.array_equal(np.concatenate(outs[2]), solo1)


def test_farm_requires_batched():
    import pytest
    i = a2.open_engine(44100, 1024, 1, batched=False)
    with pytest.raises(ValueError):
        Farm([i])
