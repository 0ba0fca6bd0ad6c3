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


def test_farm_tpu_device_dispatch():
    """End-to-end device validation: a 6-engine farm crosses
    JAX_MIN_ROWS in k2trance's busy section, so row evaluation runs
    on the real TPU — output must stay bit-exact with the numpy twin.
    Gated: needs a TPU backend and ~2 min (jit compile)."""
    import os
    import jax
    import pytest
    if jax.default_backend() != "tpu":
        pytest.skip("needs a TPU backend")
    if not os.environ.get("A2_TPU_TESTS"):
        pytest.skip("set A2_TPU_TESTS=1 to run (jit compile ~1 min)")
    from audiality2_tpu.tpu import row_kernel as RK
    K = 6
    f_np = Farm([_mk(SONG) for _ in range(K)])
    f_tpu = Farm([_mk(SONG) for _ in range(K)])
    for _ in range(int(12 * 44100 / 4096)):       # skip sparse intro
        f_np.run(4096, use_jax=False)
        f_tpu.run(4096, use_jax=False)
    hit = []
    orig = RK.RowBatch.evaluate

    def spy(self, atlas, use_jax=True):
        hit.append(bool(use_jax and self.n >= self.JAX_MIN_ROWS))
        return orig(self, atlas, use_jax=use_jax)

    RK.RowBatch.evaluate = spy
    try:
        for _ in range(3):
            r_np = f_np.run(4096, use_jax=False)
            r_tpu = f_tpu.run(4096, use_jax=True)
            for k in range(K):
                assert np.array_equal(r_np[k][0], r_tpu[k][0])
    finally:
        RK.RowBatch.evaluate = orig
    assert any(hit), "device path never engaged"
