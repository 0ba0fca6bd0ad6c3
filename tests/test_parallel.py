"""Sharded single-render API (audiality2_tpu.parallel).

One song's oscillator runs shard across a jax Mesh (the virtual
8-CPU mesh here; ICI on real hardware), bus slots psum, the stage
chain runs replicated — output must be bit-exact with the solo
goldens.  Songs chosen to cover every item kind: k2trance (runs +
stages + fbdelay rings), fmtest3 (fm operator stages with device
state), k2intro (filter12 chains).

These are MULTI-superblock renders (44100 frames at 31*64-frame
superblocks = 23 superblocks), so device state — fbdelay ring
contents/positions, filter d1/d2, fm per-op `last` — carries across
sharded superblock boundaries and any leak shows as a golden
mismatch.  Scaling shape (1/2/4/8 shards): tools/shard_scaling.py,
table in DESIGN.md."""

import numpy as np
import pytest

import audiality2_tpu as a2
from conftest import GOLDEN_DIR

BENCH = "/root/reference/benchmark"


@pytest.mark.parametrize("song,ndev", [
    ("k2trance", 4), ("fmtest3", 4),
    pytest.param("k2intro", 8, marks=pytest.mark.slow),
])
def test_render_sharded_bit_exact(song, ndev):
    from audiality2_tpu.parallel import render_sharded
    i = a2.open_engine(44100, 4096, 1, batched=False)
    prog = i.get(i.load(f"{BENCH}/{song}.a2s"), "Song")
    N = 44100
    out = render_sharded(i, prog, N, n_devices=ndev,
                         bufsize=31 * 64, interpret=True)
    import os
    gold = np.fromfile(os.path.join(GOLDEN_DIR,
                                    f"{song}-5s-44100.raw"),
                       np.int32)[:N]
    m = N - N % 4096
    assert (out[0][:m] == gold[:m]).all(), song
