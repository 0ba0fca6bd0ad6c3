"""Farm: many engine instances, one device dispatch per block.

NOTE (round 2): the production serving surface is now
`audiality2_tpu.serve.render_many` — per-stream native-record ->
superblock-mixer pipelines (docs/device.md).  This row-level farm
remains as the merged-dispatch form for the Python batched engine
and its on-TPU regression test (tests/test_farm.py).

The TPU-native serving mode.  The reference engine renders one song
per process; a TPU chip is only busy when thousands of oscillator rows
arrive per dispatch.  A Farm runs K independent batched engines
(independent songs, scores, or listeners) in lock-step: each block,
every engine records its superblock (VM/control plane on host, exact
reference semantics — engine/core.py P1), the row batches are merged
into one array with per-engine wave-atlas offsets, evaluated in a
single device call, and the results are split back for each engine's
replay (P3).

This amortizes both the dispatch latency and the kernel launch over
the whole fleet: with K engines the per-block row count multiplies by
K, crossing the JAX_MIN_ROWS break-even (tpu/row_kernel.py) that a
single song cannot reach.

Scaling out: shard the merged row axis over a jax.sharding.Mesh (see
__graft_entry__.dryrun_multichip) — rows are embarrassingly parallel
and each chip renders its own slice of the fleet.
"""

import numpy as np

from .tpu.row_kernel import RowBatch


class _MergedAtlas:
    """Concatenated wave atlases of all farm engines; version-keyed
    like WaveAtlas so the row kernel's device cache works."""

    def __init__(self, parts):
        self.data = (np.concatenate([p.data for p in parts])
                     if parts else np.zeros(1, np.int32))
        self.version = tuple((id(p), p.version) for p in parts)


class Farm:
    """Run several batched engines with merged row dispatch.

    interfaces: engine Interfaces opened with batched=True (the
    default).  run(frames) advances every engine by `frames` and
    returns each engine's output (list of per-channel int32 arrays),
    identical to what the engine's own sinks observe.
    """

    def __init__(self, interfaces):
        self.interfaces = list(interfaces)
        self.cores = [i.state.core for i in self.interfaces]
        for c in self.cores:
            if not c.batched:
                raise ValueError("Farm requires batched engines")

    def run(self, frames, use_jax=None):
        cores = self.cores
        recs = [c.record_superblock(frames) for c in cores]

        # merge row batches with atlas offsets
        merged = RowBatch()
        counts = []
        atlas_parts = []
        offset = 0
        for c, (frags, oplists, rb) in zip(cores, recs):
            counts.append(rb.n)
            if rb.n:
                a = c._atlas
                atlas_parts.append(a)
                merged.base.extend(b + offset for b in rb.base)
                merged.ph0.extend(rb.ph0)
                merged.dph.extend(rb.dph)
                merged.amp0.extend(rb.amp0)
                merged.damp.extend(rb.damp)
                merged.haspm.extend(rb.haspm)
                merged.stereo.extend(rb.stereo)
                merged.clamp.extend(rb.clamp)
                merged.vol0.extend(rb.vol0)
                merged.dvol.extend(rb.dvol)
                merged.pan0.extend(rb.pan0)
                merged.dpan.extend(rb.dpan)
                merged.n += rb.n
                offset += len(a.data)

        if merged.n:
            if use_jax is None:
                use_jax = any(c.use_jax for c in cores)
            rows = merged.evaluate(_MergedAtlas(atlas_parts),
                                   use_jax=use_jax)
        else:
            rows = None

        # split + replay per engine
        outputs = []
        pos = 0
        for c, (frags, oplists, rb), n in zip(cores, recs, counts):
            sub = rows[pos:pos + n] if n else None
            pos += n

            captured = []

            def sink(bufs, fr, captured=captured):
                captured.append([np.array(b) for b in bufs])

            c.sinks.append(sink)
            try:
                c.replay_superblock(frames, frags, oplists, sub)
            finally:
                c.sinks.remove(sink)
            outputs.append(captured[0] if captured else None)
        return outputs
