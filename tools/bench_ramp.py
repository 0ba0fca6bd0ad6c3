"""Isolated cost of the ramper-replay scan (_ramp_scan) and its
scaling in steps x lanes, measured with in-dispatch repetition (16
chained evaluations per jit call; dispatch/poll overhead amortizes to
1/16 — see bench_true_compute.py for why per-dispatch timing lies
through this relay).

Usage: python tools/bench_ramp.py [NrR] [Nr]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from audiality2_tpu.tpu import superblock as SB


def synth(NrR, Nr, rng):
    base = np.zeros((Nr, SB.BASE_N), np.int32)
    base[:, SB.RC_DPH] = rng.integers(1 << 20, 1 << 24, Nr)
    base[:, SB.RC_SIZE] = 1024
    base[:, SB.RC_AMP0] = rng.integers(0, 1 << 24, Nr)
    base[:, SB.RC_DAMP] = rng.integers(-1 << 12, 1 << 12, Nr)
    base[:, SB.RC_VOL0] = rng.integers(0, 1 << 24, Nr)
    base[:, SB.RC_OFF] = 0
    base[:, SB.RC_TOTAL] = rng.integers(64, 1024, Nr)
    rmp = np.zeros((NrR, SB.RR_N), np.int32)
    rmp[:, SB.RR_AT] = rng.integers(0, 1 << 24, NrR)
    rmp[:, SB.RR_ATMR] = rng.integers(0, 1 << 16, NrR)
    rmp[:, SB.RR_VT] = rng.integers(0, 1 << 24, NrR)
    rmp[:, SB.RR_VTMR] = rng.integers(0, 1 << 16, NrR)
    rmp[:, SB.RR_PV] = rng.integers(0, 1 << 22, NrR)
    rmp[:, SB.RR_PTGT] = rng.integers(0, 1 << 22, NrR)
    rmp[:, SB.RR_PTIMER] = rng.integers(0, 1 << 16, NrR)
    rmp[:, SB.RR_DPHRAW] = rng.integers(1, 1 << 24, NrR)
    rmp[:, SB.RR_PERIOD] = rng.integers(1 << 16, 1 << 24, NrR)
    rmp[:, SB.RR_BASE] = rng.integers(0, Nr, NrR)
    return rmp, base


def timed(name, fn, inputs, reps=4):
    # force a VALUE readback: through the axon relay execution is
    # LAZY — block_until_ready returns before the program runs, and
    # only fetching a result forces it (a 16x4096-matmul chain
    # "measures" 0.1 ms by block, 40 ms by float())
    float(jax.tree_util.tree_leaves(fn(*inputs[0]))[0])
    ts = []
    for inp in inputs[1:]:
        t0 = time.perf_counter()
        float(jax.tree_util.tree_leaves(fn(*inp))[0])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:<44} {med * 1e3 / 16:8.2f} ms/eval "
          f"(x16 chained: {med * 1e3:.0f} ms)", flush=True)
    return med / 16


def chain16(body):
    def f(rmp, base):
        acc = jnp.int32(0)
        for it in range(16):
            r2 = rmp.at[0, SB.RR_AT].add(it)
            t = body(r2.astype(jnp.int64), base.astype(jnp.int64))
            acc = acc + t.sum(dtype=jnp.int32)   # consume ALL lanes
        return acc
    return jax.jit(f)


def scan_k(K):
    """_ramp_scan with a static step count override."""
    orig = SB.RUN_KCHUNK

    def body(rmp, base):
        SB.RUN_KCHUNK = K + 1
        try:
            return SB._ramp_scan(rmp, base)
        finally:
            SB.RUN_KCHUNK = orig
    return body


def main(NrR=64_000, Nr=253_952, reps=4):
    rng = np.random.default_rng(0)

    def mk(i):
        rmp, base = synth(NrR, Nr, rng)
        return (jnp.asarray(rmp), jnp.asarray(base))

    inputs = [mk(i) for i in range(reps + 1)]
    for b in inputs:
        b[0].block_until_ready()
        b[1].block_until_ready()

    timed("ramp scan K=15 (production)", chain16(scan_k(15)),
          inputs, reps)
    timed("ramp scan K=5", chain16(scan_k(5)), inputs, reps)

    # lane scaling: quarter lanes at K=15
    def mkq(i):
        rmp, base = synth(NrR // 4, Nr, rng)
        return (jnp.asarray(rmp), jnp.asarray(base))
    inq = [mkq(i) for i in range(reps + 1)]
    for b in inq:
        b[0].block_until_ready()
    timed("ramp scan K=15, lanes/4", chain16(scan_k(15)), inq, reps)

    # full consumption pattern of _expand_rows' has_ramp block:
    # scan -> [K-1, NrR, 10] traj -> per-row gather -> int64
    # where-substitution into 8 row fields -> reduce
    Rtot = 240_896
    ridx_h = np.sort(rng.integers(0, NrR, Rtot)).astype(np.int32)
    ridx_h[rng.random(Rtot) < 0.4] = -1
    k_h = rng.integers(0, 6, Rtot, np.int32)
    K = SB.RUN_KCHUNK - 1

    def mkr(i):
        rmp, base = synth(NrR, Nr, rng)
        flds = rng.integers(-1 << 30, 1 << 30, (8, Rtot), np.int32)
        return (jnp.asarray(rmp), jnp.asarray(base),
                jnp.asarray(ridx_h), jnp.asarray(k_h),
                jnp.asarray(flds))

    def consume(n_substs):
        def f(rmp, base, ridx, k, flds):
            acc = jnp.int32(0)
            for it in range(16):
                r2 = rmp.at[0, SB.RR_AT].add(it)
                traj = SB._ramp_scan(r2.astype(jnp.int64),
                                     base.astype(jnp.int64))
                fidx = jnp.clip(k - 1, 0, K - 1) * NrR \
                    + jnp.clip(ridx, 0, None)
                tg = jnp.take(traj.reshape(-1, traj.shape[-1]),
                              fidx, axis=0)
                t64 = tg.astype(jnp.int64)
                use = (ridx >= 0) & (k >= 1)
                out = jnp.int64(0)
                for c in range(n_substs):
                    v = jnp.where(use,
                                  t64[:, c],
                                  flds[c].astype(jnp.int64))
                    out = out + v
                acc = acc + out.sum().astype(jnp.int32)
            return acc
        return jax.jit(f)

    inr = [mkr(i) for i in range(reps + 1)]
    for b in inr:
        b[0].block_until_ready()
    timed("scan+gather+8 substs (real pattern)", consume(8), inr,
          reps)
    timed("scan+gather+1 subst", consume(1), inr, reps)

    # unrolled (no lax.scan): same math, steps inlined
    def unrolled(rmp, base):
        orig = SB.RUN_KCHUNK
        # reuse _ramp_scan's own pieces by calling with scan replaced
        # is invasive; instead approximate the question "is lax.scan
        # the overhead?" by timing K=1 (one step, no scan loop)
        SB.RUN_KCHUNK = 2
        try:
            return SB._ramp_scan(rmp, base)
        finally:
            SB.RUN_KCHUNK = orig
    timed("ramp scan K=1 (step floor)", chain16(unrolled), inputs,
          reps)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
