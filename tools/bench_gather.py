"""Bisects WHY row gathers are fast or slow on this TPU: table size
(VMEM residency) vs index pattern (monotone vs random).  All outputs
are [Rout, W] int32 row gathers; per-call time via the amortized
dispatch-window method (see bench_ops.py).

CAVEAT (round 4): execution through the axon relay is LAZY — see the
note in bench_ops.py; trust only tools/bench_true_compute.py-style
chained+value-forced measurements for absolute numbers.  This file's
finding stands qualitatively: no gather variant differs by the 1000x
the naive timings suggested.

Usage: python tools/bench_gather.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, inputs):
    r = fn(*inputs[0])
    jax.tree_util.tree_leaves(r)[0].block_until_ready()
    t0 = time.perf_counter()
    outs = [fn(*inp) for inp in inputs[1:]]
    for o in outs:
        jax.tree_util.tree_leaves(o)[0].block_until_ready()
    per = (time.perf_counter() - t0) / (len(inputs) - 1)
    print(f"{name:<58} {per * 1e3:8.2f} ms/call", flush=True)
    return per


def main(Rout=240_896, reps=6):
    rng = np.random.default_rng(0)

    def run(name, T, W, idx_kind, sorted_hint=False):
        tbl_mb = T * W * 4 / 2**20
        if idx_kind == "mono":
            idx = np.sort(rng.integers(0, T, Rout)).astype(np.int32)
        elif idx_kind == "rand":
            idx = rng.integers(0, T, Rout, np.int32)
        elif idx_kind == "runmono":
            # monotone with dips to 0 (linear-run clip pattern):
            # 60% of positions ascend, 40% are 0
            idx = np.sort(rng.integers(0, T, Rout)).astype(np.int32)
            drop = rng.random(Rout) < 0.4
            idx[drop] = 0

        def mk(i):
            t = rng.integers(-1 << 30, 1 << 30, (T, W), np.int32)
            return (jnp.asarray(t), jnp.asarray(idx))

        if sorted_hint:
            @jax.jit
            def g(t, ix):
                return jax.lax.gather(
                    t, ix[:, None],
                    jax.lax.GatherDimensionNumbers(
                        offset_dims=(1,), collapsed_slice_dims=(0,),
                        start_index_map=(0,)),
                    slice_sizes=(1, W), indices_are_sorted=True,
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        else:
            @jax.jit
            def g(t, ix):
                return jnp.take(t, ix, axis=0)

        timeit(f"{name}: tbl {tbl_mb:5.1f}MB W={W} idx={idx_kind}"
               + (" sorted-hint" if sorted_hint else ""),
               g, [mk(i) for i in range(reps)])

    # --- table size sweep at fixed random index pattern
    run("A1", 87_863, 18, "rand")      # 6 MB  (rungather table size)
    run("A2", 155_000, 10, "rand")     # 5.9 MB
    run("A3", 518_100, 10, "rand")     # 20 MB (traj table size)
    run("A4", 518_100, 10, "mono")     # 20 MB, monotone idx
    run("A5", 518_100, 10, "runmono")  # 20 MB, monotone w/ 0-dips
    run("A6", 518_100, 10, "mono", sorted_hint=True)
    run("A7", 87_863, 18, "mono")      # rungather's real pattern
    run("A8", 259_050, 10, "rand")     # 9.9 MB
    run("A9", 259_050, 10, "mono")     # 9.9 MB monotone
    # --- split-table variant: two half-column gathers from sub-VMEM
    T, W = 518_100, 10
    idx_m = np.sort(rng.integers(0, T, Rout)).astype(np.int32)

    def mk2(i):
        t = rng.integers(-1 << 30, 1 << 30, (T, W), np.int32)
        return (jnp.asarray(np.ascontiguousarray(t[:, :5])),
                jnp.asarray(np.ascontiguousarray(t[:, 5:])),
                jnp.asarray(idx_m))

    @jax.jit
    def g2(ta, tb, ix):
        return (jnp.take(ta, ix, axis=0), jnp.take(tb, ix, axis=0))

    timeit("B1: split 2x10MB tables W=5 idx=mono", g2,
           [mk2(i) for i in range(reps)])

    # --- C: exact replicas of bench_ops' trajgather (which measured
    # 24 ms where A3 above measures free) to find the discriminant
    K, NrR, Rtot = 15, 34_540, Rout
    ridx = rng.integers(0, NrR, Rtot, np.int32)
    kk = rng.integers(1, 5, Rtot, np.int32)

    def mkc(i, shape):
        t = rng.integers(-1 << 30, 1 << 30, shape, np.int32)
        return (jnp.asarray(t), jnp.asarray(ridx), jnp.asarray(kk))

    @jax.jit
    def c1(traj2, ridx, k):
        # bench_ops tg_runmajor_nt verbatim: 3D input + reshape +
        # on-device index arithmetic
        fidx = (jnp.clip(ridx, 0, None) * K
                + jnp.clip(k - 1, 0, K - 1))
        return jnp.take(traj2.reshape(-1, 10), fidx, axis=0)

    @jax.jit
    def c2(traj2, ridx, k):
        # same but 2D input (no reshape)
        fidx = (jnp.clip(ridx, 0, None) * K
                + jnp.clip(k - 1, 0, K - 1))
        return jnp.take(traj2, fidx, axis=0)

    timeit("C1: 3D [NrR,K,10] reshape + computed fidx", c1,
           [mkc(i, (NrR, K, 10)) for i in range(reps)])
    timeit("C2: 2D [NrR*K,10] + computed fidx", c2,
           [mkc(i, (NrR * K, 10)) for i in range(reps)])


if __name__ == "__main__":
    main()
