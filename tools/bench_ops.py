"""Op-level microbench for the superblock expansion's suspect ops.

CAVEAT (round 4): execution through the axon relay is LAZY —
block_until_ready can return before the program actually runs, so
absolute numbers from this harness are unreliable (a 16-matmul chain
"measures" 0.1 ms by block_until_ready, 40 ms by float(result)).
Use tools/bench_true_compute.py (in-dispatch chaining + forced value
readback) for trustworthy on-chip numbers; this file is kept for its
candidate implementations.

The component-removal probe (probe_compute.py) attributes cost by
(FULL - variant) serial A/Bs, which relay weather drift can swamp.
This tool times CANDIDATE IMPLEMENTATIONS of each hot op in
isolation at production shapes (k2trance 12 s superblock scale):

  rungather  — expand runmat rows to Rtot rows (rid non-decreasing)
  trajgather — per-row [10]-column trajectory fetch
  slotsum    — accumulate [Rtot, 2, 64] row audio into slots
  sort       — on-device 32-bit key/val sort at Rtot

Method: jit each candidate, then dispatch REPS calls back-to-back
with content-perturbed inputs (the relay content-caches identical
buffers) and block once — per-call time converges to true device
cost as the in-flight window amortizes the relay's completion-poll
latency.  An empty pass-through is timed as the floor.

Usage: python tools/bench_ops.py [Rtot] [Nr] [nslot] [reps]
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, inputs, reps):
    # warm (compile)
    r = fn(*inputs[0])
    jax.tree_util.tree_leaves(r)[0].block_until_ready()
    t0 = time.perf_counter()
    outs = [fn(*inp) for inp in inputs[1:]]
    for o in outs:
        jax.tree_util.tree_leaves(o)[0].block_until_ready()
    per = (time.perf_counter() - t0) / (len(inputs) - 1)
    print(f"{name:<44} {per * 1e3:8.2f} ms/call", flush=True)
    return per


def main(Rtot=240_896, Nr=87_863, nslot=66_144, reps=6):
    # defaults = measured k2trance 12 s superblock production shapes
    rng = np.random.default_rng(0)
    C = 18                       # runmat BASE_N columns
    K = 15                       # RUN_KCHUNK-1
    NrR = 34_540                 # ramp runs

    # --- build a realistic run layout: ascending starts, avg len ~2
    lens = rng.integers(1, 5, Nr)
    starts = np.zeros(Nr, np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    starts = np.minimum(starts, Rtot - 1)
    rm_host = rng.integers(-1 << 30, 1 << 30, (Nr, C), np.int32)
    rm_host[:, 0] = starts                     # RC_START-like
    mark_host = np.zeros(Rtot + 1, np.int32)
    np.add.at(mark_host, np.clip(starts, 0, Rtot), 1)
    rid_host = np.cumsum(mark_host[:Rtot]) - 1

    def inputs_for(mk, reps):
        return [mk(i) for i in range(reps)]

    print(f"shapes: Rtot={Rtot} Nr={Nr} nslot={nslot} "
          f"audio={Rtot * 2 * 64 * 4 / 2**20:.0f} MB", flush=True)

    # ---------- floor
    f_id = jax.jit(lambda x: x + 1)
    timeit("floor: x+1 on [Rtot] i32", f_id,
           inputs_for(lambda i: (jnp.asarray(
               rng.integers(0, 100, Rtot, np.int32)),), reps), reps)

    # ---------- rungather candidates
    def mk_rg(i):
        rm = rm_host.copy()
        rm[:, 1] += i                          # perturb contents
        return (jnp.asarray(rm),)

    def rg_common(rm):
        start = rm[:, 0]
        mark = jnp.zeros(Rtot + 1, jnp.int32).at[
            jnp.clip(start, 0, Rtot)].add(1)
        return jnp.cumsum(mark[:Rtot]) - 1

    @jax.jit
    def rg_take(rm):
        rid = rg_common(rm)
        return jnp.take(rm, jnp.clip(rid, 0, None), axis=0)

    @jax.jit
    def rg_sorted(rm):
        rid = rg_common(rm)
        return jax.lax.gather(
            rm, jnp.clip(rid, 0, None)[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, C), indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    @jax.jit
    def rg_cumsum(rm):
        # delta-scatter + int32-wrap cumsum: place rm[r]-rm[r-1] at
        # start[r], cumsum reconstructs the forward fill exactly
        start = rm[:, 0]
        prev = jnp.concatenate([rm[:1], rm[:-1]], axis=0)
        delta = rm - prev
        d = jnp.zeros((Rtot, C), jnp.int32).at[
            jnp.clip(start, 0, Rtot - 1)].add(
            delta, indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        d = d.at[0].add(rm[0])
        return jnp.cumsum(d, axis=0, dtype=jnp.int32)

    a = timeit("rungather: jnp.take", rg_take,
               inputs_for(mk_rg, reps), reps)
    b = timeit("rungather: lax.gather sorted", rg_sorted,
               inputs_for(mk_rg, reps), reps)
    c = timeit("rungather: delta-scatter+cumsum", rg_cumsum,
               inputs_for(mk_rg, reps), reps)
    # verify cumsum == take on one instance
    g1 = np.asarray(rg_take(*mk_rg(0)))
    g2 = np.asarray(rg_cumsum(*mk_rg(0)))
    alive = rid_host >= 0
    print("  cumsum == take (alive rows):",
          bool((g1[alive] == g2[alive]).all()), flush=True)

    # ---------- trajgather candidates
    # realistic row-level indices: runs expanded in order, ramp runs
    # numbered ascending in run order (exactly how _build_runs
    # assigns RC_RIDX), k = row position within its run
    is_ramp = np.zeros(Nr, bool)
    is_ramp[rng.choice(Nr, NrR, replace=False)] = True
    ridx_run = np.full(Nr, -1, np.int32)
    ridx_run[is_ramp] = np.arange(NrR, dtype=np.int32)
    rid_rows = np.clip(rid_host, 0, None)
    ridx_host = ridx_run[rid_rows]
    k_host = (np.arange(Rtot) - starts[rid_rows]).astype(np.int32)
    traj_host = rng.integers(-1 << 30, 1 << 30, (K, NrR, 10),
                             np.int32)

    def mk_tg(i):
        t = traj_host.copy()
        t[:, :, 0] += i
        return (jnp.asarray(t), jnp.asarray(ridx_host),
                jnp.asarray(k_host))

    @jax.jit
    def tg_take(traj, ridx, k):
        # current production form: k-major [K, NrR, 10] layout
        fidx = (jnp.clip(k - 1, 0, K - 1) * NrR
                + jnp.clip(ridx, 0, None))
        return jnp.take(traj.reshape(-1, 10), fidx, axis=0)

    @jax.jit
    def tg_runmajor(traj, ridx, k):
        # candidate: transpose to run-major [NrR, K, 10]; fidx is
        # then ascending within every run and across runs (RC_RIDX is
        # assigned in run order), so the gather is near-sequential
        t2 = jnp.transpose(traj, (1, 0, 2)).reshape(-1, 10)
        fidx = (jnp.clip(ridx, 0, None) * K
                + jnp.clip(k - 1, 0, K - 1))
        return jnp.take(t2, fidx, axis=0)

    @jax.jit
    def tg_runmajor_nt(traj2, ridx, k):
        # transpose-free variant (layout already run-major) to
        # isolate the transpose's own cost
        fidx = (jnp.clip(ridx, 0, None) * K
                + jnp.clip(k - 1, 0, K - 1))
        return jnp.take(traj2.reshape(-1, 10), fidx, axis=0)

    def mk_tg2(i):
        t = np.ascontiguousarray(traj_host.transpose(1, 0, 2))
        t[:, :, 0] += i
        return (jnp.asarray(t), jnp.asarray(ridx_host),
                jnp.asarray(k_host))

    timeit("trajgather: k-major take (current)", tg_take,
           inputs_for(mk_tg, reps), reps)
    timeit("trajgather: transpose+run-major take", tg_runmajor,
           inputs_for(mk_tg, reps), reps)
    timeit("trajgather: run-major take (no transp)", tg_runmajor_nt,
           inputs_for(mk_tg2, reps), reps)

    # ---------- slot accumulation candidates
    slot_host = np.minimum(
        np.repeat(rng.integers(0, nslot - 64, Nr), lens)
        + np.concatenate([np.arange(l) for l in lens]),
        nslot - 1).astype(np.int32)
    if len(slot_host) < Rtot:       # pad dead rows to the dead slot
        slot_host = np.concatenate(
            [slot_host, np.full(Rtot - len(slot_host), nslot - 1,
                                np.int32)])
    slot_host = slot_host[:Rtot]
    perm_host = np.argsort(slot_host, kind="stable").astype(np.int32)
    keys_host = slot_host[perm_host]

    def mk_sl(i):
        au = rng.integers(-1 << 20, 1 << 20, (Rtot, 128), np.int32)
        return (jnp.asarray(au), jnp.asarray(slot_host),
                jnp.asarray(perm_host), jnp.asarray(keys_host))

    @jax.jit
    def sl_unsorted(au, slot, perm, keys):
        return jax.ops.segment_sum(au, slot, num_segments=nslot)

    @jax.jit
    def sl_devsort(au, slot, perm, keys):
        k2, p2 = jax.lax.sort_key_val(
            slot, jnp.arange(Rtot, dtype=jnp.int32))
        au2 = jnp.take(au, p2, axis=0)
        return jax.ops.segment_sum(au2, k2, num_segments=nslot,
                                   indices_are_sorted=True)

    @jax.jit
    def sl_hostperm(au, slot, perm, keys):
        au2 = jnp.take(au, perm, axis=0)
        return jax.ops.segment_sum(au2, keys, num_segments=nslot,
                                   indices_are_sorted=True)

    @jax.jit
    def sl_scatter(au, slot, perm, keys):
        return jnp.zeros((nslot, 128), jnp.int32).at[slot].add(au)

    # cumsum + boundary-difference: rows already slot-sorted, the
    # per-slot row ranges [lo, hi) are host-known -> segment sum =
    # csum[hi] - csum[lo] with a zero row prepended (int32 wrap makes
    # the difference exact regardless of overflow in the prefix)
    lo_host = np.searchsorted(keys_host, np.arange(nslot),
                              "left").astype(np.int32)
    hi_host = np.searchsorted(keys_host, np.arange(nslot),
                              "right").astype(np.int32)

    def mk_sl2(i):
        au = rng.integers(-1 << 20, 1 << 20, (Rtot, 128), np.int32)
        return (jnp.asarray(au[perm_host]), jnp.asarray(lo_host),
                jnp.asarray(hi_host))

    @jax.jit
    def sl_cumsum(au2, lo, hi):
        cs = jnp.cumsum(au2, axis=0, dtype=jnp.int32)
        z = jnp.concatenate(
            [jnp.zeros((1, 128), jnp.int32), cs], axis=0)
        return jnp.take(z, hi, axis=0) - jnp.take(z, lo, axis=0)

    @jax.jit
    def sl_cumsum_only(au2, lo, hi):
        return jnp.cumsum(au2, axis=0, dtype=jnp.int32)

    u = timeit("slotsum: unsorted segment_sum", sl_unsorted,
               inputs_for(mk_sl, reps), reps)
    d = timeit("slotsum: device sort+take+sorted", sl_devsort,
               inputs_for(mk_sl, reps), reps)
    h = timeit("slotsum: host perm take+sorted", sl_hostperm,
               inputs_for(mk_sl, reps), reps)
    s = timeit("slotsum: scatter-add", sl_scatter,
               inputs_for(mk_sl, reps), reps)
    timeit("slotsum: cumsum+boundary-diff", sl_cumsum,
           inputs_for(mk_sl2, reps), reps)
    timeit("slotsum: cumsum alone", sl_cumsum_only,
           inputs_for(mk_sl2, reps), reps)
    x = mk_sl(0)
    r1 = np.asarray(sl_unsorted(*x))
    r2 = np.asarray(sl_devsort(*x))
    r3 = np.asarray(sl_hostperm(*x))
    au2h = np.asarray(x[0])[perm_host]
    r4 = np.asarray(sl_cumsum(jnp.asarray(au2h),
                              jnp.asarray(lo_host),
                              jnp.asarray(hi_host)))
    print("  devsort == unsorted:", bool((r1 == r2).all()),
          " hostperm == unsorted:", bool((r1 == r3).all()),
          " cumsum == unsorted:", bool((r1 == r4).all()),
          flush=True)

    # ---------- pure sort cost
    def mk_srt(i):
        return (jnp.asarray(
            rng.integers(0, nslot, Rtot, np.int32)),)

    @jax.jit
    def srt(x):
        return jax.lax.sort_key_val(
            x, jnp.arange(Rtot, dtype=jnp.int32))[0]

    timeit("sort_key_val [Rtot] i32", srt,
           inputs_for(mk_srt, reps), reps)


if __name__ == "__main__":
    argv = [int(x) for x in sys.argv[1:]]
    main(*argv)
