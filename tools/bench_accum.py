"""On-chip microbench of the superblock's slot-accumulation and
field-packing formulations (the two dominant costs in the round-5
probe decomposition: noscatter 12.6 ms, expansion glue ~17 ms of a
50.7 ms 12-s k2trance superblock).

Chain method (tools/bench_true_compute.py): N data-dependent
evaluations inside ONE jit call with salted pre-uploaded inputs and a
forced readback; per-op = (t(N) - t(1)) / (N - 1), so dispatch/poll
cancel.  Shapes mirror the real k2trance 12-s superblock: Rtot =
240896 rows, nslot = 66145, multiplicity ~3.6.

Usage: python tools/bench_accum.py [N]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(N=8, reps=5):
    import jax
    import jax.numpy as jnp

    Rtot = 240896
    S = 66145
    rng = np.random.default_rng(0)
    # realistic sorted slot keys: multiplicity ~Poisson(3.6) over
    # increasing slots (the real keys are the sorted slot ids)
    keys = np.sort(rng.integers(0, S - 1, Rtot).astype(np.int32))
    perm = rng.permutation(Rtot).astype(np.int32)
    audio = rng.integers(-(1 << 30), 1 << 30, (Rtot, 128),
                         dtype=np.int32)
    audio64 = audio[:, :64].copy()
    audioT = np.ascontiguousarray(audio.T)

    def chain(fn, x, n):
        def f(x, s):
            acc = jnp.int32(s)
            for k in range(n):
                y = fn(x + (acc & 1))  # data-dep: defeats CSE/elide
                acc = acc + y
            return acc
        return jax.jit(f)

    devs = {}

    def upload(name, a):
        if name not in devs:
            d = jnp.asarray(a)
            d.block_until_ready()
            devs[name] = d
        return devs[name]

    kj = upload("keys", keys)
    pj = upload("perm", perm)

    def timeit(tag, fn, x):
        x = upload(tag + ":in", x)
        f1, fN = chain(fn, x, 1), chain(fn, x, N)
        int(f1(x, 0))
        int(fN(x, 0))
        t1s, tns = [], []
        for k in range(reps):
            t0 = time.perf_counter()
            int(f1(x, k + 1))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(fN(x, k + 1))
            tns.append(time.perf_counter() - t0)
        t1 = sorted(t1s)[len(t1s) // 2]
        tn = sorted(tns)[len(tns) // 2]
        per = (tn - t1) / (N - 1) * 1e3
        print(f"{tag:34s} {per:8.2f} ms", flush=True)
        return per

    # 1. current production: take(perm) + sorted segsum, 2ch
    def cur(a):
        a2 = jnp.take(a, pj, axis=0)
        seg = jax.ops.segment_sum(a2, jnp.take(kj, pj)
                                  if False else kj,
                                  num_segments=S,
                                  indices_are_sorted=True)
        return seg[0, 0] + seg[-1, -1]
    timeit("take+segsum 2ch [R,128]", cur, audio)

    # 2. the take alone
    def tk(a):
        a2 = jnp.take(a, pj, axis=0)
        return a2[0, 0] + a2[-1, -1]
    timeit("take [R,128]", tk, audio)

    # 3. sorted segsum alone
    def sg(a):
        seg = jax.ops.segment_sum(a, kj, num_segments=S,
                                  indices_are_sorted=True)
        return seg[0, 0] + seg[-1, -1]
    timeit("segsum sorted [R,128]", sg, audio)

    # 4. unsorted segsum (scatter-add), no take
    def sc(a):
        seg = jax.ops.segment_sum(a, pj % S, num_segments=S)
        return seg[0, 0] + seg[-1, -1]
    timeit("segsum unsorted [R,128]", sc, audio)

    # 5. mono: take+segsum on [R, 64]
    def cur64(a):
        a2 = jnp.take(a, pj, axis=0)
        seg = jax.ops.segment_sum(a2, kj, num_segments=S,
                                  indices_are_sorted=True)
        return seg[0, 0] + seg[-1, -1]
    timeit("take+segsum mono [R,64]", cur64, audio64)

    # 6. f32 limb variant: does TPU move f32 faster than i32?
    def curf(a):
        lo = (a & 0xFFFF).astype(jnp.float32)
        hi = (a >> 16).astype(jnp.float32)
        lo2 = jnp.take(lo, pj, axis=0)
        hi2 = jnp.take(hi, pj, axis=0)
        sl = jax.ops.segment_sum(lo2, kj, num_segments=S,
                                 indices_are_sorted=True)
        sh = jax.ops.segment_sum(hi2, kj, num_segments=S,
                                 indices_are_sorted=True)
        out = (sh.astype(jnp.int32) << 16) + sl.astype(jnp.int32)
        return out[0, 0] + out[-1, -1]
    timeit("take+segsum f32limb [R,128]", curf, audio)

    # 7. materialized transpose [128, R] -> [R, 128]
    def tr(a):
        t = a.T
        t = jax.lax.optimization_barrier(t)
        return t[0, 0] + t[-1, -1]
    timeit("transpose [128,R]->[R,128]", tr, audioT)

    # 8. the params interleave: 16 [R] vectors -> [NB, 16, 128]
    NB = Rtot // 128
    vecs = rng.integers(-100, 100, (16, Rtot), dtype=np.int32)

    def inter(v):
        parts = [v[i].reshape(NB, 128) for i in range(16)]
        p = jnp.stack(parts, axis=1).reshape(NB * 16, 128)
        p = jax.lax.optimization_barrier(p)
        return p[0, 0] + p[-1, -1]
    timeit("param interleave [16,R]->[NB*16,128]", inter, vecs)

    # 9. flat param stack (the proposed kernel layout)
    def flat(v):
        p = v.reshape(16, NB, 128)
        p = jax.lax.optimization_barrier(p + 0)
        return p[0, 0, 0] + p[-1, -1, -1]
    timeit("param flat copy [16,R]", flat, vecs)

    # 10. cumsum-diff segsum: wrap-exact prefix sums + boundary gather
    last = np.zeros(S, np.int64)
    np.maximum.at(last, keys, np.arange(Rtot))
    has = np.zeros(S, bool)
    has[keys] = True
    lastr = np.where(has, last, -1).astype(np.int32)
    lj = upload("last", lastr)

    def cd(a):
        c = jnp.cumsum(a, axis=0)
        g = jnp.take(c, jnp.clip(lj, 0, Rtot - 1), axis=0)
        return g[0, 0] + g[-1, -1]
    timeit("cumsum+boundary-gather [R,128]", cd, audio)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
