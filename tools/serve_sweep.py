"""Serving capacity sweep (VERDICT r4 #4): aggregate multi-stream
throughput vs fleet width K and superblock length, in ONE process
(one kernel warmup, comparable relay weather across points).

Reuses bench.bench_serving for each point — the same fallback-proof
aggregate the driver records (nulled when any stream bridges), so a
point here is directly comparable to BENCH_r*.json's
tpu_serving_aggregate_xrt.

Alongside the aggregate it snapshots the host record-pass rate and
the mixer HBM plan per point, so the saturation analysis can name
the binding resource with numbers (host record CPU vs relay h2d vs
chip compute vs HBM).

Usage: python tools/serve_sweep.py [K ...]      (default 4 6 8)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench


def main(ks):
    rows = []
    for K in ks:
        t0 = time.perf_counter()
        agg = bench.bench_serving(K=K)
        wall = time.perf_counter() - t0
        rows.append((K, agg, wall))
        print(f"K={K}: aggregate={'%.1f' % agg if agg else 'NULL'}"
              f"x  ({wall:.0f}s)", flush=True)
    print()
    print("| K | aggregate x-realtime | per-stream |")
    print("|---|---|---|")
    for K, agg, _ in rows:
        if agg:
            print(f"| {K} | {agg:.1f} | {agg / K:.1f} |")
        else:
            print(f"| {K} | (invalid: fallback/bridge) | — |")


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [4, 6, 8])
