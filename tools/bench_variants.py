"""A/B env-variant driver for bench_true_compute.

Runs the FULL chain measurement once per env-variant combination in a
single process (one kernel warmup), printing the TRUE ms/superblock
for each.  Used to pick accumulation strategy / barrier placement on
real-chip data instead of relay-polluted per-dispatch timings.

Usage: python tools/bench_variants.py "VAR=VAL[;VAR=VAL...]" ... \
          [--sb 12] [--N 4] [--song k2trance]
An empty string argument ("") is the baseline (no env overrides).
KV pairs are separated by ";" (NOT ","): probe values are
comma-lists themselves (A2_COMPUTE_PROBE=nokernel,noscatter).
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench_true_compute as btc  # noqa: E402  (tools/ sibling)

VARS = ("A2_ACCUM", "A2_EXPAND_BARRIER", "A2_COMPUTE_PROBE",
        "A2_NO_MONO", "A2_STAGE_FLOAT")


def main(argv):
    sb, N, song = 12.0, 4, "k2trance"
    variants = []
    it = iter(argv)
    for a in it:
        if a == "--sb":
            sb = float(next(it))
        elif a == "--N":
            N = int(next(it))
        elif a == "--song":
            song = next(it)
        else:
            variants.append(a)
    if not variants:
        variants = ["", "A2_ACCUM=scatter"]
    for v in variants:
        for k in VARS:
            os.environ.pop(k, None)
        for kv in filter(None, v.split(";")):
            k, _, val = kv.partition("=")
            os.environ[k] = val
        print(f"=== variant [{v or 'baseline'}] ===", flush=True)
        btc.main(sb, N, song)


if __name__ == "__main__":
    main(sys.argv[1:])
