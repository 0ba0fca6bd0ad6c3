"""Real-chip exactness check for the device DSP (DESIGN backlog #2).

Renders N seconds of each backlog song through the production
DeviceRenderer on the real TPU and compares bit-for-bit against the
30 s reference goldens.  The same jnp graphs are golden-verified in
interpret mode by the fast tier; this validates the Mosaic/XLA-TPU
compilation of the new device stages (fm scans, dc rows, nomip rows,
in-chain oscillator rows, filter scans).

Usage: python tools/tpu_exactness.py [seconds] [song ...]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

BENCH = "/root/reference/benchmark"
GOLD = "/root/repo/goldens"
SONGS = ["dctest", "fmtest3", "k2intro", "pulsetronic", "k2trance"]


def check(song, secs, bufsize=4096):
    import audiality2_tpu as a2
    from audiality2_tpu.engine.device_render import DeviceRenderer
    i = a2.open_engine(44100, 4096, 1, batched=False)
    prog = i.get(i.load(f"{BENCH}/{song}.a2s"), "Song")
    r = DeviceRenderer(i, channels=1)
    r.timestamp_reset()
    r.start(0, prog)
    out = []
    n = 0
    t0 = time.time()
    while n < int(secs * 44100):
        out.append(r.run(bufsize))
        n += bufsize
    dt = time.time() - t0
    fb = r.fell_back
    r.close()
    mine = np.concatenate(out, axis=1)[0]
    gold = np.fromfile(f"{GOLD}/{song}-30s-44100.raw", np.int32)
    m = min(len(gold), len(mine))
    m -= m % 4096
    ok = bool((mine[:m] == gold[:m]).all())
    nbad = int((mine[:m] != gold[:m]).sum())
    print(f"{song}: exact={ok} fellback={fb} frames={m} "
          f"mismatch={nbad} wall={dt:.1f}s x_rt={secs/dt:.1f}",
          flush=True)
    return ok and not fb


def main():
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    songs = sys.argv[2:] or SONGS
    allok = True
    for s in songs:
        try:
            allok &= check(s, secs)
        except Exception as e:
            print(f"{s}: ERROR {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            allok = False
    print("ALL OK" if allok else "FAILURES", flush=True)


if __name__ == "__main__":
    main()
