"""Per-phase profiler for the TPU device render pipeline.

Measures, at bench conditions (k2trance, configurable superblock
size), the wall time of each pipeline phase per superblock:

  record   - native C++ record pass (main thread)
  build    - program_from_native + blob assembly
  h2d      - threaded blob upload (_threaded_put)
  enqueue  - the jitted/Compiled fn call (async dispatch: how long
             the call itself blocks before returning device futures)
  compute  - block_until_ready on the returned masters (device time
             not hidden behind the enqueue)
  fetch    - threaded d2h of the pre-split master chunks

The sum of phases vs the pipelined steady gap shows how much overlap
the relay actually grants (see DESIGN.md "Measured deployment
envelope").  Usage:

  python tools/profile_device.py [seconds-per-superblock] [n-superblocks]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(sb_seconds=12.0, nsb=6, samplerate=44100):
    nsb = int(nsb)
    import audiality2_tpu as a2
    from audiality2_tpu.engine.device_render import DeviceRenderer
    from audiality2_tpu.tpu import superblock as sbm
    from audiality2_tpu.tpu.superblock import program_from_native

    i = a2.open_engine(samplerate, 4096, 1, batched=False)
    song = i.get(i.load("/root/reference/benchmark/k2trance.a2s"),
                 "Song")
    r = DeviceRenderer(i, channels=1, readback="i16")
    t0 = time.perf_counter()
    warmed = r.wait_device(timeout=900)
    print(f"warmup {time.perf_counter() - t0:.1f}s warmed={warmed}")
    r.timestamp_reset()
    r.start(0, song)
    BUF = (int(sb_seconds * samplerate) // 64) * 64
    total = BUF * nsb
    r._profile(total, BUF)
    mixer = r.mixer

    # wrap _threaded_put / the compiled fn call to time h2d + enqueue
    tl = {}
    orig_put = sbm._threaded_put

    def put_timed(arr, **kw):
        t = time.perf_counter()
        out = orig_put(arr, **kw)
        tl["h2d"] = time.perf_counter() - t
        tl["bytes"] = arr.nbytes
        return out

    sbm._threaded_put = put_timed

    rows = []
    for k in range(nsb):
        t0 = time.perf_counter()
        rec = r.nr.record(BUF)
        t1 = time.perf_counter()
        prog = program_from_native(*rec, [64] * (BUF // 64),
                                   r.atlas_entry, r.master_channels)
        r._tag_prog(prog)
        t2 = time.perf_counter()
        # _dispatch = blob build + h2d (timed inside) + fn enqueue
        handle = mixer.dispatch(prog)
        t3 = time.perf_counter()
        masters = handle[0]
        if not isinstance(masters, (tuple, list)):
            masters = (masters,)
        for m in masters:
            m.block_until_ready()
        t4 = time.perf_counter()
        out = mixer.fetch(handle)
        t5 = time.perf_counter()
        rows.append(dict(record=t1 - t0, build=t2 - t1,
                         h2d=tl.get("h2d", 0.0),
                         dispatch=t3 - t2 - tl.get("h2d", 0.0),
                         compute=t4 - t3, fetch=t5 - t4,
                         total=t5 - t0,
                         mb=tl.get("bytes", 0) / 1e6))
        print({k2: round(v, 3) for k2, v in rows[-1].items()})
    sbm._threaded_put = orig_put

    st = rows[1:] or rows
    agg = {k2: sum(x[k2] for x in st) / len(st) for k2 in st[0]}
    print("steady mean:", {k2: round(v, 3) for k2, v in agg.items()})
    audio_s = BUF / samplerate
    print(f"serial-sum x-realtime: {audio_s / agg['total']:.1f}  "
          f"(compute-only ceiling {audio_s / agg['compute']:.1f}, "
          f"upload {audio_s / max(agg['h2d'], 1e-9):.0f}, "
          f"fetch {audio_s / max(agg['fetch'], 1e-9):.0f})")
    r.close()


if __name__ == "__main__":
    a = [float(x) for x in sys.argv[1:3]]
    main(*(a + [12.0, 6][len(a):]))
