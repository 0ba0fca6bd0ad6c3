"""Relay latency budget: predict the device path's steady rate from
its component costs, then reconcile against the measured steady
(VERDICT r4 #3: "poll ms x dispatches + bytes/bandwidth + compute
should PREDICT the observed steady" — otherwise every shortfall can
be blamed on relay weather).

Method: render k2trance through the production pipeline pieces
SERIALLY (no overlap) with each phase timed separately —

  record+build   native C++ record pass + numpy program build (host)
  h2d            threaded blob upload per chained group (bytes timed)
  enqueue        the jitted chain call (async dispatch futures)
  ready          block_until_ready on the group = completion-poll
                 latency + G x true on-chip compute; poll/group =
                 ready - G x compute_true (compute_true from
                 tools/bench_true_compute.py, passed as --compute)
  fetch          threaded d2h of the pre-split master chunks

then run the REAL pipelined render in the same process/weather and
compare its measured steady against

  predicted steady/sb = max(record+build, (h2d+enqueue)/G,
                            ready/G, fetch/sb)        (4-slot overlap)
  predicted serial/sb = sum of all phases / G

Usage: python tools/latency_budget.py [--compute MS_PER_SB]
           [--sb 12] [--groups 5] [--G 4] [--steady-secs 120]
Prints the DESIGN.md budget table and exits nonzero if the pipelined
prediction misses the measurement by more than 25%.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

K2 = "/root/reference/benchmark/k2trance.a2s"


def main(argv):
    compute_ms = None
    sb_seconds, ngroups, G, steady_secs = 12.0, 5, 4, 120.0
    it = iter(argv)
    for a in it:
        if a == "--compute":
            compute_ms = float(next(it))
        elif a == "--sb":
            sb_seconds = float(next(it))
        elif a == "--groups":
            ngroups = int(next(it))
        elif a == "--G":
            G = int(next(it))
        elif a == "--steady-secs":
            steady_secs = float(next(it))
    import audiality2_tpu as a2
    from audiality2_tpu.engine.device_render import DeviceRenderer
    from audiality2_tpu.tpu import superblock as sbm
    from audiality2_tpu.tpu.superblock import program_from_native

    samplerate = 44100
    i = a2.open_engine(samplerate, 4096, 1, batched=False)
    song = i.get(i.load(K2), "Song")
    r = DeviceRenderer(i, channels=1, readback="i16")
    t0 = time.perf_counter()
    warmed = r.wait_device(timeout=900)
    print(f"warmup {time.perf_counter() - t0:.1f}s warmed={warmed}",
          flush=True)
    r.timestamp_reset()
    r.start(0, song)
    BUF = (int(sb_seconds * samplerate) // 64) * 64
    audio_s = BUF / samplerate
    r._profile(BUF * (ngroups * G + 1), BUF)
    mixer = r.mixer

    tl = {"h2d": 0.0, "bytes": 0}
    orig_put = sbm._threaded_put

    def put_timed(arr, **kw):
        t = time.perf_counter()
        out = orig_put(arr, **kw)
        tl["h2d"] += time.perf_counter() - t
        tl["bytes"] += arr.nbytes
        return out

    sbm._threaded_put = put_timed
    rows = []
    try:
        for g in range(ngroups):
            t0 = time.perf_counter()
            progs = []
            for _ in range(G):
                rec = r.nr.record(BUF)
                p = program_from_native(
                    *rec, [64] * (BUF // 64), r.atlas_entry,
                    r.master_channels)
                r._tag_prog(p)
                progs.append(p)
            t1 = time.perf_counter()
            tl["h2d"] = 0.0
            tl["bytes"] = 0
            handles = mixer.dispatch_chain(progs)
            t2 = time.perf_counter()
            for h in handles:
                ms = h[0]
                if not isinstance(ms, (tuple, list)):
                    ms = (ms,)
                for m in ms:
                    m.block_until_ready()
            t3 = time.perf_counter()
            fb = 0
            for h in handles:
                outs = mixer.fetch(h)
                fb += sum(np.asarray(o).nbytes for o in outs)
            t4 = time.perf_counter()
            rows.append(dict(
                recbuild=t1 - t0, h2d=tl["h2d"],
                enqueue=t2 - t1 - tl["h2d"], ready=t3 - t2,
                fetch=t4 - t3, up_mb=tl["bytes"] / 1e6,
                down_mb=fb / 1e6))
            print({k: round(v, 3) for k, v in rows[-1].items()},
                  flush=True)
    finally:
        sbm._threaded_put = orig_put
    r.close()

    med = {k: sorted(x[k] for x in rows)[len(rows) // 2]
           for k in rows[0]}
    if compute_ms is None:
        print("# no --compute given; using the DESIGN ledger value")
        compute_ms = 51.2
    comp_g = G * compute_ms / 1e3
    poll_g = med["ready"] - comp_g
    up_bw = med["up_mb"] / max(med["h2d"], 1e-9)
    pred_serial = (med["recbuild"] + med["h2d"] + med["enqueue"]
                   + med["ready"] + med["fetch"]) / G
    pred_pipe = max(med["recbuild"] / G,
                    (med["h2d"] + med["enqueue"]) / G,
                    med["ready"] / G, med["fetch"] / G)

    # the real pipelined render, same process + weather
    r2 = DeviceRenderer(i, channels=1, readback="i16",
                        bridge_compile=False, chain_dispatch=G,
                        pipeline_depth=8)
    r2.timestamp_reset()
    r2.start(0, song)
    marks = []
    r2.render(int(steady_secs * samplerate), bufsize=BUF,
              sink=lambda bufs, frames: marks.append(
                  time.perf_counter()))
    r2.close()
    q1, q3 = len(marks) // 4, 3 * len(marks) // 4
    meas_sb = (marks[q3] - marks[q1]) / max(q3 - q1, 1)
    meas_x = audio_s / meas_sb

    print()
    print("| term | per group (G=%d) | per superblock | note |"
          % G)
    print("|---|---|---|---|")
    print("| record+build (host) | %.1f ms | %.1f ms | native "
          "record pass + numpy build |"
          % (med["recbuild"] * 1e3, med["recbuild"] * 1e3 / G))
    print("| h2d upload | %.1f ms | %.1f ms | %.1f MB/group at "
          "%.0f MB/s |"
          % (med["h2d"] * 1e3, med["h2d"] * 1e3 / G, med["up_mb"],
             up_bw))
    print("| enqueue | %.1f ms | %.1f ms | async dispatch |"
          % (med["enqueue"] * 1e3, med["enqueue"] * 1e3 / G))
    print("| on-chip compute | %.1f ms | %.1f ms | "
          "bench_true_compute |" % (comp_g * 1e3, compute_ms))
    print("| completion poll | %.1f ms | %.1f ms | ready - "
          "G x compute |" % (poll_g * 1e3, poll_g * 1e3 / G))
    print("| d2h fetch | %.1f ms | %.1f ms | %.2f MB/group |"
          % (med["fetch"] * 1e3, med["fetch"] * 1e3 / G,
             med["down_mb"]))
    print()
    print("predicted serial   : %.1f ms/sb = %.1fx"
          % (pred_serial * 1e3, audio_s / pred_serial))
    print("predicted pipelined: %.1f ms/sb = %.1fx  (binding term: "
          "%s)" % (pred_pipe * 1e3, audio_s / pred_pipe,
                   max((("record+build", med["recbuild"] / G),
                        ("h2d+enqueue",
                         (med["h2d"] + med["enqueue"]) / G),
                        ("poll+compute", med["ready"] / G),
                        ("fetch", med["fetch"] / G)),
                       key=lambda t: t[1])[0]))
    print("measured pipelined : %.1f ms/sb = %.1fx  (%d marks)"
          % (meas_sb * 1e3, meas_x, len(marks)))
    err = abs(pred_pipe - meas_sb) / meas_sb
    print("prediction error   : %.0f%%" % (err * 100))
    return 0 if err <= 0.25 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
