"""On-chip cost attribution for the device superblock program.

Compiles and times the production k2trance superblock under each
A2_COMPUTE_PROBE variant (see tpu/superblock._probes): every variant
removes one component at trace time, XLA DCE strips what only that
component needed, and (full - variant) attributes device time to the
component.  Variants produce WRONG AUDIO — this tool is perf
diagnosis only.

Each variant costs one remote jit compile (seconds through the
relay); superblocks are cycled so the relay's content cache cannot
fake the timings.

Usage: python tools/probe_compute.py [sb_seconds] [song]
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

VARIANTS = [
    "",                    # full program (baseline)
    "noexpand",            # no oscillator expansion at all
    "nokernel",            # expansion without the pallas kernel
    "noscatter",           # expansion without the slot accumulation
    "norungather",         # expansion without the run->row gather
    "noramp",              # expansion without the ramp replay
    "nostages",            # no panmix/copy/ws stages
    "nofbd",               # no fbdelay
    "nofilt",              # no filter/fm scans
    "noexpand,nostages,nofbd,nofilt",   # residual (stash+readback)
]


def main(sb_seconds=12.0, song="k2trance", samplerate=44100):
    import audiality2_tpu as a2
    from audiality2_tpu.engine.device_render import DeviceRenderer
    from audiality2_tpu.tpu.superblock import program_from_native

    i = a2.open_engine(samplerate, 4096, 1, batched=False)
    prog = i.get(i.load(f"/root/reference/benchmark/{song}.a2s"),
                 "Song")
    r = DeviceRenderer(i, channels=1, readback="i16")
    t0 = time.perf_counter()
    r.wait_device(timeout=900)
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)
    r.timestamp_reset()
    r.start(0, prog)
    BUF = (int(sb_seconds * samplerate) // 64) * 64
    NSB = 7
    r._profile(BUF * NSB, BUF)
    mixer = r.mixer
    progs = []
    for _ in range(NSB):
        rec = r.nr.record(BUF)
        p = program_from_native(*rec, [64] * (BUF // 64),
                                r.atlas_entry, r.master_channels)
        r._tag_prog(p)
        progs.append(p)
    audio_s = BUF / samplerate
    base = None
    # The relay's completion poll costs hundreds of ms per
    # SYNCHRONOUS dispatch (the production pipeline amortizes it
    # across its in-flight window) — so timing one dispatch at a
    # time attributes nothing.  Dispatch all measurement superblocks
    # back-to-back and block once: per-superblock time converges to
    # the true (device + upload) cost as the window deepens.
    for var in VARIANTS:
        if var:
            os.environ["A2_COMPUTE_PROBE"] = var
        else:
            os.environ.pop("A2_COMPUTE_PROBE", None)
        mixer._fns.clear()
        tc = time.perf_counter()
        h = mixer.dispatch(progs[0])        # compile + warm
        for m in (h[0] if isinstance(h[0], (list, tuple))
                  else (h[0],)):
            m.block_until_ready()
        tcomp = time.perf_counter() - tc
        t1 = time.perf_counter()
        hs = [mixer.dispatch(p) for p in progs[1:]]
        for h in hs:
            for m in (h[0] if isinstance(h[0], (list, tuple))
                      else (h[0],)):
                m.block_until_ready()
        per = (time.perf_counter() - t1) / (NSB - 1)
        if not var:
            base = per
        delta = "" if base is None or not var else \
            f"  component={1e3 * (base - per):8.1f} ms" \
            f" ({1e3 * (base - per) / audio_s:6.2f} ms/audio-s)"
        print(f"{var or 'FULL':<38} per-sb={per * 1e3:7.1f} ms"
              f" (compile {tcomp:.1f}s){delta}", flush=True)
    os.environ.pop("A2_COMPUTE_PROBE", None)
    print(f"baseline: {base * 1e3:.1f} ms / {audio_s:.1f}"
          f" audio-s = {1e3 * base / audio_s:.2f} ms/audio-s"
          f" (pipelined ceiling {audio_s / base:.0f}x)", flush=True)
    r.close()


if __name__ == "__main__":
    sb = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
    main(sb, sys.argv[2] if len(sys.argv) > 2 else "k2trance")
