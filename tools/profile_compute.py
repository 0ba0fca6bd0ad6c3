"""Ablation profiler for the on-device superblock program.

The per-phase profiler (profile_device.py) shows WHERE the pipeline
time goes (record/build/h2d/compute/fetch); this one splits the
`compute` phase itself by recompiling the device program with each
stage family stubbed to identity and measuring the drop:

  full         - the production program
  -expand      - _expand_rows (run expansion + pallas oscillator)
  -stages      - panmix/xinsert vector stages
  -fbd         - fbdelay scans
  -filt        - filter12/dcblock/limiter/waveshaper scans
  -fm          - fm operator-graph scans

Each ablation is a fresh remote compile (~30-70 s on this relay), so
the probe costs a few minutes.  Usage:

  python tools/profile_compute.py [seconds-per-superblock] [n-reps]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(sb_seconds=12.0, reps=3, samplerate=44100):
    reps = int(reps)
    import audiality2_tpu as a2
    from audiality2_tpu.engine.device_render import DeviceRenderer
    from audiality2_tpu.tpu import superblock as sbm
    from audiality2_tpu.tpu.superblock import program_from_native

    i = a2.open_engine(samplerate, 4096, 1, batched=False)
    song = i.get(i.load("/root/reference/benchmark/k2trance.a2s"),
                 "Song")
    r = DeviceRenderer(i, channels=1, readback="i16")
    print("warmed:", r.wait_device(timeout=900))
    r.timestamp_reset()
    r.start(0, song)
    BUF = (int(sb_seconds * samplerate) // 64) * 64
    # profile pass unifies the jit signature, then record 2 steady
    # superblocks to measure with
    r._profile(BUF * 4, BUF)
    mixer = r.mixer
    progs = []
    for _ in range(2):
        rec = r.nr.record(BUF)
        prog = program_from_native(*rec, [64] * (BUF // 64),
                                   r.atlas_entry, r.master_channels)
        r._tag_prog(prog)
        progs.append(prog)

    orig = dict(
        expand=sbm._expand_rows,
        stage=sbm._apply_stage,
        fbd=sbm._apply_fbdelay,
        filt=sbm._apply_filter,
        filtf=sbm._apply_filter_float,
        fm=sbm._apply_fm,
    )
    stubs = dict(
        expand=lambda slots, *a, **k: slots,
        stage=lambda slots, key, arr: slots,
        fbd=lambda slots, sig, arr, ring, pos: (slots, ring),
        filt=lambda slots, kind, sig, arr, st: (slots, st),
        filtf=lambda slots, kind, sig, arr, st: (slots, st),
        fm=lambda slots, sig, arr, st: (slots, st),
    )
    ablations = [
        ("full", ()),
        ("-expand", ("expand",)),
        ("-stages", ("stage",)),
        ("-fbd", ("fbd",)),
        ("-filt", ("filt", "filtf")),
        ("-fm", ("fm",)),
    ]
    audio_s = BUF / samplerate
    results = {}
    for name, keys in ablations:
        for k in keys:
            setattr(sbm, "_apply_" + k if k != "expand"
                    else "_expand_rows", stubs[k])
        # force retrace+recompile under the stubbed graph
        mixer._fns = {}
        try:
            tc0 = time.perf_counter()
            best = 1e9
            for rep in range(reps + 1):
                for prog in progs:
                    t0 = time.perf_counter()
                    h = mixer.dispatch(prog)
                    masters = h[0]
                    if not isinstance(masters, (tuple, list)):
                        masters = (masters,)
                    for m in masters:
                        m.block_until_ready()
                    dt = time.perf_counter() - t0
                    if rep:           # rep 0 = compile + warm
                        best = min(best, dt)
            results[name] = best
            print(f"{name:9s} {best*1000:7.1f} ms/superblock "
                  f"({best/audio_s*1000:.1f} ms/audio-s)  "
                  f"[compile+warm {time.perf_counter()-tc0-best:.1f}s]")
        finally:
            sbm._expand_rows = orig["expand"]
            sbm._apply_stage = orig["stage"]
            sbm._apply_fbdelay = orig["fbd"]
            sbm._apply_filter = orig["filt"]
            sbm._apply_filter_float = orig["filtf"]
            sbm._apply_fm = orig["fm"]
    full = results.get("full", 0.0)
    print("\ncomponent costs (full - ablated):")
    for name, _ in ablations[1:]:
        if name in results:
            d = full - results[name]
            print(f"  {name[1:]:8s} {d*1000:7.1f} ms "
                  f"({d/max(full,1e-9)*100:4.0f}% of compute)")
    r.close()


if __name__ == "__main__":
    a = [float(x) for x in sys.argv[1:3]]
    main(*(a + [12.0, 3][len(a):]))
