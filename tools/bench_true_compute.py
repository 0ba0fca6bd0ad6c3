"""TRUE on-chip cost of the production superblock program.

Every per-dispatch measurement through this deployment's relay is
polluted by 20-400 ms of dispatch/completion-poll latency that a
5-deep window does not reliably amortize (tools/bench_gather.py shows
identical gathers measuring 0.03 ms or 24 ms depending on relay
weather).  This tool removes the relay from the measurement entirely:
it jits a CHAIN of N production superblocks inside ONE dispatch
(fbdelay rings and filter state thread iteration-to-iteration, a
1-word blob perturbation defeats CSE) and reports

    true_per_sb = (t_chain(N) - t_chain(1)) / (N - 1)

which is pure device compute — upload, dispatch and poll cost appear
once in both terms and cancel.

With A2_TRUE_PROBES=1 it additionally measures every
A2_COMPUTE_PROBE component-removal variant with the same chain
method, attributing TRUE on-chip cost per component (each variant
costs two remote compiles).

Usage: python tools/bench_true_compute.py [sb_seconds] [N] [song]
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# norungather is excluded: replacing the run gather with a broadcast
# makes the whole program constant-foldable under the chain, so the
# variant measures XLA DCE, not the gather (which bench_gather.py
# shows is ~free anyway)
PROBES = ["noexpand", "nokernel", "noscatter", "nopanmix",
          "noramp", "nostages", "nofbd", "nofilt"]


def main(sb_seconds=12.0, N=4, song="k2trance", samplerate=44100,
         reps=5):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import audiality2_tpu as a2
    from audiality2_tpu.engine.device_render import DeviceRenderer
    from audiality2_tpu.tpu.superblock import (BASE_N, RC_AMP0,
                                               program_from_native,
                                               _blob_layout)

    i = a2.open_engine(samplerate, 4096, 1, batched=False)
    prog = i.get(i.load(f"/root/reference/benchmark/{song}.a2s"),
                 "Song")
    # A2_STAGE_FLOAT=1: measure the float stage tier (the -80 dB
    # budget path) instead of the exact integer stages — the
    # VERDICT r4 #6 production-default A/B
    r = DeviceRenderer(i, channels=1, readback="i16",
                       stage_mode=("float"
                                   if os.environ.get("A2_STAGE_FLOAT")
                                   else "exact"))
    t0 = time.perf_counter()
    r.wait_device(timeout=900)
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)
    r.timestamp_reset()
    r.start(0, prog)
    BUF = (int(sb_seconds * samplerate) // 64) * 64
    audio_s = BUF / samplerate
    r._profile(BUF * 3, BUF)
    rec = r.nr.record(BUF)
    p = program_from_native(*rec, [64] * (BUF // 64),
                            r.atlas_entry, r.master_channels)
    r._tag_prog(p)
    mixer = r.mixer
    mixer._repad(p)
    sig = mixer._signature(p)
    layout, total = _blob_layout(sig)
    # blob index of run 0's RC_AMP0 (harmless perturbation target)
    # blob index of run 0's RC_AMP0 under either layout (packed rmq
    # word 0 is the raw AMP0 stream)
    rm_pos = (layout["rmq"][0] if sig[12]
              else layout["rm"][0] + RC_AMP0)

    # assemble real dispatch inputs once (mirrors _dispatch, but we
    # keep everything as host arrays and upload fresh per rep)
    blob_np, rings, prevs = _assemble(mixer, p, sig, layout, total)
    atlas = mixer._atlas()

    def chain(n):
        fnj = mixer._build_fn(p, sig)

        def f(atlas, blob, rings, prevs):
            acc = jnp.int32(0)
            for it in range(n):
                b2 = blob.at[rm_pos].add(it)
                parts, rings, prevs = fnj(atlas, b2, rings, prevs)
                s = sum(pt.astype(jnp.int32).sum() for pt in parts)
                acc = acc + s
            return acc, rings, prevs
        return jax.jit(f)

    # pre-uploaded, content-distinct blobs: uploads must NOT sit in
    # the timed path (h2d weather through this relay swings 10x
    # minute-to-minute and would not cancel between the two chain
    # lengths); the only per-call overhead left is the dispatch poll,
    # which the interleaved pairing + the (tN-t1)/(N-1) difference
    # suppresses.  Blobs are salted PER VARIANT: the relay result-
    # caches aggressively enough that an input buffer it has seen
    # before can return instantly even under a different program.
    salt = [0]

    def fresh_blobs():
        devblobs = []
        for k in range(2 * reps + 2):
            b = blob_np.copy()
            salt[0] += 1
            b[rm_pos] += salt[0]
            devblobs.append(jnp.asarray(b))
        for b in devblobs:
            b.block_until_ready()
        return devblobs

    def true_per_sb(tag):
        devblobs = fresh_blobs()
        f1, fN = chain(1), chain(N)
        tc = time.perf_counter()
        o = f1(atlas, devblobs[0], rings, prevs)
        o[0].block_until_ready()
        o = fN(atlas, devblobs[1], rings, prevs)
        o[0].block_until_ready()
        print(f"  {tag} compile+warm "
              f"{time.perf_counter() - tc:.1f}s", flush=True)
        t1s, tNs = [], []
        for k in range(reps):
            t0 = time.perf_counter()
            o = f1(atlas, devblobs[2 + 2 * k], rings, prevs)
            o[0].block_until_ready()
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            o = fN(atlas, devblobs[3 + 2 * k], rings, prevs)
            o[0].block_until_ready()
            tNs.append(time.perf_counter() - t0)
        t1 = sorted(t1s)[len(t1s) // 2]
        tN = sorted(tNs)[len(tNs) // 2]
        true_sb = (tN - t1) / (N - 1)
        print(f"  {tag} chain(1) median {t1 * 1e3:.1f} ms  "
              f"chain({N}) median {tN * 1e3:.1f} ms", flush=True)
        print(f"{tag} TRUE: {true_sb * 1e3:.1f} ms/superblock "
              f"= {true_sb * 1e3 / audio_s:.2f} ms/audio-s "
              f"(compute-only ceiling {audio_s / true_sb:.0f}x)",
              flush=True)
        return true_sb

    base = true_per_sb("FULL")
    sel = os.environ.get("A2_TRUE_PROBES", "")
    if sel:
        probes = PROBES if sel == "1" else sel.split(",")
        for var in probes:
            os.environ["A2_COMPUTE_PROBE"] = var
            try:
                t = true_per_sb(var)
                print(f"  => {var} component: "
                      f"{(base - t) * 1e3:7.1f} ms/superblock "
                      f"({(base - t) * 1e3 / audio_s:5.2f} "
                      f"ms/audio-s)", flush=True)
            finally:
                os.environ.pop("A2_COMPUTE_PROBE", None)
    r.close()


def _assemble(mixer, prog, sig, layout, total):
    """Builds (blob, rings, prevs) exactly as DeviceMixer._dispatch
    would, without dispatching."""
    import jax.numpy as jnp
    import numpy as np
    from audiality2_tpu.tpu import superblock as SB

    blob = np.zeros(total, np.int32)

    def put(name, a):
        pos, shape = layout[name]
        a = np.asarray(a)
        blob[pos:pos + a.size] = a.ravel().astype(np.int32,
                                                  copy=False)

    for i2, (_, _, tb) in enumerate(prog.class_blocks):
        put(("tbase", i2), tb)
    if prog.runmat is not None and prog.runmat.size:
        if sig[12]:
            put("rmq", SB._rmq_pack(prog.runmat,
                                    mixer._rmq["tables"]))
            for j, t in enumerate(mixer._rmq["tables"]):
                put(("rmt", j), t)
        else:
            put("rm", prog.runmat)
        Rtot = sum(NB * SB.OK.RPB for _, NB, _ in prog.class_blocks)
        if Rtot and SB._accum_sorted():
            put("rowperm", SB._host_slot_perm(
                prog.runmat, Rtot, prog.ninst * prog.F))
    rmp = getattr(prog, "rampmat", None)
    if rmp is not None and rmp.size and prog.has_ramp:
        if sig[12] and sig[12][1]:
            put("rqr", SB._rqr_pack(rmp, mixer._rmq["rtables"]))
            for j, t in enumerate(mixer._rmq["rtables"]):
                put(("rqt", j), t)
        else:
            put("rmp", rmp)
    if prog.stash_audio is not None and len(prog.stash_audio):
        put("sa", prog.stash_audio)
        put("sas", prog.stash_slot)
    smn = getattr(prog, "stash_mono", None)
    if smn is not None and len(smn):
        put("sm", smn)
        put("sms", prog.stash_mono_slot)
    # per-item tables in the same sorted order as _dispatch
    items = []
    for st in prog.stages:
        items.append(("stage", st["key"], st, ""))
    for fd in prog.fbdelays:
        items.append(("fbd", fd["key"], fd, str(fd["unit_id"])))
    for fl in prog.filters:
        items.append(("filt", fl["key"], fl, ""))
    items.sort(key=lambda t: (t[1], t[3]))
    rings = []
    prevs = []
    fbdpos = []
    perms = []
    for j, (tag, key, ob, _) in enumerate(items):
        if tag == "stage":
            if ob["arr"].shape[0]:
                put(("it", j), ob["arr"])
            if ob["dense"].shape[0]:
                put(("itd", j), ob["dense"])
        else:
            put(("it", j), ob["arr"])
        if tag == "fbd":
            size = SB.FBD_TAIL if bool(ob.get("dense")) \
                else SB._FBD_BUFSIZE
            rings.append(jnp.zeros((2, size), jnp.int32))
            fbdpos.append(0)
        elif tag == "filt":
            K = ob["arr"].shape[1]
            perms.append(np.full(K, -1, np.int32))
            prevs.append(mixer._init_state(ob["kind"], K))
    if fbdpos:
        put("fbdpos", np.asarray(fbdpos, np.int32))
    if perms:
        put("fperm", np.concatenate(perms))
    return blob, rings, prevs


if __name__ == "__main__":
    a = sys.argv[1:]
    main(float(a[0]) if a else 12.0,
         int(a[1]) if len(a) > 1 else 4,
         a[2] if len(a) > 2 else "k2trance")
