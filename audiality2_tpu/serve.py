"""Multi-stream serving: render many songs concurrently on one chip.

The TPU-native serving mode for the superblock device path
(engine/device_render.py): K independent streams — different songs,
scores, or listeners — each with its own engine, DeviceRenderer and
jit signature, rendered concurrently so the chip, the host control
plane and the transfers all stay busy.  The per-process oscillator
kernel warmup is shared; streams bridge through the bit-exact native
path until it finishes, so a server starts producing audio
immediately.

Through this deployment's TPU relay, concurrent transfers from
multiple streams are unreliable (see DESIGN.md fleet findings), so
relay-facing work is serialized by default with a shared transfer
lock — device compute still overlaps every stream's host record.
On a locally-attached TPU, pass serialize_transfers=False.

This replaced the round-1 row-level voice farm (which merged row
batches of Python batched engines into one dispatch); the serving
path instead gives each stream the full native-record -> superblock-
mixer pipeline.
"""

import threading

import numpy as np

from .engine.device_render import DeviceRenderer


class StreamJob:
    """One render job: `program` (handle from interface.get) started
    with `args` on a fresh root voice of `interface`, rendered for
    `frames` frames.  `sink(bufs, frames)` streams audio; without a
    sink the job's output is returned as [channels][frames] int32."""

    def __init__(self, interface, program, frames, args=(),
                 channels=None, sink=None):
        self.interface = interface
        self.program = program
        self.frames = frames
        self.args = tuple(args)
        self.channels = channels
        self.sink = sink
        self.output = None
        self.error = None
        self.renderer = None


def render_many(jobs, bufsize=None, serialize_transfers=True,
                interpret=None, profile=True, readback="exact",
                stagger=True, stagger_timeout=180.0,
                stage_mode="exact"):
    """Renders all jobs concurrently on the device path.  Each job's
    output is bit-exact with a solo render (streams share no mutable
    state beyond the device itself).  Returns the job list with
    .output filled (or .error set; the first error is re-raised).
    readback="i16" halves each stream's d2h bytes (see
    DeviceMixer.readback) — lossless for 16-bit PCM sinks.

    stagger=True starts stream k+1 only once stream k has COMPILED
    its jit signature (or fell back / timed out): this deployment's
    relay compile service stalls for minutes under concurrent
    compiles (DESIGN.md fleet findings), and every stream needs
    exactly one compile thanks to the profiled single-signature
    render — staggering turns the stall into a short ramp-up."""
    lock = threading.Lock() if serialize_transfers else None
    for j in jobs:
        r = DeviceRenderer(j.interface, channels=j.channels,
                           interpret=interpret, transfer_lock=lock,
                           readback=readback, stage_mode=stage_mode)
        r.timestamp_reset()
        r.start(0, j.program, *j.args)
        j.renderer = r

    done = []

    def go(j):
        try:
            j.output = j.renderer.render(
                j.frames, bufsize=bufsize, sink=j.sink,
                profile=profile)
        except BaseException as e:
            j.error = e
        finally:
            done.append(j)
            j.renderer.close()

    threads = [threading.Thread(target=go, args=(j,)) for j in jobs]
    import time as _t
    for t, j in zip(threads, jobs):
        t.start()
        if not stagger:
            continue
        deadline = _t.monotonic() + stagger_timeout
        while _t.monotonic() < deadline and j not in done \
                and not j.renderer.mixer._fns \
                and not j.renderer.fell_back:
            _t.sleep(0.25)
    for t in threads:
        t.join()
    for j in jobs:
        if j.error is not None:
            raise j.error
    return jobs


class _SharedCore:
    """Atlas owner for a fleet-shared DeviceMixer."""

    def __init__(self):
        from .tpu.osc_kernel import PairAtlas
        self._pair_atlas = PairAtlas()


class A2HbmBudgetError(RuntimeError):
    """The fleet's device-memory plan exceeds the HBM budget."""


def fleet_hbm_plan(mixer, progs, pipeline_depth=3,
                   hbm_budget=14 * (1 << 30)):
    """Conservative HBM plan for a fleet sharing one DeviceMixer:
    per-stream persistent state (fbdelay rings, filter/fm state) is
    resident for EVERY stream simultaneously, while transient
    working sets exist only for the <= pipeline_depth+1 superblocks
    in flight.  The default budget leaves ~2 GB of a v5e's 16 GB for
    XLA scratch/fragmentation.  Returns the plan dict; raises
    A2HbmBudgetError when it does not fit."""
    persistent = execb = flight = 0
    for p in progs:
        b = mixer.device_bytes(p)
        persistent += b["persistent"]
        # expansion intermediates live only while a program EXECUTES
        # (one at a time; x2 covers enqueue/execute overlap), while
        # every in-flight superblock holds its input blob + master
        execb = max(execb, b.get("exec", b["working"]))
        flight = max(flight,
                     b.get("blob", 0) + b.get("master", 0))
        atlas = b["atlas"]
    total = persistent + 2 * execb \
        + (pipeline_depth + 1) * flight + atlas
    plan = {"streams": len(progs), "persistent": persistent,
            "exec_per_dispatch": execb,
            "flight_per_superblock": flight, "atlas": atlas,
            "inflight": pipeline_depth + 1, "total": total,
            "budget": hbm_budget}
    if total > hbm_budget:
        raise A2HbmBudgetError(
            "fleet HBM plan %.2f GB exceeds budget %.2f GB "
            "(%d streams: %.2f GB persistent + 2 x %.2f GB "
            "executing + %d x %.2f GB in flight + %.2f GB atlas)"
            % (total / 2**30, hbm_budget / 2**30, len(progs),
               persistent / 2**30, execb / 2**30,
               pipeline_depth + 1, flight / 2**30,
               atlas / 2**30))
    return plan


def render_multiplexed(jobs, bufsize=None, readback="exact",
                       interpret=None, profile=True,
                       stage_mode="exact", pipeline_depth=3,
                       hbm_budget=14 * (1 << 30), batch=1):
    """Time-division-multiplexed serving: ONE scheduler drives all
    streams through ONE shared DeviceMixer, rotating per superblock —
    record stream A's next superblock while the chip computes B's and
    C's readback is in flight.

    This is the serving mode for deployments where the TPU link
    serializes everything anyway (this relay; also typical gRPC
    attachments): thread-concurrent streams (render_many) just fight
    over the link and the GIL, while the multiplexer keeps exactly
    one upload, one compute and one readback in flight and reaches
    the solo pipeline's throughput as fleet AGGREGATE.  The shared
    mixer unions every stream's shapes, so the whole fleet costs ONE
    jit compile; per-stream device state (fbdelay rings, filter
    state) and atlas entries are namespaced.

    Per-stream output is bit-exact with a solo render; a stream whose
    record/dispatch/fetch fails is bridged to the native path at its
    emitted frontier, sample-exactly, without disturbing the others.

    batch > 1 groups streams into fixed batches whose superblocks
    dispatch as ONE chained device call (DeviceMixer.dispatch_many):
    the link's per-dispatch completion-poll cost is paid once per
    batch instead of once per stream-superblock — the lever that
    makes K streams multiply aggregate throughput through a
    high-latency link.  Each group's chain is AOT-precompiled after
    profiling; when a group's members drain unevenly (different
    stream lengths, or a member bridges natively), the leftover
    members dispatch individually rather than compiling new chain
    shapes mid-window.  A failed batched dispatch bridges every
    stream of the group sample-exactly, like a solo dispatch fault.
    """
    from .tpu.superblock import DeviceMixer, program_from_native

    core = _SharedCore()
    mixer = DeviceMixer(core, interpret=interpret, readback=readback,
                        stage_mode=stage_mode)
    if bufsize is None:
        bufsize = 1376 * 64
    bufsize -= bufsize % 64 or 0

    class _S:
        def __init__(self, j):
            self.j = j
            self.r = DeviceRenderer(j.interface, channels=j.channels,
                                    mixer=mixer)
            self.r.timestamp_reset()
            self.r.start(0, j.program, *j.args)
            j.renderer = self.r
            self.recorded = 0
            self.emitted = 0
            self.chunks = [] if j.sink is None else None
            self.native = False

        def emit(self, bufs):
            frames = len(bufs[0])
            keep = min(frames, self.j.frames - self.emitted)
            if keep <= 0:
                return
            if keep < frames:
                bufs = [b[:keep] for b in bufs]
            self.emitted += keep
            if self.j.sink is not None:
                self.j.sink(bufs, keep)
            else:
                self.chunks.append(np.stack(bufs))

        def bridge(self, why):
            """Sample-exact native continuation from the emitted
            frontier (drops this stream's in-flight superblocks)."""
            import sys
            print("a2 serve: stream bridging natively: %r" % (why,),
                  file=sys.stderr)
            self.native = True
            self.r._fallback(self.emitted, 0)
            n = self.emitted
            while n < self.j.frames:
                frames = min(bufsize, self.j.frames - n)
                self.emit(list(self.r.nr.run(frames)))
                n += frames
            self.recorded = self.j.frames

        def finish(self):
            if self.j.sink is None and self.chunks:
                self.j.output = np.concatenate(self.chunks, axis=1)

    streams = [_S(j) for j in jobs]
    # one kernel warmup for the fleet
    streams[0].r.wait_device()
    if profile:
        for s in streams:
            s.r._profile(s.j.frames, bufsize)
        # the whole fleet has profiled: freeze the packed dispatch
        # format over the union of every stream's recorded values
        # (33% smaller uploads on the bandwidth-bound relay; a
        # post-freeze stream that records novel values bridges
        # natively via the encode-time verify)
        mixer.finalize_format()
        # compile every stream's signature up front (shape skeletons
        # only — no data moves): through this deployment's relay a
        # fresh signature costs 30-65 s of remote compile, which must
        # never land inside the serving window.  Streams with equal
        # shapes share one compile.
        progs = [getattr(s.r, "_profiled_prog", None)
                 for s in streams]
        progs = [p for p in progs if p is not None]
        # refuse fleets whose device-resident state cannot fit HBM
        # BEFORE any stream starts (a mid-fleet OOM would take the
        # whole serving window down, not just one stream)
        fleet_hbm_plan(mixer, progs, pipeline_depth=pipeline_depth,
                       hbm_budget=hbm_budget)
        for p in progs:
            try:
                mixer.precompile(p)
            except Exception:
                pass     # first dispatch will compile instead

    # fixed stream groups for batched dispatch (see docstring)
    batch = max(1, int(batch))
    groups = [streams[i:i + batch]
              for i in range(0, len(streams), batch)]
    if profile and batch > 1:
        for g in groups:
            gp = [getattr(s.r, "_profiled_prog", None) for s in g]
            if len(g) > 1 and all(p is not None for p in gp):
                try:
                    mixer.precompile_many(gp)
                except Exception:
                    pass

    # Deep pipeline, the solo render()'s shape with stream rotation:
    # the main thread records+builds stream A's next superblock while
    # a dispatch thread uploads B's, the device holds up to
    # `pipeline_depth` enqueued programs and a fetch thread reads the
    # oldest back.  A fully serial rotation (record -> dispatch ->
    # fetch per superblock) measures ~3x slower aggregate, and a
    # one-deep device window pays the relay's ~200-400 ms
    # completion-poll latency per superblock instead of per window.
    import os
    import threading
    from collections import deque
    depth = max(batch, int(pipeline_depth))
    rot = 0
    rec_out = None           # [(stream, prog), ...] awaiting dispatch
    disp = None              # running dispatch thread
    dres = [None, None, None]    # (group, handles, error)
    inflight = deque()       # (stream, handle) enqueued on device
    # fetch POOL (the solo render()'s shape): the relay's completion
    # poll costs hundreds of ms PER FETCH — one fetcher at a time
    # serializes that per superblock and caps the fleet AGGREGATE the
    # same way it capped solo steady; a few concurrent fetchers
    # overlap the polls.  Per-stream emission order is preserved: the
    # pool is FIFO over the (already stream-ordered) inflight queue
    # and only the oldest entry is ever emitted.
    FPOOL = min(int(os.environ.get("A2_FETCH_POOL", "3")), depth)
    fpool = deque()          # (thread, [stream, out, error])

    def drop_inflight(s2):
        """Discard s2's pipeline slots (it bridged natively)."""
        nonlocal rec_out
        if rec_out is not None:
            rec_out = [e for e in rec_out if e[0] is not s2] or None
        for ent in [e for e in inflight if e[0] is s2]:
            inflight.remove(ent)

    def record_raw(s, slot):
        """Records s's next superblock into slot = [prog, error].
        Thread-safe: the native engine state it touches is all
        per-State (pending-event map and rec_stats are State members)
        and the fleet-shared PairAtlas is mutated under its lock
        (atlas_entry); the a2rt_record call releases the GIL, so a
        group's streams record in parallel on a multi-core host.
        Bridging/bookkeeping stays on the main thread."""
        try:
            rows, stages, stash, nfrag = s.r.nr.record(bufsize)
            prog = program_from_native(
                rows, stages, stash, nfrag, [64] * nfrag,
                s.r.atlas_entry, s.r.master_channels)
            s.r._tag_prog(prog)
            slot[0] = prog
        except BaseException as e:
            slot[1] = e

    # record-pool width: the host record pass is per-stream
    # independent (each stream owns its native engine state — the
    # pending-event map and rec_stats are State members, and the
    # shared PairAtlas is locked), so a group's records run
    # concurrently — the aggregate record ceiling scales with host
    # cores instead of pinning at one core's ~200x.  The width is a
    # real bound: at most RPOOL records run at once (a semaphore,
    # not one-thread-per-stream), so A2_RECORD_POOL=2 on a loaded
    # host means 2.  Width 1 keeps the exact serial path.
    try:
        RPOOL = int(os.environ.get("A2_RECORD_POOL",
                                   str(os.cpu_count() or 1)))
    except ValueError:
        RPOOL = os.cpu_count() or 1
    RPOOL = max(1, RPOOL)
    rec_sem = threading.Semaphore(RPOOL)

    def record_bounded(s, sl):
        with rec_sem:
            record_raw(s, sl)

    def record_group(live):
        """Records every live stream's next superblock; returns the
        [(stream, prog), ...] that succeeded, bridging failures."""
        slots = [[None, None] for _ in live]
        if RPOOL > 1 and len(live) > 1:
            ths = [threading.Thread(target=record_bounded,
                                    args=(s, sl))
                   for s, sl in zip(live, slots)]
            for t in ths:
                t.start()
            for t in ths:
                t.join()
        else:
            for s, sl in zip(live, slots):
                record_raw(s, sl)
        recs = []
        for s, (prog, err) in zip(live, slots):
            if err is not None:
                drop_inflight(s)
                s.bridge(err)
            else:
                s.recorded += bufsize
                recs.append((s, prog))
        return recs

    while True:
        active = [s for s in streams
                  if not s.native and s.recorded < s.j.frames]
        if not active and rec_out is None and disp is None \
                and not inflight and not fpool:
            break
        blocked = False      # did this iteration do blocking work
        if active and rec_out is None:
            # record the next group's superblocks (whole-group
            # batches dispatch chained; partial groups — uneven
            # stream lengths or bridged members — go one by one)
            for _ in range(len(groups)):
                g = groups[rot % len(groups)]
                rot += 1
                live = [s for s in g if s in active]
                if live:
                    break
            recs = record_group(live)
            if recs:
                rec_out = recs
                blocked = True
        if disp is not None:
            disp.join()
            disp = None
            blocked = True
            grp, hs, err = dres
            if err is not None:
                for s2, _ in grp:
                    if not s2.native:
                        drop_inflight(s2)
                        s2.bridge(err)
            else:
                for (s2, _), h in zip(grp, hs):
                    if not s2.native:
                        inflight.append((s2, h))
        if rec_out is not None:
            grp = rec_out
            rec_out = None
            whole = len(grp) == batch

            def put(grp=grp, whole=whole):
                dres[0], dres[1], dres[2] = grp, None, None
                try:
                    if whole and len(grp) > 1:
                        dres[1] = mixer.dispatch_many(
                            [p for _, p in grp])
                    else:
                        dres[1] = [mixer.dispatch(p)
                                   for _, p in grp]
                except BaseException as e:
                    dres[2] = e
            disp = threading.Thread(target=put)
            disp.start()
        if fpool and (not fpool[0][0].is_alive()
                      or len(inflight) + len(fpool) >= depth
                      or not blocked):
            th, slot = fpool.popleft()
            th.join()
            s2, out, err = slot
            if err is not None:
                if not s2.native:
                    drop_inflight(s2)
                    s2.bridge(err)
            elif not s2.native:
                s2.emit(out)
        while len(fpool) < FPOOL and inflight:
            s2, h = inflight.popleft()
            slot = [s2, None, None]

            def get(h=h, slot=slot):
                try:
                    slot[1] = mixer.fetch(h)
                except BaseException as e:
                    slot[2] = e
            th = threading.Thread(target=get)
            th.start()
            fpool.append((th, slot))
    for s in streams:
        s.finish()
    return jobs
