"""DeviceRenderer: native record -> TPU superblock mixer.

The production offline render path: the C++ runtime runs the whole
control plane (VM, events, voice tree, rampers, pitch — bit-exact
with the reference) in record mode, emitting oscillator rows, bus
stage entries, and stash patches (native/a2rt_record.inc); the TPU
evaluates the superblock (tpu/superblock.py DeviceMixer) and only the
master audio returns to the host.

Offline rendering has no latency bound, so superblocks are seconds
long, amortizing dispatch overhead; the device dispatch is
asynchronous, letting the host record superblock N+1 while the chip
renders N (double-buffered pipeline).

If the song uses units the device program can't express, the record
call reports it and the renderer transparently restarts on the pure
native CPU path (the record pass has already advanced engine state,
so a fresh native state is built — cheap, it's one compile-free
object upload).
"""

import os

import numpy as np

from ..native import NativeRenderer
from ..tpu.osc_kernel import PairAtlas


class DeviceRenderer:
    """Drives a NativeRenderer in record mode and mixes on the TPU.

    Drop-in replacement for NativeRenderer's offline rendering API
    (timestamp_reset / start / play / send / run / close).

    The FIRST Mosaic compile of the oscillator kernel in a process is
    extremely slow through this deployment's TPU relay (40-400 s,
    content-cache-cold; every later pallas compile is <1 s), so a
    background thread warms it once per process and renders bridge
    through the bit-exact native path until the device is ready —
    a render never stalls waiting for the compiler."""

    import threading as _threading
    _warm_lock = _threading.Lock()
    _warm_thread = None
    _warm_done = _threading.Event()
    _warm_t0 = None        # perf_counter at warmup start
    _warm_elapsed = None   # actual warmup duration (s), once done

    @classmethod
    def _ensure_warm(cls):
        with cls._warm_lock:
            if cls._warm_thread is not None:
                return
            import threading
            import atexit
            import time as _time
            cls._warm_t0 = _time.perf_counter()
            # tearing the process down while the compile thread is
            # inside the PJRT client aborts (C++ exception in a dying
            # thread); wait for it at exit — bounded, so a hung remote
            # compiler can delay exit but not deadlock it
            atexit.register(lambda: cls._warm_done.wait(600))

            def go():
                try:
                    import jax
                    import jax.numpy as jnp
                    from ..tpu import osc_kernel as OK
                    atlas = jnp.zeros((64, 128), jnp.int32)
                    tb = jnp.zeros(8, jnp.int32)
                    par = jnp.zeros((OK.NPARAM, 8 * OK.RPB), jnp.int32)
                    jax.jit(lambda t, p: OK._osc_call(1, t, p, atlas)) \
                        (tb, par).block_until_ready()
                except BaseException:
                    pass       # device unusable -> renders stay native
                finally:
                    import time as _time
                    cls._warm_elapsed = (_time.perf_counter()
                                         - cls._warm_t0)
                    cls._warm_done.set()
            cls._warm_thread = threading.Thread(target=go, daemon=True)
            cls._warm_thread.start()

    def _device_ready(self):
        if self.mixer.interpret:
            return True
        DeviceRenderer._ensure_warm()
        return DeviceRenderer._warm_done.is_set()

    def wait_device(self, timeout=None):
        """Blocks until the per-process kernel warmup is done (True),
        or the timeout expires (False)."""
        if self.mixer.interpret:
            return True
        DeviceRenderer._ensure_warm()
        return DeviceRenderer._warm_done.wait(timeout)

    _NS_COUNTER = [0]

    def __init__(self, interface, channels=None, interpret=None,
                 transfer_lock=None, readback="exact", mixer=None,
                 stage_mode="exact", pipeline_depth=3,
                 bridge_compile=True, chain_dispatch=1):
        from ..tpu.superblock import DeviceMixer
        self.i = interface
        self.nr = NativeRenderer(interface, channels=channels)
        self.samplerate = self.nr.samplerate
        self.master_channels = self.nr.master_channels
        quality = {"hifi": 0, "normal": 1, "lofi": 2}[
            getattr(interface.state.config, "quality", "hifi")]
        DeviceRenderer._NS_COUNTER[0] += 1
        self._ns = DeviceRenderer._NS_COUNTER[0]
        self._atlas_handles = set()
        if mixer is None:
            # own mixer/atlas: wave handles and unit serials are
            # engine-local, no namespacing needed
            self._pair_atlas = PairAtlas()
            self.mixer = DeviceMixer(self, interpret=interpret,
                                     transfer_lock=transfer_lock,
                                     readback=readback,
                                     quality=quality,
                                     stage_mode=stage_mode)
            self._shared = False
        else:
            # SHARED mixer (serve.render_multiplexed): one jit
            # signature and one device atlas for the whole fleet;
            # atlas keys and device ring state are namespaced per
            # stream
            self.mixer = mixer
            self._pair_atlas = mixer.core._pair_atlas
            self._shared = True
            if mixer.quality != quality:
                raise ValueError(
                    "shared-mixer streams must share one wtosc "
                    "quality (mixer %d, stream %d)"
                    % (mixer.quality, quality))
        self.fell_back = False
        self.bridged_frames = 0  # rendered natively during warmup
        # dispatched-but-unfetched superblocks kept in flight: the
        # relay adds ~200-400 ms of completion-poll latency per
        # blocking fetch, while the device itself finishes a 12 s
        # superblock in ~190 ms — keeping several programs enqueued
        # amortizes the poll latency across the window (measured
        # 389 ms blocking one-at-a-time vs 212 ms/superblock at
        # depth 8 on the same program)
        self.pipeline_depth = max(1, int(pipeline_depth))
        # bridge_compile: a solo render()'s one remote jit compile
        # costs 30-60 s through this deployment's relay (which
        # ignores the persistent compile cache, DESIGN.md) — with
        # this flag the compile runs on a background thread started
        # right after the profile pass (DeviceMixer.precompile, the
        # same AOT path serving uses) while the render bridges
        # through the bit-exact native path, so a user's first song
        # starts producing audio immediately.  Off = wait for the
        # compile inline (bench_device_path measures the device-true
        # total this way).
        self.bridge_compile = bridge_compile
        # chain_dispatch > 1: render() groups this many CONSECUTIVE
        # superblocks per device dispatch (DeviceMixer.dispatch_chain
        # threads ring/filter state inside the jitted call) — the
        # link's per-dispatch completion-poll cost, the dominant
        # steady-state overhead through a congested relay, is paid
        # once per group instead of once per superblock
        self.chain_dispatch = max(1, int(chain_dispatch))
        # chain-shape compile done (render() groups superblocks only
        # after this fires; singles stream meanwhile, so the chain
        # costs a cold render nothing)
        import threading as _t
        self._chain_ready = _t.Event()
        self._song_ready = None  # precompile-done event (render())
        self._calls = []         # replayed on native fallback
        self._pending = None     # (prog, frames) in-flight superblock
        if not self.mixer.interpret:
            DeviceRenderer._ensure_warm()

    # ---- control API (recorded for fallback replay) ----

    def timestamp_reset(self):
        self.nr.timestamp_reset()
        self._calls.append(("timestamp_reset",))

    def timestamp_bump(self, dt):
        self.nr.timestamp_bump(dt)
        self._calls.append(("timestamp_bump", dt))

    def start(self, parent, program, *args):
        self._calls.append(("start", parent, program) + args)
        return self.nr.start(parent, program, *args)

    def play(self, parent, program, *args):
        self._calls.append(("play", parent, program) + args)
        return self.nr.play(parent, program, *args)

    def send(self, voice, ep, *args):
        self._calls.append(("send", voice, ep) + args)
        return self.nr.send(voice, ep, *args)

    def _tag_prog(self, prog):
        """Namespaces per-unit device state ids when sharing a mixer
        across engines (serve.render_multiplexed): unit serial
        counters are engine-local, so fbdelay rings / filter state of
        different streams must not alias.  prog.ns keys the mixer's
        per-stream shape high-water marks: each stream pads to ITS
        OWN profiled sizes (an fm-dense stream's stash volume must
        not inflate every other stream's uploads); streams with equal
        shapes still share one compiled fn."""
        prog.ns = self._ns if self._shared else 0
        if self._shared:
            for fd in prog.fbdelays:
                if not isinstance(fd["unit_id"], tuple):
                    fd["unit_id"] = (self._ns, fd["unit_id"])
            for fl in prog.filters:
                fl["serials"] = [x if isinstance(x, tuple)
                                 else (self._ns, x)
                                 for x in fl["serials"]]
        return prog

    # ---- wave atlas keyed by native wave handle ----

    def atlas_entry(self, handle, mip):
        key = (self._ns, handle) if self._shared else handle
        # the atlas may be fleet-shared (serve.render_multiplexed)
        # and reached from concurrent record threads; hold its lock
        # across the whole add-if-missing so two streams can't race
        # the tbase assignment (reentrant, so the nested add_wave/
        # finalize/lookup acquisitions are free)
        with self._pair_atlas.lock:
            if key not in self._atlas_handles:
                hi = self.i.state.ss.hm.get(handle)
                self._pair_atlas.add_wave(key, hi.data)
                self._atlas_handles.add(key)
                self._pair_atlas.finalize()
            return self._pair_atlas.lookup(key, mip)

    # ---- rendering ----

    def _fallback(self, rendered_frames, frames):
        """Native record hit unsupported content: rebuild a fresh
        native state, replay the control calls, skip what was already
        rendered, and continue on the pure native path."""
        self.fell_back = True
        self.nr.close()
        self.nr = NativeRenderer(self.i, channels=self.master_channels)
        for c in self._calls:
            getattr(self.nr, c[0])(*c[1:])
        skip = rendered_frames
        while skip > 0:
            n = min(skip, 65536)
            self.nr.run(n)
            skip -= n
        self._rendered_pre = rendered_frames

    _rendered = 0

    def run(self, frames):
        """Render `frames` frames; returns (channels, frames) int32."""
        from ..tpu.superblock import program_from_native
        if self.fell_back:
            out = self.nr.run(frames)
            self._rendered += frames
            return out
        self.wait_device()       # run() is the test/debug surface:
        try:                     # block for the warmup, use the chip
            rows, stages, stash, nfrag = self.nr.record(frames)
        except Exception:
            self._fallback(self._rendered, frames)
            out = self.nr.run(frames)
            self._rendered += frames
            return out
        sizes = [64] * (frames // 64)
        if frames % 64:
            sizes.append(frames % 64)
        prog = program_from_native(rows, stages, stash, nfrag, sizes,
                                   self.atlas_entry,
                                   self.master_channels)
        self._tag_prog(prog)
        bufs = self.mixer.run(prog)
        self._rendered += frames
        return np.stack(bufs)

    def _warm_chain(self, prog, C):
        """Compiles the C-superblock chain shape, then lets render()
        start grouping (singles stream until then)."""
        try:
            self.mixer.precompile_chain(prog, C)
        except Exception:
            pass
        self._chain_ready.set()

    def _profile(self, total_frames, bufsize):
        """Record-only dry pass over the whole render on a scratch
        native state: warms the mixer's shape high-water marks and
        unifies the stage structure (DeviceMixer.observe), so the
        real render compiles ONE jit signature instead of one per
        shape crossing — each remote compile costs seconds, so for a
        long song this pass (~4% of render time) pays for itself
        many times over."""
        from ..tpu.superblock import program_from_native
        probe = NativeRenderer(self.i, channels=self.master_channels)
        try:
            for c in self._calls:
                getattr(probe, c[0])(*c[1:])
            n = 0
            while n < total_frames:
                rows, stages, stash, nfrag = probe.record(bufsize)
                prog = program_from_native(
                    rows, stages, stash, nfrag, [64] * nfrag,
                    self.atlas_entry, self.master_channels)
                self._tag_prog(prog)
                self.mixer.observe(prog)
                self._profiled_prog = prog
                n += bufsize
        except Exception:
            return False
        finally:
            probe.close()
        return True

    def render(self, total_frames, bufsize=None, sink=None,
               profile=True):
        """Pipelined offline render: records superblock N+1 on the
        CPU while the device computes N and an IO thread fetches N-1.
        With profile=True (default) a record-only dry pass first
        unifies the jit signature across the whole song (one remote
        compile total).  Every superblock records a full `bufsize`
        (the tail is trimmed) so the signature stays constant.
        Returns [channels][total_frames] int32 (or streams through
        `sink(bufs, frames)` and returns None)."""
        import threading
        from ..tpu.superblock import program_from_native
        if bufsize is None:
            bufsize = min(total_frames, 2752 * 64)
        bufsize -= bufsize % 64 or 0
        do_profile = [profile]   # lazily, at first device use
        chunks = []
        emitted = [0]

        def emit(bufs):
            frames = len(bufs[0])
            keep = min(frames, total_frames - emitted[0])
            if keep <= 0:
                return
            if keep < frames:
                bufs = [b[:keep] for b in bufs]
            emitted[0] += keep
            if sink is not None:
                sink(bufs, keep)
            else:
                chunks.append(np.stack(bufs))

        # deep pipeline, all concurrently busy in steady state:
        #   main thread:     record+build superblock N
        #   dispatch thread: upload superblock N-1 (mixer.dispatch —
        #                    serialized: one in flight, so the mixer's
        #                    ring/signature state stays ordered)
        #   device:          up to `pipeline_depth` enqueued programs
        #                    (the relay's completion poll costs
        #                    ~200-400 ms per blocking wait; a deep
        #                    window pays it once per window, not once
        #                    per superblock)
        #   fetch thread:    read back the oldest handle, emit in
        #                    order; joined only when done, the window
        #                    is full, or the song has drained
        from collections import deque
        C = self.chain_dispatch
        if C <= 1 or self.mixer.interpret:
            # no chain compile to wait for (interpret mode compiles
            # locally per call; tests exercise chains immediately)
            self._chain_ready.set()
        depth = max(self.pipeline_depth, C)
        rec_out = []             # built programs awaiting dispatch
        disp = None              # running dispatch thread
        dres = [None, None]      # dispatch (handles, error)
        inflight = deque()       # dispatched handles awaiting fetch
        # fetch POOL: each entry [thread, [out, err]], oldest first.
        # The relay's completion poll costs hundreds of ms PER FETCH
        # and executes lazily — with one fetcher at a time the poll
        # serializes per superblock and binds the whole steady rate;
        # a few concurrent fetchers overlap the polls (emission stays
        # in order: only the oldest is ever emitted)
        FPOOL = min(int(os.environ.get("A2_FETCH_POOL", "3")),
                    depth)
        fpool = deque()

        def drain_inflight():
            # best-effort in-order fetch of everything the device
            # already has, so a relay fault loses no finished audio
            ok = True
            while fpool:
                th, slot = fpool.popleft()
                th.join()
                if ok and slot[0] is not None:
                    emit(slot[0])
                else:
                    ok = False
            while ok and inflight:
                try:
                    emit(self.mixer.fetch(inflight.popleft()))
                except BaseException:
                    ok = False
            inflight.clear()

        n = 0
        while n < total_frames or rec_out \
                or disp is not None or inflight \
                or fpool:
            blocked = False      # did this iteration do blocking work
            if n < total_frames and not self.fell_back \
                    and self._device_ready() and len(rec_out) < C \
                    and (self._song_ready is None
                         or self._song_ready.is_set()):
                if do_profile[0]:
                    do_profile[0] = False
                    ok = self._profile(total_frames, bufsize)
                    if ok and not self.mixer.interpret \
                            and getattr(self, "_profiled_prog",
                                        None) is not None:
                        if self.bridge_compile:
                            # AOT-compile the song's one signature on
                            # a thread; bridge natively meanwhile
                            ev = threading.Event()
                            self._song_ready = ev
                            prog_p = self._profiled_prog

                            def warm_song():
                                try:
                                    self.mixer.precompile(prog_p)
                                except Exception:
                                    pass
                                finally:
                                    ev.set()
                                self._warm_chain(prog_p, C)
                            threading.Thread(target=warm_song,
                                             daemon=True).start()
                            continue
                        # inline: same AOT compile, before the first
                        # record (no mid-pipeline stall either way).
                        # The chain shape compiles on a background
                        # thread — the render dispatches singles at
                        # full device-true rate until it lands, so
                        # the chain costs a cold render nothing
                        try:
                            self.mixer.precompile(
                                self._profiled_prog)
                        except Exception:
                            pass
                        threading.Thread(
                            target=self._warm_chain,
                            args=(self._profiled_prog, C),
                            daemon=True).start()
                # always a full superblock (stable jit signature);
                # emit() trims the tail past total_frames
                frames = bufsize
                try:
                    rows, stages, stash, nfrag = self.nr.record(frames)
                except Exception:
                    self._fallback(n, min(frames, total_frames - n))
                    rec_out = []
                if not self.fell_back:
                    sizes = [64] * (frames // 64)
                    if frames % 64:
                        sizes.append(frames % 64)
                    prog = program_from_native(
                        rows, stages, stash, nfrag, sizes,
                        self.atlas_entry, self.master_channels)
                    self._tag_prog(prog)
                    rec_out.append(prog)
                    n += frames
                    blocked = True
            elif n < total_frames and not rec_out \
                    and disp is None and not inflight \
                    and not fpool:
                # native bridge: fell back, or the per-process kernel
                # warmup hasn't finished yet (bit-exact either way).
                # Runs only once in-flight superblocks have drained,
                # so emission stays in order across the switch.
                frames = min(bufsize, total_frames - n)
                emit(list(self.nr.run(frames)))
                if not self.fell_back:
                    self.bridged_frames += frames
                n += frames
                blocked = True
            if disp is not None:
                disp.join()
                disp = None
                blocked = True
                if dres[0] is None:
                    # relay fault mid-pipeline: emit whatever the
                    # device already finished, drop the rest and
                    # restart at the emitted frontier on the
                    # bit-exact native path (the serving resilience
                    # contract)
                    drain_inflight()
                    import sys
                    print("a2 device: superblock dispatch failed, "
                          "bridging natively: %r" % (dres[1],),
                          file=sys.stderr)
                    self._fallback(emitted[0],
                                   total_frames - emitted[0])
                    rec_out = []
                    n = emitted[0]
                    continue
                inflight.extend(dres[0])
            if rec_out and (len(rec_out) >= C or n >= total_frames
                            or not self._chain_ready.is_set()):
                grp = rec_out
                rec_out = []

                def put(grp=grp):
                    dres[0] = None
                    dres[1] = None
                    try:
                        if len(grp) >= 2 and len(grp) == C:
                            # full group: ONE chained device call
                            dres[0] = self.mixer.dispatch_chain(grp)
                        else:
                            # partial tail: the single signature is
                            # compiled anyway — avoid a fresh chain
                            # shape for the song's last group
                            dres[0] = [self.mixer.dispatch(p)
                                       for p in grp]
                    except BaseException as e:
                        dres[1] = e
                disp = threading.Thread(target=put)
                disp.start()
            if fpool and (not fpool[0][0].is_alive()
                          or len(inflight) + len(fpool) >= depth
                          or not blocked):
                th, slot = fpool.popleft()
                th.join()
                if slot[0] is None:
                    import sys
                    print("a2 device: superblock fetch failed, "
                          "bridging natively: %r" % (slot[1],),
                          file=sys.stderr)
                    # the failed handle is the OLDEST: drop every
                    # newer in-flight/pooled superblock (emitting any
                    # would leave a gap) and restart natively at the
                    # emitted frontier
                    for th2, _ in fpool:
                        th2.join()
                    fpool.clear()
                    inflight.clear()
                    self._fallback(emitted[0],
                                   total_frames - emitted[0])
                    rec_out = []
                    disp = None
                    n = emitted[0]
                    continue
                emit(slot[0])
            while len(fpool) < FPOOL and inflight:
                h = inflight.popleft()
                slot = [None, None]

                def go(h=h, slot=slot):
                    try:
                        slot[0] = self.mixer.fetch(h)
                    except BaseException as e:
                        slot[1] = e
                th = threading.Thread(target=go)
                th.start()
                fpool.append((th, slot))
        if sink is not None:
            return None
        return np.concatenate(chunks, axis=1)

    @property
    def activevoices(self):
        return self.nr.activevoices

    def close(self):
        self.nr.close()
