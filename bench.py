"""Benchmark: k2trance offline render x-realtime + TPU voice throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline (BASELINE.md): the C reference renders k2trance at ~57x
realtime on an i9-7940X (benchmark/RESULTS:26).
"""

import json
import sys
import time
import warnings

warnings.filterwarnings("ignore")

import numpy as np

K2TRANCE = "/root/reference/benchmark/k2trance.a2s"
BASELINE_XRT = 57.0


def bench_k2trance(seconds=500.0, samplerate=44100):
    """End-to-end offline render of k2trance (the reference's own
    headline benchmark: 500 s at 44.1 kHz mono) through the native
    runtime — the engine's production render path.  Output is
    bit-exact with the C reference (tests/test_native.py)."""
    import audiality2_tpu as a2
    from audiality2_tpu.native import NativeRenderer
    i = a2.open_engine(samplerate, 4096, 1, batched=False)
    song = i.get(i.load(K2TRANCE), "Song")
    r = NativeRenderer(i, channels=1)
    r.timestamp_reset()
    r.start(0, song)
    total = int(seconds * samplerate)
    t0 = time.perf_counter()
    n = 0
    # 64k-frame chunks: the engine's fragment loop is identical
    # (bit-exact at any multiple of 64); this just keeps the python
    # driver loop out of the measurement
    while n < total:
        r.run(65536)
        n += 65536
    dt = time.perf_counter() - t0
    r.close()
    return (n / samplerate) / dt


def bench_device_path(seconds=192.0, samplerate=44100):
    """End-to-end k2trance render through the production TPU path:
    native C++ record -> run-compressed upload -> on-device run
    expansion + pallas oscillator + superblock mix -> master-only
    readback, pipelined (engine/device_render.py render()), bit-exact
    with the reference.

    Returns (total_xrt, steady_xrt): total includes the profile pass
    and the song's ONE remote jit compile (3-30 s through this
    deployment's relay, not cacheable across processes); steady is
    the sustained pipelined rate once compiled — the rate of a long
    render or a warm server."""
    try:
        import time as _t
        import audiality2_tpu as a2
        from audiality2_tpu.engine.device_render import DeviceRenderer
        i = a2.open_engine(samplerate, 4096, 1, batched=False)
        song = i.get(i.load(K2TRANCE), "Song")
        # production readback mode: the 16-bit PCM conversion runs
        # on-device (bit-exact for WAV sinks, -101 dBFS on the int32
        # contract, half the d2h bytes).  bridge_compile off: this
        # metric is the DEVICE-TRUE total (profile + the song's one
        # remote jit compile + pipelined render); the production
        # default bridges the compile through the native path — see
        # tpu_first_song_xrt below for that user-facing number.
        # chain_dispatch=4: four consecutive superblocks per device
        # call (state threads inside the jit) — the relay's
        # per-dispatch completion-poll cost is paid once per chain
        # pipeline_depth 8: the relay's completion-poll latency
        # amortizes across the in-flight window (DESIGN: 389 ms
        # blocking one-at-a-time vs 212 ms/superblock at depth 8)
        r = DeviceRenderer(i, channels=1, readback="i16",
                           bridge_compile=False, chain_dispatch=4,
                           pipeline_depth=8)
        # the once-per-process Mosaic warmup (40-900 s through this
        # deployment's relay, high variance; <1 s on a locally-attached
        # TPU) runs on a background thread — production renders bridge through the
        # native path meanwhile; here we wait so the measured numbers
        # are the device path's own.  warm_s is the ACTUAL elapsed
        # warmup (None while it is still pending), never the timeout
        # constant — BENCH_r04 recorded "900.0" for what was a
        # timeout, not a measurement.
        warmed = r.wait_device(timeout=900)
        warm_s = DeviceRenderer._warm_elapsed
        r.timestamp_reset()
        r.start(0, song)
        # ~12 s superblocks: the steady chain is per-superblock
        # compute + fixed relay latency/readback; bigger superblocks
        # amortize the fixed part (same-weather sweep: 4 s -> 16.1x,
        # 8 s -> 16.7x, 12 s -> 23.0x)
        BUF = 8268 * 64
        total = int(seconds * samplerate)
        marks = []

        def sink(bufs, frames):
            marks.append(_t.perf_counter())

        t0 = _t.perf_counter()
        r.render(total, bufsize=BUF, sink=sink)
        wall = _t.perf_counter() - t0
        bridged = r.bridged_frames
        r.close()
        if r.fell_back or not warmed or bridged or len(marks) < 8:
            print("# device path attempt invalid: fell_back=%s "
                  "warmed=%s bridged=%d marks=%d"
                  % (r.fell_back, warmed, bridged, len(marks)),
                  file=sys.stderr)
            return None, None, warm_s
        # steady = frames/wall over the middle half of the emission
        # timeline — robust to the BURSTY completion pattern of
        # chained dispatch (a chain's superblocks all become ready
        # together, so median inter-chunk gaps lie)
        q1, q3 = len(marks) // 4, 3 * len(marks) // 4
        steady_xrt = ((q3 - q1) * BUF / samplerate) \
            / (marks[q3] - marks[q1])
        return (total / samplerate) / wall, steady_xrt, warm_s
    except Exception as e:
        print(f"# device path bench failed: {e}", file=sys.stderr)
        return None, None, None


def bench_first_song(seconds=192.0, samplerate=44100):
    """The user-facing cold-start number: a first song rendered with
    the production bridge_compile default — the song's one remote jit
    compile runs on a background thread while the render bridges
    through the bit-exact native path, so the first render never
    waits on the relay's 30-60 s compile service.  (The per-process
    kernel warmup is assumed done, as for any warm server.)"""
    try:
        import time as _t
        import audiality2_tpu as a2
        from audiality2_tpu.engine.device_render import DeviceRenderer
        i = a2.open_engine(samplerate, 4096, 1, batched=False)
        song = i.get(i.load(K2TRANCE), "Song")
        r = DeviceRenderer(i, channels=1, readback="i16",
                           chain_dispatch=4, pipeline_depth=8)
        if not r.wait_device(timeout=900):
            return None
        r.timestamp_reset()
        r.start(0, song)
        total = int(seconds * samplerate)
        t0 = _t.perf_counter()
        r.render(total, bufsize=8268 * 64)
        wall = _t.perf_counter() - t0
        r.close()
        if r.fell_back:
            return None
        return seconds / wall
    except Exception as e:
        print(f"# first-song bench failed: {e}", file=sys.stderr)
        return None


def bench_serving(K=4, seconds=96.0, samplerate=44100):
    """Aggregate multi-stream serving throughput: K songs through
    the time-division-multiplexed scheduler
    (serve.render_multiplexed): one shared mixer = ONE jit compile
    for the whole fleet, one upload/compute/readback in flight —
    the right shape for a link that serializes everything (this
    relay, and gRPC attachments generally).  Returns the aggregate
    x-realtime over the steady half of the run."""
    try:
        import time as _t
        import audiality2_tpu as a2
        from audiality2_tpu.engine.device_render import DeviceRenderer
        from audiality2_tpu.serve import (StreamJob,
                                          render_multiplexed)
        songs = ["k2trance", "k2loader", "k2intro", "pulsetronic",
                 "k2epilogue", "dctest"]
        # ensure the per-process kernel warmup is done so streams
        # don't bridge natively
        i0 = a2.open_engine(samplerate, 4096, 1, batched=False)
        rw = DeviceRenderer(i0, channels=1)
        warmed = rw.wait_device(timeout=900)
        rw.close()
        if not warmed:
            return None
        frames = int(seconds * samplerate)
        events = []
        jobs = []
        for k in range(K):
            i = a2.open_engine(samplerate, 4096, 1, batched=False)
            prog = i.get(i.load("/root/reference/benchmark/%s.a2s"
                                % songs[k % len(songs)]), "Song")

            def sink(bufs, n, _k=k):
                events.append((_t.perf_counter(), n))
            jobs.append(StreamJob(i, prog, frames, channels=1,
                                  sink=sink))
        # batch=K: all K streams' superblocks dispatch as ONE chained
        # device call per rotation (serve.render_multiplexed batch
        # mode) — per-dispatch poll cost divides by K.  12 s
        # superblocks (the solo bench's sweet spot) + a 2-batch
        # in-flight window
        render_multiplexed(jobs, bufsize=8268 * 64, readback="i16",
                           batch=K, pipeline_depth=2 * K)
        if any(j.error is not None for j in jobs) or not events:
            return None
        # fallback-proofing: a stream that bridged mid-flight renders
        # on the host CPU, so counting its frames would inflate the
        # "TPU aggregate" with CPU throughput — the metric is NULLED
        # when any stream fell back or bridged any frames, rather
        # than reported with a stderr footnote the artifact can't see
        fell = sum(bool(j.renderer.fell_back) for j in jobs)
        bridged = sum(int(getattr(j.renderer, "bridged_frames", 0))
                      for j in jobs)
        if fell or bridged:
            print("# serving attempt invalid: %d fallbacks, %d "
                  "bridged frames" % (fell, bridged), file=sys.stderr)
            return None
        t0 = min(t for t, _ in events)
        t1 = max(t for t, _ in events)
        if t1 - t0 < 1.0:
            return None
        mid = t0 + (t1 - t0) * 0.5
        fr = sum(n for t, n in events if t >= mid)
        return (fr / samplerate) / (t1 - mid)
    except Exception as e:
        print(f"# serving bench failed: {e}", file=sys.stderr)
        return None


def bench_osc_kernel(R=16384, samplerate=44100, quality=0):
    """Pallas oscillator kernel ceiling: exact-integer wtosc
    voice-samples/s at the worst-case pass count (mip-0 tables).
    quality 0 = HIFI 2x Hermite (4 pair lookups/sample); quality 2 =
    LOFI single lerp (1 lookup/sample) — the production low-latency
    tier, ~4x fewer lane shuffles on the gather-bound kernel.
    A kernel metric, not engine throughput."""
    try:
        import time as _t
        import jax.numpy as jnp
        from audiality2_tpu.engine.state import open_engine
        from audiality2_tpu.tpu import osc_kernel as OK

        i = open_engine(samplerate, 1024, 1)
        pa = OK.PairAtlas()
        w = i.get_wave(i.get(0, "saw"))
        pa.add_wave("saw", w)
        pa.finalize()
        dev = jnp.asarray(pa.data)
        rng = np.random.default_rng(0)
        tb, npz, off = pa.lookup("saw", 0)
        batch = OK.OscBatch(pa)
        size = w.size[0]
        for _ in range(R):
            batch.add(tb, npz, off, int(rng.integers(0, size << 24)),
                      int(rng.integers(1 << 20, 2 << 24)),
                      int(rng.integers(0, 1 << 26)), 0)
        calls = batch.build()
        import jax
        # all R rows land in one pass class here (one wave, mip 0)
        cls, t, p, _ = max(calls, key=lambda c: c[1].shape[0])
        tj, pj = jnp.asarray(t), jnp.asarray(p)

        # measurement honesty through this relay (round 4): execution
        # is LAZY — block_until_ready can return before the program
        # runs, and independent dispatches may not all execute before
        # a block on the last one.  The kernel therefore runs as a
        # CHAIN of data-dependent evaluations inside ONE jit call
        # (each rep's amp params are perturbed by a value derived
        # from the previous rep's output, so nothing can be elided or
        # reordered), and the result is forced with a value readback.
        REPS = 10

        def run(t_, p_, s_):
            rowk = jnp.arange(p_.shape[0], dtype=jnp.int32) \
                % OK.NPARAM
            acc = jnp.int32(s_)
            for k in range(REPS):
                pk = jnp.where((rowk == OK.P_AMP0)[:, None],
                               p_ + acc + k, p_)
                o = OK._osc_call(cls, t_, pk, dev, quality=quality)
                acc = acc + o[0, 0] + o[-1, -1]
            return acc

        fn = jax.jit(run)
        int(fn(tj, pj, jnp.int32(0)))     # compile + warm (forced)
        # best of 3 groups: shared-host relay noise is +-15%, and a
        # single slow group under-reports the kernel by ~2x
        best = None
        for grp in range(3):
            t0 = _t.perf_counter()
            int(fn(tj, pj, jnp.int32(grp + 1)))
            dt = (_t.perf_counter() - t0) / REPS
            best = dt if best is None else min(best, dt)
        return R * 64 / best
    except Exception as e:
        print(f"# osc kernel bench failed: {e}", file=sys.stderr)
        return None


def _relay_alive(timeout=90.0):
    """Bounded TPU-backend health probe: the relay sometimes goes
    fully DOWN and backend init then HANGS (not errors), which would
    stall the device benches for their full wait_device windows."""
    import threading
    ok = []

    def probe():
        try:
            import jax
            ok.append(jax.devices()[0].platform in ("tpu", "axon"))
        except Exception:
            ok.append(False)
    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout)
    return bool(ok and ok[0])


def main():
    tpu_up = _relay_alive()
    if not tpu_up:
        print("# TPU relay unavailable: native benches only",
              file=sys.stderr)
    # start the once-per-process TPU kernel warmup now so it overlaps
    # the native benchmarks below
    try:
        from audiality2_tpu.engine.device_render import DeviceRenderer
        if tpu_up:
            DeviceRenderer._ensure_warm()
    except Exception:
        pass
    # best of two runs: the shared cloud host shows ~15% run-to-run
    # variance; peak throughput is the stable, comparable number
    xrt = max(bench_k2trance(), bench_k2trance())
    if tpu_up:
        dev_total, dev_steady, warm_s = bench_device_path()
        first_song = bench_first_song()
        serving = bench_serving()
        # the steady number is the round's headline device metric and
        # must be structurally incapable of getting lost to bench
        # ordering (BENCH_r04: the first attempt ate the full warmup
        # timeout while the NEXT bench in the same process warmed
        # fine and rendered).  If any earlier device bench ran — the
        # process is warm by now — re-attempt with a shorter render
        # until a valid attempt lands (bounded retries).
        for attempt in range(2):
            if dev_steady is not None:
                break
            print("# retrying device-path steady (attempt %d, "
                  "process warm)" % (attempt + 2), file=sys.stderr)
            dev_total, dev_steady, w2 = bench_device_path(
                seconds=96.0)
            warm_s = warm_s if warm_s is not None else w2
        if serving is None:
            print("# retrying serving bench", file=sys.stderr)
            serving = bench_serving(seconds=48.0)
        osc = bench_osc_kernel()
        osc_lofi = bench_osc_kernel(quality=2)
    else:
        dev_total = dev_steady = warm_s = serving = None
        first_song = osc = osc_lofi = None
    result = {
        "metric": "k2trance_offline_render",
        "value": round(xrt, 3),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / BASELINE_XRT, 4),
    }
    # Production TPU path (native record -> device superblock mixer,
    # bit-exact): total includes one-time jit compiles; steady is the
    # warm sustained rate.  See DESIGN.md for the measured transfer/
    # dispatch ceiling of this deployment's TPU tunnel.
    if dev_total is not None:
        result["tpu_device_path_xrt"] = round(dev_total, 2)
        result["tpu_device_path_steady_xrt"] = round(dev_steady, 2)
    elif tpu_up:
        # the absence of the steady field is itself a finding —
        # record it explicitly instead of silently dropping it
        result["tpu_device_path_steady_xrt"] = None
    if warm_s is not None:
        result["tpu_kernel_warmup_s"] = round(warm_s, 1)
    elif tpu_up:
        result["tpu_kernel_warmup_timed_out"] = True
    if first_song is not None:
        result["tpu_first_song_xrt"] = round(first_song, 2)
    if serving is not None:
        result["tpu_serving_aggregate_xrt"] = round(serving, 2)
    if osc is not None:
        result["tpu_osc_kernel_msamples_s"] = int(osc / 1e6)
    if osc_lofi is not None:
        result["tpu_osc_kernel_lofi_msamples_s"] = int(osc_lofi / 1e6)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
