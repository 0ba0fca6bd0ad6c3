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

This is the round-2 replacement for the row-level farm
(audiality2_tpu.farm), which merged row batches of Python batched
engines into one dispatch; the serving path instead gives each
stream the full native-record -> superblock-mixer pipeline.
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
                stagger=True, stagger_timeout=180.0):
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
                           readback=readback)
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
