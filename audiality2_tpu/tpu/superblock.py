"""Device superblock mixer: whole-buffer rendering on the TPU.

Round 1's batched engine evaluated oscillator ROWS on the device but
shipped every row's audio back to the host and replayed the mix there
— ~1 KB of readback per row made the device path unprofitable (see
VERDICT.md).  This module moves the *entire* mix-down onto the chip:

    rows (pallas osc kernel) ──┐
    noise/gen audio patches ───┼──> per-(bus-instance, fragment) SLOTS
                               │    (segmented scatter-add)
    group chains: panmix / xinsert bypass / fbdelay   (stage ops)
                               │
                           master slots  ──> threaded d2h readback

Only the master audio leaves the device (~176 KB per mono audio
second), instead of per-row audio (~20 MB per audio second).

The compiler consumes the batched engine's recorded op tape
(engine/core.py record_superblock) *without mutating any engine
state*: effect-unit control writes are queued ops, so their rampers
still hold superblock-start state at record end; the compiler
shadow-simulates the queued writes + per-slice prepare()/run() calls
(units/ramper.py semantics = reference include/a2_dsp.h:105-170) to
capture exact per-slice (value, delta) ramps.  If the tape contains
anything the device program can't express, compile() raises
Unsupported and the caller falls back to host replay — bit-exactness
is never at risk.

Bus model: physical scratch buffers are time-multiplexed across
sibling groups (reference core.c:364-395), so slots are keyed by
*unit instance*, not buffer: every fragment, each live group's inline
unit emits a "clear" op which (re)binds its output buffers to the
instance (reference a2_groupdriver wiring, audiality2.c:266-306).
Rows/stashes/chain ops then resolve buffers through the binding.

Exact-order correctness: int32 adds commute (x86 wrap semantics), so
all adds into a slot can happen in one scatter; chain ops run in
(-nestlevel, chain position) stage order, which reproduces the
engine's depth-first evaluation; REPLACE ops are rewritten as
add-of-difference so duplicate slot indices in one scatter stay
well-defined.

fbdelay runs as a lax.scan over its recorded slices with the ring
buffers (reference src/units/fbdelay.c:27, 128k samples) living on
the device between superblocks.
"""

import numpy as np

import jax
# the mixer's panmix/fbdelay math is int64; without the x64 flag JAX
# silently truncates astype(int64) to int32 (found the hard way: the
# native-record path doesn't import tpu/kernels.py, which used to be
# the only place setting this)
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: superblock signatures repeat across
# renders/processes, and each miss costs seconds of remote compile
import os as _os
_cache_dir = _os.environ.get(
    "A2_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.dirname(_os.path.abspath(__file__)))), ".jax_cache"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
import jax.numpy as jnp

from ..constants import A2_MAXFRAG, A2_PROCADD
from ..units.ramper import Ramper
from . import osc_kernel as OK

FRAG = A2_MAXFRAG
# Device fbdelay ring size.  The REFERENCE ring is 2^17 samples
# (fbdelay.c), but ring size is semantically invisible for any tap
# delay < 2^17: position (p - dl) mod SIZE always reads the sample
# written dl frames ago as long as it hasn't been overwritten.  The
# device ring is deliberately larger so a whole superblock's writes
# plus the maximum tap lookback fit WITHOUT wrapping — that lets the
# ld/rd reader taps run vectorized against the final ring outside the
# feedback scan (span <= 2^20 - 2^17 samples = 20.8 s @ 44.1 kHz;
# longer superblocks fall back, guard in the builders).
_FBD_BUFSIZE = 1 << 20
# Dense-path persistent ring state: the reference's own window
# (fbdelay.c FBD_SIZE = 2^17 samples; native a2rt_units.inc
# fbd_process masks every tap by FBD_SIZE-1, so no tap can look back
# farther).  The dense fbdelay keeps only this tail between
# superblocks — 1 MB/instance instead of the legacy ring's 8 MB —
# and rebuilds a linear [tail | superblock] buffer per superblock.
FBD_TAIL = 1 << 17

# int32 zero for dynamic-slice starts: traced span starts are int32,
# and lax requires all start indices to share one dtype (a bare 0
# traces as int64 under the x64 flag)
_Z = np.int32(0)


class Unsupported(Exception):
    """Op tape contains something the device program can't express."""


def _shadow_ramper(r):
    s = Ramper(0)
    s.value, s.target, s.delta, s.timer = r.value, r.target, r.delta, \
        r.timer
    return s


def _pow2(n, lo=1):
    p = lo
    while p < n:
        p <<= 1
    return p


def _quant(n, step):
    """Rounds n up to a multiple of step.  Used for the mixer's
    monotone shape padding: finer than pow2 (which wastes up to 2x
    upload and compute on padding), at the cost of a few more shape
    crossings — which the profiled render absorbs, since its dry
    pass pins the high-water marks before the one jit compile."""
    return ((max(n, 1) + step - 1) // step) * step


class _PanmixShadow:
    def __init__(self, u):
        self.vol = _shadow_ramper(u.vol)
        self.pan = _shadow_ramper(u.pan)


class _FbdelayShadow:
    def __init__(self, u):
        self.samplerate = u.samplerate
        self.fbdelay = u.fbdelay
        self.ldelay = u.ldelay
        self.rdelay = u.rdelay
        self.drygain = u.drygain
        self.fbgain = u.fbgain
        self.lgain = u.lgain
        self.rgain = u.rgain


def _trunc_div_c(a, b):
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


class SuperblockProgram:
    """Compiled device program for one superblock (see compile())."""

    def __init__(self):
        self.F = 0
        self.frag_sizes = None
        self.ninst = 0
        self.master_inst = 0
        self.master_channels = 1
        # oscillator runs (see _build_runs): one record per LEN
        # consecutive linearly-continuing fragments of an oscillator;
        # the device expands runs into per-fragment kernel rows
        # (_expand_rows), so upload and host build cost scale with
        # the run count, not the row count
        self.runmat = None       # int32 [Nr, BASE_N]
        self.rampmat = None      # int32 [NrR, RC_N] (RAMP runs only)
        self.inst_of = None      # owner serial -> instance index lut
        self.nruns = 0
        self.has_ramp = False    # any RAMP run (part of the sig)
        self.class_blocks = []   # (pass_class, NB, tbase np[NB])
        self.Rtot = 0            # total expanded row capacity
        # stash
        self.stash_audio = None  # int32 [NS, 2, 64] pre-masked
        self.stash_slot = None   # int32 [NS]
        self.stash_mono = None   # int32 [NSm, 64] (1-channel patches)
        self.stash_mono_slot = None
        # stages: list of dicts (kind, variant, arrays)
        self.stages = []
        # fbdelay instances: list of dicts
        self.fbdelays = []
        # filter12/dcblock/limiter classes: instance-batched scans
        self.filters = []


# mode bits for rows (bits 1/2/4 are shared with the fused panmix
# in the pallas kernel — keep in sync with osc_kernel.ROW_*)
_ROW_HASPM = OK.ROW_HASPM       # 1
_ROW_STEREO = OK.ROW_STEREO     # 2
_ROW_CLAMP = OK.ROW_CLAMP       # 4
# noise row (native a2rt_record.inc RM_NOISE): the run is a pitched
# S&H LCG oscillator (reference wtosc.c:129-152); RC_SIZE carries the
# global RNG state and RC_POSOFF the held sample at the run's first
# real sample.  Noise runs live in pseudo pass class 0 (no wavetable)
# and are expanded as closed-form crossing counts + an LCG log-jump.
_ROW_NOISE = 8
# dc row (native a2rt_record.inc RM_DC, RF_WAVE == -2): pseudo pass
# class 0 like noise; the device emits the per-sample amp ramp value
# itself (dc.c LINEAR out[n] = value + n*delta after PrepareRamper)
_ROW_DC = 16

# run pass classes: the pallas classes plus the table-less noise
# class 0, which _expand_rows computes directly on the VPU
ALL_CLASSES = (0,) + OK.PASS_CLASSES

# run-matrix columns (SuperblockProgram.runmat).  START is the run's
# first expanded-row index in the concatenated class row space; dead
# (padding) runs have LEN 0 and START == Rtot.  A run covers TOTAL
# contiguous samples from fragment FRAG0 sample OFF, spanning LEN
# fragments; AMP0/VOL0/PAN0 (and PH) are fragment-frame-0 normalized.
#
# RC_RAMP=1 marks a ramper-replay run (native/a2rt_record.inc): its
# fragments k>=1 are reconstructed by replaying a2_PrepareRamper /
# wtosc_run_pitch per fragment from the RC_AT..RC_PERIOD snapshot
# (state at the END of fragment 0) in _ramp_scan — whole envelope and
# pitch-ramp segments ship as single runs even though the reference's
# per-fragment integer division bends them off any line.
(RC_START, RC_LEN, RC_DPH, RC_SIZE, RC_POSOFF, RC_AMP0, RC_DAMP,
 RC_VOL0, RC_DVOL, RC_PAN0, RC_DPAN, RC_SLOT, RC_MODE, RC_OFF,
 RC_TOTAL, RC_PHHI, RC_PHLO,
 RC_RAMP, RC_MIP, RC_AT, RC_ATMR, RC_VT, RC_VTMR, RC_PT, RC_PTMR,
 RC_PV, RC_PTGT, RC_PTIMER, RC_PRAMP, RC_DPHRAW, RC_PERIOD) = range(31)
RC_N = 31

# the uploaded runmat carries only the base columns plus RC_RIDX (an
# index into the separate rampmat, -1 for LINEAR runs) — the 13
# ramper-snapshot columns ship only for the RAMP runs that need them,
# keeping the per-run upload at 72 B + 56 B for ramp runs
RC_RIDX = RC_RAMP
BASE_N = RC_RIDX + 1

# rampmat layout: the 13 snapshot columns plus a back-pointer to the
# run's base row (for the scan's shared base fields)
(RR_MIP, RR_AT, RR_ATMR, RR_VT, RR_VTMR, RR_PT, RR_PTMR,
 RR_PV, RR_PTGT, RR_PTIMER, RR_PRAMP, RR_DPHRAW, RR_PERIOD,
 RR_BASE) = range(14)
RR_N = 14

# device ramp-replay scan length (native a2rt_record.inc RUN_KCHUNK):
# a RAMP run spans at most this many fragments
RUN_KCHUNK = 16

# float-tier damping threshold (internal Q units, 1.0 = 1 << 24): a
# filter12 class whose minimum observed Q falls below this keeps the
# exact serial scan even under stage_mode="float" — a weakly damped
# resonator amplifies and sustains the reference's truncation noise,
# so the float continuum (which models only the noise's mean) drifts
# beyond the -80 dB budget.  Corpus measurements of the float tier
# vs exact goldens: minQ 0.39 -> -97.8 dB, 0.195 -> -84.6 dB,
# 0.039 -> -51.8 dB (pulsetronic PulseBass) — about 45 dB per decade
# of Q, crossing -80 dB near Q ~ 0.15.
_FLOAT_TIER_MINQ = int(0.15 * (1 << 24))


def _probes():
    """Perf-diagnosis probe set (A2_COMPUTE_PROBE, comma-separated).
    Each named probe removes one piece of the device program at TRACE
    time (XLA DCE then strips everything only that piece needed), so
    timing (full - variant) attributes on-chip cost per component.
    Results are wrong under any probe — tools/probe_compute.py only.

      noexpand    skip oscillator-run expansion entirely
      nokernel    zero the pallas oscillator output (keeps expansion
                  glue, panmix and the slot accumulation)
      noscatter   keep all expansion compute, drop the slot scatter
      norungather replace the run->row field gather with a
                  contiguous read (isolates the gather's cost)
      noramp      skip the ramper-replay scan + trajectory gather
      nopanmix    skip the per-sample int64 vol/pan ramp products
                  (audio = masked oscillator output)
      trajonly    compute the ramp scan + trajectory gather but do
                  NOT substitute it into the row fields (isolates
                  the replay's raw compute from its fusion coupling
                  with the downstream int64 row math)
      nofields    constant kernel params (DCEs the run gather, phase
                  math and param arithmetic; keeps slot_r + kernel +
                  scatter — combine with nocls0, whose g[sl] reads
                  otherwise keep the gather alive)
      nocls0      zero the whole table-less class-0 output (noise
                  LCG replay, dc trajectories, their XLA panmix)
      nocls0pm    keep class-0 audio, skip only its XLA panmix
      nostages    skip panmix/copy/ws stage items
      nofbd       skip fbdelay items
      nofilt      skip filter/fm items
    """
    v = _os.environ.get("A2_COMPUTE_PROBE")
    return frozenset(v.split(",")) if v else frozenset()


def _build_runs(prog, cls_arr, tbase, posoff, ph_hi, ph_lo, dph,
                modsize, amp0, damp, vol0, dvol, pan0, dpan, slot0,
                mode, off0, total, lens, extra=None):
    """Sorts oscillator runs by (pass class, table base), lays their
    expanded rows out in 128-row kernel blocks (padding within each
    (class, tbase) bucket so a block reads one table), and fills
    prog.runmat / prog.class_blocks / prog.Rtot.  All inputs are
    int32 numpy arrays of length = number of runs; everything here is
    O(runs), not O(rows)."""
    Nr = len(cls_arr)
    prog.nruns = Nr
    if Nr == 0:
        prog.runmat = np.zeros((0, BASE_N), np.int32)
        prog.rampmat = np.zeros((0, RC_N), np.int32)
        prog.class_blocks = [(c, 0, np.zeros(0, np.int32))
                             for c in ALL_CLASSES]
        prog.Rtot = 0
        prog.has_ramp = False
        return
    # assemble the run matrix UNSORTED first (contiguous column
    # writes), then apply the sort as ONE row gather — 17 separate
    # `x[order]` gathers each re-walk the permutation cache-hostilely
    # and dominated the build at ~180k runs/superblock
    m = np.empty((Nr, RC_N), np.int32)
    m[:, RC_LEN] = lens
    m[:, RC_DPH] = dph
    m[:, RC_SIZE] = modsize
    m[:, RC_POSOFF] = posoff
    m[:, RC_AMP0] = amp0
    m[:, RC_DAMP] = damp
    m[:, RC_VOL0] = vol0
    m[:, RC_DVOL] = dvol
    m[:, RC_PAN0] = pan0
    m[:, RC_DPAN] = dpan
    m[:, RC_SLOT] = slot0
    m[:, RC_MODE] = mode
    m[:, RC_OFF] = off0
    m[:, RC_TOTAL] = total
    m[:, RC_PHHI] = ph_hi
    m[:, RC_PHLO] = ph_lo
    if extra is not None:
        # ramper-replay snapshot columns RC_RAMP..RC_PERIOD
        m[:, RC_RAMP:RC_N] = extra
    else:
        m[:, RC_RAMP:RC_N] = 0
    order = np.lexsort((tbase, cls_arr))
    m = m[order]
    cls_s = cls_arr[order]
    tb_s = tbase[order]
    len_s = m[:, RC_LEN].astype(np.int64)
    bkey = (cls_s.astype(np.int64) << 32) | tb_s
    newb = np.empty(Nr, bool)
    newb[0] = True
    newb[1:] = bkey[1:] != bkey[:-1]
    bstart = np.nonzero(newb)[0]
    brows = np.add.reduceat(len_s, bstart)
    bpad = ((brows + OK.RPB - 1) // OK.RPB) * OK.RPB
    bcls = cls_s[bstart]
    btb = tb_s[bstart].astype(np.int32)

    class_blocks = []
    bucket_base = np.zeros(len(bstart), np.int64)
    base = 0
    for c in ALL_CLASSES:
        sel = np.nonzero(bcls == c)[0]
        crows = int(bpad[sel].sum()) if len(sel) else 0
        NB = crows // OK.RPB
        if len(sel):
            cb = np.cumsum(bpad[sel]) - bpad[sel]
            bucket_base[sel] = base + cb
            tb_blocks = np.repeat(btb[sel],
                                  (bpad[sel] // OK.RPB).astype(np.int64))
        else:
            tb_blocks = np.zeros(0, np.int32)
        class_blocks.append((c, NB, tb_blocks.astype(np.int32)))
        base += NB * OK.RPB
    prog.class_blocks = class_blocks
    prog.Rtot = base

    bid = np.cumsum(newb) - 1
    cum = np.cumsum(len_s) - len_s
    start = bucket_base[bid] + (cum - cum[bstart][bid])
    m[:, RC_START] = start
    ramp_sel = m[:, RC_RAMP] != 0
    nramp = int(ramp_sel.sum())
    ridx = np.full(Nr, -1, np.int32)
    ridx[ramp_sel] = np.arange(nramp, dtype=np.int32)
    base = np.empty((Nr, BASE_N), np.int32)
    base[:, :RC_RIDX] = m[:, :RC_RIDX]
    base[:, RC_RIDX] = ridx
    prog.runmat = base
    rmp = np.empty((nramp, RR_N), np.int32)
    rmp[:, RR_MIP:RR_BASE] = m[ramp_sel][:, RC_MIP:RC_PERIOD + 1]
    rmp[:, RR_BASE] = np.nonzero(ramp_sel)[0].astype(np.int32)
    prog.rampmat = rmp
    prog.has_ramp = nramp > 0


def compile_superblock(core, frags, oplists, rowbatch):
    """Builds a SuperblockProgram from one recorded superblock.
    Raises Unsupported if the tape can't run fully on-device."""
    from ..units.host_units import (PanmixUnit, XInsertUnit,
                                    FbdelayUnit, InlineUnit)
    from ..units.deferred import DeferredPanmix, DeferredWtosc

    F = len(frags)
    prog = SuperblockProgram()
    prog.F = F
    prog.frag_sizes = list(frags)

    # ----- instance table; master is instance 0 -----
    inst_ids = {}

    def inst_of(u):
        i = inst_ids.get(id(u))
        if i is None:
            i = len(inst_ids) + 1          # 0 is master
            inst_ids[id(u)] = i
        return i

    master_bind = {}
    mch = core.master.channels
    for ch in range(mch):
        master_bind[id(core.master.buffers[ch])] = (0, ch)
    prog.master_inst = 0
    prog.master_channels = mch

    shadows = {}
    stages = {}          # (nest, chain, kind, variant) -> entry lists
    fbd_insts = {}       # id(u) -> dict
    rows_slot = np.full(rowbatch.n, -1, np.int64)
    rows_off = np.zeros(rowbatch.n, np.int32)
    rows_frm = np.zeros(rowbatch.n, np.int32)
    stash_list = []

    def depth_key(u):
        # assigned at populate time (engine/core.py) so it survives
        # the voice dying mid-superblock
        return u.depth_key

    for fi, ops in enumerate(oplists):
        binding = dict(master_bind)
        for e in ops:
            tag = e[0]
            if tag == "clear":
                u = e[1]
                if u.flags & A2_PROCADD:
                    raise Unsupported("inline in adding mode")
                ii = inst_of(u)
                for ch, buf in enumerate(u.outputs):
                    binding[id(buf)] = (ii, ch)
            elif tag == "row":
                _, u, idx, o, f = e
                b0 = binding.get(id(u.outputs[0]))
                if b0 is None:
                    raise Unsupported("row into unbound bus")
                ii, ch0 = b0
                if ch0 != 0:
                    raise Unsupported("row channel offset")
                if len(u.outputs) == 2:
                    b1 = binding.get(id(u.outputs[1]))
                    if b1 != (ii, 1):
                        raise Unsupported("row split across buses")
                if not (u.flags & A2_PROCADD) and not isinstance(
                        u, (DeferredPanmix, DeferredWtosc)):
                    raise Unsupported("replacing row")
                rows_slot[idx] = ii * F + fi
                rows_off[idx] = o
                rows_frm[idx] = f
            elif tag == "stash":
                _, u, o, f, bufs = e
                if not (u.flags & A2_PROCADD):
                    raise Unsupported("replacing stash")
                audio = np.zeros((2, FRAG), np.int32)
                slot = None
                for ch, buf in enumerate(bufs):
                    b = binding.get(id(u.outputs[ch]))
                    if b is None:
                        raise Unsupported("stash into unbound bus")
                    ii, bch = b
                    if slot is None:
                        slot = ii * F + fi
                    elif slot != ii * F + fi or bch != ch:
                        raise Unsupported("stash channel mismatch")
                    audio[bch, o:o + f] = buf[o:o + f]
                stash_list.append((slot, audio))
            elif tag == "write":
                wcb, value, start, dur = e[1], e[2], e[3], e[4]
                u, j = e[5], e[6]
                if u is None:
                    raise Unsupported("untagged write")
                sh = shadows.get(id(u))
                if sh is None:
                    if isinstance(u, PanmixUnit):
                        sh = _PanmixShadow(u)
                    elif isinstance(u, FbdelayUnit):
                        sh = _FbdelayShadow(u)
                    else:
                        raise Unsupported(
                            "write to %s" % type(u).__name__)
                    shadows[id(u)] = sh
                if isinstance(u, PanmixUnit):
                    (sh.vol if j == 0 else sh.pan).set(value, start, dur)
                else:
                    if j < 3:
                        v = _trunc_div_c(value * sh.samplerate,
                                         65536000)
                        setattr(sh, ("fbdelay", "ldelay", "rdelay")[j],
                                v)
                    else:
                        setattr(sh, ("drygain", "fbgain", "lgain",
                                     "rgain")[j - 3], value)
            elif tag == "proc":
                _, u, o, f = e
                if isinstance(u, PanmixUnit):
                    sh = shadows.get(id(u))
                    if sh is None:
                        sh = _PanmixShadow(u)
                        shadows[id(u)] = sh
                    ni, no = u.ninputs, u.noutputs
                    add = bool(u.flags & A2_PROCADD)
                    srcs = [binding.get(id(b)) for b in
                            u.inputs[:ni]]
                    dsts = [binding.get(id(b)) for b in
                            u.outputs[:no]]
                    if any(s is None for s in srcs + dsts):
                        raise Unsupported("panmix unbound bus")
                    si = srcs[0][0]
                    di = dsts[0][0]
                    if any(s[0] != si for s in srcs) or \
                            any(d[0] != di for d in dsts):
                        raise Unsupported("panmix cross-bus channels")
                    sch = tuple(s[1] for s in srcs)
                    dch = tuple(d[1] for d in dsts)
                    sh.vol.prepare(f)
                    if ni == 1 and no == 1:
                        entry = (si * F + fi, di * F + fi, o, f,
                                 sh.vol.value, sh.vol.delta, 0, 0, 0)
                        sh.vol.run(f)
                    else:
                        sh.pan.prepare(f)
                        clamp = int(sh.pan.target > 0xFFFFFF
                                    or sh.pan.target < -0xFFFFFF
                                    or sh.pan.value > 0xFFFFFF
                                    or sh.pan.value < -0xFFFFFF)
                        entry = (si * F + fi, di * F + fi, o, f,
                                 sh.vol.value, sh.vol.delta,
                                 sh.pan.value, sh.pan.delta, clamp)
                        sh.vol.run(f)
                        sh.pan.run(f)
                    key = depth_key(u) + ("panmix", ni, no, add,
                                          sch, dch)
                    stages.setdefault(key, []).append(entry)
                elif isinstance(u, XInsertUnit):
                    if u.clients:
                        raise Unsupported("xinsert with clients")
                    n = u.ninputs
                    add = bool(u.flags & A2_PROCADD)
                    for ch in range(n):
                        s = binding.get(id(u.inputs[ch]))
                        d = binding.get(id(u.outputs[ch]))
                        if s is None or d is None:
                            raise Unsupported("xinsert unbound bus")
                        key = depth_key(u) + ("copy", ch, add,
                                              (s[1],), (d[1],))
                        stages.setdefault(key, []).append(
                            (s[0] * F + fi, d[0] * F + fi, o, f,
                             0, 0, 0, 0, 0))
                elif isinstance(u, FbdelayUnit):
                    sh = shadows.get(id(u))
                    if sh is None:
                        sh = _FbdelayShadow(u)
                        shadows[id(u)] = sh
                    mind = min(sh.fbdelay, sh.ldelay, sh.rdelay)
                    if mind < f or sh.fbdelay < f:
                        raise Unsupported("fbdelay shorter than slice")
                    srcs = [binding.get(id(b)) for b in u.inputs]
                    dsts = [binding.get(id(b)) for b in u.outputs]
                    if any(x is None for x in srcs + dsts):
                        raise Unsupported("fbdelay unbound bus")
                    fd = fbd_insts.get(id(u))
                    if fd is None:
                        fd = {"unit": u, "key": depth_key(u),
                              "stereoin": u.ninputs == 2,
                              "stereoout": u.noutputs == 2,
                              "add": bool(u.flags & A2_PROCADD),
                              "slices": []}
                        fbd_insts[id(u)] = fd
                    fd["slices"].append(
                        (srcs[0][0] * F + fi,
                         srcs[-1][0] * F + fi,
                         dsts[0][0] * F + fi,
                         dsts[-1][0] * F + fi,
                         o, f, sh.fbdelay, sh.ldelay, sh.rdelay,
                         sh.drygain, sh.fbgain, sh.lgain, sh.rgain))
                else:
                    raise Unsupported("proc %s" % type(u).__name__)
            elif tag == "deinit":
                pass
            else:
                raise Unsupported("op %s" % tag)

    if rowbatch.n and (rows_slot < 0).any():
        raise Unsupported("orphan rows")

    # pad the instance count to a power of two (min 4) so the slot
    # array shape — and thus the jit signature — stays stable as
    # groups come and go
    prog.ninst = _pow2(len(inst_ids) + 1, 4)

    # ----- rows -> 1-fragment runs for the device expansion -----
    R = rowbatch.n
    if R:
        cls_arr = np.empty(R, np.int32)
        tbase = np.empty(R, np.int32)
        posoff = np.empty(R, np.int32)
        ph_hi = np.empty(R, np.int32)
        ph_lo = np.empty(R, np.int32)
        for i in range(R):
            w, mm = rowbatch.wavemip[i]
            if w is None:
                raise Unsupported("row without wave key")
            tb, npz, off = core.pair_atlas_entry(w, mm)
            # shift the row back by its slice offset so the kernel
            # computes directly at absolute frame positions (frame n
            # = slice sample n-off); exact because the kernel's phase
            # and amp arithmetic are mod-2^32 / carried exactly, and
            # frames outside [off, off+frm) are masked before the
            # slot scatter.
            so = int(rows_off[i])
            ph_s = rowbatch.ph0[i] - so * rowbatch.dph[i]
            tbase[i] = tb
            cls_arr[i] = OK.pass_class(npz)
            posoff[i] = off
            ph_hi[i] = np.int64(ph_s >> 32).astype(np.int32)
            ph_lo[i] = np.int64(ph_s & 0xFFFFFFFF).astype(np.int32)
        so_a = rows_off[:R].astype(np.int64)
        amp_s = (np.asarray(rowbatch.amp0, np.int64)
                 - so_a * np.asarray(rowbatch.damp, np.int64)) \
            .astype(np.int32)
        # vol/pan are fragment-frame-0 normalized like phase/amp
        vol_s = (np.asarray(rowbatch.vol0, np.int64)
                 - so_a * np.asarray(rowbatch.dvol, np.int64)) \
            .astype(np.int32)
        pan_s = (np.asarray(rowbatch.pan0, np.int64)
                 - so_a * np.asarray(rowbatch.dpan, np.int64)) \
            .astype(np.int32)
        mode = (np.asarray(rowbatch.haspm, bool) * _ROW_HASPM
                + np.asarray(rowbatch.stereo, bool) * _ROW_STEREO
                + np.asarray(rowbatch.clamp, bool) * _ROW_CLAMP) \
            .astype(np.int32)
        _build_runs(
            prog, cls_arr, tbase, posoff, ph_hi, ph_lo,
            np.asarray(rowbatch.dph, np.int64).astype(np.int32),
            np.zeros(R, np.int32), amp_s,
            np.asarray(rowbatch.damp, np.int64).astype(np.int32),
            vol_s,
            np.asarray(rowbatch.dvol, np.int64).astype(np.int32),
            pan_s,
            np.asarray(rowbatch.dpan, np.int64).astype(np.int32),
            rows_slot[:R].astype(np.int32), mode,
            rows_off[:R].astype(np.int32),
            rows_frm[:R].astype(np.int32),
            np.ones(R, np.int32))

    # ----- stash -----
    if stash_list:
        NS = _pow2(len(stash_list), 64)
        sa = np.zeros((NS, 2, FRAG), np.int32)
        ssl = np.full(NS, prog.ninst * F, np.int32)
        stash_list.sort(key=lambda t: t[0])   # sorted segment-sum
        for i, (slot, audio) in enumerate(stash_list):
            sa[i] = audio
            ssl[i] = slot
        prog.stash_audio = sa
        prog.stash_slot = ssl

    # ----- stages -----
    for key in sorted(stages.keys()):
        nest, chain, kind = key[0], key[1], key[2]
        entries = stages[key]
        K = _pow2(len(entries), 128)   # min pad: stable jit shapes
        arr = np.zeros((K, 9), np.int32)
        arr[:, 0] = prog.ninst * F     # dead src for padding
        arr[:, 1] = prog.ninst * F
        entries = sorted(entries, key=lambda en: en[1])  # sorted emit
        for i, en in enumerate(entries):
            arr[i] = en
        prog.stages.append({"kind": kind, "key": key, "arr": arr,
                            "n": len(entries),
                            "dense": np.zeros((0, F, 9), np.int32)})

    # fbdelay instances are stage ops too — insert in depth order
    for fd in fbd_insts.values():
        sl = fd["slices"]
        # chunked scan: C consecutive slices are processed in one
        # vectorized step — exact because the FEEDBACK delay is at
        # least the chunk's ring span (reader taps run vectorized
        # against the final ring; min delay >= slice frames is
        # already enforced above)
        if prog.F * FRAG + (1 << 17) > _FBD_BUFSIZE:
            raise Unsupported("superblock too long for fbdelay ring")
        mind = min(s[6] for s in sl)
        C = 1
        while C * 2 * FRAG <= mind and C < 1024:
            C *= 2
        ns = _pow2(len(sl), C)
        ns = ((ns + C - 1) // C) * C
        arr = np.zeros((ns, 13), np.int32)
        arr[:, :4] = prog.ninst * F  # dead src/dst (sorted emit)
        for i, s in enumerate(sl):
            arr[i] = s
        arr[len(sl):, 5] = 0                    # frames=0 -> no-op
        prog.fbdelays.append({
            "unit_id": id(fd["unit"]), "key": fd["key"],
            "stereoin": fd["stereoin"], "stereoout": fd["stereoout"],
            "add": fd["add"], "arr": arr, "n": len(sl), "chunk": C,
            "dense": False})

    return prog


# =================================================================
#   Program construction from native record arrays
# =================================================================

# native/a2rt_record.inc field indices
(RF_WAVE, RF_MIP, RF_PH_HI, RF_PH_LO, RF_DPH, RF_AMP0, RF_DAMP,
 RF_VOL0, RF_DVOL, RF_PAN0, RF_DPAN, RF_OWNER, RF_FRAG, RF_OFF,
 RF_TOTAL, RF_MODE, RF_LEN, RF_SIZE,
 RF_RAMP, RF_AT, RF_ATMR, RF_VT, RF_VTMR, RF_PT, RF_PTMR,
 RF_PV, RF_PTGT, RF_PTIMER, RF_PRAMP, RF_DPHRAW, RF_PERIOD,
 RF_NS0, RF_NLAST) = range(33)
(SF_KIND, SF_NEST, SF_CHAIN, SF_NI, SF_NO, SF_ADD, SF_SCH, SF_DCH,
 SF_SRC0, SF_SRC1, SF_DST0, SF_DST1, SF_FRAG, SF_OFF, SF_FRM,
 SF_P0, SF_P1, SF_P2, SF_P3, SF_P4, SF_P5, SF_P6, SF_SERIAL) = range(23)
SF_N = 23
SK_PANMIX, SK_COPY, SK_FBDELAY = 0, 1, 2
SK_WS, SK_F12, SK_DCB, SK_LIM = 3, 4, 5, 6
SK_FM, SK_FMP = 7, 8     # fm stage header + op1-3 continuation row
_FILT_TAG = {SK_F12: "f12", SK_DCB: "dcb", SK_LIM: "lim"}
# per-kind state-carrying item arr widths + dead-slot columns (the
# "filters" machinery hosts every instance-batched scan unit: the
# three filter recurrences and the fm operator graph)
_FILT_W = {"f12": 13, "dcb": 13, "lim": 13, "fm": 27}
_FILT_DEAD = {"f12": (2, 3), "dcb": (2, 3), "lim": (2, 3),
              "fm": (0,)}
# limiter peak state starts at 32768<<8 (reference limiter.c lim_init)
_LIM_PEAK0 = 32768 << 8


def program_from_native(rows, stages, stash, F, frag_sizes,
                        atlas_entry, master_channels,
                        inst_map=None):
    """Builds a SuperblockProgram from the native record pass's flat
    arrays (NativeRenderer.record).  atlas_entry(wave_handle, mip) ->
    (tbase, npass, pos_off) in the PairAtlas.  All heavy lifting is
    vectorized numpy — no per-row Python loops.

    inst_map: optional (inst_of_lut, ninst) precomputed from a FULL
    program — used by the sharded render to build per-shard row
    programs whose slot numbering agrees with the full program's
    stage tables (a shard sees only a subset of owners, so deriving
    the map from the subset would renumber instances)."""
    prog = SuperblockProgram()
    prog.F = F
    prog.frag_sizes = list(frag_sizes)
    prog.master_channels = master_channels
    prog.master_inst = 0

    if inst_map is not None:
        inst_of, ninst = inst_map
        prog.ninst = ninst
        prog.inst_of = inst_of
    else:
        # owner serials -> dense instance indices (0 = master).
        # SK_FMP continuation rows carry raw op params in the
        # SRC/DST columns and must not leak into the owner set.
        owners = [np.zeros(1, np.int32)]
        if len(rows):
            owners.append(rows[:, RF_OWNER])
        if len(stages):
            so = stages[stages[:, SF_KIND] != SK_FMP]
            owners.append(so[:, SF_SRC0])
            owners.append(so[:, SF_SRC1])
            owners.append(so[:, SF_DST0])
            owners.append(so[:, SF_DST1])
        if len(stash):
            owners.append(stash[:, 0])
        uniq = np.unique(np.concatenate(owners))
        assert uniq[0] == 0
        ninst = _pow2(len(uniq), 4)
        prog.ninst = ninst
        lut_sz = int(uniq.max()) + 1
        inst_of = np.zeros(lut_sz, np.int32)
        inst_of[uniq] = np.arange(len(uniq), dtype=np.int32)
        prog.inst_of = inst_of

    def slot(owner, frag):
        return inst_of[np.asarray(owner)] * F + np.asarray(frag)

    # ----- oscillator runs -----
    R = len(rows)
    if R:
        # noise runs (RF_WAVE == -1) have no wavetable: pseudo pass
        # class 0, RNG state / held sample ride the SIZE / POSOFF
        # columns (native a2rt_record.inc RM_NOISE)
        noise = rows[:, RF_WAVE] < 0
        wm = np.where(noise, 0,
                      rows[:, RF_WAVE].astype(np.int64) * 16
                      + rows[:, RF_MIP])
        uw = np.unique(wm[~noise]) if (~noise).any() \
            else np.zeros(0, np.int64)
        tb_l = np.zeros(int(uw.max()) + 1 if len(uw) else 1, np.int32)
        np_l = np.zeros_like(tb_l)
        off_l = np.zeros_like(tb_l)
        for key in uw:
            t, n_, o_ = atlas_entry(int(key) // 16, int(key) % 16)
            tb_l[key], np_l[key], off_l[key] = t, n_, o_
        lay = None
        try:
            from ..native import layout_runs
            lay = layout_runs(rows, inst_of, F, tb_l, np_l, off_l,
                              np.asarray(OK.PASS_CLASSES, np.int32))
        except Exception:
            lay = None
        if lay is not None:
            # native layout (a2rt_layout_runs): byte-identical to
            # _build_runs below, ~10x faster — the run layout was the
            # dominant host build cost and the host build caps
            # aggregate serving throughput
            runmat, rampmat, nb, tb_blocks, rtot = lay
            prog.runmat = runmat
            prog.rampmat = rampmat
            prog.nruns = R
            prog.has_ramp = len(rampmat) > 0
            blocks = []
            pos = 0
            for ci, c in enumerate(ALL_CLASSES):
                NB = int(nb[ci])
                blocks.append((c, NB,
                               tb_blocks[pos:pos + NB].copy()))
                pos += NB
            prog.class_blocks = blocks
            prog.Rtot = rtot
        else:
            tbase = np.where(noise, 0, tb_l[wm]).astype(np.int32)
            npass = np_l[wm]
            posoff = np.where(noise, rows[:, RF_NLAST],
                              off_l[wm]).astype(np.int32)
            cls_idx = np.searchsorted(OK.PASS_CLASSES, npass)
            cls_arr = np.asarray(OK.PASS_CLASSES, np.int32)[cls_idx]
            cls_arr = np.where(noise, 0, cls_arr).astype(np.int32)
            modsize = np.where(noise, rows[:, RF_NS0],
                               rows[:, RF_SIZE]).astype(np.int32)
            extra = np.empty((R, RC_N - RC_RAMP), np.int32)
            extra[:, 0] = rows[:, RF_RAMP]
            extra[:, 1] = rows[:, RF_MIP]
            extra[:, 2:] = rows[:, RF_AT:RF_PERIOD + 1]
            _build_runs(
                prog, cls_arr, tbase, posoff,
                rows[:, RF_PH_HI], rows[:, RF_PH_LO], rows[:, RF_DPH],
                modsize, rows[:, RF_AMP0], rows[:, RF_DAMP],
                rows[:, RF_VOL0], rows[:, RF_DVOL], rows[:, RF_PAN0],
                rows[:, RF_DPAN],
                slot(rows[:, RF_OWNER], rows[:, RF_FRAG])
                .astype(np.int32),
                rows[:, RF_MODE], rows[:, RF_OFF], rows[:, RF_TOTAL],
                rows[:, RF_LEN], extra)

    # ----- stash -----
    # mono patches (the common case: fm/noise/dc leaf voices) upload
    # one channel instead of the record format's fixed two — half the
    # stash bytes on fm-heavy songs
    NS = len(stash)
    if NS:
        mono_sel = stash[:, 4] <= 1
        sm = stash[mono_sel]
        st2 = stash[~mono_sel]
        NSm, NSs = len(sm), len(st2)
        if NSm:
            NSmp = _pow2(NSm, 64)
            ma = np.zeros((NSmp, FRAG), np.int32)
            msl = np.full(NSmp, ninst * F, np.int32)
            sl_m = slot(sm[:, 0], sm[:, 1])
            # slot-sorted (pure adds, order-free): the device stash
            # accumulation is a sorted segment-sum
            o = np.argsort(sl_m, kind="stable")
            ma[:NSm] = sm[o, 5:5 + FRAG]
            msl[:NSm] = sl_m[o]
            prog.stash_mono = ma
            prog.stash_mono_slot = msl
        if NSs:
            NSp = _pow2(NSs, 64)
            sa = np.zeros((NSp, 2, FRAG), np.int32)
            ssl = np.full(NSp, ninst * F, np.int32)
            sl_s = slot(st2[:, 0], st2[:, 1])
            o = np.argsort(sl_s, kind="stable")
            sa[:NSs] = st2[o, 5:].reshape(NSs, 2, FRAG)
            ssl[:NSs] = sl_s[o]
            prog.stash_audio = sa
            prog.stash_slot = ssl

    # ----- stages (vectorized grouping) -----
    if len(stages):
        S = stages
        skind = S[:, SF_KIND]
        reg = S[(skind == SK_PANMIX) | (skind == SK_COPY)
                | (skind == SK_WS)]
        # waveshaper rows apply identical per-sample math to each
        # channel: expand a stereo entry into two per-channel rows
        # (channel tag in SF_NI, like xinsert copies)
        ws2 = reg[(reg[:, SF_KIND] == SK_WS) & (reg[:, SF_NI] == 2)]
        if len(ws2):
            hi = ws2.copy()
            hi[:, SF_SRC0] = ws2[:, SF_SRC1]
            hi[:, SF_DST0] = ws2[:, SF_DST1]
            hi[:, SF_SCH] = ws2[:, SF_SCH] >> 8
            hi[:, SF_DCH] = ws2[:, SF_DCH] >> 8
            hi[:, SF_NI] = 1
            hi[:, SF_NO] = 0
            lo = reg.copy()
            sel = (lo[:, SF_KIND] == SK_WS) & (lo[:, SF_NI] == 2)
            lo[sel, SF_SCH] &= 0xFF
            lo[sel, SF_DCH] &= 0xFF
            lo[sel, SF_NI] = 0
            lo[sel, SF_NO] = 0
            reg = np.concatenate([lo, hi])
        else:
            sel = reg[:, SF_KIND] == SK_WS
            if sel.any():
                reg = reg.copy()
                reg[sel, SF_NI] = 0
                reg[sel, SF_NO] = 0
        # group key as one int64: nest/chain/kind/ni/no/add/sch/dch
        gk = (reg[:, SF_NEST].astype(np.int64) << 48) \
            | (reg[:, SF_CHAIN].astype(np.int64) << 40) \
            | (reg[:, SF_KIND].astype(np.int64) << 36) \
            | (reg[:, SF_NI].astype(np.int64) << 32) \
            | (reg[:, SF_NO].astype(np.int64) << 28) \
            | (reg[:, SF_ADD].astype(np.int64) << 24) \
            | (reg[:, SF_SCH].astype(np.int64) << 12) \
            | reg[:, SF_DCH].astype(np.int64)
        order = np.argsort(gk, kind="stable")
        gs = gk[order]
        bnd = np.nonzero(np.concatenate(
            [[True], gs[1:] != gs[:-1]]))[0]
        sizes = np.diff(np.append(bnd, len(gs)))
        ent = np.empty((len(reg), 9), np.int32)
        rr = reg[order]
        ent[:, 0] = slot(rr[:, SF_SRC0], rr[:, SF_FRAG])
        ent[:, 1] = slot(rr[:, SF_DST0], rr[:, SF_FRAG])
        ent[:, 2] = rr[:, SF_OFF]
        ent[:, 3] = rr[:, SF_FRM]
        ent[:, 4:9] = rr[:, SF_P0:SF_P4 + 1]
        frags_all = rr[:, SF_FRAG].astype(np.int64)
        far = np.arange(F, dtype=np.int32)
        for gi, b in enumerate(bnd):
            r0 = rr[b]
            nest, chain = int(r0[SF_NEST]), int(r0[SF_CHAIN])
            ni, no = int(r0[SF_NI]), int(r0[SF_NO])
            add = bool(r0[SF_ADD])
            sch = (int(r0[SF_SCH]) & 0xFF, int(r0[SF_SCH]) >> 8)
            dch = (int(r0[SF_DCH]) & 0xFF, int(r0[SF_DCH]) >> 8)
            if int(r0[SF_KIND]) == SK_PANMIX:
                key = (-nest, chain, "panmix", ni, no, add,
                       sch[:max(ni, 1)], dch[:max(no, 1)])
            elif int(r0[SF_KIND]) == SK_WS:
                key = (-nest, chain, "ws", ni, add,
                       (sch[0],), (dch[0],))
            else:
                key = (-nest, chain, "copy", ni, add,
                       (sch[0],), (dch[0],))
            n = int(sizes[gi])
            seg = ent[b:b + n]
            # dense partition: an instance-pair (= source/dest slot
            # span) whose slices are one-per-fragment ships as a
            # dense [F, 9] span table (contiguous device slices, no
            # gather/scatter — see _apply_stage_dense); pairs with
            # sub-fragment splits, and sparse pairs where the dense
            # table would cost more upload than it saves, stay on
            # the legacy slice list
            fr_g = frags_all[b:b + n]
            sspan = seg[:, 0].astype(np.int64) - fr_g
            dspan = seg[:, 1].astype(np.int64) - fr_g
            pk = (sspan << 32) | dspan
            o2 = np.argsort(pk, kind="stable")
            pks = pk[o2]
            pbnd = np.nonzero(np.concatenate(
                [[True], pks[1:] != pks[:-1]]))[0]
            psz = np.diff(np.append(pbnd, n))
            dense_groups = []
            legacy = []
            dense_dsts = set()
            for pb, pn in zip(pbnd, psz):
                idx = o2[pb:pb + pn]
                np_ = int(pn)
                frs = fr_g[idx]
                p = int(pks[pb])
                dsp = p & 0xFFFFFFFF
                # REPLACE groups must have unique destination spans
                # for the vectorized emit (the add-of-difference
                # reads `old` once for all groups; two REPLACEs into
                # one span would both subtract it) — such pairs stay
                # on the order-free legacy slice list
                if np_ * 2 < F or len(np.unique(frs)) != np_ \
                        or (not add and dsp in dense_dsts):
                    legacy.append(seg[idx])
                    continue
                dense_dsts.add(dsp)
                da = np.zeros((F, 9), np.int32)
                da[:, 0] = (p >> 32) + far
                da[:, 1] = dsp + far
                da[frs, 2:9] = seg[idx][:, 2:9]
                dense_groups.append(da)
            dense = np.stack(dense_groups) if dense_groups \
                else np.zeros((0, F, 9), np.int32)
            if legacy:
                lg = np.concatenate(legacy)
                nl = len(lg)
                K = _quant(nl, 128)
                arr = np.zeros((K, 9), np.int32)
                arr[:, 0] = ninst * F
                arr[:, 1] = ninst * F
                # dst-sorted (adds / add-of-difference are
                # order-free): the device emit is a sorted
                # segment-sum, padding = dead slot = highest index
                arr[:nl] = lg[np.argsort(lg[:, 1], kind="stable")]
            else:
                nl = 0
                arr = np.zeros((0, 9), np.int32)
            prog.stages.append({"kind": key[2], "key": key,
                                "arr": arr, "n": nl,
                                "dense": dense})
        prog.stages.sort(key=lambda st: st["key"])
        fbd = S[skind == SK_FBDELAY]
        filt = S[(skind == SK_F12) | (skind == SK_DCB)
                 | (skind == SK_LIM)]
    else:
        fbd = np.zeros((0, SF_N), np.int32)
        filt = np.zeros((0, SF_N), np.int32)
    for serial in np.unique(fbd[:, SF_SERIAL]) if len(fbd) else ():
        sr = fbd[fbd[:, SF_SERIAL] == serial]
        s0 = sr[0]
        # chunk bound: only the FEEDBACK delay serializes (reader
        # taps are vectorized against the final ring), so the chunk
        # grows to the fb tap's span, not min(fb, ld, rd)
        mind = int(sr[:, SF_P0].min())
        C = 1
        while C * 2 * FRAG <= mind and C < 1024:
            C *= 2
        n = len(sr)
        # dense eligibility (_apply_fbdelay_dense): contiguous
        # full-superblock coverage in time order (slices may split
        # fragments — per-slice gain ramps — the device expands gains
        # per sample), constant slot spans, constant fb/ld/rd within
        # the reference's 2^17 window (native fbd_process masks every
        # tap by 2^17-1).  fb/ld/rd become jit-time constants of the
        # dense program (static ring slicing), so they also gate the
        # signature (_repad keeps them sticky per song).
        tpos = sr[:, SF_FRAG].astype(np.int64) * FRAG \
            + sr[:, SF_OFF]
        dense = bool(
            n > 0
            and mind >= FRAG
            and tpos[0] == 0
            and (tpos[1:] == tpos[:-1] + sr[:-1, SF_FRM]).all()
            and tpos[-1] + sr[-1, SF_FRM] == F * FRAG
            and all((sr[:, c] == sr[0, c]).all()
                    for c in (SF_SRC0, SF_SRC1, SF_DST0, SF_DST1,
                              SF_P0, SF_P1, SF_P2))
            and max(int(sr[0, SF_P0]), int(sr[0, SF_P1]),
                    int(sr[0, SF_P2])) <= FBD_TAIL)
        if not dense and F * FRAG + FBD_TAIL > _FBD_BUFSIZE:
            # the legacy path's vectorized reader taps need the whole
            # superblock + max reference delay to fit the 2^20 ring
            # without wrapping (the dense path has no such bound: its
            # linear buffer is sized per superblock)
            raise Unsupported("superblock too long for fbdelay ring")
        ns = _quant(n, C)
        arr = np.zeros((ns, 13), np.int32)
        arr[:, :4] = ninst * F     # dead src/dst: keeps the emit's
        # sorted-segment invariant
        arr[:n, 0] = slot(sr[:, SF_SRC0], sr[:, SF_FRAG])
        arr[:n, 1] = slot(sr[:, SF_SRC1], sr[:, SF_FRAG])
        arr[:n, 2] = slot(sr[:, SF_DST0], sr[:, SF_FRAG])
        arr[:n, 3] = slot(sr[:, SF_DST1], sr[:, SF_FRAG])
        arr[:n, 4] = sr[:, SF_OFF]
        arr[:n, 5] = sr[:, SF_FRM]
        arr[:n, 6:13] = sr[:, SF_P0:SF_P6 + 1]
        prog.fbdelays.append({
            "unit_id": int(serial), "key": (-int(s0[SF_NEST]),
                                            int(s0[SF_CHAIN])),
            "stereoin": int(s0[SF_NI]) == 2,
            "stereoout": int(s0[SF_NO]) == 2,
            "add": bool(s0[SF_ADD]), "arr": arr, "n": n,
            "chunk": C, "dense": dense,
            "fbpar": (int(s0[SF_P0]), int(s0[SF_P1]),
                      int(s0[SF_P2])) if dense else (-1, -1, -1)})

    # ----- filter12 / dcblock / limiter: instance-batched per-sample
    # scans (serial state per instance persists on the device between
    # superblocks like the fbdelay rings) -----
    if len(filt):
        fk = (filt[:, SF_NEST].astype(np.int64) << 48) \
            | (filt[:, SF_CHAIN].astype(np.int64) << 40) \
            | (filt[:, SF_KIND].astype(np.int64) << 36) \
            | (filt[:, SF_NI].astype(np.int64) << 32) \
            | (filt[:, SF_NO].astype(np.int64) << 28) \
            | (filt[:, SF_ADD].astype(np.int64) << 24) \
            | (filt[:, SF_SCH].astype(np.int64) << 12) \
            | filt[:, SF_DCH].astype(np.int64)
        for key64 in np.unique(fk):
            rows_k = filt[fk == key64]
            serials = [int(s) for s in np.unique(rows_k[:, SF_SERIAL])]
            K = len(serials)
            Smax = max(int((rows_k[:, SF_SERIAL] == s).sum())
                       for s in serials)
            arr = np.zeros((Smax, K, 13), np.int32)
            arr[:, :, 2] = ninst * F
            arr[:, :, 3] = ninst * F
            for j, ser in enumerate(serials):
                sr = rows_k[rows_k[:, SF_SERIAL] == ser]
                n = len(sr)
                arr[:n, j, 0] = slot(sr[:, SF_SRC0], sr[:, SF_FRAG])
                arr[:n, j, 1] = slot(sr[:, SF_SRC1], sr[:, SF_FRAG])
                arr[:n, j, 2] = slot(sr[:, SF_DST0], sr[:, SF_FRAG])
                arr[:n, j, 3] = slot(sr[:, SF_DST1], sr[:, SF_FRAG])
                arr[:n, j, 4] = sr[:, SF_OFF]
                arr[:n, j, 5] = sr[:, SF_FRM]
                arr[:n, j, 6:13] = sr[:, SF_P0:SF_P6 + 1]
            r0 = rows_k[0]
            nest, chain = int(r0[SF_NEST]), int(r0[SF_CHAIN])
            ni, no = int(r0[SF_NI]), int(r0[SF_NO])
            sch = (int(r0[SF_SCH]) & 0xFF, int(r0[SF_SCH]) >> 8)
            dch = (int(r0[SF_DCH]) & 0xFF, int(r0[SF_DCH]) >> 8)
            kind = _FILT_TAG[int(r0[SF_KIND])]
            # float-tier eligibility: an undamped filter12 resonator
            # (q near 0) never decays the reference's truncation
            # noise, so the float continuum drifts beyond the -80 dB
            # budget — such classes keep the exact serial scan.  The
            # minimum q over this superblock's slices (q ramps
            # linearly within a slice) unions across the profile
            # pass in observe().  dcblock (Q=1) and the limiter are
            # always damped.
            if kind == "f12":
                qv = rows_k[:, SF_P2].astype(np.int64)
                qd = rows_k[:, SF_P3].astype(np.int64)
                frm = rows_k[:, SF_FRM].astype(np.int64)
                qe = qv + qd * np.maximum(frm - 1, 0)
                minq = int(min(qv.min(), qe.min()))
            else:
                minq = 1 << 30
            prog.filters.append({
                "kind": kind,
                "key": (-nest, chain, kind,
                        ni, no, bool(r0[SF_ADD]), sch[:max(ni, 1)],
                        dch[:max(no, 1)]),
                "serials": serials, "arr": arr, "n": K,
                "minq": minq})

    # ----- fm stages: instance-batched oversampled operator scans
    # (native a2rt_record.inc fm_record; SK_FM header + SK_FMP op1-3
    # continuation row).  Per-op `last` persists on the device
    # between superblocks like filter state. -----
    if len(stages):
        fmi = np.nonzero(stages[:, SF_KIND] == SK_FM)[0]
        if len(fmi):
            fmh = stages[fmi]
            fmp = stages[fmi + 1]       # SK_FMP partners
            fk = (fmh[:, SF_NEST].astype(np.int64) << 48) \
                | (fmh[:, SF_CHAIN].astype(np.int64) << 40) \
                | (fmh[:, SF_P0].astype(np.int64) << 16) \
                | (fmh[:, SF_ADD].astype(np.int64) << 8) \
                | fmh[:, SF_DCH].astype(np.int64)
            for key64 in np.unique(fk):
                m2 = fk == key64
                rows_k = fmh[m2]
                prm_k = fmp[m2]
                serials = [int(s)
                           for s in np.unique(rows_k[:, SF_SERIAL])]
                K = len(serials)
                Smax = max(int((rows_k[:, SF_SERIAL] == s).sum())
                           for s in serials)
                arr = np.zeros((Smax, K, 27), np.int32)
                arr[:, :, 0] = ninst * F       # dead dst
                for j, ser in enumerate(serials):
                    sel = rows_k[:, SF_SERIAL] == ser
                    sr = rows_k[sel]
                    pr = prm_k[sel]
                    n = len(sr)
                    arr[:n, j, 0] = slot(sr[:, SF_DST0],
                                         sr[:, SF_FRAG])
                    arr[:n, j, 1] = sr[:, SF_OFF]
                    arr[:n, j, 2] = sr[:, SF_FRM]
                    arr[:n, j, 3:9] = sr[:, SF_P1:SF_P6 + 1]
                    arr[:n, j, 9:27] = pr[:, 1:19]
                r0 = rows_k[0]
                nest, chain = int(r0[SF_NEST]), int(r0[SF_CHAIN])
                sk = int(r0[SF_P0])
                prog.filters.append({
                    "kind": "fm",
                    "key": (-nest, chain, "fm", sk,
                            bool(r0[SF_ADD]),
                            (int(r0[SF_DCH]),)),
                    "serials": serials, "arr": arr, "n": K,
                    "minq": 1 << 30})

    return prog


# =================================================================
#   Device execution
# =================================================================

def _pitch_tables():
    from ..fixmath import _PITCH_TAB
    base = np.asarray([b for b, _ in _PITCH_TAB], np.int64)
    coeff = np.asarray([c for _, c in _PITCH_TAB], np.int64)
    return base, coeff


_PTAB_BASE, _PTAB_COEFF = _pitch_tables()
_M32 = 0xFFFFFFFF


def _w32(x):
    """int64 -> int32 two's-complement wrap, back to int64."""
    return x.astype(jnp.int32).astype(jnp.int64)


def _tdiv(a, b):
    """C truncated i64/i64 division, b > 0, EXACT: two-stage f32
    estimate (f32 division is native on the TPU VPU; f64 would be
    software-emulated) + integer correction.  Stage 1 leaves
    |q - q*| <~ 2^10 for |a| < 2^57; stage 2 on the remainder leaves
    |q - q*| <= 2; two correction steps finish it."""
    bf = b.astype(jnp.float32)
    q = jnp.trunc(a.astype(jnp.float32) / bf).astype(jnp.int64)
    for _ in range(2):
        r = a - q * b
        q = q + jnp.trunc(r.astype(jnp.float32) / bf) \
            .astype(jnp.int64)
    for _ in range(2):
        r = a - q * b
        pos = a >= 0
        dec = (pos & (r < 0)) | (~pos & (r <= -b))
        inc = (pos & (r >= b)) | (~pos & (r > 0))
        q = q - dec.astype(jnp.int64) + inc.astype(jnp.int64)
    return q


def _prepare_vec(v, tg, t, fr):
    """a2_PrepareRamper(fr), vectorized int64-carrying-int32 wrap.
    Returns (value, delta, timer) after the call."""
    t0 = t == 0
    big = (t >> 8) >= fr
    diff = _w32(tg - v)
    safe_t = jnp.where(t0 | ~big, 1, t)
    d_big = _w32(_tdiv(diff << 8, safe_t))
    d_small = _w32(_tdiv(diff, fr))
    v2 = jnp.where(t0, tg, v)
    d = jnp.where(t0, 0, jnp.where(big, d_big, d_small))
    t2 = jnp.where(t0, t, jnp.where(big, t - (fr << 8), 0))
    return v2, d, t2


def _p2i_vec(p):
    """a2_P2I (fixmath.p2i), vectorized in int64; input nonnegative
    (< 2^23: the replayed midpoint sum is a logical >>9)."""
    n = p & 0xFFFF
    oct_ = p >> 16
    idx = n >> 10
    coeff = jnp.take(jnp.asarray(_PTAB_COEFF), idx)
    base = jnp.take(jnp.asarray(_PTAB_BASE), idx)
    dph = (coeff * (n & 1023)) & _M32
    dph >>= 2
    dph = (dph + base) & _M32
    sh = (7 - oct_) & 31
    return dph >> sh


def _nz_tab():
    # noise LCG doubling-jump table (reference a2_dsp.h:37-42,
    # native a2rt.cpp lcg_next: s = s*1566083941 + 1 mod 2^32):
    # after 2^j steps, s -> A[j]*s + C[j]
    A, C = 1566083941, 1
    out = []
    for _ in range(11):
        out.append((A, C))
        A, C = (A * A) & 0xFFFFFFFF, (A * C + C) & 0xFFFFFFFF
    return out


_NZ_TAB = _nz_tab()


def _noise_audio(s0, last0, phr, dphu, offl, offr, kk, isramp, c0,
                 amp0, damp):
    """Noise-run rows: reproduces the reference's pitched S&H LCG
    (wtosc.c:129-152, native a2rt_units.inc wtosc_process case 1)
    with closed-form crossing counts and an LCG log-jump — fully
    parallel across rows and samples.  The global draw ORDER is
    exact: the record pass snapshots the shared RNG state per run and
    breaks runs whenever another unit draws in between.

    s0/last0: RNG state and held sample at the run's first real
    sample; phr: fragment frame-0 phase (48:24, int64); dphu: phase
    increment (uint32-valued int64); offl: this row's first valid
    sample; offr: the run's starting sample; kk: the row's fragment
    index in the run; isramp+c0: scan-replayed rows and their
    accumulated draw counts.  Returns int32 [R, FRAG] audio."""
    n = jnp.arange(FRAG, dtype=jnp.int64)[None, :]
    hi = (dphu >= (1 << 23))[:, None]
    # draws consumed after processing sample n, relative to run start
    base23 = jnp.where(isramp, phr >> 23,
                       (phr - (kk * FRAG - offr) * dphu) >> 23)
    cons_lo = ((phr[:, None] + (n + 1) * dphu[:, None]) >> 23) \
        - base23[:, None] + jnp.where(isramp, c0, 0)[:, None]
    cons_hi = (n + 1 - offl[:, None]) \
        + jnp.where(isramp, c0,
                    kk * FRAG - offr + offl)[:, None]
    cons = jnp.where(hi, cons_hi, cons_lo)
    cons = jnp.clip(cons, 0, (1 << 11) - 1)
    # s = jump(s0, cons): 11 doubling steps, uint32 wrap
    s = jnp.broadcast_to(
        jax.lax.bitcast_convert_type(s0.astype(jnp.int32),
                                     jnp.uint32)[:, None],
        cons.shape)
    consu = cons.astype(jnp.uint32)
    for j, (aj, cj) in enumerate(_NZ_TAB):
        bit = ((consu >> j) & 1) != 0
        s = jnp.where(bit, s * jnp.uint32(aj) + jnp.uint32(cj), s)
    val = ((s * (s >> 16)) >> 16).astype(jnp.int32) - 32767
    last = jnp.where(cons == 0, last0[:, None], val)
    ampn = (amp0.astype(jnp.int64)[:, None]
            + n * damp.astype(jnp.int64)[:, None]).astype(jnp.int32)
    return (last * (ampn >> 10)) >> 6


def _ramp_scan(rmp, base):
    """Replays the reference's per-fragment control recurrences for
    every run ON THE DEVICE: a2_PrepareRamper's integer-division
    requantization for amp/vol/pan (reference include/a2_dsp.h:
    131-148) and wtosc_run_pitch's pitch->dphase conversion
    (reference src/units/wtosc.c:89-105) with phase accumulation.
    Inputs: rampmat int64 [NrR, RR_N] and the base runmat int64
    [Nr, BASE_N] (RR_BASE back-pointers resolve the shared fields).
    Returns per-fragment trajectories for fragments
    k=1..RUN_KCHUNK-1 of every RAMP run, each [RUN_KCHUNK-1, NrR]:
    (amp, damp, vol, dvol, pan, dpan, dph, ph).
    The C++ record pass verifies this exact replay against the live
    engine at every run extension (a2rt_record.inc
    sim_predict_match), so a divergence can only ever break a run,
    never bend audio."""
    n64 = jnp.int64(FRAG)
    g = jnp.take(base, jnp.clip(rmp[:, RR_BASE], 0, None), axis=0)
    av = _w32(g[:, RC_AMP0] + n64 * g[:, RC_DAMP])
    at = rmp[:, RR_ATMR]
    atg = rmp[:, RR_AT]
    vv = _w32(g[:, RC_VOL0] + n64 * g[:, RC_DVOL])
    vt = rmp[:, RR_VTMR]
    vtg = rmp[:, RR_VT]
    pv = _w32(g[:, RC_PAN0] + n64 * g[:, RC_DPAN])
    ptm = rmp[:, RR_PTMR]
    ptg = rmp[:, RR_PT]
    pcv = rmp[:, RR_PV]
    pct = rmp[:, RR_PTIMER]
    pctg = rmp[:, RR_PTGT]
    pramp = rmp[:, RR_PRAMP]
    dphraw = rmp[:, RR_DPHRAW] & _M32
    period = rmp[:, RR_PERIOD] & _M32
    mip = rmp[:, RR_MIP]
    # noise runs carry the RNG state in RC_SIZE: no phase wrap
    noise = (g[:, RC_MODE] & _ROW_NOISE) != 0
    msz = jnp.where(noise, 0, g[:, RC_SIZE] << 24)
    safe_m = jnp.where(msz > 0, msz, 1)
    dph0 = g[:, RC_DPH] & _M32
    ph0 = (g[:, RC_PHHI] << 32) | (g[:, RC_PHLO] & _M32)
    ph = ph0 + n64 * dph0

    # fragment k's frame count: 64 mid-run, the remaining tail for a
    # terminal (partial-fragment closing) merge.  prepare()'s branch
    # selection depends on it, so the replay must use the real count.
    span = g[:, RC_OFF] + g[:, RC_TOTAL]

    # noise S&H draw counts (wtosc.c:129-152): draws consumed before
    # fragment k, accumulated across the replay so the device can
    # LCG-jump to each fragment's starting RNG state.  Fragment 0:
    # samples [OFF, min(span, 64)).
    off0 = g[:, RC_OFF]
    end0 = jnp.clip(span, 0, FRAG)
    dcnt = jnp.where(
        dph0 >= (1 << 23), end0 - off0,
        ((ph0 + end0 * dph0) >> 23) - ((ph0 + off0 * dph0) >> 23))

    def step(carry, k):
        (av, at, vv, vt, pv, ptm, pcv, pct, pramp, dphraw, ph,
         dcnt) = carry
        fr = jnp.clip(span - (k << 6), 1, FRAG)
        av2, ad, at2 = _prepare_vec(av, atg, at, fr)
        vv2, vd, vt2 = _prepare_vec(vv, vtg, vt, fr)
        pv2, pd, ptm2 = _prepare_vec(pv, ptg, ptm, fr)
        # wtosc_run_pitch
        pcv2, pcd, pct2 = _prepare_vec(pcv, pctg, pct, fr)
        skip = (dphraw != 0) & (pct2 == 0) & (pramp == 0)
        lastv = pcv2 & _M32
        pcv3 = jnp.where(skip, pcv2, _w32(pcv2 + pcd * fr))
        pin = ((lastv + (pcv3 & _M32)) & _M32) >> 9
        dphraw2 = jnp.where(skip, dphraw, _p2i_vec(pin))
        pramp2 = jnp.where(skip, pramp, pcd)
        dph = (dphraw2 * period) >> mip
        phm = jnp.where(msz > 0, ph % safe_m, ph)
        # int32-packed output (ph split hi/lo): every field fits 32
        # bits (av/ad/vv/vd/pv/pd are _w32-folded, dph is the runmat's
        # int32 phase-increment range, dcnt <= RUN_KCHUNK*64), so the
        # expansion's big per-row trajectory gather moves half the
        # bytes of the old int64 matrix
        out = (av2, ad, vv2, vd, pv2, pd, dph, phm >> 32,
               phm & _M32, dcnt)
        dk = jnp.where(dph >= (1 << 23), fr,
                       ((phm + fr * dph) >> 23) - (phm >> 23))
        carry = (_w32(av2 + ad * fr), at2,
                 _w32(vv2 + vd * fr), vt2,
                 _w32(pv2 + pd * fr), ptm2,
                 pcv3, pct2, pramp2, dphraw2, phm + fr * dph,
                 dcnt + dk)
        return carry, out

    carry0 = (av, at, vv, vt, pv, ptm, pcv, pct, pramp, dphraw, ph,
              dcnt)
    _, outs = jax.lax.scan(step, carry0,
                           jnp.arange(1, RUN_KCHUNK, dtype=jnp.int64))
    # one [K-1, NrR, 10] int32 matrix so the expansion needs a single
    # int32 row gather instead of nine int64 element gathers
    return jnp.stack([o.astype(jnp.int32) for o in outs], axis=-1)


_BARRIER_DEFAULT = "ramp"


def _expand_rows(slots, atlas, class_sig, tbase_devs, runmat,
                 rampmat, dead_slot, interpret, has_ramp=False,
                 quality=0, rowperm=None, mono=False):
    """Expands oscillator runs into per-fragment kernel rows ON THE
    DEVICE, evaluates them with the pallas kernel and scatter-adds
    the panmixed audio into the slots.

    class_sig: static tuple of (pass_class, NB); tbase_devs: per-class
    int32[NB] device arrays; runmat: int32[Nr, RC_N].  A LINEAR run's
    row k (0 <= k < LEN) is its fragment FRAG0+k with
        phase  = wrap(PH0 + k*64*DPH)   [mod SIZE<<24 when looped]
        amp0   = AMP0 + k*64*DAMP       [int32 wrap]
        vol/pan likewise; slot = SLOT + k
    — exactly the values the per-fragment record pass would have
    emitted (native/a2rt_record.inc rec_commit merges only when this
    linear prediction holds).  A RAMP run's rows k >= 1 instead come
    from the _ramp_scan replay of the reference's per-fragment
    ramper/pitch requantization (verified fragment-by-fragment by the
    record pass)."""
    Rtot = sum(NB * OK.RPB for _, NB in class_sig)
    probe = _probes()
    if "noexpand" in probe:
        return slots

    # Materialization barriers: the isolated costs of this function's
    # ops are small (take+segsum 3.4 ms, transpose 0.26 ms, param
    # pack 0.07 ms at k2trance 12-s shapes — tools/bench_accum.py),
    # but composed, XLA re-fuses producer chains into every consumer
    # and the same program measures 3-4x that (the round-4 "mere act
    # of substituting" effect).  A2_EXPAND_BARRIER=a,b,... ablates
    # barrier placements with tools/bench_true_compute.py; the
    # default set is the measured-best combination.
    _bset = _os.environ.get("A2_EXPAND_BARRIER", _BARRIER_DEFAULT)
    _bset = set(_bset.split(",")) if _bset else set()

    def _bar(name, *xs):
        if name in _bset or "all" in _bset:
            xs = jax.lax.optimization_barrier(xs)
        return xs if len(xs) > 1 else xs[0]

    rm = runmat
    start = rm[:, RC_START]
    alive_run = (rm[:, RC_LEN] > 0).astype(jnp.int32)
    mark = jnp.zeros(Rtot + 1, jnp.int32).at[
        jnp.clip(start, 0, Rtot)].add(alive_run)
    rid = jnp.cumsum(mark[:Rtot]) - 1
    if "norungather" in probe:
        g = jnp.broadcast_to(rm[0] + rid[0], (Rtot, rm.shape[1]))
    else:
        # rid is non-decreasing by construction (cumsum of start
        # marks), so the run->row gather is a SORTED row gather
        g = jax.lax.gather(
            rm, jnp.clip(rid, 0, None)[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, rm.shape[1]),
            indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    g = _bar("g", g)
    p = jnp.arange(Rtot, dtype=jnp.int32)
    k = p - g[:, RC_START]
    alive = (rid >= 0) & (k < g[:, RC_LEN])
    k64 = k.astype(jnp.int64)
    kn = k << 6                      # int32: k*64 (k < 2^19)
    dph = g[:, RC_DPH]
    # the ONLY per-row int64 the expansion keeps: the raw phase
    # accumulate (one mul+add; bits above 32 are real).  Everything
    # downstream runs in int32 lanes — in particular the loop wrap
    # moves to int32 POSITION space: ph = pos*2^24 + frac with
    # 0 <= frac < 2^24 and msz = size<<24, so
    # ph mod msz == (pos mod size)*2^24 + frac exactly (floor-mod on
    # both sides), and the int32 % is far cheaper than the emulated
    # 64-bit division the VPU would otherwise run per row
    ph = ((g[:, RC_PHHI].astype(jnp.int64) << 32)
          | (g[:, RC_PHLO].astype(jnp.int64) & 0xFFFFFFFF)) \
        + k64 * (dph.astype(jnp.int64) << 6)
    # noise rows carry the RNG state in RC_SIZE — never phase-wrap
    noisef = (g[:, RC_MODE] & _ROW_NOISE) != 0
    sz = jnp.where(noisef, 0, g[:, RC_SIZE])
    wrap = (sz > 0) & (k > 0)
    pos32 = (ph >> 24).astype(jnp.int32)
    f32 = (ph & 0xFFFFFF).astype(jnp.int32)
    pos32 = jnp.where(wrap,
                      pos32 % jnp.where(sz > 0, sz, 1), pos32)
    # int32-wrap per-row bases: congruent mod 2^32 with the int64
    # forms, and the per-sample recurrences (kernel and reference
    # alike) wrap at 32 bits anyway
    amp = g[:, RC_AMP0] + kn * g[:, RC_DAMP]
    damp = g[:, RC_DAMP]
    dph32 = dph
    vol0 = g[:, RC_VOL0] + kn * g[:, RC_DVOL]
    pan0 = g[:, RC_PAN0] + kn * g[:, RC_DPAN]
    dvol = g[:, RC_DVOL]
    dpan = g[:, RC_DPAN]
    if has_ramp and "noramp" in probe:
        has_ramp = False
    if has_ramp:
        traj = _ramp_scan(rampmat.astype(jnp.int64),
                          rm.astype(jnp.int64))
        NrR = rampmat.shape[0]
        ridx = g[:, RC_RIDX]
        fidx = jnp.clip(k - 1, 0, RUN_KCHUNK - 2).astype(jnp.int64) \
            * NrR + jnp.clip(ridx, 0, None).astype(jnp.int64)
        tg = jnp.take(traj.reshape(-1, traj.shape[-1]), fidx,
                      axis=0)                        # [Rtot, 10] i32
        use = (ridx >= 0) & (k >= 1) & alive
        if "trajonly" in probe:         # perf diagnosis only
            # force the replay's compute but keep the fields linear:
            # a data-dependent comparison XLA cannot constant-fold
            # keeps tg live while (in practice) adding 0
            sent = jnp.int32(-(1 << 30) + 12345)
            amp = amp + jnp.where(
                tg.sum(axis=1) == sent, 1, 0).astype(amp.dtype)
            use = jnp.zeros_like(alive)
            has_ramp = False
        amp = jnp.where(use, tg[:, 0], amp)
        damp = jnp.where(use, tg[:, 1], damp)
        vol0 = jnp.where(use, tg[:, 2], vol0)
        dvol = jnp.where(use, tg[:, 3], dvol)
        pan0 = jnp.where(use, tg[:, 4], pan0)
        dpan = jnp.where(use, tg[:, 5], dpan)
        dph32 = jnp.where(use, tg[:, 6], dph32)
        # traj phase is already wrapped by the scan; assemble its
        # (pos, frac24) split straight from the int32 hi/lo words
        pos32 = jnp.where(
            use,
            (tg[:, 7] << 8)
            | jax.lax.shift_right_logical(tg[:, 8],
                                          jnp.int32(24)), pos32)
        f32 = jnp.where(use, tg[:, 8] & 0xFFFFFF, f32)
        # materialize the substituted per-row vectors ONCE: without
        # the barrier XLA duplicates the trajectory gather into every
        # downstream fused consumer (kernel param packing, noise
        # inputs), re-evaluating it per consumer — measured ~22 ms of
        # a k2trance superblock's 80 ms (trajonly probe, round 4
        # pre-fusion).  Gated as barrier token "ramp" (in
        # _BARRIER_DEFAULT): XLA does not DCE an optimization
        # barrier's operands, so the barrier also pins the WHOLE
        # upstream glue live — which both distorts probe attribution
        # and (post-panmix-fusion, where the duplication pathology is
        # gone — trajonly measures 0.6 ms) may cost more than it
        # saves.  A/B with A2_EXPAND_BARRIER= (empty).
        if "ramp" in _bset or "all" in _bset:
            (amp, damp, vol0, dvol, pan0, dpan, pos32, f32,
             dph32) = jax.lax.optimization_barrier(
                (amp, damp, vol0, dvol, pan0, dpan, pos32, f32,
                 dph32))
    else:
        use = jnp.zeros_like(alive)
    # noise draws consumed before this row's fragment (RAMP rows get
    # the scan-accumulated count; LINEAR rows are closed-form below)
    cnt0 = jnp.where(use, tg[:, 9].astype(jnp.int64), 0) if has_ramp \
        else jnp.zeros_like(k64)
    az = alive.astype(jnp.int32)
    pos = (pos32 + g[:, RC_POSOFF]) * az
    f = f32 * az
    amp = amp * az
    damp = damp * az
    zeros = jnp.zeros_like(pos)

    off = jnp.where(k == 0, g[:, RC_OFF], 0)
    end = jnp.clip(g[:, RC_OFF] + g[:, RC_TOTAL] - kn, 0, FRAG)
    end = jnp.where(alive, end, 0)
    slot_r = jnp.where(alive, g[:, RC_SLOT] + k, dead_slot)
    mode = g[:, RC_MODE]
    fused = "nopanmix" not in probe
    # panmix ramp bases/deltas folded to int32: the per-sample
    # recurrences wrap at 32 bits (C semantics), so the int64 deltas
    # are congruent mod 2^32 and the kernel's int32-wrap evaluation
    # reproduces the engine's true (never-overflowing) i32 values
    fields = [pos, f, (dph32 >> 24) * az, (dph32 & 0xFFFFFF) * az,
              amp, damp, vol0, dvol, pan0, dpan, off, end,
              mode, zeros, zeros, zeros]
    if "nofields" in probe:         # perf diagnosis only
        # constant params: XLA DCEs the run gather, phase math, and
        # param arithmetic upstream (keeps slot_r, kernel, scatter)
        z0 = jnp.broadcast_to(jnp.int32(0), (Rtot,))
        fields = [z0] * len(fields)
    fields = list(_bar("fields", *fields))

    outs = []
    b0 = 0
    for (cls, NB), tb in zip(class_sig, tbase_devs):
        if not NB:
            continue
        P = NB * OK.RPB
        sl = slice(b0, b0 + P)
        if cls == 0:
            # table-less class: S&H LCG noise replay, or a dc row
            # (dc.c LINEAR), whose output IS the amp trajectory.
            # The int64 phase is reassembled HERE, on the class-0
            # slice only (noise rows never wrap, so the linear ph is
            # exact; ramp rows take the scan's wrapped hi/lo words)
            ph_sl = ph[sl]
            use_sl = use[sl]
            if has_ramp:
                ph_sl = jnp.where(
                    use_sl,
                    (tg[sl, 7].astype(jnp.int64) << 32)
                    | (tg[sl, 8].astype(jnp.int64) & 0xFFFFFFFF),
                    ph_sl)
            if "nocls0" in probe:       # perf diagnosis only
                outs.append(jnp.zeros(
                    (P, (FRAG if mono else 2 * FRAG)), jnp.int32))
                b0 += P
                continue
            res = _noise_audio(
                g[sl, RC_SIZE], g[sl, RC_POSOFF], ph_sl,
                dph32[sl].astype(jnp.int64) & 0xFFFFFFFF,
                off[sl].astype(jnp.int64),
                g[sl, RC_OFF].astype(jnp.int64), k64[sl],
                use_sl, cnt0[sl], amp[sl], damp[sl])
            dcf = ((g[sl, RC_MODE] & _ROW_DC) != 0)[:, None]
            nn_ = jnp.arange(FRAG, dtype=jnp.int64)[None, :]
            dcres = _w32(amp[sl].astype(jnp.int64)[:, None]
                         + nn_ * damp[sl].astype(jnp.int64)[:, None])
            res = jnp.where(dcf, dcres.astype(res.dtype), res)
            if "nocls0pm" in probe:     # perf diagnosis only
                outs.append(res if mono else jnp.concatenate(
                    [res, jnp.zeros_like(res)], axis=1))
                b0 += P
                continue
            outs.append(_panmix_rows(
                res, vol0[sl], dvol[sl], pan0[sl], dpan[sl],
                off[sl], end[sl], mode[sl], fused,
                mono=mono))                     # (P, C*64)
            b0 += P
            continue
        # flat (NPARAM, P) param layout: a pure slice/concat for XLA
        # (the old per-block (NB*NPARAM, RPB) interleave cost a real
        # on-device relayout of the whole param matrix)
        par = jnp.stack([x[sl] for x in fields])
        if "nokernel" in probe:
            res = jnp.zeros(((FRAG if mono else 2 * FRAG), P),
                            jnp.int32)
        else:
            # the kernel applies the per-row panmix + the [OFF, END)
            # validity window IN the pallas program (2 output
            # channel sublanes per row; 1 for mono programs) — the
            # XLA side never builds a per-sample int64 row matrix
            res = OK._osc_call(cls, tb, par, atlas,
                               interpret=interpret, quality=quality,
                               fused_pm=fused, mono=mono)
        outs.append(res.T)                      # (P, C*64)
        b0 += P
    audio = jnp.concatenate(outs, axis=0)       # [Rtot, C*FRAG] i32
    audio = _bar("audio", audio)

    if "noscatter" in probe:        # perf diagnosis only
        if mono:
            return slots.at[0, 0].add(audio.sum(axis=0))
        return slots.at[0].add(audio.sum(axis=0).reshape(2, FRAG))
    # rows stay in class/table order for the kernel, so slot ids
    # can't be PRE-sorted.  Two equivalent accumulations (int32 wrap
    # adds commute, so order is free):
    #   scatter (DEFAULT) — segment_sum directly on unsorted keys;
    #   sorted (A2_ACCUM=sorted) — gather rows into slot order first,
    #     then a sorted segment-sum (perm precomputed on the host and
    #     shipped in the blob; on-device sort for perm-less callers).
    # Round-3 relay-polluted timings said sorted wins 6 vs 16.5 ms;
    # the round-5 TRUE chain measurement (tools/bench_true_compute)
    # says the opposite — the [Rtot, C*64] row gather costs more than
    # XLA's unsorted scatter (47.0 vs 51.2 ms/superblock FULL), so
    # scatter is the production default.
    if _os.environ.get("A2_ACCUM", "scatter") != "sorted":
        seg = jax.ops.segment_sum(
            audio, slot_r.astype(jnp.int32),
            num_segments=slots.shape[0])
    else:
        if rowperm is not None:
            perm = rowperm
            keys = jnp.take(slot_r.astype(jnp.int32), perm)
        else:
            keys, perm = jax.lax.sort_key_val(
                slot_r.astype(jnp.int32),
                jnp.arange(Rtot, dtype=jnp.int32))
        audio2, keys = _bar("sorted", jnp.take(audio, perm, axis=0),
                            keys)
        seg = jax.ops.segment_sum(
            audio2, keys, num_segments=slots.shape[0],
            indices_are_sorted=True)
    seg = _bar("seg", seg)
    if mono:
        return slots.at[:, 0].add(seg)
    return slots + seg.reshape(slots.shape)


def _panmix_rows(osc, vol0, dvol, pan0, dpan, off, end, mode, fused,
                 mono=False):
    """Reference panmix (panmix.c panmix_process12/process11) for the
    table-less class-0 rows (noise/dc), whose audio is computed in
    XLA rather than the pallas kernel: per-sample vol/pan ramps
    (int64 folded through int32 so the fragment-frame-0 wrap carry
    cancels), stereo positioning with the 2*vol clamp, and the
    [OFF, END) validity window.  Returns int32 [P, 2*FRAG] (channel 0
    sublanes 0..63, channel 1 64..127) matching the fused kernel's
    row layout — or [P, FRAG] channel 0 only for mono programs (no
    row carries ROW_STEREO, so channel 1 is identically zero)."""
    n = jnp.arange(FRAG, dtype=jnp.int64)[None, :]
    dvol = dvol.astype(jnp.int64)
    valid = (n >= off.astype(jnp.int64)[:, None]) \
        & (n < end.astype(jnp.int64)[:, None])
    osc64 = osc.astype(jnp.int64)
    if not fused:                   # perf diagnosis only
        ch0s = jnp.where(valid, osc64, 0)
        if mono:
            return ch0s.astype(jnp.int32)
        ch1s = jnp.zeros_like(ch0s)
        return jnp.concatenate(
            [ch0s, ch1s], axis=1).astype(jnp.int32)
    vol = (vol0.astype(jnp.int64)[:, None]
           + n * dvol[:, None]) \
        .astype(jnp.int32).astype(jnp.int64)
    haspm = ((mode & _ROW_HASPM) != 0)[:, None]
    mono_pm = (osc64 * vol) >> 24
    if mono:
        ch0 = jnp.where(haspm, mono_pm, osc64)
        return jnp.where(valid, ch0, 0).astype(jnp.int32)
    dpan = dpan.astype(jnp.int64)
    pan = (pan0.astype(jnp.int64)[:, None]
           + n * dpan[:, None]) \
        .astype(jnp.int32).astype(jnp.int64)
    vp = (pan * vol) >> 24
    v0 = vol - vp
    v1 = vol + vp
    lim = vol << 1
    clamp = ((mode & _ROW_CLAMP) != 0)[:, None]
    v0 = jnp.where(clamp, jnp.minimum(v0, lim), v0)
    v1 = jnp.where(clamp, jnp.minimum(v1, lim), v1)
    stereo = ((mode & _ROW_STEREO) != 0)[:, None]
    l_pm = (osc64 * v0) >> 24
    r_pm = (osc64 * v1) >> 24
    ch0 = jnp.where(haspm, jnp.where(stereo, l_pm, mono_pm), osc64)
    ch1 = jnp.where(haspm & stereo, r_pm, jnp.zeros_like(osc64))
    ch0s = jnp.where(valid, ch0, 0)
    ch1s = jnp.where(valid, ch1, 0)
    return jnp.concatenate([ch0s, ch1s], axis=1).astype(jnp.int32)


def _emit(slots, dst, ch_out, mask, add):
    """Writes per-channel int64 [K, 64] outputs into dst slots,
    masked to the slice range.  REPLACE becomes add-of-difference so
    duplicate dst indices stay well-defined.

    The accumulation runs as a sorted segment-sum instead of a
    scatter-add: stage tables are build-time sorted by dst (padding =
    dead slot = highest index), and segment_sum with sorted ids
    measures ~3x faster than scatter on this TPU (XLA lowers the
    sorted case to a vectorized scan instead of serializing
    duplicates)."""
    K = mask.shape[0]
    delta = jnp.zeros((K, 2, FRAG), jnp.int32)
    old = slots[dst]
    for ch, out in ch_out.items():
        out32 = out.astype(jnp.int32)
        if add:
            d = jnp.where(mask, out32, 0)
        else:
            d = jnp.where(mask, out32 - old[:, ch], 0)
        delta = delta.at[:, ch].set(d)
    nslot = slots.shape[0]
    seg = jax.ops.segment_sum(
        delta.reshape(K, 2 * FRAG), dst.astype(jnp.int32),
        num_segments=nslot, indices_are_sorted=True)
    return slots + seg.reshape(nslot, 2, FRAG)


def _div64(num, den):
    """C truncating i64 division, den > 0 (waveshaper.c's division;
    den >= 2^24 for in-range audio).  Same exact two-stage scheme as
    _tdiv."""
    den = jnp.where(den <= 0, 1, den)
    return _tdiv(num, den)


def _stage_key_meta(key):
    """(add, sch) for either stage-key layout (copy/ws vs panmix)."""
    if key[2] in ("copy", "ws"):
        return key[4], key[5]
    return key[5], key[6]


def _stage_math(key, x0, x1, a, ns):
    """Shared per-slice stage arithmetic (panmix / copy / waveshaper)
    on int64 channel inputs [K, 64]: returns {dst_channel: int64
    output}.  ns = slice-local sample index (rampers advance in
    slice-local samples, a2_RunRamper); a = int64 slice params with
    p0..p4 in columns 4..8.  Used identically by the legacy
    (slice-list) and dense (instance-span) stage paths."""
    kind = key[2]
    if kind == "copy":
        return {key[6][0]: x0}
    if kind == "ws":
        # waveshaper.c:67-105 fixed-point path, exact int64 incl. the
        # truncating division (cf. native a2rt_units.inc ws_process)
        av = _w32(a[:, 4:5] + ns * a[:, 5:6])
        a3p1 = _w32(_w32(_w32(av << 1) + av) + (1 << 24))
        a4 = av >> 4
        asqr = _w32((a4 * a4) >> 24)
        vsqr = _w32((x0 * x0) >> 22)
        vout = x0 * a3p1
        sq = av * vsqr
        vout = jnp.where(x0 >= 0, vout - sq, vout + sq)
        den = ((asqr * vsqr) >> 16) + (1 << 24)
        return {key[6][0]: _div64(vout, den)}
    ni, no, dch = key[3], key[4], key[7]
    vol = a[:, 4:5] + ns * a[:, 5:6]
    if ni == 1 and no == 1:
        return {dch[0]: (x0 * vol) >> 24}
    pan = a[:, 6:7] + ns * a[:, 7:8]
    clamp = (a[:, 8:9] != 0)
    vp = (pan * vol) >> 24
    v0 = vol - vp
    v1 = vol + vp
    lim = vol << 1
    v0 = jnp.where(clamp, jnp.minimum(v0, lim), v0)
    v1 = jnp.where(clamp, jnp.minimum(v1, lim), v1)
    # destination channel 0xFF = dropped (the native record's
    # drop-channel variant: that side of the panmix writes an
    # unowned, unreadable buffer)
    if ni == 1 and no == 2:
        out = {}
        if dch[0] != 0xFF:
            out[dch[0]] = (x0 * v0) >> 24
        if dch[1] != 0xFF:
            out[dch[1]] = (x0 * v1) >> 24
        return out
    if ni == 2 and no == 1:
        return {dch[0]: (x0 * v0 + x1 * v1) >> 25}
    out = {}
    if dch[0] != 0xFF:
        out[dch[0]] = (x0 * v0) >> 24
    if dch[1] != 0xFF:
        out[dch[1]] = (x1 * v1) >> 24
    return out


def _apply_stage(slots, key, arr):
    """Legacy slice-list stage path: arbitrary (slot, off, frames)
    slices, gathered/accumulated by slot id.  Production content
    mostly rides _apply_stage_dense; this path keeps the leftovers
    (instances with sub-fragment splits, partial-coverage groups)."""
    a = arr.astype(jnp.int64)
    src = slots[a[:, 0]]                   # [K, 2, 64] int32
    n = jnp.arange(FRAG, dtype=jnp.int64)[None, :]
    o = a[:, 2:3]
    f = a[:, 3:4]
    mask = (n >= o) & (n < o + f)
    # rampers advance in slice-local samples (a2_RunRamper): the
    # value at absolute frame n is value + (n - offset) * delta
    ns = n - o
    add, sch = _stage_key_meta(key)
    x0 = src[:, sch[0]].astype(jnp.int64)
    x1 = src[:, sch[-1]].astype(jnp.int64)
    return _emit(slots, a[:, 1], _stage_math(key, x0, x1, a, ns),
                 mask, add)


def _apply_stage_dense(slots, key, darr):
    """Dense stage path: instances whose slices are one-per-fragment
    (host-verified at build time) ship as [G, F, 9] tables whose row
    f IS fragment f of a contiguous slot span, so the slice gather
    and the segment-sum emit become contiguous dynamic slices — on
    TPU, gathers/scatters over the slot array were the dominant
    stage cost (scatter serializes per element), while span
    slice/update run at HBM bandwidth.

    Fragments the instance didn't process carry frames=0: their
    delta is zero and the read-modify-write writes back what it
    read, which also makes all-zero padding groups (span start 0 =
    master) harmless.

    All G groups evaluate in ONE windowed gather + stage math + ONE
    windowed scatter-add (update_window_dims) instead of a serial
    G-round dynamic-slice/update chain: groups of one stage key are
    order-independent (the build already emits them in span-sorted,
    not record, order), REPLACE groups have host-verified unique
    destination spans (duplicate-destination REPLACE pairs are
    demoted to the legacy slice list at build time), and span
    windows are instance-aligned so distinct starts never overlap.
    A2_DENSE_SERIAL=1 keeps the old loop for A/B."""
    G, F = darr.shape[0], darr.shape[1]
    add, sch = _stage_key_meta(key)
    if not _os.environ.get("A2_DENSE_SERIAL"):
        nn = jnp.arange(FRAG, dtype=jnp.int64)[None, :]
        a = darr.reshape(G * F, 9).astype(jnp.int64)
        s0 = darr[:, 0, 0]
        d0 = darr[:, 0, 1]
        gdn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0,))
        src = jax.lax.gather(
            slots, s0[:, None], gdn, slice_sizes=(F, 2, FRAG),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS) \
            .reshape(G * F, 2, FRAG)
        o = a[:, 2:3]
        f = a[:, 3:4]
        mask = (nn >= o) & (nn < o + f)
        ns = nn - o
        x0 = src[:, sch[0]].astype(jnp.int64)
        x1 = src[:, sch[-1]].astype(jnp.int64)
        outs = _stage_math(key, x0, x1, a, ns)
        if add:
            dst = None
        else:
            dst = jax.lax.gather(
                slots, d0[:, None], gdn, slice_sizes=(F, 2, FRAG),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS) \
                .reshape(G * F, 2, FRAG)
        delta = jnp.zeros((G * F, 2, FRAG), jnp.int32)
        for ch, out in outs.items():
            out32 = out.astype(jnp.int32)
            if add:
                d = jnp.where(mask, out32, 0)
            else:
                d = jnp.where(mask, out32 - dst[:, ch], 0)
            delta = delta.at[:, ch].set(d)
        sdn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,))
        return jax.lax.scatter_add(
            slots, d0[:, None], delta.reshape(G, F, 2, FRAG), sdn,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    n = jnp.arange(FRAG, dtype=jnp.int64)[None, :]
    for g2 in range(G):
        a = darr[g2].astype(jnp.int64)     # [F, 9]
        s0 = darr[g2, 0, 0]
        d0 = darr[g2, 0, 1]
        src = jax.lax.dynamic_slice(slots, (s0, _Z, _Z), (F, 2, FRAG))
        o = a[:, 2:3]
        f = a[:, 3:4]
        mask = (n >= o) & (n < o + f)
        ns = n - o
        x0 = src[:, sch[0]].astype(jnp.int64)
        x1 = src[:, sch[-1]].astype(jnp.int64)
        outs = _stage_math(key, x0, x1, a, ns)
        dst = jax.lax.dynamic_slice(slots, (d0, _Z, _Z), (F, 2, FRAG))
        for ch, out in outs.items():
            out32 = out.astype(jnp.int32)
            if add:
                d = jnp.where(mask, out32, 0)
            else:
                # REPLACE as add-of-difference: dense masks are
                # disjoint from any leftover legacy slices of the
                # same stage (one slice per fragment per instance),
                # so reading `old` after earlier dense groups is
                # exact (see _emit)
                d = jnp.where(mask, out32 - dst[:, ch], 0)
            dst = dst.at[:, ch].add(d)
        slots = jax.lax.dynamic_update_slice(slots, dst, (d0, _Z, _Z))
    return slots


def _apply_fbdelay(slots, sig, arr, ring, bufpos):
    """sig: (stereoin, stereoout, add, chunk).  arr int32[NS,13] (NS a
    multiple of chunk), ring int32[2,SIZE], bufpos int32 scalar (mod
    SIZE).  Returns (slots, new_ring).

    The scan processes `chunk` consecutive slices per step; exact
    because every tap delay >= the chunk's ring span, so no tap ever
    reads a sample written within the same step (same argument as the
    host engine's vectorized path, units/host_units.py fbdelay)."""
    stereoin, stereoout, add, C = sig
    a = arr.astype(jnp.int64)
    NS = arr.shape[0]
    M = _FBD_BUFSIZE - 1
    src0 = slots[a[:, 0]][:, 0]
    src1 = slots[a[:, 1]][:, 1 if stereoin else 0]
    old0 = slots[a[:, 2]][:, 0]
    old1 = slots[a[:, 3]][:, 1]

    frames = a[:, 5]
    starts = bufpos.astype(jnp.int64) + jnp.concatenate(
        [jnp.zeros(1, jnp.int64), jnp.cumsum(frames)[:-1]])

    nvec = jnp.arange(FRAG, dtype=jnp.int64)[None, :]
    oj = a[:, 4:5]
    fj = a[:, 5:6]
    msk = nvec < fj
    widx = (starts[:, None] + nvec) & M
    # slice-local positions: input sample k is bus frame o+k
    ridx = jnp.clip(nvec + oj, 0, FRAG - 1)
    src0 = jnp.take_along_axis(src0, ridx, axis=1)
    src1 = jnp.take_along_axis(src1, ridx, axis=1)

    def chunked(x):
        return x.reshape((NS // C, C) + x.shape[1:])

    # The scan carries ONLY the cross-feedback recurrence — the one
    # true serial dependency (chunk bound: fb delay >= C*FRAG, so fb
    # taps never read their own chunk's writes).  The ld/rd reader
    # taps and the dry path run vectorized over the whole superblock
    # against the FINAL ring below: a reader tap at sample p reads
    # position p - dl < p, which the completed scan has already
    # written with exactly the serial engine's value — and the ring
    # is sized so a superblock's writes never wrap over any reader's
    # lookback window (see _FBD_BUFSIZE).
    choff = (jnp.arange(2, dtype=jnp.int64)
             * _FBD_BUFSIZE)[:, None, None]
    # masked samples (a partial slice's tail overlaps the next
    # slice's ring range) are redirected to a dump cell past the
    # ring, so every REAL ring position is written by exactly one
    # sample — no duplicate-order dependence, and no need to read
    # back current values for preservation
    DUMP = 2 * _FBD_BUFSIZE

    def step(rf, xs):
        i0, i1, wid, m, fb, fbg = xs
        i01 = jnp.stack([i0, i1]).astype(jnp.int64)     # [2, C, 64]
        # cross-feedback: left output taps the RIGHT ring and vice
        # versa (fbdelay.c stereo-reversed taps) — choff flipped
        fidx = ((wid - fb[:, None]) & M)[None] + choff[::-1]
        ftap = jnp.take(rf, fidx).astype(jnp.int64)
        o_fb = (ftap * fbg[None, :, None]) >> 16
        w = (i01 + o_fb).astype(jnp.int32)
        tgt = jnp.where(m[None], wid[None] + choff, DUMP)
        rf = rf.at[tgt].set(w)
        return rf, (o_fb[0].astype(jnp.int32),
                    o_fb[1].astype(jnp.int32))

    xs = tuple(chunked(x) for x in
               (src0, src1, widx, msk, a[:, 6], a[:, 10]))
    rf0 = jnp.concatenate([ring.reshape(-1),
                           jnp.zeros(1, jnp.int32)])
    rff, (out0, out1) = jax.lax.scan(step, rf0, xs)
    R2f = rff[:-1].reshape(2, _FBD_BUFSIZE)
    L, R = R2f[0], R2f[1]
    ld = a[:, 7:8]
    rd = a[:, 8:9]
    dry = a[:, 9:10]
    lg = a[:, 11:12]
    rg = a[:, 12:13]
    out0 = out0.reshape(NS, FRAG).astype(jnp.int64)
    out1 = out1.reshape(NS, FRAG).astype(jnp.int64)
    out0 = out0 + ((jnp.take(L, (widx - ld) & M).astype(jnp.int64)
                    * lg) >> 16)
    out1 = out1 + ((jnp.take(R, (widx - rd) & M).astype(jnp.int64)
                    * rg) >> 16)
    out0 = out0 + ((src0.astype(jnp.int64) * dry) >> 16)
    out1 = out1 + ((src1.astype(jnp.int64) * dry) >> 16)
    out0 = out0.astype(jnp.int32)
    out1 = out1.astype(jnp.int32)

    backidx = jnp.clip(nvec - oj, 0, FRAG - 1)
    omask = (nvec >= oj) & (nvec < oj + fj)
    out0 = jnp.take_along_axis(out0, backidx, axis=1)
    out1 = jnp.take_along_axis(out1, backidx, axis=1)
    if not stereoout:
        # mono output mixes both delay channels (fbdelay.c mono
        # variant; native a2rt_units.inc fbd_process)
        out0 = (out0 + out1) >> 1
    if add:
        d0 = jnp.where(omask, out0, 0)
        d1 = jnp.where(omask, out1, 0)
    else:
        d0 = jnp.where(omask, out0 - old0, 0)
        d1 = jnp.where(omask, out1 - old1, 0)
    # slices are time-ordered (one instance => dst ascending; padding
    # = dead slot at the end), so the emit is a sorted segment-sum
    nslot = slots.shape[0]
    seg0 = jax.ops.segment_sum(
        d0.astype(jnp.int32), arr[:, 2], num_segments=nslot,
        indices_are_sorted=True)
    slots = slots.at[:, 0].add(seg0)
    if stereoout:
        seg1 = jax.ops.segment_sum(
            d1.astype(jnp.int32), arr[:, 3], num_segments=nslot,
            indices_are_sorted=True)
        slots = slots.at[:, 1].add(seg1)
    return slots, jnp.stack([L, R])


def _apply_fbdelay_dense(slots, sig, arr, tail, F):
    """Dense fbdelay: the superblock is one CONTIGUOUS sample stream
    of a single instance with constant fb/ld/rd delays and constant
    slot spans (host-verified, program_from_native) — slices may
    still split fragments (per-slice gain ramps), so the four gain
    columns expand to per-sample vectors ON DEVICE from the slice
    table (mark+cumsum+sorted-gather, the run-expansion trick).  The
    ring is a LINEAR buffer [last 2^17 samples | superblock], and the
    feedback scan carries only a ROLLING WINDOW of ceil(fb/CH)+1
    chunks: fb/ld/rd are jit-time constants (part of the signature),
    so every slice offset is STATIC — no gather/scatter, no dynamic
    relayouts, no multi-MB carry.

    sig: (stereoin, stereoout, add, chunk_frags, fb, ld, rd); arr
    int32 [NS, 13] time-ordered slice rows (padding rows frames=0);
    tail int32 [2, FBD_TAIL], time-ordered (tail[:, -1] = newest).
    Exactness argument is the legacy path's: only the cross-feedback
    tap is serial (CH <= fb by the chunk rule), and a reader tap at
    sample t reads t - d < t, already final.  Returns
    (slots, new_tail)."""
    stereoin, stereoout, add, C, fb, ld, rd = sig
    N = F * FRAG
    D = FBD_TAIL
    CH = C * FRAG
    NPad = ((N + CH - 1) // CH) * CH
    nsteps = NPad // CH
    s0 = arr[0, 0]
    s1 = arr[0, 1]
    src0 = jax.lax.dynamic_slice(
        slots, (s0, _Z, _Z), (F, 2, FRAG))[:, 0]
    src1 = jax.lax.dynamic_slice(
        slots, (s1, _Z, _Z), (F, 2, FRAG))[:, 1 if stereoin else 0]
    i0 = src0.reshape(N)
    i1 = src1.reshape(N)

    # per-sample gains from the slice table: slice j covers samples
    # [sum(frames[:j]), +frames[j]) — coverage is contiguous and
    # time-ordered by eligibility, padding rows land at start N
    frames = arr[:, 5]
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(frames)[:-1]])
    mark = jnp.zeros(N + 1, jnp.int32).at[
        jnp.clip(starts, 0, N)].add(1)
    sid = jnp.cumsum(mark[:N]) - 1
    gains = jnp.take(arr[:, 9:13], jnp.clip(sid, 0, None),
                     axis=0).astype(jnp.int64)    # [N, 4] sorted
    dry = gains[:, 0]
    lg = gains[:, 2]
    rg = gains[:, 3]

    def padN(x):
        if NPad > N:
            return jnp.concatenate(
                [x, jnp.zeros((NPad - N,), x.dtype)])
        return x

    i01 = jnp.stack([padN(i0), padN(i1)]) \
        .reshape(2, nsteps, CH).transpose(1, 0, 2)
    fbgc = padN(gains[:, 1].astype(jnp.int32)) \
        .reshape(nsteps, CH)
    # rolling window: the last Lc chunks of the ring; the fb tap for
    # the chunk being computed sits at constant offset Lc*CH - fb
    Lc = -(-fb // CH) + 1
    off = Lc * CH - fb
    m = min(D, Lc * CH)
    win = tail[:, D - m:]
    if Lc * CH > m:
        win = jnp.concatenate(
            [jnp.zeros((2, Lc * CH - m), jnp.int32), win], axis=1)

    def step(win, xs):
        x01, gc = xs
        ftap = jax.lax.slice(win, (0, off), (2, off + CH))
        # cross-feedback: left writes tap the RIGHT ring and vice
        # versa (fbdelay.c stereo-reversed taps)
        o_fb = (ftap[::-1].astype(jnp.int64)
                * gc.astype(jnp.int64)[None]) >> 16
        w = (x01.astype(jnp.int64) + o_fb).astype(jnp.int32)
        win = jnp.concatenate([win[:, CH:], w], axis=1)
        return win, (w, o_fb.astype(jnp.int32))

    _, (wall, ofb) = jax.lax.scan(step, win, (i01, fbgc))
    buf = jnp.concatenate(
        [tail, wall.transpose(1, 0, 2).reshape(2, NPad)], axis=1)
    ofb = ofb.transpose(1, 0, 2).reshape(2, NPad)[:, :N] \
        .astype(jnp.int64)
    # reader taps: static slices (fb/ld/rd are signature constants)
    Ltap = jax.lax.slice(buf[0], (D - ld,), (D - ld + N,)) \
        .astype(jnp.int64)
    Rtap = jax.lax.slice(buf[1], (D - rd,), (D - rd + N,)) \
        .astype(jnp.int64)
    out0 = ofb[0] + ((Ltap * lg) >> 16) \
        + ((i0.astype(jnp.int64) * dry) >> 16)
    out1 = ofb[1] + ((Rtap * rg) >> 16) \
        + ((i1.astype(jnp.int64) * dry) >> 16)
    out0 = out0.astype(jnp.int32)
    out1 = out1.astype(jnp.int32)
    if not stereoout:
        # mono output mixes both delay channels (fbdelay.c mono
        # variant; native a2rt_units.inc fbd_process)
        out0 = (out0 + out1) >> 1
    new_tail = jax.lax.slice(buf, (0, N), (2, N + D))
    d0s = arr[0, 2]
    dst0 = jax.lax.dynamic_slice(slots, (d0s, _Z, _Z), (F, 2, FRAG))
    o0 = out0.reshape(F, FRAG)
    dst0 = dst0.at[:, 0].add(o0 if add else o0 - dst0[:, 0])
    slots = jax.lax.dynamic_update_slice(slots, dst0, (d0s, _Z, _Z))
    if stereoout:
        d1s = arr[0, 3]
        dst1 = jax.lax.dynamic_slice(slots, (d1s, _Z, _Z),
                                     (F, 2, FRAG))
        o1 = out1.reshape(F, FRAG)
        dst1 = dst1.at[:, 1].add(o1 if add else o1 - dst1[:, 1])
        slots = jax.lax.dynamic_update_slice(slots, dst1,
                                             (d1s, _Z, _Z))
    return slots, new_tail


def _apply_filter(slots, kind, sig, arr, state):
    """filter12 / dcblock / limiter as an instance-batched scan over
    each instance's slice sequence (reference src/units/filter12.c
    f12_process, dcblock.c, limiter.c:84-131 — per-sample serial
    recurrences, so the 64 intra-fragment samples run unrolled inside
    each scan step while instances batch on the lane axis).  State
    (filter d1/d2 per channel; limiter peak) is carried per instance
    and persists across superblocks via DeviceMixer._rings.

    sig: (ni, no, add, sch, dch).  arr int32 [S, K, 13]; state
    [K, 2, 2] int32 for f12/dcb, [K] int64 (u32 peak) for lim."""
    ni, no, add, sch, dch = sig
    a = arr.astype(jnp.int64)
    nvec = jnp.arange(FRAG, dtype=jnp.int64)[None, :]
    stereo = ni == 2

    def gather(slots, ax, col, ch):
        return slots[ax[:, col]][:, ch].astype(jnp.int64)   # [K, 64]

    def step(carry, ax):
        slots, st = carry
        x0 = gather(slots, ax, 0, sch[0])
        x1 = gather(slots, ax, 1, sch[-1]) if stereo else x0
        off = ax[:, 4]
        frm = ax[:, 5]
        msk = (nvec >= off[:, None]) & (nvec < (off + frm)[:, None])
        # The 64 intra-fragment samples run as an INNER lax.scan
        # (instances batch on the lane axis of each [K] step).  An
        # unrolled python loop is a compile-time trap on this graph:
        # per-sample lane updates (.at[:, nn].set) cost ~12 s of XLA
        # CPU compile per signature, and both leading-axis updates
        # and a 64-column jnp.stack trip XLA's slow-compile path
        # (minutes — concat fusion recomputes each column's whole
        # recurrence chain).  The scan body compiles once: ~0.4 s,
        # with identical steady-state runtime (measured both).
        nn64 = jnp.arange(FRAG, dtype=jnp.int64)
        if kind == "lim":
            rel = ax[:, 6]
            thr = ax[:, 7] & _M32

            def istep(pk, xs_):
                if stereo:
                    x0n, x1n, actn = xs_
                    lp_ = jnp.abs(x0n)
                    rp_ = jnp.abs(x1n)
                    pka = jnp.maximum(lp_, rp_)
                    pka = (pka + ((pka - jnp.abs(lp_ - rp_)) >> 1)) \
                        & _M32
                else:
                    x0n, actn = xs_
                    pka = jnp.abs(x0n) & _M32
                gt = pka > pk
                dec = (pk - rel) & _M32
                dec = jnp.where(dec < thr, thr, dec)
                pk2 = jnp.where(gt, pka, dec)
                gain = _tdiv(jnp.int64(32767 << 16),
                             jnp.maximum(((pk2 + 511) & _M32) >> 9,
                                         1))
                o0n = _w32((x0n * gain) >> 16)
                o1n = _w32((x1n * gain) >> 16) if stereo else None
                if no == 2:
                    # mono-in/stereo-out keeps channel 2 silent
                    ys = (o0n, o1n if stereo
                          else jnp.zeros_like(o0n))
                else:
                    # stereo-in/mono-out: the later channel wins the
                    # shared output (historical write order)
                    ys = (o1n if stereo else o0n,)
                return jnp.where(actn, pk2, pk), ys

            ixs = (x0.T, x1.T, msk.T) if stereo else (x0.T, msk.T)
            st2, ys = jax.lax.scan(istep, st, ixs)
            outs = [y.T for y in ys]
        else:
            # filter12.c:94-118 / dcblock.c state-variable cores;
            # state rides per-channel [K] int32 carries
            if kind == "f12":
                f0 = ax[:, 6]
                df = ax[:, 7]
                qv = ax[:, 8]
                qd = ax[:, 9]
                lp0 = ax[:, 10]
                bp0 = ax[:, 11]
                hp0 = ax[:, 12]
            else:
                fc0 = ax[:, 6] >> 12
            nch = 2 if stereo else 1

            def istep(c2, xs_):
                d1 = list(c2[0])
                d2 = list(c2[1])
                xn = xs_[:nch]
                actn, nn = xs_[nch], xs_[nch + 1]
                if kind == "f12":
                    ns_ = nn - off
                    fl = _w32(f0 + ns_ * df) >> 12
                    qq = _w32(qv + ns_ * qd) >> 12
                fos = [None] * no
                for c in range(nch):
                    x = xn[c]
                    if kind == "f12":
                        d1c = d1[c] >> 4
                        l = _w32(d2[c] + (_w32(fl * d1c) >> 8))
                        h = _w32(_w32((x >> 5) - l)
                                 - (_w32(qq * d1c) >> 8))
                        b = _w32((_w32(fl * (h >> 4)) >> 8)
                                 + d1[c])
                        fo = _w32(_w32(_w32(_w32(l * lp0)
                                            + _w32(b * bp0))
                                       + _w32(h * hp0)) >> 3)
                    else:
                        t1 = d1[c] >> 4
                        l = _w32(d2[c] + (_w32(fc0 * t1) >> 8))
                        h = _w32(_w32((x >> 5) - l)
                                 - _w32(t1 << 4))
                        b = _w32((_w32(fc0 * (h >> 4)) >> 8)
                                 + d1[c])
                        fo = _w32(h << 5)
                    # stereo-in/mono-out: the later channel's sample
                    # wins the shared output (matches the unit's
                    # historical write order)
                    fos[min(c, no - 1)] = fo
                    d1[c] = jnp.where(actn, b, d1[c]) \
                        .astype(jnp.int32)
                    d2[c] = jnp.where(actn, l, d2[c]) \
                        .astype(jnp.int32)
                fos = [f if f is not None else jnp.zeros_like(xn[0])
                       for f in fos]
                return (tuple(d1), tuple(d2)), tuple(fos)

            c0 = (tuple(st[:, 0, c] for c in range(2)),
                  tuple(st[:, 1, c] for c in range(2)))
            ixs = tuple(x.T for x in ([x0, x1] if stereo else [x0])) \
                + (msk.T, nn64)
            (d1f, d2f), ys = jax.lax.scan(istep, c0, ixs)
            outs = [y.T for y in ys]
            st2 = jnp.stack([jnp.stack(d1f, axis=1),
                             jnp.stack(d2f, axis=1)], axis=1)
        # emit (REPLACE as add-of-difference, like _emit)
        for c, dst_col, ch_d in (((0, 2, dch[0]),)
                                 + (((1, 3, dch[-1]),)
                                    if no == 2 else ())):
            out32 = outs[c].astype(jnp.int32)
            old = slots[ax[:, dst_col]][:, ch_d]
            if add:
                d = jnp.where(msk, out32, 0)
            else:
                d = jnp.where(msk, out32 - old, 0)
            slots = slots.at[ax[:, dst_col], ch_d].add(d)
        return (slots, st2), None

    (slots, state), _ = jax.lax.scan(step, (slots, state), a)
    return slots, state


def _apply_filter_float(slots, kind, sig, arr, state):
    """Production-tier (stage_mode="float") filter12 / dcblock /
    limiter: the per-sample serial recurrences become LOG-DEPTH
    associative scans instead of sample-count sequential steps (a
    single exact filter instance costs S*64 serial scan steps per
    superblock — the dominant on-chip stage cost).

    filter12 / dcblock are affine recurrences in the (d1, d2) state:
      d1' = d1*(1 - F*(F+Q)) - F*d2 + F*(x/32),   d2' = d2 + F*d1
    (F = fl/4096, Q = qq/4096 for filter12; Q = 1, F = fc0/4096 for
    dcblock — the float continuum of filter12.c:94-118 / dcblock.c
    with the integer truncations dropped), composed by
    jax.lax.associative_scan over 2x2 affine maps.  The limiter peak
    envelope is a max-plus recurrence pk' = max(pka, pk - rel, thr)
    (limiter.c:84-131 with the one-sample attack/decay hysteresis
    relaxed to its max form), composed as (drop, m) elements.

    Accuracy is the -80 dB production budget (BASELINE.md), not
    bit-exactness: tests/test_quality.py measures the tier against
    the exact goldens.  State stays in the exact tier's int32/int64
    arrays (rounded at superblock boundaries) so tiers can be
    switched per render."""
    ni, no, add, sch, dch = sig
    stereo = ni == 2
    S, K, _ = arr.shape
    N = S * FRAG
    a = arr
    nvec = jnp.arange(FRAG, dtype=jnp.int32)
    # gather every slice's input up front: slices address distinct
    # (instance, fragment) slots, so there is no within-filter
    # dependence between a slice's input and an earlier slice's
    # output (the serial scan relies on the same fact)
    x0i = slots[a[:, :, 0]][:, :, sch[0]]               # [S, K, 64]
    x1i = slots[a[:, :, 1]][:, :, sch[-1]] if stereo else x0i
    off = a[:, :, 4]
    frm = a[:, :, 5]
    act = (nvec >= off[:, :, None]) & (nvec < (off + frm)[:, :, None])

    def tl(v):
        """[S, K, 64] -> time-major [N, K]."""
        return v.transpose(1, 0, 2).reshape(K, N).T

    actt = tl(act)
    x0f = tl(x0i).astype(jnp.float32)
    x1f = tl(x1i).astype(jnp.float32) if stereo else x0f

    if kind == "lim":
        rel = tl(jnp.broadcast_to(a[:, :, 6:7], (S, K, FRAG))) \
            .astype(jnp.float32)
        thr = tl(jnp.broadcast_to(a[:, :, 7:8] & _M32,
                                  (S, K, FRAG))).astype(jnp.float32)
        if stereo:
            lp_ = jnp.abs(x0f)
            rp_ = jnp.abs(x1f)
            mx = jnp.maximum(lp_, rp_)
            pka = mx + jnp.floor((mx - jnp.abs(lp_ - rp_)) * 0.5)
        else:
            pka = jnp.abs(x0f)
        drop = jnp.where(actt, rel, 0.0)
        mseg = jnp.where(actt, jnp.maximum(pka, thr),
                         jnp.float32(-1e30))

        def comb(l, r):
            return (l[0] + r[0],
                    jnp.maximum(l[1] - r[0], r[1]))

        dC, mC = jax.lax.associative_scan(comb, (drop, mseg), axis=0)
        p0 = state.astype(jnp.float32)[None, :]
        pk = jnp.maximum(p0 - dC, mC)
        gain = jnp.float32(32767 << 16) \
            / jnp.maximum(jnp.floor((pk + 511.0) * (1.0 / 512.0)),
                          1.0)
        outs_t = []
        o0 = x0f * gain * (1.0 / 65536.0)
        o1 = (x1f * gain * (1.0 / 65536.0)) if stereo else None
        if no == 2:
            outs_t = [o0, o1 if stereo else jnp.zeros_like(o0)]
        else:
            outs_t = [o1 if stereo else o0]
        st2 = jnp.maximum(pk[-1], 1.0).astype(state.dtype)
    else:
        nch = 2 if stereo else 1
        ns_ = (nvec[None, None, :] - off[:, :, None])
        # mean-truncation bias terms: the exact tier's arithmetic
        # shifts floor away low bits at every step (l = d2 +
        # ((fl*(d1>>4))>>8) etc.); the float continuum without them
        # sits a biased random-walk away from the reference (-74 dB
        # measured).  Each floor drops a mean of 0.5 of its unit, so
        # cF = fl/512 + 0.5 (the >>4 inside the product scales by
        # fl/256) and cQ likewise fold into the affine b-terms,
        # leaving only the zero-mean half of the truncation noise.
        if kind == "f12":
            fl = _w32(a[:, :, 6:7].astype(jnp.int64)
                      + ns_.astype(jnp.int64)
                      * a[:, :, 7:8].astype(jnp.int64)) >> 12
            qq = _w32(a[:, :, 8:9].astype(jnp.int64)
                      + ns_.astype(jnp.int64)
                      * a[:, :, 9:10].astype(jnp.int64)) >> 12
            F = tl(fl).astype(jnp.float32) * (1.0 / 4096.0)
            Q = tl(qq).astype(jnp.float32) * (1.0 / 4096.0)
            cF = F * 8.0 + 0.5          # fl/512 + 0.5
            cQ = Q * 8.0 + 0.5
            hbias = -0.5 + cF + cQ      # (x>>5) floor + l/q terms
            g_lp = tl(jnp.broadcast_to(a[:, :, 10:11],
                                       (S, K, FRAG))) \
                .astype(jnp.float32)
            g_bp = tl(jnp.broadcast_to(a[:, :, 11:12],
                                       (S, K, FRAG))) \
                .astype(jnp.float32)
            g_hp = tl(jnp.broadcast_to(a[:, :, 12:13],
                                       (S, K, FRAG))) \
                .astype(jnp.float32)
        else:
            fc = jnp.broadcast_to(a[:, :, 6:7] >> 12, (S, K, FRAG))
            F = tl(fc).astype(jnp.float32) * (1.0 / 4096.0)
            Q = jnp.ones_like(F)
            cF = F * 8.0 + 0.5
            # dcblock: h = (x>>5) - l - ((d1>>4)<<4); the masked-out
            # low bits of d1 add a mean of +7.5, the x floor -0.5
            hbias = -0.5 + cF + 7.5
        FQ = F * (F + Q)
        one = jnp.ones_like(F)
        zero = jnp.zeros_like(F)

        def comb(l, r):
            a00 = r[0] * l[0] + r[1] * l[2]
            a01 = r[0] * l[1] + r[1] * l[3]
            a10 = r[2] * l[0] + r[3] * l[2]
            a11 = r[2] * l[1] + r[3] * l[3]
            b0 = r[0] * l[4] + r[1] * l[5] + r[4]
            b1 = r[2] * l[4] + r[3] * l[5] + r[5]
            return (a00, a01, a10, a11, b0, b1)

        outs_t = [None] * no
        st_cols = []
        for c in range(nch):
            xc = (x1f if c else x0f) * (1.0 / 32.0)
            A00 = jnp.where(actt, one - FQ, one)
            A01 = jnp.where(actt, -F, zero)
            A10 = jnp.where(actt, F, zero)
            A11 = one
            b0 = jnp.where(actt, F * (xc + hbias) - cF, zero)
            b1 = jnp.where(actt, -cF, zero)
            pre = jax.lax.associative_scan(
                comb, (A00, A01, A10, A11, b0, b1), axis=0)
            # pre-state at sample n = inclusive prefix of samples
            # 0..n-1 applied to the entry state
            d1_0 = state[:, 0, c].astype(jnp.float32)[None, :]
            d2_0 = state[:, 1, c].astype(jnp.float32)[None, :]

            def shifted(v, ident):
                return jnp.concatenate(
                    [jnp.full((1, K), ident, jnp.float32), v[:-1]],
                    axis=0)

            p00 = shifted(pre[0], 1.0)
            p01 = shifted(pre[1], 0.0)
            p10 = shifted(pre[2], 0.0)
            p11 = shifted(pre[3], 1.0)
            pb0 = shifted(pre[4], 0.0)
            pb1 = shifted(pre[5], 0.0)
            d1p = p00 * d1_0 + p01 * d2_0 + pb0
            d2p = p10 * d1_0 + p11 * d2_0 + pb1
            l_ = d2p + F * d1p - cF
            h_ = xc + (hbias - cF) - l_ - Q * d1p
            if kind == "f12":
                b_ = d1p + F * h_ - cF
                fo = (l_ * g_lp + b_ * g_bp + h_ * g_hp) \
                    * (1.0 / 8.0)
            else:
                fo = h_ * 32.0
            # stereo-in/mono-out: the later channel wins the shared
            # output (the unit's historical write order)
            outs_t[min(c, no - 1)] = fo
            d1e = pre[0][-1] * d1_0[0] + pre[1][-1] * d2_0[0] \
                + pre[4][-1]
            d2e = pre[2][-1] * d1_0[0] + pre[3][-1] * d2_0[0] \
                + pre[5][-1]
            st_cols.append((d1e, d2e))
        outs_t = [o if o is not None
                  else jnp.zeros((N, K), jnp.float32)
                  for o in outs_t]
        lim = jnp.float32(2**31 - 1)
        d1f = jnp.stack([jnp.clip(jnp.round(st_cols[c][0]
                                            if c < nch
                                            else st_cols[0][0] * 0),
                                  -lim, lim)
                         for c in range(2)], axis=1)
        d2f = jnp.stack([jnp.clip(jnp.round(st_cols[c][1]
                                            if c < nch
                                            else st_cols[0][1] * 0),
                                  -lim, lim)
                         for c in range(2)], axis=1)
        st2 = jnp.stack([d1f, d2f], axis=1).astype(jnp.int32)

    # emit exactly like the exact tier (REPLACE = add-of-difference)
    lim32 = jnp.float32(2**31 - 1)
    for c, dst_col, ch_d in (((0, 2, dch[0]),)
                             + (((1, 3, dch[-1]),) if no == 2
                                else ())):
        o_t = jnp.clip(outs_t[c], -lim32, lim32)
        out32 = o_t.T.reshape(K, S, FRAG).transpose(1, 0, 2) \
            .astype(jnp.int32)                          # [S, K, 64]
        old = slots[a[:, :, dst_col]][:, :, ch_d]
        if add:
            d = jnp.where(act, out32, 0)
        else:
            d = jnp.where(act, out32 - old, 0)
        slots = slots.at[a[:, :, dst_col], ch_d].add(d)
    return slots, st2


_FM_SINE_NP = None


def _fm_sine_table():
    # paired entries (sine[k+1]<<16 | u16(sine[k])): ONE gather per
    # lerp instead of two (the osc-kernel atlas trick).  Cache the
    # NUMPY table and convert per trace: caching a jnp array created
    # inside a jit trace leaks a tracer.
    global _FM_SINE_NP
    if _FM_SINE_NP is None:
        from ..units.host_units import _fm_sine
        t = _fm_sine().astype(np.int64)      # 2049 entries
        lo = t[:-1] & 0xFFFF
        hi = t[1:] & 0xFFFF
        _FM_SINE_NP = ((hi << 16) | lo).astype(np.int32)   # 2048
    return jnp.asarray(_FM_SINE_NP)


def _apply_fm(slots, sig, arr, state):
    """The fm family's oversampled operator graph as an instance-
    batched scan (reference src/units/fm.c fm_process / native
    a2rt_units.inc fm_run_t).  Each op's phase/amp/fb trajectory is
    closed-form per sample from the slice snapshot; the op's `last`
    (which feeds back into its own phase via fb>>17 — the serial
    recurrence) is the scan carry and persists across superblocks as
    device state [K, 4] int32 (DeviceMixer._filt_cache).

    sig: (structkey, add, dch); arr int32 [S, K, 27] with per-slice
    (dst, off, frm) + 4x(ph0, dph, av0, ad, fbv0, fbd), all
    fragment-frame-0 normalized."""
    structkey, add, dch = sig
    nops = (structkey >> 8) & 0xF
    parallel = (structkey >> 4) & 0xF
    osbits = (structkey >> 1) & 0x7
    OS = 1 << osbits
    a = arr.astype(jnp.int64)
    nvec = jnp.arange(FRAG, dtype=jnp.int64)[None, :]
    sine = _fm_sine_table()
    WPMASK = (2048 << 8) - 1

    def step(carry, ax):
        slots, st = carry                  # st int32 [K, 4]
        off = ax[:, 1]
        frm = ax[:, 2]
        msk = (nvec >= off[:, None]) & (nvec < (off + frm)[:, None])
        ph0 = [ax[:, 3 + i * 6] & _M32 for i in range(nops)]
        dph = [ax[:, 4 + i * 6] & _M32 for i in range(nops)]
        av0 = [ax[:, 5 + i * 6] for i in range(nops)]
        ad = [ax[:, 6 + i * 6] for i in range(nops)]
        fbv0 = [ax[:, 7 + i * 6] for i in range(nops)]
        fbd = [ax[:, 8 + i * 6] for i in range(nops)]
        dphs = [d >> osbits for d in dph]

        def istep(c2, xs_):
            last = list(c2)                # per-op [K] int32
            actn, nn = xs_
            avs = [_w32(av0[i] + nn * ad[i]) for i in range(nops)]
            fbvs = [_w32(fbv0[i] + nn * fbd[i]) for i in range(nops)]
            phs = [(ph0[i] + nn * dph[i]) & _M32 for i in range(nops)]
            cand = [x.astype(jnp.int64) for x in last]
            vsum = jnp.zeros_like(avs[0])
            for os_ in range(OS):
                def osc(i, mod):
                    # fm.c fm_osc: per-op self-feedback into phase
                    fb = (cand[i] * fbvs[i]) >> 17
                    ph = ((phs[i] + os_ * dphs[i] + mod + fb)
                          & _M32) >> 5
                    pw = ph & WPMASK
                    ix = (pw >> 8).astype(jnp.int32)
                    x = pw & 0xFF
                    pr = jnp.take(sine, ix).astype(jnp.int64)
                    s0 = ((pr & 0xFFFF) << 48) >> 48   # sext i16
                    s1 = (pr << 32) >> 48
                    cand[i] = (s0 * (256 - x) + s1 * x) >> 8
                    return _w32((cand[i] * avs[i]) >> 16)

                if parallel == 2:          # ring modulator pairs
                    if nops == 2:
                        vv0 = osc(0, jnp.int64(0))
                        vv1 = osc(1, jnp.int64(0))
                    else:
                        vv0 = osc(0, osc(2, jnp.int64(0)))
                        vv1 = osc(1, osc(3, jnp.int64(0)))
                    vsum = _w32(vsum + _w32((vv0 * vv1) >> 23))
                else:
                    vv = jnp.int64(0)
                    for i in range(nops - 1, -1, -1):
                        if i and parallel:
                            vv = _w32(vv + osc(i, jnp.int64(0)))
                        else:
                            vv = osc(i, vv)
                    vsum = _w32(vsum + vv)
            out = vsum >> osbits
            last = [jnp.where(actn, cand[i], last[i].astype(jnp.int64))
                    .astype(jnp.int32) for i in range(nops)]
            last += list(c2)[nops:]        # untouched op slots
            return tuple(last), out

        c0 = tuple(st[:, i] for i in range(4))
        cf, ys = jax.lax.scan(istep, c0,
                              (msk.T, jnp.arange(FRAG,
                                                 dtype=jnp.int64)))
        out = ys.T                         # [K, 64] int64
        st2 = jnp.stack(cf, axis=1)
        # emit (REPLACE as add-of-difference, like _apply_filter)
        out32 = out.astype(jnp.int32)
        old = slots[ax[:, 0]][:, dch]
        if add:
            d = jnp.where(msk, out32, 0)
        else:
            d = jnp.where(msk, out32 - old, 0)
        slots = slots.at[ax[:, 0], dch].add(d)
        return (slots, st2), None

    (slots, state), _ = jax.lax.scan(step, (slots, state), a)
    return slots, state


# bounded transfer retry: the deployment relay occasionally drops a
# transfer (FAILED_PRECONDITION) or stalls; a failed chunk is retried
# with exponential backoff before the error propagates (where the
# caller's native-path fallback absorbs it)
_XFER_TRIES = 3
_XFER_BACKOFF = 0.25


def _retry(fn):
    import time as _t
    delay = _XFER_BACKOFF
    for attempt in range(_XFER_TRIES):
        try:
            return fn()
        except BaseException:
            if attempt == _XFER_TRIES - 1:
                raise
            _t.sleep(delay)
            delay *= 4


def _threaded_put(arr, nchunks=8, min_bytes=1 << 19):
    """Chunked threaded h2d upload (the relay parallelizes across
    streams: ~60 MB/s single vs ~130 MB/s with 8-16 threads)."""
    if arr.nbytes < min_bytes:
        return _retry(lambda: jnp.asarray(arr))
    import threading
    k = min(nchunks, arr.shape[0])
    bounds = np.linspace(0, arr.shape[0], k + 1).astype(int)
    outs = [None] * k
    errs = []

    def g(i):
        try:
            outs[i] = _retry(
                lambda: jax.device_put(arr[bounds[i]:bounds[i + 1]]))
        except BaseException as e:
            errs.append(e)
    th = [threading.Thread(target=g, args=(i,)) for i in range(k)]
    for t in th:
        t.start()
    for t in th:
        t.join()
    if errs:
        raise errs[0]
    return jnp.concatenate(outs, axis=0)


def _threaded_get(dev, nchunks=8):
    """Chunked threaded d2h fetch (the relay parallelizes across
    streams: ~16 MB/s single vs ~51 MB/s with 8 threads)."""
    import threading
    k = min(nchunks, dev.shape[0]) or 1
    bounds = np.linspace(0, dev.shape[0], k + 1).astype(int)
    parts = [dev[bounds[i]:bounds[i + 1]] for i in range(k)]
    outs = [None] * k
    errs = []

    def g(i):
        try:
            outs[i] = _retry(lambda: np.asarray(parts[i]))
        except BaseException as e:
            errs.append(e)
    th = [threading.Thread(target=g, args=(i,)) for i in range(k)]
    for t in th:
        t.start()
    for t in th:
        t.join()
    if errs:
        raise errs[0]
    return np.concatenate(outs, axis=0)


# master readback chunk count: the jitted fn returns the master
# pre-split so fetch() overlaps d2h streams without issuing eager
# device slice programs
_RB_CHUNKS = 8


def _host_slot_perm(runmat, Rtot, dead_slot):
    """Slot-order row permutation for _expand_rows' sorted
    segment-sum, computed on the HOST from the same runmat the device
    expands — the permutation is a pure function of the run layout,
    so shipping it (~4 B/row) saves the chip the O(Rtot log Rtot)
    key sort.  Mirrors _expand_rows' rid/alive/slot_r computation;
    numpy's stable argsort on int keys is a radix sort, so the host
    cost is O(Rtot) on the (overlapped) record thread."""
    start = runmat[:, RC_START]
    ln = runmat[:, RC_LEN]
    mark = np.zeros(Rtot + 1, np.int32)
    np.add.at(mark, np.clip(start, 0, Rtot).astype(np.intp),
              (ln > 0).astype(np.int32))
    rid = np.cumsum(mark[:Rtot], dtype=np.int32) - 1
    gi = np.clip(rid, 0, None)
    p = np.arange(Rtot, dtype=np.int32)
    k = p - start[gi]
    alive = (rid >= 0) & (k < ln[gi])
    slot_r = np.where(alive, runmat[gi, RC_SLOT] + k,
                      np.int32(dead_slot))
    # tie order is free (int32-wrap adds commute), so the default
    # introsort beats stable radix ~4x here
    return np.argsort(slot_r).astype(np.int32)


def _accum_sorted():
    """True when A2_ACCUM=sorted selects the gather+sorted-segsum slot
    accumulation (see _expand_rows); the default is the unsorted
    scatter, which needs no host-precomputed permutation.  Read at
    call time so A/B drivers can flip it per trace, but it must stay
    constant between a signature's first trace and its dispatches
    (the blob layout depends on it)."""
    return _os.environ.get("A2_ACCUM", "scatter") == "sorted"


# ---- packed runmat dispatch format ("rmq", round 5) ----
# The relay tunnel's TRUE h2d bandwidth (~40-80 MB/s with weather;
# measured with forced materialization — the put only times the
# enqueue) binds the device path's steady rate, and the runmat is
# ~73% of the per-superblock upload.  This format re-encodes the 18
# int32 base columns in 11 words/run (44 B vs 72 B, a 39% runmat
# cut):
#   words 0-3   raw int32: AMP0, DPH, PHLO, SIZE (high-entropy)
#   word  4     START(22) | OFF(6)<<22 | MODE(4)<<28
#   word  5     (RIDX+1)(22) | (PHHI+1)(6)<<22
#   word  6     SLOT(22) | LEN(8)<<22
#   words 7-10  u16 pairs: indices into per-song sorted value tables
#               for DAMP,DPAN / PAN0,TOTAL / POSOFF,DVOL / VOL0
# The tables are finalized from the PROFILE pass (which records the
# whole deterministic song, so dispatch values are always present;
# _rmq_pack verifies and raises on any miss, which the renderer
# absorbs via native bridging).  Field-width caps are checked at
# finalize; any violation keeps the legacy "rm" layout.
_RMQ_IDXCOLS = (RC_DAMP, RC_DPAN, RC_PAN0, RC_TOTAL, RC_POSOFF,
                RC_DVOL, RC_VOL0)
_RMQ_WORDS = 11

# rampmat leg of the packed format ("rqr"): 8 words vs RR_N=14 —
#   word 0     BASE(22) | MIP(4)<<22
#   words 1-3  raw int32: ATMR, PV, DPHRAW
#   words 4-7  u16 table indices: AT,PT / PTMR,VT / VTMR,PTIMER /
#              PRAMP,PERIOD
# PTGT is not shipped: the record pass snapshots ramp state at
# fragment-0 END where the pitch ramper has always landed
# (PTIMER == 0), so PTGT == PV — verified song-wide at finalize
# (any violation keeps the legacy rampmat layout).
_RQR_IDXCOLS = (RR_AT, RR_PT, RR_PTMR, RR_VT, RR_VTMR, RR_PTIMER,
                RR_PRAMP, RR_PERIOD)
_RQR_WORDS = 8


def _rmq_pack(rm, tables):
    """Host-side encode of a padded runmat [Nrp, BASE_N] into the
    packed (11, Nrp) int32 stream.  Raises ValueError when a value is
    missing from its table (a stream recorded past the profiled
    universe — the caller bridges natively)."""
    u = rm.astype(np.uint32)
    out = np.empty((_RMQ_WORDS, rm.shape[0]), np.uint32)
    out[0] = u[:, RC_AMP0]
    out[1] = u[:, RC_DPH]
    out[2] = u[:, RC_PHLO]
    out[3] = u[:, RC_SIZE]
    out[4] = (u[:, RC_START] | (u[:, RC_OFF] << 22)
              | (u[:, RC_MODE] << 28))
    out[5] = (((u[:, RC_RIDX] + 1) & 0x3FFFFF)
              | ((u[:, RC_PHHI] + 1) << 22))
    out[6] = u[:, RC_SLOT] | (u[:, RC_LEN] << 22)
    for w in range(4):
        half = []
        for j in (2 * w, 2 * w + 1):
            if j >= len(_RMQ_IDXCOLS):
                half.append(np.uint32(0))
                continue
            col = rm[:, _RMQ_IDXCOLS[j]]
            idx = np.searchsorted(tables[j], col)
            if (idx >= len(tables[j])).any() \
                    or not np.array_equal(tables[j][idx], col):
                raise ValueError("rmq: value outside profiled table")
            half.append(idx.astype(np.uint32))
        out[7 + w] = half[0] | (half[1] << 16)
    return out.view(np.int32)


def _rqr_pack(rmp, tables):
    """Host-side encode of a padded rampmat [NrR, RR_N] into the
    packed (8, NrR) int32 stream (see _RQR_WORDS)."""
    u = rmp.astype(np.uint32)
    out = np.empty((_RQR_WORDS, rmp.shape[0]), np.uint32)
    out[0] = u[:, RR_BASE] | (u[:, RR_MIP] << 22)
    out[1] = u[:, RR_ATMR]
    out[2] = u[:, RR_PV]
    out[3] = u[:, RR_DPHRAW]
    for w in range(4):
        half = []
        for j in (2 * w, 2 * w + 1):
            col = rmp[:, _RQR_IDXCOLS[j]]
            idx = np.searchsorted(tables[j], col)
            if (idx >= len(tables[j])).any() \
                    or not np.array_equal(tables[j][idx], col):
                raise ValueError("rqr: value outside profiled table")
            half.append(idx.astype(np.uint32))
        out[4 + w] = half[0] | (half[1] << 16)
    return out.view(np.int32)


def _rqr_unpack(pk, tabs):
    """Device-side decode back to the [NrR, RR_N] rampmat."""
    def srl(x, n):
        return jax.lax.shift_right_logical(
            x, jnp.asarray(n, x.dtype))

    base = pk[0] & 0x3FFFFF
    mip = srl(pk[0], 22) & 15
    idx = []
    for w in range(4):
        iw = pk[4 + w]
        idx.append(iw & 0xFFFF)
        idx.append(srl(iw, 16))
    (at, pt, ptmr, vt, vtmr, ptimer, pramp,
     period) = [jnp.take(tabs[j], idx[j])
                for j in range(len(_RQR_IDXCOLS))]
    pv = pk[2]
    # column order = RR_MIP..RR_BASE; PTGT == PV by the finalize
    # invariant
    return jnp.stack(
        [mip, at, pk[1], vt, vtmr, pt, ptmr, pv, pv, ptimer,
         pramp, pk[3], period, base], axis=1)


def _rmq_unpack(pk, tabs):
    """Device-side decode back to the [Nrp, BASE_N] runmat (pure
    int32 lane math + 7 gathers from the small tables)."""
    def srl(x, n):
        # literal shift counts trace as i64 under x64 mode and
        # shift_right_logical requires matching dtypes
        return jax.lax.shift_right_logical(
            x, jnp.asarray(n, x.dtype))

    w1, w2, w3 = pk[4], pk[5], pk[6]
    start = w1 & 0x3FFFFF
    offc = srl(w1, 22) & 63
    mode = srl(w1, 28) & 15
    ridx = (w2 & 0x3FFFFF) - 1
    phhi = (srl(w2, 22) & 63) - 1
    slot = w3 & 0x3FFFFF
    lenc = srl(w3, 22) & 255
    idx = []
    for w in range(4):
        iw = pk[7 + w]
        idx.append(iw & 0xFFFF)
        idx.append(srl(iw, 16))
    (damp, dpan, pan0, total, posoff, dvol,
     vol0) = [jnp.take(tabs[j], idx[j])
              for j in range(len(_RMQ_IDXCOLS))]
    # column order = RC_START..RC_RIDX (BASE_N)
    return jnp.stack(
        [start, lenc, pk[1], pk[3], posoff, pk[0], damp, vol0,
         dvol, pan0, dpan, slot, mode, offc, total, phhi, pk[2],
         ridx], axis=1)


def _blob_layout(sig):
    """Static element layout of the one-blob dispatch upload: a map
    name -> (offset, shape) over a flat int32 array, derived from the
    jit signature alone so _dispatch (host fill) and _build_fn
    (device unpack) always agree."""
    (F, ninst, minst, mch, rows_sig, rpad, ns, nsm, ramppad,
     readback, quality, items, rmq) = sig
    ent = []
    for i, (cls, NB) in enumerate(rows_sig):
        ent.append((("tbase", i), (NB,)))
    if rpad:
        if rmq:
            ent.append(("rmq", (_RMQ_WORDS, rpad)))
            for j, sz in enumerate(rmq[0]):
                ent.append((("rmt", j), (sz,)))
        else:
            ent.append(("rm", (rpad, BASE_N)))
        Rtot = sum(NB * OK.RPB for _, NB in rows_sig)
        if Rtot and _accum_sorted():
            # host-precomputed slot-order row permutation (saves the
            # on-device O(Rtot log Rtot) sort in _expand_rows); the
            # default scatter accumulation needs no permutation, so
            # the slot (and the host argsort) exist only in sorted
            # mode
            ent.append(("rowperm", (Rtot,)))
    if ramppad:
        if rmq and rmq[1]:
            ent.append(("rqr", (_RQR_WORDS, ramppad)))
            for j, sz in enumerate(rmq[1]):
                ent.append((("rqt", j), (sz,)))
        else:
            ent.append(("rmp", (ramppad, RR_N)))
    if ns:
        ent.append(("sa", (ns, 2, FRAG)))
        ent.append(("sas", (ns,)))
    if nsm:
        ent.append(("sm", (nsm, FRAG)))
        ent.append(("sms", (nsm,)))
    nfbd = 0
    nperm = 0
    for j, (tag, key, extra) in enumerate(items):
        if tag == "stage":
            K, G = extra
            if K:
                ent.append((("it", j), (K, 9)))
            if G:
                ent.append((("itd", j), (G, F, 9)))
        elif tag == "fbd":
            ent.append((("it", j), (extra[0], 13)))
            nfbd += 1
        else:
            S, K = extra[0], extra[1]
            ent.append((("it", j), (S, K, _FILT_W[key[2]])))
            nperm += K
    if nfbd:
        ent.append(("fbdpos", (nfbd,)))
    if nperm:
        ent.append(("fperm", (nperm,)))
    layout = {}
    pos = 0
    for name, shape in ent:
        sz = 1
        for d in shape:
            sz *= d
        layout[name] = (pos, shape)
        pos += sz
    return layout, max(pos, 1)


class DeviceMixer:
    """Executes SuperblockPrograms on the device: one jitted function
    per program signature (shape-bucketed at compile time, so a
    steady-state song reuses a handful of compilations).  Owns the
    device pair-atlas copy and the fbdelay ring state (persist across
    superblocks)."""

    def __init__(self, core, interpret=None, transfer_lock=None,
                 readback="exact", quality=0, stage_mode="exact"):
        self.core = core
        # effect-stage arithmetic tier.  "exact": the reference's
        # integer recurrences run as per-sample serial scans —
        # bit-exact, but a single filter12/limiter instance costs
        # sample-count sequential steps per superblock (the dominant
        # on-chip stage cost).  "float": filter12/dcblock become
        # float32 affine recurrences evaluated by a log-depth
        # jax.lax.associative_scan, and the limiter peak envelope a
        # max-plus associative scan — the production tier for the
        # -80 dB budget (BASELINE.md acceptance bar); goldens keep
        # "exact".  fm keeps its exact scan in both tiers (operator
        # feedback is not affine).
        if stage_mode not in ("exact", "float"):
            raise ValueError("stage_mode must be 'exact' or 'float'")
        self.stage_mode = stage_mode
        # wtosc interpolation quality (0 hifi / 1 normal / 2 lofi,
        # reference wtosc.c:27-46).  A per-mixer static: lofi's
        # single-lookup lerp runs the gather-bound oscillator kernel
        # ~4x faster than hifi's 2x-oversampled Hermite.  Streams of
        # a fleet-shared mixer must agree (DeviceRenderer asserts).
        self.quality = quality
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        # "exact": int32 8:24 master (bit-exact goldens).  "i16": the
        # 16-bit PCM conversion (clip(x>>8), cli.py write_wav) runs
        # ON-DEVICE and only int16 returns — half the d2h bytes, and
        # still bit-exact for any 16-bit product (the conversion is
        # the same one the WAV writer would apply); the int32
        # reconstruction returned to callers is quantized at
        # -101 dBFS.
        self.readback = readback
        # optional lock serializing relay-facing work across mixers:
        # multi-stream serving through the deployment relay fails
        # under concurrent transfers (see DESIGN.md fleet findings);
        # a shared lock keeps streams safe while device compute still
        # overlaps host record
        self.transfer_lock = transfer_lock
        self._atlas_dev = None
        self._atlas_ver = -1
        self._rings = {}         # unit_id -> [jnp (2, SIZE) int32, pos]
        self._fns = {}           # signature -> jitted fn or Compiled
        self._jit_fns = {}       # signature -> traceable jitted fn
        self._chain_fns = {}     # (sig, ...) -> batched dispatch fn
        # per-namespace mixer state (prog.ns; 0 for solo renders).
        # A fleet-shared mixer keys shape high-water marks and the
        # profiled structure union PER STREAM: every stream pads to
        # its own profiled sizes (one fm-dense stream must not
        # inflate the whole fleet's uploads), while streams whose
        # shapes agree still share one compiled fn (the signature
        # carries shapes, not namespaces).
        self._hw = {}            # ns -> {key -> high-water}
        self._union_stages = {}  # ns -> {stage key -> template}
        self._union_fbd = {}     # ns -> {unit_id -> template dict}
        self._union_filters = {}  # ns -> {filter class key -> {S,K}}
        # packed-runmat format: None = undecided (collecting), False
        # = legacy layout, dict = active (tables + sizes)
        self._rmq = None
        self._rmq_acc = {"uniq": [[] for _ in _RMQ_IDXCOLS],
                         "runiq": [[] for _ in _RQR_IDXCOLS],
                         "max": {}}
        self._fine = False       # exact-fit padding (observe())
        # filter state lives ON DEVICE as one stacked array per
        # (stream, filter class); the dispatch blob carries a lane
        # permutation (prev lane or -1 = fresh) so state follows each
        # unit serial across superblocks with zero per-lane transfers
        self._filt_cache = {}    # (ns, key) -> [stacked dev, serials]
        self._init_dev = {}      # (kind, K) -> initial stacked state

    def observe(self, prog):
        """Profile pass: folds this program's shapes into the
        high-water marks and the stage-structure union without
        dispatching anything.  After observing every superblock of a
        song, all its real dispatches share one jit signature.
        Profiled mixers use exact-fit padding (_quant) instead of
        pow2 — the dry pass pins the high-water marks before the one
        jit compile, so fine steps cost no extra signatures but cut
        the pow2 padding's up-to-2x upload/compute waste."""
        self._fine = True
        self._repad(prog)
        ns = getattr(prog, "ns", 0)
        ust = self._union_stages.setdefault(ns, {})
        ufb = self._union_fbd.setdefault(ns, {})
        ufl = self._union_filters.setdefault(ns, {})
        for st in prog.stages:
            t = ust.get(st["key"]) or {"K": 0, "G": 0}
            ust[st["key"]] = {
                "K": max(t["K"], st["arr"].shape[0]),
                "G": max(t["G"], st["dense"].shape[0])}
        for fd in prog.fbdelays:
            ufb[fd["unit_id"]] = {
                "key": fd["key"], "stereoin": fd["stereoin"],
                "stereoout": fd["stereoout"], "add": fd["add"],
                "chunk": fd["chunk"], "ns": fd["arr"].shape[0]}
        for fl in prog.filters:
            old = ufl.get(fl["key"])
            ufl[fl["key"]] = {
                "S": fl["arr"].shape[0], "K": fl["arr"].shape[1],
                "minq": min(fl.get("minq", 1 << 30),
                            old["minq"] if old else 1 << 30)}
        # packed-runmat profile: per-column value universes + field-
        # width caps over the PADDED runmat (so the dead-run encoding
        # is covered too).  Collected per observe, unioned at
        # finalize (_rmq_finalize).
        if self._rmq is None and prog.runmat is not None \
                and prog.runmat.size:
            rm = prog.runmat
            acc = self._rmq_acc
            for j, c in enumerate(_RMQ_IDXCOLS):
                acc["uniq"][j].append(np.unique(rm[:, c]))
            mx = acc["max"]
            mx["rtot"] = max(mx.get("rtot", 0), int(prog.Rtot))
            for key, col in (("start", RC_START), ("slot", RC_SLOT),
                             ("len", RC_LEN), ("off", RC_OFF),
                             ("mode", RC_MODE), ("phhi", RC_PHHI),
                             ("ridx", RC_RIDX)):
                v = rm[:, col]
                mx[key] = max(mx.get(key, 0), int(v.max()))
                mx[key + "_lo"] = min(mx.get(key + "_lo", 0),
                                      int(v.min()))
            rmp = getattr(prog, "rampmat", None)
            if rmp is not None and rmp.size:
                for j, c in enumerate(_RQR_IDXCOLS):
                    acc["runiq"][j].append(np.unique(rmp[:, c]))
                for key, col in (("rbase", RR_BASE),
                                 ("rmip", RR_MIP)):
                    v = rmp[:, col]
                    mx[key] = max(mx.get(key, 0), int(v.max()))
                    mx[key + "_lo"] = min(mx.get(key + "_lo", 0),
                                          int(v.min()))
                if not np.array_equal(rmp[:, RR_PV],
                                      rmp[:, RR_PTGT]):
                    mx["ptgt_ne"] = 1
                mx["rseen"] = 1

    def finalize_format(self):
        """Explicit packed-format finalize for a fleet-shared mixer
        whose WHOLE fleet has profiled (serve.render_multiplexed
        calls this after the per-stream profile loop, before the HBM
        plan's first _signature): the tables union every profiled
        stream, so the fleet's own dispatches always hit them.  A
        stream added after this point that records novel values gets
        an encode-time verify failure and bridges natively (the
        serving resilience contract)."""
        if self._rmq is None and self._fine:
            self._rmq = self._rmq_finalize(force=True)

    def _rmq_finalize(self, force=False):
        """Decides the packed-runmat format once per mixer, after the
        profile pass has observed every superblock: builds the 7
        sorted per-song value tables and checks every bit-packed
        field's cap.  Returns the format dict, or False when any cap
        fails (legacy layout), or when the mixer is fleet-shared
        (streams joining after finalize could record values outside
        the tables) — unless force=True (finalize_format)."""
        if _os.environ.get("A2_NO_PACK") \
                or (not force and set(self._hw.keys()) != {0}):
            # ns != 0 means a fleet-shared mixer (serve._tag_prog):
            # streams joining after finalize could record values
            # outside the frozen tables
            return False
        acc = self._rmq_acc
        mx = acc["max"]
        if not mx:
            return False
        ok = (mx.get("rtot", 0) < (1 << 22)
              and mx.get("start", 0) <= mx.get("rtot", 0)
              and mx.get("start_lo", 0) >= 0
              and mx.get("slot", 0) < (1 << 22)
              and mx.get("slot_lo", 0) >= 0
              and mx.get("len", 0) <= 255
              and mx.get("len_lo", 0) >= 0
              and 0 <= mx.get("off", 0) < 64
              and mx.get("off_lo", 0) >= 0
              and 0 <= mx.get("mode", 0) < 16
              and mx.get("mode_lo", 0) >= 0
              and -1 <= mx.get("phhi_lo", 0)
              and mx.get("phhi", 0) < 62
              and mx.get("ridx", 0) + 1 < (1 << 22)
              and mx.get("ridx_lo", 0) >= -1)
        if not ok:
            return False
        tables = []
        for j in range(len(_RMQ_IDXCOLS)):
            u = np.unique(np.concatenate(
                acc["uniq"][j] + [np.zeros(1, np.int32)]))
            if len(u) > 65535:
                return False
            tables.append(u.astype(np.int32))
        # rampmat leg — independent: its cap failures keep only the
        # rampmat on the legacy layout
        rtables = None
        if mx.get("rseen") and not mx.get("ptgt_ne") \
                and 0 <= mx.get("rbase_lo", 0) \
                and mx.get("rbase", 0) < (1 << 22) \
                and 0 <= mx.get("rmip_lo", 0) \
                and mx.get("rmip", 0) < 16:
            rtables = []
            for j in range(len(_RQR_IDXCOLS)):
                u = np.unique(np.concatenate(
                    acc["runiq"][j] + [np.zeros(1, np.int32)]))
                if len(u) > 65535:
                    rtables = None
                    break
                rtables.append(u.astype(np.int32))
        return {"tables": tables,
                "sizes": tuple(len(t) for t in tables),
                "rtables": rtables,
                "rsizes": (tuple(len(t) for t in rtables)
                           if rtables else None)}

    def _atlas(self):
        pa = self.core._pair_atlas
        if pa is None:
            from .osc_kernel import PairAtlas
            self.core._pair_atlas = pa = PairAtlas()
        if pa.data is None:
            pa.finalize()
        if pa.version != self._atlas_ver:
            self._atlas_dev = jnp.asarray(pa.data)
            self._atlas_ver = pa.version
        return self._atlas_dev

    # ---- monotone shape padding (stable jit signatures) ----

    def _repad(self, prog):
        """Pads every variable-size array up to its high-water mark so
        steady-state superblocks reuse compiled signatures instead of
        recompiling on every pow2 crossing."""
        ns = getattr(prog, "ns", 0)
        hw = self._hw.setdefault(ns, {})

        def grow(key, n):
            m = max(hw.get(key, 0), n)
            hw[key] = m
            return m

        # instance-count floor: padding instances are never read (all
        # real slots index inst < the build-time count), so stale
        # dead-slot indices inside already-built stage arrays remain
        # harmless writes to unused slots
        prog.ninst = grow("ninst", prog.ninst)
        # sticky ramp-replay flag: once any superblock of the song
        # carries RAMP runs, every signature includes the scan
        prog.has_ramp = bool(grow("has_ramp",
                                  int(getattr(prog, "has_ramp",
                                              False))))
        # sticky stereo-rows flag: a program none of whose rows carry
        # ROW_STEREO (nor stereo stash audio) runs the expansion in
        # MONO — the kernel emits one channel sublane group and the
        # whole row-audio accumulation moves half the bytes.  Checked
        # at run level (expanded rows inherit the run's mode; the
        # ramp replay substitutes vol/pan values, never the mode).
        st = 0
        if prog.runmat is not None and prog.runmat.shape[0]:
            st = int(bool(
                (prog.runmat[:, RC_MODE] & _ROW_STEREO).any()))
        if not st and getattr(prog, "stash_audio", None) is not None \
                and prog.stash_audio.shape[0]:
            st = int(bool(prog.stash_audio[:, 1].any()))
        prog.rows_stereo = bool(grow("rows_stereo", st))
        dead = prog.ninst * prog.F

        # oscillator runs: pow2-quantized monotone class-block growth;
        # growing a class shifts the bases of later classes in the
        # concatenated row space, so run starts are remapped
        if prog.runmat is not None:
            old_ends = []
            shift = []
            ob = nb = 0
            blocks = []
            for cls, NB, tb in prog.class_blocks:
                NBp = grow(("cls", cls), _quant(NB, 8)
                           if self._fine else _pow2(max(NB, 1), 8))
                shift.append(nb - ob)
                ob += NB * OK.RPB
                old_ends.append(ob)
                nb += NBp * OK.RPB
                if NBp > NB:
                    tb = np.concatenate(
                        [tb, np.zeros(NBp - NB, np.int32)])
                blocks.append((cls, NBp, tb))
            prog.class_blocks = blocks
            shift.append(nb - ob)        # dead-run sentinel (== Rtot)
            starts = prog.runmat[:, RC_START].astype(np.int64)
            if nb != ob:
                ci = np.searchsorted(np.asarray(old_ends), starts,
                                     side="right")
                prog.runmat[:, RC_START] = (
                    starts + np.asarray(shift, np.int64)[ci]) \
                    .astype(np.int32)
            prog.Rtot = nb
            Nr = prog.runmat.shape[0]
            Nrp = grow("runs", _quant(Nr, 2048)
                       if self._fine else _pow2(max(Nr, 1), 1024))
            if Nrp > Nr:
                m = np.zeros((Nrp, BASE_N), np.int32)
                m[:, RC_START] = prog.Rtot
                m[:, RC_RIDX] = -1
                m[:Nr] = prog.runmat
                prog.runmat = m
            if prog.has_ramp or hw.get("rampruns", 0):
                NrR = prog.rampmat.shape[0]
                NrRp = grow("rampruns", _quant(NrR, 512)
                            if self._fine
                            else _pow2(max(NrR, 1), 512))
                if NrRp > NrR:
                    rm = np.zeros((NrRp, RR_N), np.int32)
                    rm[:NrR] = prog.rampmat
                    prog.rampmat = rm
                prog.has_ramp = True
        if prog.runmat is None and hw.get("runs", 0):
            # a superblock (or stream, under a fleet-shared mixer)
            # with no oscillator rows must still match the unioned
            # signature: dead runmat + high-water class blocks
            blocks = []
            base = 0
            for cls in ALL_CLASSES:
                NBp = hw.get(("cls", cls), 0)
                blocks.append((cls, NBp, np.zeros(NBp, np.int32)))
                base += NBp * OK.RPB
            prog.class_blocks = blocks
            prog.Rtot = base
            m = np.zeros((hw["runs"], BASE_N), np.int32)
            m[:, RC_START] = base
            m[:, RC_RIDX] = -1
            prog.runmat = m
            if hw.get("rampruns", 0):
                prog.rampmat = np.zeros((hw["rampruns"], RR_N),
                                        np.int32)
                prog.has_ramp = True
        if prog.stash_audio is not None or hw.get("stash", 0):
            NS = prog.stash_audio.shape[0] \
                if prog.stash_audio is not None else 0
            NSp = grow("stash", NS)
            if NSp > NS:
                sa = np.zeros((NSp, 2, FRAG), np.int32)
                sl = np.full(NSp, dead, np.int32)
                if NS:
                    sa[:NS] = prog.stash_audio
                    sl[:NS] = prog.stash_slot
                prog.stash_audio, prog.stash_slot = sa, sl
        if prog.stash_mono is not None or hw.get("stashm", 0):
            NS = prog.stash_mono.shape[0] \
                if prog.stash_mono is not None else 0
            NSp = grow("stashm", NS)
            if NSp > NS:
                sa = np.zeros((NSp, FRAG), np.int32)
                sl = np.full(NSp, dead, np.int32)
                if NS:
                    sa[:NS] = prog.stash_mono
                    sl[:NS] = prog.stash_mono_slot
                prog.stash_mono, prog.stash_mono_slot = sa, sl
        for st in prog.stages:
            K = st["arr"].shape[0]
            Kp = grow(("st",) + st["key"], K)
            if Kp > K:
                arr = np.zeros((Kp, 9), np.int32)
                arr[:, 0] = dead
                arr[:, 1] = dead
                arr[:K] = st["arr"]
                st["arr"] = arr
            G = st["dense"].shape[0]
            Gp = grow(("stG",) + st["key"], G)
            if Gp > G:
                # padding groups: all-zero rows (span start 0,
                # frames 0) — the dense read-modify-write writes
                # back what it read (_apply_stage_dense)
                da = np.zeros((Gp, prog.F, 9), np.int32)
                da[:G] = st["dense"]
                st["dense"] = da
        for fd in prog.fbdelays:
            # sticky dense flag: once any superblock of the song
            # needs the legacy path for this instance (partial
            # coverage, sub-fragment splits, ramped delays), every
            # signature uses it — the persistent ring state format
            # must be stable across the song's one jit signature
            dkey = ("fbdense", fd["unit_id"])
            sticky = hw.get(dkey, 1)
            nowd = int(bool(fd.get("dense"))) & sticky
            # fb/ld/rd are jit-time constants of the dense program:
            # if they drift between superblocks (ramped delay
            # parameters), the song must stay on the legacy path —
            # a per-superblock recompile would be worse
            pkey = ("fbpar", fd["unit_id"])
            if nowd:
                par = fd.get("fbpar", (-1, -1, -1))
                seen = hw.get(pkey)
                if seen is None:
                    hw[pkey] = par
                elif seen != par:
                    nowd = 0
            hw[dkey] = nowd
            fd["dense"] = bool(nowd)
            NS = fd["arr"].shape[0]
            C = fd["chunk"]
            NSp = grow(("fbd", fd["unit_id"], C), NS)
            NSp = ((NSp + C - 1) // C) * C
            if NSp > NS:
                arr = np.zeros((NSp, 13), np.int32)
                arr[:, :4] = dead      # sorted-emit invariant
                arr[:NS] = fd["arr"]
                fd["arr"] = arr
        for fl in prog.filters:
            S_, K_, W_ = fl["arr"].shape
            Sp = grow(("flS",) + fl["key"], S_)
            Kp = grow(("flK",) + fl["key"], K_)
            if Sp > S_ or Kp > K_:
                arr = np.zeros((Sp, Kp, W_), np.int32)
                for c in _FILT_DEAD[fl["kind"]]:
                    arr[:, :, c] = dead
                arr[:S_, :K_] = fl["arr"]
                fl["arr"] = arr
            # sticky LOW-water of observed q: the float-tier
            # eligibility (signature bit) must be stable across
            # superblocks — once an undamped slice is seen, the class
            # stays on the exact scan
            qkey = ("flQ",) + fl["key"]
            mq = min(hw.get(qkey, 1 << 30), fl.get("minq", 1 << 30))
            hw[qkey] = mq
            fl["minq"] = mq

        # profiled structure union: emit dead entries for stages /
        # fbdelay instances absent from this superblock so the jit
        # signature matches every other superblock of the song
        ust = self._union_stages.get(ns) or {}
        ufb = self._union_fbd.get(ns) or {}
        ufl = self._union_filters.get(ns) or {}
        if ust:
            have = {st["key"] for st in prog.stages}
            for key, t in ust.items():
                if key in have:
                    continue
                K = max(t["K"], hw.get(("st",) + key, 0))
                G = max(t["G"], hw.get(("stG",) + key, 0))
                hw[("st",) + key] = K
                hw[("stG",) + key] = G
                arr = np.zeros((K, 9), np.int32)
                arr[:, 0] = dead
                arr[:, 1] = dead
                prog.stages.append({
                    "kind": key[2], "key": key, "arr": arr, "n": 0,
                    "dense": np.zeros((G, prog.F, 9), np.int32)})
        if ufb:
            have = {fd["unit_id"] for fd in prog.fbdelays}
            for uid, t in ufb.items():
                if uid in have:
                    continue
                # an absent instance cannot be dense (its ring time
                # must freeze): the whole song goes legacy
                hw[("fbdense", uid)] = 0
                ns = max(t["ns"], hw.get(("fbd", uid, t["chunk"]),
                                         t["ns"]))
                ns = ((ns + t["chunk"] - 1) // t["chunk"]) \
                    * t["chunk"]
                hw[("fbd", uid, t["chunk"])] = max(
                    hw.get(("fbd", uid, t["chunk"]), 0), ns)
                fda = np.zeros((ns, 13), np.int32)
                fda[:, :4] = dead      # sorted-emit invariant
                prog.fbdelays.append({
                    "unit_id": uid, "key": t["key"],
                    "stereoin": t["stereoin"],
                    "stereoout": t["stereoout"], "add": t["add"],
                    "arr": fda, "n": 0,
                    "chunk": t["chunk"], "dense": False})
        if ufl:
            have = {fl["key"] for fl in prog.filters}
            for key, t in ufl.items():
                if key in have:
                    continue
                Sp = max(t["S"], hw.get(("flS",) + key, 0))
                Kp = max(t["K"], hw.get(("flK",) + key, 0))
                arr = np.zeros((Sp, Kp, _FILT_W[key[2]]), np.int32)
                for c in _FILT_DEAD[key[2]]:
                    arr[:, :, c] = dead
                prog.filters.append({"kind": key[2], "key": key,
                                     "serials": [], "arr": arr,
                                     "n": 0,
                                     "minq": min(
                                         t.get("minq", 1 << 30),
                                         hw.get(("flQ",) + key,
                                                1 << 30))})

    def _signature(self, prog):
        rows = tuple((cls, NB) for cls, NB, _ in prog.class_blocks)
        rpad = prog.runmat.shape[0] if prog.runmat is not None             else 0
        ramppad = prog.rampmat.shape[0] \
            if getattr(prog, "rampmat", None) is not None else 0
        ns = prog.stash_audio.shape[0] if prog.stash_audio is not None             else 0
        nsm = prog.stash_mono.shape[0] \
            if getattr(prog, "stash_mono", None) is not None else 0
        items = []
        for st in prog.stages:
            items.append(("stage", st["key"],
                          (st["arr"].shape[0],
                           st["dense"].shape[0]), ""))
        for fd in prog.fbdelays:
            # fb/ld/rd ride the signature for dense instances: the
            # dense program's ring slicing is STATIC in them
            items.append(("fbd", fd["key"],
                          (fd["arr"].shape[0], fd["stereoin"],
                           fd["stereoout"], fd["add"], fd["chunk"],
                           bool(fd["dense"]))
                          + (tuple(fd.get("fbpar", (-1, -1, -1)))
                             if fd["dense"] else ()),
                          str(fd["unit_id"])))
        for fl in prog.filters:
            # third extra element = float-tier eligibility: filter12
            # classes whose observed minimum q stays above the
            # damping threshold may run the float associative scan
            # (stage_mode="float"); undamped resonators keep the
            # exact serial scan (see _apply_filter_float)
            ok = int(fl.get("minq", 1 << 30) >= _FLOAT_TIER_MINQ)
            items.append(("filt", fl["key"],
                          fl["arr"].shape[:2] + (ok,), ""))
        # unit_id tiebreak: several fbdelay instances can share a
        # (-nest, chain) key; the execution order must be
        # deterministic across streams of a fleet-shared mixer
        items.sort(key=lambda t: (t[1], t[3]))
        items = [t[:3] for t in items]
        # quality slot: bits 0-3 = interpolator tier, 16 = float
        # stage tier, 32 = mono row expansion (no ROW_STEREO row and
        # no stereo stash anywhere in the song — sticky via _repad)
        if self._rmq is None and self._fine:
            # first real signature after the profile pass: decide
            # the packed-runmat format once (see _rmq_finalize)
            self._rmq = self._rmq_finalize()
        return (prog.F, prog.ninst, prog.master_inst,
                prog.master_channels, rows, rpad, ns, nsm,
                ramppad if prog.has_ramp else 0, self.readback,
                self.quality + (16 if self.stage_mode == "float"
                                else 0)
                + (32 if rpad and not getattr(prog, "rows_stereo",
                                              True)
                   and not _os.environ.get("A2_NO_MONO") else 0),
                tuple(items),
                ((self._rmq["sizes"], self._rmq["rsizes"])
                 if self._rmq else None))

    def device_bytes(self, prog):
        """HBM budget for one stream at this program's signature
        (VERDICT r3 weak #7): returns {"persistent": B, "working": B}.

        persistent = device-resident state that lives across
        superblocks: fbdelay rings (dense tail 2x2^17 int32 = 1 MB
        per instance — sized to the reference's 2^17 delay clamp,
        fbdelay.c:27 — vs 8 MB for the legacy full ring), filter/fm
        per-instance state, and the shared wave atlas (counted once
        per process, reported separately).

        working = the transient per-dispatch high-water estimate:
        input blob, slot array, expansion intermediates (row audio +
        ramp trajectory), and the master readback buffer.  Real XLA
        liveness is below this sum (buffers are reused); this is the
        conservative planning number a fleet guard can rely on.
        """
        self._repad(prog)
        sig = self._signature(prog)
        (F, ninst, minst, mch, rows_sig, rpad, ns, nsm, ramppad,
         readback, quality, items, rmq) = sig
        persistent = 0
        for t, k, e in items:
            if t == "fbd":
                persistent += 2 * (FBD_TAIL if e[5]
                                   else _FBD_BUFSIZE) * 4
            elif t == "filt":
                persistent += e[1] * (8 if k[2] == "lim" else 16)
        _, blob_total = _blob_layout(sig)
        Rtot = sum(NB * OK.RPB for _, NB in rows_sig)
        blob = blob_total * 4
        execb = (ninst * F + 1) * 2 * FRAG * 4             # slots
        execb += Rtot * (FRAG if quality & 32
                         else 2 * FRAG) * 4                # row audio
        if rmq:
            # packed dispatch: the device rebuilds the full runmat
            execb += rpad * BASE_N * 4
            if rmq[1]:
                execb += ramppad * RR_N * 4
        if ramppad:
            execb += (RUN_KCHUNK - 1) * ramppad * 10 * 4   # traj
        execb += ns * 2 * FRAG * 4 + nsm * FRAG * 4        # stash
        master = F * mch * FRAG * (2 if readback == "i16" else 4)
        atlas = self.core._pair_atlas
        return {"persistent": persistent,
                # split (round 4): only the EXECUTING program holds
                # its expansion intermediates — an in-flight
                # superblock awaiting fetch holds just its input blob
                # and master output, so a deep pipeline must not be
                # charged depth x exec (the round-3 plan was, and
                # refused fleets that actually fit comfortably)
                "blob": blob, "exec": execb, "master": master,
                "working": blob + execb + master,
                "atlas": (atlas.data.nbytes
                          if atlas is not None and atlas.data
                          is not None else 0)}

    def _build_inner(self, sig):
        """The unpacked superblock program (separate arrays per
        input).  Production dispatch wraps it behind the one-blob
        unpack (_build_fn); the multichip dryrun shards it directly
        (__graft_entry__)."""
        (F, ninst, minst, mch, rows_sig, rpad, ns, nsm, ramppad,
         readback, quality, items, rmq) = sig
        stage_float = bool(quality & 16)   # stage tier bit
        mono_rows = bool(quality & 32)     # mono expansion bit
        quality &= 15
        interpret = self.interpret
        exec_items = list(items)
        Rtot = sum(NB * OK.RPB for _, NB in rows_sig)

        def fn(atlas, tbase_devs, runmat, rampmat, stash_audio,
               stash_slot, stash_mono, stash_mono_slot, stage_arrs,
               fbd_arrs, fbd_rings, fbd_pos, filt_arrs, filt_states,
               rowperm=None):
            nslot = ninst * F + 1
            slots = jnp.zeros((nslot, 2, FRAG), jnp.int32)
            if rpad and Rtot:
                slots = _expand_rows(slots, atlas, rows_sig,
                                     tbase_devs, runmat, rampmat,
                                     ninst * F, interpret,
                                     ramppad > 0, quality,
                                     rowperm=rowperm,
                                     mono=mono_rows)
            if ns:
                # stash tables are build-time sorted by slot
                seg = jax.ops.segment_sum(
                    stash_audio.reshape(ns, 2 * FRAG), stash_slot,
                    num_segments=nslot, indices_are_sorted=True)
                slots = slots + seg.reshape(nslot, 2, FRAG)
            if nsm:
                segm = jax.ops.segment_sum(
                    stash_mono, stash_mono_slot, num_segments=nslot,
                    indices_are_sorted=True)
                slots = slots.at[:, 0].add(segm)
            new_rings = []
            new_filt = []
            si = fi = gi = 0
            probe = _probes()
            for tag, key, extra in exec_items:
                if tag == "stage":
                    la, da = stage_arrs[si]
                    if "nostages" not in probe:
                        if da.shape[0]:
                            slots = _apply_stage_dense(slots, key,
                                                       da)
                        if la.shape[0]:
                            slots = _apply_stage(slots, key, la)
                    si += 1
                elif tag == "fbd":
                    if "nofbd" in probe:
                        new_rings.append(fbd_rings[fi])
                        fi += 1
                        continue
                    (_, stereoin, stereoout, add, C,
                     fdense) = extra[:6]
                    if fdense:
                        fb_, ld_, rd_ = extra[6:9]
                        slots, ring = _apply_fbdelay_dense(
                            slots, (stereoin, stereoout, add, C,
                                    fb_, ld_, rd_),
                            fbd_arrs[fi], fbd_rings[fi], F)
                    else:
                        slots, ring = _apply_fbdelay(
                            slots, (stereoin, stereoout, add, C),
                            fbd_arrs[fi], fbd_rings[fi],
                            fbd_pos[fi])
                    new_rings.append(ring)
                    fi += 1
                elif "nofilt" in probe:
                    new_filt.append(filt_states[gi])
                    gi += 1
                elif key[2] == "fm":
                    slots, stf = _apply_fm(
                        slots, (key[3], key[4], key[5][0]),
                        filt_arrs[gi], filt_states[gi])
                    new_filt.append(stf)
                    gi += 1
                else:
                    fsig = (key[3], key[4], key[5], key[6], key[7])
                    ok = len(extra) > 2 and extra[2]
                    if stage_float and ok:
                        slots, stf = _apply_filter_float(
                            slots, key[2], fsig, filt_arrs[gi],
                            filt_states[gi])
                    else:
                        slots, stf = _apply_filter(
                            slots, key[2], fsig, filt_arrs[gi],
                            filt_states[gi])
                    new_filt.append(stf)
                    gi += 1
            master = slots[minst * F:(minst + 1) * F, :mch]
            if readback == "i16":
                master = jnp.clip(master >> 8, -32768, 32767) \
                    .astype(jnp.int16)
            return master, new_rings, new_filt

        return fn

    def _build_fn(self, prog, sig):
        """The production dispatch entry: ONE int32 blob carries every
        per-superblock input (tbase, runmat, rampmat, stash + slots,
        stage/fbdelay/filter tables, fbdelay ring positions, filter
        lane permutation), statically sliced apart on-device.  Each
        jnp.asarray/device_put is a full relay round trip (~5-15 ms
        through this deployment's tunnel), so a program with a dozen
        small tables was paying more in transfer latency than in
        bytes; the blob makes dispatch exactly one threaded upload +
        one execute regardless of program structure."""
        inner = self._build_inner(sig)
        (F, ninst, minst, mch, rows_sig, rpad, ns, nsm, ramppad,
         readback, quality, items, rmq) = sig
        layout, total = _blob_layout(sig)
        nfbd = sum(1 for t, _, _ in items if t == "fbd")
        nperm = sum(e[1] for t, _, e in items if t == "filt")

        def take(blob, name):
            pos, shape = layout[name]
            sz = 1
            for d in shape:
                sz *= d
            return jax.lax.slice(blob, (pos,), (pos + sz,)) \
                .reshape(shape)

        def fn(atlas, blob, fbd_rings, filt_prevs):
            z = jnp.zeros((0,), jnp.int32)
            tbase_devs = [take(blob, ("tbase", i))
                          for i in range(len(rows_sig))]
            if rpad and rmq:
                runmat = _rmq_unpack(
                    take(blob, "rmq"),
                    [take(blob, ("rmt", j))
                     for j in range(len(rmq[0]))])
            elif rpad:
                runmat = take(blob, "rm")
            else:
                runmat = jnp.zeros((0, BASE_N), jnp.int32)
            Rtot_ = sum(NB * OK.RPB for _, NB in rows_sig)
            rowperm = take(blob, "rowperm") \
                if rpad and Rtot_ and _accum_sorted() else None
            if ramppad and rmq and rmq[1]:
                rampmat = _rqr_unpack(
                    take(blob, "rqr"),
                    [take(blob, ("rqt", j))
                     for j in range(len(rmq[1]))])
            elif ramppad:
                rampmat = take(blob, "rmp")
            else:
                rampmat = jnp.zeros((0, RR_N), jnp.int32)
            stash_audio = take(blob, "sa") if ns else z
            stash_slot = take(blob, "sas") if ns else z
            stash_mono = take(blob, "sm") if nsm else z
            stash_mono_slot = take(blob, "sms") if nsm else z
            fbd_pos = take(blob, "fbdpos") if nfbd else z
            perm = take(blob, "fperm") if nperm else z
            stage_arrs = []
            fbd_arrs = []
            filt_arrs = []
            filt_states = []
            pj = 0
            for j, (tag, key, extra) in enumerate(items):
                if tag == "stage":
                    K, G = extra
                    la = take(blob, ("it", j)) if K \
                        else jnp.zeros((0, 9), jnp.int32)
                    da = take(blob, ("itd", j)) if G \
                        else jnp.zeros((0, F, 9), jnp.int32)
                    stage_arrs.append((la, da))
                elif tag == "fbd":
                    fbd_arrs.append(take(blob, ("it", j)))
                else:
                    arrj = take(blob, ("it", j))
                    K = extra[1]
                    pm = jax.lax.slice(perm, (pj,), (pj + K,))
                    pj += K
                    prev = filt_prevs[len(filt_arrs)]
                    idx = jnp.clip(pm, 0, prev.shape[0] - 1)
                    if key[2] == "lim":
                        st = jnp.where(pm < 0,
                                       jnp.int64(_LIM_PEAK0),
                                       prev[idx])
                    elif key[2] == "fm":
                        st = jnp.where((pm < 0)[:, None],
                                       0, prev[idx])
                    else:
                        st = jnp.where((pm < 0)[:, None, None],
                                       0, prev[idx])
                    filt_arrs.append(arrj)
                    filt_states.append(st)
            master, nr_, nf_ = inner(
                atlas, tbase_devs, runmat, rampmat,
                stash_audio, stash_slot, stash_mono,
                stash_mono_slot, stage_arrs, fbd_arrs,
                fbd_rings, fbd_pos, filt_arrs, filt_states,
                rowperm=rowperm)
            # master returns pre-split into chunks: slicing INSIDE
            # the jit is free, while slicing the result eagerly costs
            # one relay-executed device program per chunk (~20-40 ms
            # each — the old _threaded_get was paying 8 of them per
            # fetch, dwarfing the actual d2h bytes)
            k = min(_RB_CHUNKS, F)
            bnds = np.linspace(0, F, k + 1).astype(int)
            parts = tuple(
                jax.lax.slice_in_dim(master, int(b0), int(b1),
                                     axis=0)
                for b0, b1 in zip(bnds[:-1], bnds[1:]))
            return parts, nr_, nf_

        return jax.jit(fn)

    def run(self, prog):
        """Returns master audio int32 [channels][frames] (numpy)."""
        return self.fetch(self.dispatch(prog))

    def dispatch(self, prog):
        """Asynchronously dispatches a superblock; returns a handle
        for fetch().  The device computes while the host records the
        next superblock (the 1-CPU pipeline)."""
        if self.transfer_lock is not None:
            with self.transfer_lock:
                return self._dispatch(prog)
        return self._dispatch(prog)

    def precompile(self, prog):
        """Triggers this program signature's remote jit compile from
        shape skeletons alone — no data dispatched, no device state
        touched.  A server calls this per stream after profiling so
        the serving window never blocks on the relay compiler (each
        new signature costs seconds-to-a-minute there).  Returns True
        if a compile actually happened."""
        self._repad(prog)
        sig = self._signature(prog)
        if sig in self._fns:
            return False
        fn = self._build_fn(prog, sig)
        self._jit_fns[sig] = fn
        layout, total = _blob_layout(sig)
        (F, ninst, minst, mch, rows_sig, rpad, ns, nsm, ramppad,
         readback, quality, items, rmq) = sig
        sd = jax.ShapeDtypeStruct
        blob = sd((total,), jnp.int32)
        rings = [sd((2, FBD_TAIL if e[5] else _FBD_BUFSIZE),
                    jnp.int32)
                 for t, _, e in items if t == "fbd"]
        prevs = [sd((e[1],), jnp.int64) if k[2] == "lim"
                 else sd((e[1], 4), jnp.int32) if k[2] == "fm"
                 else sd((e[1], 2, 2), jnp.int32)
                 for t, k, e in items if t == "filt"]
        # the stored Compiled is callable with the same arg structure
        # as the jitted fn, so _dispatch needs no special casing
        self._fns[sig] = fn.lower(self._atlas(), blob, rings,
                                  prevs).compile()
        return True

    def _init_state(self, kind, K):
        d = self._init_dev.get((kind, K))
        if d is None:
            if kind == "lim":
                d = jnp.full((K,), _LIM_PEAK0, jnp.int64)
            elif kind == "fm":
                d = jnp.zeros((K, 4), jnp.int32)   # per-op `last`
            else:
                d = jnp.zeros((K, 2, 2), jnp.int32)
            self._init_dev[(kind, K)] = d
        return d

    def _dispatch(self, prog):
        sig, blob, fbd_rings, filt_prevs, meta = self._prepare(prog)
        fn = self._fns.get(sig)
        if fn is None:
            fn = self._build_fn(prog, sig)
            self._fns[sig] = fn
            self._jit_fns[sig] = fn
        atlas = self._atlas()
        dev = _threaded_put(blob, nchunks=16)
        masters, new_rings, new_filt = fn(atlas, dev, fbd_rings,
                                          filt_prevs)
        self._commit(meta, new_rings, new_filt)
        return (masters, meta[4], meta[5])

    def _prepare(self, prog):
        """Builds one superblock's dispatch inputs: pads shapes,
        assembles the one-blob upload and snapshots the per-stream
        device state (fbdelay rings, filter/fm state).  Returns
        (sig, blob, fbd_rings, filt_prevs, meta); after the device
        call, _commit(meta, new_rings, new_filt) writes the advanced
        state back.  Split from _dispatch so dispatch_many can
        prepare a whole batch before one chained device call."""
        self._repad(prog)
        sig = self._signature(prog)
        ns_ = getattr(prog, "ns", 0)
        layout, total = _blob_layout(sig)
        blob = np.zeros(total, np.int32)

        def put(name, a):
            pos, shape = layout[name]
            a = np.asarray(a)
            blob[pos:pos + a.size] = a.ravel().astype(np.int32,
                                                      copy=False)

        for i, (_, _, tb) in enumerate(prog.class_blocks):
            put(("tbase", i), tb)
        if prog.runmat is not None and prog.runmat.size:
            if sig[12]:
                put("rmq", _rmq_pack(prog.runmat,
                                     self._rmq["tables"]))
                for j, t in enumerate(self._rmq["tables"]):
                    put(("rmt", j), t)
            else:
                put("rm", prog.runmat)
            Rtot_ = sum(NB * OK.RPB
                        for _, NB, _ in prog.class_blocks)
            if Rtot_ and _accum_sorted():
                put("rowperm", _host_slot_perm(
                    prog.runmat, Rtot_, prog.ninst * prog.F))
        rmp = getattr(prog, "rampmat", None)
        if rmp is not None and rmp.size and prog.has_ramp:
            if sig[12] and sig[12][1]:
                put("rqr", _rqr_pack(rmp, self._rmq["rtables"]))
                for j, t in enumerate(self._rmq["rtables"]):
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

        # per-item tables in sorted (execution) order — the same
        # key+tiebreak as _signature, so item j here is item j there
        items = []
        for st in prog.stages:
            items.append(("stage", st["key"], st, ""))
        for fd in prog.fbdelays:
            items.append(("fbd", fd["key"], fd,
                          str(fd["unit_id"])))
        for fl in prog.filters:
            items.append(("filt", fl["key"], fl, ""))
        items.sort(key=lambda t: (t[1], t[3]))
        fbd_rings = []
        fbd_pos = []
        fbd_ids = []
        fbd_nframes = []
        filt_prevs = []
        filt_keys = []
        filt_serials = []
        perm = []
        for j, (tag, _, ob, _) in enumerate(items):
            if tag == "stage":
                if ob["arr"].shape[0]:
                    put(("it", j), ob["arr"])
                if ob["dense"].shape[0]:
                    put(("itd", j), ob["dense"])
            else:
                put(("it", j), ob["arr"])
            if tag == "fbd":
                uid = ob["unit_id"]
                dense = bool(ob.get("dense"))
                want = FBD_TAIL if dense else _FBD_BUFSIZE
                ring = self._rings.get(uid)
                if ring is None:
                    ring = [jnp.zeros((2, want), jnp.int32), 0]
                    self._rings[uid] = ring
                elif ring[0].shape[1] != want:
                    # dense<->legacy state-format conversion (at most
                    # once per song, when the sticky dense flag
                    # settles): both formats hold the last ring
                    # samples, dense time-ordered, legacy ending at
                    # pos-1
                    cur = np.asarray(ring[0])
                    if dense:
                        pos = ring[1] & (_FBD_BUFSIZE - 1)
                        idx = (pos - FBD_TAIL
                               + np.arange(FBD_TAIL)) \
                            % _FBD_BUFSIZE
                        ring = [jnp.asarray(cur[:, idx]), 0]
                    else:
                        full = np.zeros((2, _FBD_BUFSIZE), np.int32)
                        full[:, _FBD_BUFSIZE - FBD_TAIL:] = cur
                        ring = [jnp.asarray(full), 0]
                    self._rings[uid] = ring
                fbd_rings.append(ring[0])
                fbd_pos.append(ring[1] & (_FBD_BUFSIZE - 1))
                fbd_ids.append(uid)
                fbd_nframes.append(
                    0 if dense else int(ob["arr"][:, 5].sum()))
            elif tag == "filt":
                kind = ob["kind"]
                K = ob["arr"].shape[1]
                cur = list(ob["serials"])
                cur += [None] * (K - len(cur))
                ck = (ns_, ob["key"])
                ent = self._filt_cache.get(ck)
                if ent is None:
                    prev_dev = self._init_state(kind, K)
                    prev_ser = []
                else:
                    prev_dev, prev_ser = ent
                    if prev_dev.shape[0] != K:
                        # signature growth (recompiles anyway): pad /
                        # trim the device state once, eagerly
                        init = self._init_state(kind, K)
                        prev_dev = jnp.concatenate(
                            [prev_dev[:K], init[prev_dev.shape[0]:]],
                            axis=0)
                perm.extend(
                    prev_ser.index(s)
                    if (s is not None and s in prev_ser) else -1
                    for s in cur)
                filt_prevs.append(prev_dev)
                filt_keys.append(ck)
                filt_serials.append(cur)
        if fbd_pos:
            put("fbdpos", np.asarray(fbd_pos, np.int32))
        if perm:
            put("fperm", np.asarray(perm, np.int32))

        meta = (fbd_ids, fbd_nframes, filt_keys, filt_serials,
                prog.frag_sizes, prog.master_channels)
        return sig, blob, fbd_rings, filt_prevs, meta

    def _commit(self, meta, new_rings, new_filt):
        fbd_ids, fbd_nframes, filt_keys, filt_serials, _, _ = meta
        for uid, ring, nf in zip(fbd_ids, new_rings, fbd_nframes):
            self._rings[uid][0] = ring
            self._rings[uid][1] = (self._rings[uid][1] + nf) \
                % _FBD_BUFSIZE
        for ck, cur, stf in zip(filt_keys, filt_serials, new_filt):
            self._filt_cache[ck] = [stf, cur]

    def dispatch_many(self, progs):
        """ONE device dispatch for a batch of superblocks (typically
        one per stream of a multiplexed fleet): the per-signature
        superblock programs run back to back inside a single jitted
        call.  Through a high-latency link every dispatch costs a
        completion-poll round trip (~hundreds of ms on this relay
        under load); batching pays it once per K superblocks.  Device
        state threads exactly as in K separate dispatches — streams
        are disjoint in rings/filter state by construction.  Returns
        a list of fetch() handles, one per program."""
        if self.transfer_lock is not None:
            with self.transfer_lock:
                return self._dispatch_many(progs)
        return self._dispatch_many(progs)

    def _dispatch_many(self, progs):
        if len(progs) == 1:
            return [self._dispatch(progs[0])]
        preps = [self._prepare(p) for p in progs]
        sigs = tuple(pr[0] for pr in preps)
        chain = self._chain_for(sigs, progs)
        atlas = self._atlas()
        devs = tuple(_threaded_put(pr[1], nchunks=16)
                     for pr in preps)
        outs = chain(atlas, devs,
                     tuple(pr[2] for pr in preps),
                     tuple(pr[3] for pr in preps))
        handles = []
        for pr, (masters, nr_, nf_) in zip(preps, outs):
            self._commit(pr[4], nr_, nf_)
            handles.append((masters, pr[4][4], pr[4][5]))
        return handles

    def _chain_for(self, sigs, progs=None):
        """The jitted K-superblock chain for a tuple of signatures
        (cached; also the AOT target of precompile_many)."""
        ch = self._chain_fns.get(sigs)
        if ch is not None:
            return ch
        fns = []
        for k, sig in enumerate(sigs):
            f = self._jit_fns.get(sig)
            if f is None:
                f = self._build_fn(progs[k] if progs else None, sig)
                self._jit_fns[sig] = f
                self._fns.setdefault(sig, f)
            fns.append(f)

        def chain(atlas, blobs, ringss, prevss):
            return tuple(fns[k](atlas, blobs[k], ringss[k],
                                prevss[k])
                         for k in range(len(fns)))

        ch = jax.jit(chain)
        self._chain_fns[sigs] = ch
        return ch

    def dispatch_chain(self, progs):
        """ONE device dispatch for N CONSECUTIVE superblocks of the
        same stream: fbdelay rings and filter/fm state thread
        iteration-to-iteration INSIDE the jitted call (unlike
        dispatch_many, whose entries are state-disjoint streams), so
        the link's per-dispatch completion-poll cost is paid once per
        N superblocks of a solo render.  Requires every program to
        share one signature and one fbdelay/filter instance
        population (true for a profiled song in steady state); falls
        back to sequential dispatches otherwise.  Returns a list of
        fetch() handles in superblock order."""
        if self.transfer_lock is not None:
            with self.transfer_lock:
                return self._dispatch_chain(progs)
        return self._dispatch_chain(progs)

    def _dispatch_chain(self, progs):
        if len(progs) == 1:
            return [self._dispatch(progs[0])]
        preps = [self._prepare(p) for p in progs]
        sig0 = preps[0][0]
        m0 = preps[0][4]
        for pr in preps[1:]:
            if pr[0] != sig0 or pr[4][0] != m0[0] \
                    or pr[4][2] != m0[2]:
                # signature drift or instance-population change:
                # state cannot thread through one compiled chain —
                # dispatch sequentially (correct, just unamortized).
                # _prepare is idempotent w.r.t. _dispatch's own
                # prepare (shapes already padded, state re-read).
                return [self._dispatch(p) for p in progs]
        layout, total = _blob_layout(sig0)
        items = sig0[-1]
        # patch cross-superblock host-carried state for k >= 1:
        # fbdelay ring positions advance by the previous superblocks'
        # frame counts (legacy path; dense rings are position-free),
        # and the filter lane permutation must map against superblock
        # k-1's lane serials, not the cache's
        if "fbdpos" in layout and len(progs) > 1:
            pos0 = preps[0][1][layout["fbdpos"][0]:
                               layout["fbdpos"][0]
                               + len(m0[0])].copy()
            for k in range(1, len(preps)):
                pos0 = (pos0 + np.asarray(preps[k - 1][4][1],
                                          np.int64)) % _FBD_BUFSIZE
                p0, _ = layout["fbdpos"]
                preps[k][1][p0:p0 + len(pos0)] = \
                    pos0.astype(np.int32)
        if "fperm" in layout:
            p0, (nperm,) = layout["fperm"]
            for k in range(1, len(preps)):
                prev_ser = preps[k - 1][4][3]
                cur_ser = preps[k][4][3]
                perm = []
                for ps, cs in zip(prev_ser, cur_ser):
                    perm.extend(ps.index(s)
                                if (s is not None and s in ps)
                                else -1 for s in cs)
                preps[k][1][p0:p0 + nperm] = \
                    np.asarray(perm, np.int32)
        n = len(progs)
        key = ("chain", sig0, n)
        ch = self._chain_fns.get(key)
        if ch is None:
            f = self._jit_fns.get(sig0)
            if f is None:
                f = self._build_fn(progs[0], sig0)
                self._jit_fns[sig0] = f
                self._fns.setdefault(sig0, f)

            def chain(atlas, blobs, rings, prevs):
                outs = []
                for k in range(n):
                    parts, rings, prevs = f(atlas, blobs[k], rings,
                                            prevs)
                    outs.append(parts)
                return tuple(outs), rings, prevs

            ch = jax.jit(chain)
            self._chain_fns[key] = ch
        atlas = self._atlas()
        devs = tuple(_threaded_put(pr[1], nchunks=16)
                     for pr in preps)
        all_parts, fin_rings, fin_prevs = ch(
            atlas, devs, preps[0][2], preps[0][3])
        # commit the final threaded state; ring positions advance by
        # the chain's total frames, serial identity comes from the
        # LAST superblock's lane population
        last = preps[-1][4]
        merged = (m0[0],
                  [sum(pr[4][1][i] for pr in preps)
                   for i in range(len(m0[1]))],
                  last[2], last[3], None, None)
        self._commit(merged, fin_rings, fin_prevs)
        return [(parts, pr[4][4], pr[4][5])
                for parts, pr in zip(all_parts, preps)]

    def precompile_chain(self, prog, n):
        """AOT remote compile of the n-superblock solo chain from
        shape skeletons (the solo analog of precompile_many)."""
        self._repad(prog)
        sig = self._signature(prog)
        key = ("chain", sig, n)
        if isinstance(self._chain_fns.get(key), jax.stages.Compiled):
            return False
        f = self._jit_fns.get(sig)
        if f is None:
            f = self._build_fn(prog, sig)
            self._jit_fns[sig] = f
            self._fns.setdefault(sig, f)

        def chain(atlas, blobs, rings, prevs):
            outs = []
            r, pv = rings, prevs
            for k in range(n):
                parts, r, pv = f(atlas, blobs[k], r, pv)
                outs.append(parts)
            return tuple(outs), r, pv

        sd = jax.ShapeDtypeStruct
        items = sig[-1]
        layout, total = _blob_layout(sig)
        blobs = tuple(sd((total,), jnp.int32) for _ in range(n))
        rings = [sd((2, FBD_TAIL if e[5] else _FBD_BUFSIZE),
                    jnp.int32)
                 for t, _, e in items if t == "fbd"]
        prevs = [sd((e[1],), jnp.int64) if k[2] == "lim"
                 else sd((e[1], 4), jnp.int32) if k[2] == "fm"
                 else sd((e[1], 2, 2), jnp.int32)
                 for t, k, e in items if t == "filt"]
        atlas = sd(self._atlas().shape, jnp.int32)
        self._chain_fns[key] = jax.jit(chain).lower(
            atlas, blobs, rings, prevs).compile()
        return True

    def precompile_many(self, progs):
        """AOT remote compile of the K-superblock chain from shape
        skeletons (the batch analog of precompile): a serving fleet
        compiles its whole batch program before the serving window
        opens.  Returns True if a compile actually happened."""
        for p in progs:
            self._repad(p)
        sigs = tuple(self._signature(p) for p in progs)
        if len(progs) < 2 or isinstance(
                self._chain_fns.get(sigs), jax.stages.Compiled):
            return False
        chain = self._chain_for(sigs, progs)
        sd = jax.ShapeDtypeStruct
        blobs = []
        ringss = []
        prevss = []
        for sig in sigs:
            items = sig[-1]
            layout, total = _blob_layout(sig)
            blobs.append(sd((total,), jnp.int32))
            ringss.append([sd((2, FBD_TAIL if e[5]
                               else _FBD_BUFSIZE), jnp.int32)
                           for t, _, e in items if t == "fbd"])
            prevss.append([sd((e[1],), jnp.int64) if k[2] == "lim"
                           else sd((e[1], 4), jnp.int32)
                           if k[2] == "fm"
                           else sd((e[1], 2, 2), jnp.int32)
                           for t, k, e in items if t == "filt"])
        atlas = sd(self._atlas().shape, jnp.int32)
        self._chain_fns[sigs] = chain.lower(
            atlas, tuple(blobs), tuple(ringss),
            tuple(prevss)).compile()
        return True

    @staticmethod
    def _get_parts(masters):
        """Concurrent d2h of the pre-split master chunks (the jitted
        fn returns them already sliced, so each np.asarray is a pure
        transfer with no device program)."""
        import threading
        outs = [None] * len(masters)
        errs = []

        def g(i):
            try:
                outs[i] = _retry(lambda: np.asarray(masters[i]))
            except BaseException as e:
                errs.append(e)
        th = [threading.Thread(target=g, args=(i,))
              for i in range(len(masters))]
        for t in th:
            t.start()
        for t in th:
            t.join()
        if errs:
            raise errs[0]
        return np.concatenate(outs, axis=0)

    def fetch(self, handle):
        """Blocks on the threaded readback of a dispatched superblock
        and returns master audio [channels][frames] (numpy)."""
        masters, frag_sizes, mch = handle
        if not isinstance(masters, (tuple, list)):
            masters = (masters,)
        if self.transfer_lock is not None:
            # wait for the device off-lock, serialize only the d2h
            for m in masters:
                m.block_until_ready()
            with self.transfer_lock:
                out = self._get_parts(masters)   # [F, mch, 64]
        else:
            out = self._get_parts(masters)       # [F, mch, 64]
        if out.dtype == np.int16:
            # reconstruct the int32 8:24 contract from the on-device
            # 16-bit conversion (lossless for 16-bit PCM sinks)
            out = out.astype(np.int32) << 8
        total = sum(frag_sizes)
        if total == len(frag_sizes) * FRAG:
            flat = out.transpose(1, 0, 2).reshape(mch, total)
            return [flat[ch] for ch in range(mch)]
        bufs = []
        for ch in range(mch):
            b = np.empty(total, np.int32)
            pos = 0
            for fi, nfr in enumerate(frag_sizes):
                b[pos:pos + nfr] = out[fi, ch, :nfr]
                pos += nfr
            bufs.append(b)
        return bufs

    def reset_instance(self, unit_id):
        self._rings.pop(unit_id, None)
