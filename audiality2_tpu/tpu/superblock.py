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
import jax.numpy as jnp

from ..constants import A2_MAXFRAG, A2_PROCADD
from ..units.ramper import Ramper
from . import osc_kernel as OK

FRAG = A2_MAXFRAG
_FBD_BUFSIZE = 1 << 17


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
        # rows
        self.row_classes = []    # (cls, tbase[NB], params[NB*8,128], order[NB,128])
        self.nrows = 0
        self.row_aux = None      # int32 [Rpad, 8]: slot off frm haspm
                                 # stereo clamp vol0 dvol  (+ pan cols)
        self.row_pm = None       # int32 [Rpad, 4]: vol0 dvol pan0 dpan
        self.row_flags = None    # int32 [Rpad, 4]: slot, off, frm, mode
        # stash
        self.stash_audio = None  # int32 [NS, 2, 64] pre-masked
        self.stash_slot = None   # int32 [NS]
        # stages: list of dicts (kind, variant, arrays)
        self.stages = []
        # fbdelay instances: list of dicts
        self.fbdelays = []


# mode bits for rows
_ROW_HASPM = 1
_ROW_STEREO = 2
_ROW_CLAMP = 4


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

    prog.ninst = len(inst_ids) + 1

    # ----- rows: bucket for the pallas osc kernel -----
    prog.nrows = rowbatch.n
    if rowbatch.n:
        batch = OK.OscBatch(None)
        for i in range(rowbatch.n):
            w, mm = rowbatch.wavemip[i]
            if w is None:
                raise Unsupported("row without wave key")
            tb, npz, off = core.pair_atlas_entry(w, mm)
            batch.add(tb, npz, off, rowbatch.ph0[i], rowbatch.dph[i],
                      rowbatch.amp0[i], rowbatch.damp[i])
        prog.row_classes = batch.build()
        R = rowbatch.n
        Rpad = _pow2(R, 64)
        pm = np.zeros((Rpad, 4), np.int32)
        fl = np.zeros((Rpad, 4), np.int32)
        pm[:R, 0] = np.asarray(rowbatch.vol0, np.int64).astype(np.int32)
        pm[:R, 1] = np.asarray(rowbatch.dvol, np.int64).astype(np.int32)
        pm[:R, 2] = np.asarray(rowbatch.pan0, np.int64).astype(np.int32)
        pm[:R, 3] = np.asarray(rowbatch.dpan, np.int64).astype(np.int32)
        fl[:R, 0] = rows_slot[:R].astype(np.int32)
        fl[R:, 0] = prog.ninst * F            # dead slot
        fl[:R, 1] = rows_off[:R]
        fl[:R, 2] = rows_frm[:R]
        fl[:R, 3] = (np.asarray(rowbatch.haspm, bool) * _ROW_HASPM
                     + np.asarray(rowbatch.stereo, bool) * _ROW_STEREO
                     + np.asarray(rowbatch.clamp, bool) * _ROW_CLAMP)
        prog.row_pm = pm
        prog.row_flags = fl

    # ----- stash -----
    if stash_list:
        NS = _pow2(len(stash_list), 1)
        sa = np.zeros((NS, 2, FRAG), np.int32)
        ssl = np.full(NS, prog.ninst * F, np.int32)
        for i, (slot, audio) in enumerate(stash_list):
            sa[i] = audio
            ssl[i] = slot
        prog.stash_audio = sa
        prog.stash_slot = ssl

    # ----- stages -----
    for key in sorted(stages.keys()):
        nest, chain, kind = key[0], key[1], key[2]
        entries = stages[key]
        K = _pow2(len(entries), 1)
        arr = np.zeros((K, 9), np.int32)
        arr[:, 0] = prog.ninst * F     # dead src for padding
        arr[:, 1] = prog.ninst * F
        for i, en in enumerate(entries):
            arr[i] = en
        prog.stages.append({"kind": kind, "key": key, "arr": arr,
                            "n": len(entries)})

    # fbdelay instances are stage ops too — insert in depth order
    for fd in fbd_insts.values():
        NS = _pow2(len(fd["slices"]), 1)
        arr = np.zeros((NS, 13), np.int32)
        for i, s in enumerate(fd["slices"]):
            arr[i] = s
        arr[len(fd["slices"]):, 5] = 0          # frames=0 -> no-op
        prog.fbdelays.append({
            "unit_id": id(fd["unit"]), "key": fd["key"],
            "stereoin": fd["stereoin"], "stereoout": fd["stereoout"],
            "add": fd["add"], "arr": arr, "n": len(fd["slices"])})

    return prog


# =================================================================
#   Device execution
# =================================================================

class DeviceMixer:
    """Executes SuperblockPrograms on the device.  Owns the device
    pair-atlas copy and the fbdelay ring state (persist across
    superblocks)."""

    def __init__(self, core, interpret=None):
        self.core = core
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        self._atlas_dev = None
        self._atlas_ver = -1
        self._rings = {}         # unit_id -> [jnp (2, SIZE) int32, pos]
        self._jits = {}

    # ---- atlas ----
    def _atlas(self):
        pa = self.core._pair_atlas
        if pa is None:
            from .osc_kernel import PairAtlas
            self.core._pair_atlas = pa = PairAtlas()
            pa.finalize()
        if pa.version != self._atlas_ver:
            self._atlas_dev = jnp.asarray(pa.data)
            self._atlas_ver = pa.version
        return self._atlas_dev

    def run(self, prog):
        """Returns master audio int32 [channels, frames] (numpy)."""
        F = prog.F
        nslot = prog.ninst * F + 1
        slots = jnp.zeros((nslot, 2, FRAG), jnp.int32)
        atlas = self._atlas()

        # 1) rows
        if prog.nrows:
            slots = self._run_rows(prog, atlas, slots)

        # 2) stash patches
        if prog.stash_audio is not None:
            slots = slots.at[jnp.asarray(prog.stash_slot)].add(
                jnp.asarray(prog.stash_audio))

        # 3) stages in depth order (fbdelay merged by key)
        items = [(st["key"], "stage", st) for st in prog.stages]
        items += [(fd["key"] + ("fbdelay",), "fbd", fd)
                  for fd in prog.fbdelays]
        for _, kind, ob in sorted(items, key=lambda t: t[0]):
            if kind == "stage":
                slots = self._run_stage(ob, slots)
            else:
                slots = self._run_fbdelay(ob, slots)

        # 4) master extraction + readback
        mslots = slots[prog.master_inst * F:(prog.master_inst + 1) * F]
        mch = prog.master_channels
        out = np.asarray(mslots)                 # [F, 2, 64]
        bufs = []
        total = sum(prog.frag_sizes)
        for ch in range(mch):
            b = np.empty(total, np.int32)
            pos = 0
            for fi, n in enumerate(prog.frag_sizes):
                b[pos:pos + n] = out[fi, ch, :n]
                pos += n
            bufs.append(b)
        return bufs

    # ---- rows ----
    def _run_rows(self, prog, atlas, slots):
        F = prog.F
        outs = []
        orders = []
        for cls, tbase_arr, params, order in prog.row_classes:
            res = OK._osc_call(cls, jnp.asarray(tbase_arr),
                               jnp.asarray(params), atlas,
                               interpret=self.interpret)
            outs.append(res.T)                  # (NB*RPB, 64)
            orders.append(order.reshape(-1))
        osc_all = jnp.concatenate(outs, axis=0)
        order_all = np.concatenate(orders)
        # invert: for row i, position in osc_all
        Rpad = prog.row_flags.shape[0]
        inv = np.zeros(Rpad, np.int64)
        keep = order_all >= 0
        inv[order_all[keep]] = np.nonzero(keep)[0]
        osc = jnp.take(osc_all, jnp.asarray(inv), axis=0)  # [Rpad, 64]

        pm = jnp.asarray(prog.row_pm.astype(np.int64))
        fl = prog.row_flags
        n = jnp.arange(FRAG, dtype=jnp.int64)[None, :]
        osc64 = osc.astype(jnp.int64)
        vol = pm[:, 0:1] + n * pm[:, 1:2]
        pan = pm[:, 2:3] + n * pm[:, 3:4]
        vp = (pan * vol) >> 24
        v0 = vol - vp
        v1 = vol + vp
        lim = vol << 1
        clamp = jnp.asarray((fl[:, 3] & _ROW_CLAMP) != 0)[:, None]
        v0 = jnp.where(clamp, jnp.minimum(v0, lim), v0)
        v1 = jnp.where(clamp, jnp.minimum(v1, lim), v1)
        haspm = jnp.asarray((fl[:, 3] & _ROW_HASPM) != 0)[:, None]
        stereo = jnp.asarray((fl[:, 3] & _ROW_STEREO) != 0)[:, None]
        mono_pm = (osc64 * vol) >> 24
        l_pm = (osc64 * v0) >> 24
        r_pm = (osc64 * v1) >> 24
        ch0 = jnp.where(haspm, jnp.where(stereo, l_pm, mono_pm), osc64)
        ch1 = jnp.where(haspm & stereo, r_pm, jnp.zeros_like(osc64))
        # place the slice at its offset: audio sample k of the row
        # lands at frame off+k; build [Rpad, 2, 64] shifted + masked
        off = jnp.asarray(fl[:, 1].astype(np.int64))[:, None]
        frm = jnp.asarray(fl[:, 2].astype(np.int64))[:, None]
        pos = n - off                       # source sample for frame n
        valid = (pos >= 0) & (pos < frm)
        posc = jnp.clip(pos, 0, FRAG - 1).astype(jnp.int32)
        ch0s = jnp.where(valid, jnp.take_along_axis(
            ch0, posc.astype(jnp.int64), axis=1), 0)
        ch1s = jnp.where(valid, jnp.take_along_axis(
            ch1, posc.astype(jnp.int64), axis=1), 0)
        audio = jnp.stack([ch0s, ch1s], axis=1).astype(jnp.int32)
        return slots.at[jnp.asarray(fl[:, 0].astype(np.int64))].add(
            audio)

    # ---- panmix / copy stages ----
    def _run_stage(self, st, slots):
        arr = st["arr"]
        key = st["key"]
        kind = key[2]
        a = jnp.asarray(arr.astype(np.int64))
        src = slots[a[:, 0]]                   # [K, 2, 64] int32
        n = jnp.arange(FRAG, dtype=jnp.int64)[None, :]
        o = a[:, 2:3]
        f = a[:, 3:4]
        mask = (n >= o) & (n < o + f)
        # rampers advance in slice-local samples (a2_RunRamper): the
        # value at absolute frame n is value + (n - offset) * delta
        ns = n - o
        if kind == "copy":
            ch_s = key[5][0]
            ch_d = key[6][0]
            add = key[4]
            out = src[:, ch_s].astype(jnp.int64)
            return self._emit(slots, a[:, 1], {ch_d: out}, mask, add)
        # panmix
        ni, no, add, sch, dch = key[3], key[4], key[5], key[6], key[7]
        vol = a[:, 4:5] + ns * a[:, 5:6]
        if ni == 1 and no == 1:
            inp = src[:, sch[0]].astype(jnp.int64)
            out = (inp * vol) >> 24
            return self._emit(slots, a[:, 1], {dch[0]: out}, mask, add)
        pan = a[:, 6:7] + ns * a[:, 7:8]
        clamp = (a[:, 8:9] != 0)
        vp = (pan * vol) >> 24
        v0 = vol - vp
        v1 = vol + vp
        lim = vol << 1
        v0 = jnp.where(clamp, jnp.minimum(v0, lim), v0)
        v1 = jnp.where(clamp, jnp.minimum(v1, lim), v1)
        if ni == 1 and no == 2:
            inp = src[:, sch[0]].astype(jnp.int64)
            return self._emit(slots, a[:, 1],
                              {dch[0]: (inp * v0) >> 24,
                               dch[1]: (inp * v1) >> 24}, mask, add)
        i0 = src[:, sch[0]].astype(jnp.int64)
        i1 = src[:, sch[1]].astype(jnp.int64)
        if ni == 2 and no == 1:
            out = (i0 * v0 + i1 * v1) >> 25
            return self._emit(slots, a[:, 1], {dch[0]: out}, mask, add)
        return self._emit(slots, a[:, 1],
                          {dch[0]: (i0 * v0) >> 24,
                           dch[1]: (i1 * v1) >> 24}, mask, add)

    def _emit(self, slots, dst, ch_out, mask, add):
        """Writes per-channel int64 [K, 64] outputs into dst slots,
        masked to the slice range.  REPLACE becomes add-of-difference
        so duplicate dst indices stay well-defined."""
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
        return slots.at[dst].add(delta)

    # ---- fbdelay ----
    def _run_fbdelay(self, fd, slots):
        uid = fd["unit_id"]
        ring = self._rings.get(uid)
        if ring is None:
            ring = [jnp.zeros((2, _FBD_BUFSIZE), jnp.int32), 0]
            self._rings[uid] = ring
        arr = fd["arr"]
        NS = arr.shape[0]
        a = jnp.asarray(arr.astype(np.int64))
        # gather src audio series: [NS, 2, 64]
        src0 = slots[a[:, 0]][:, 0]
        src1 = slots[a[:, 1]][:, 1 if fd["stereoin"] else 0]
        old = slots[a[:, 2]]                  # dst (for replace diff)
        old0 = old[:, 0]
        old1 = slots[a[:, 3]][:, 1]

        bufpos0 = ring[1]
        # per-slice start position in the ring: cumulative frames
        frames = arr[:, 5].astype(np.int64)
        starts = bufpos0 + np.concatenate([[0], np.cumsum(frames)[:-1]])
        startsj = jnp.asarray(starts)

        nvec = jnp.arange(FRAG, dtype=jnp.int64)[None, :]
        oj = a[:, 4:5]
        fj = a[:, 5:6]
        msk = nvec < fj
        widx = (startsj[:, None] + nvec) & (_FBD_BUFSIZE - 1)
        # the scan works in slice-local sample positions: input sample
        # k of a slice is bus frame o+k; gather inputs rolled left by
        # the slice offset, roll outputs back afterwards
        ridx = jnp.clip(nvec + oj, 0, FRAG - 1)
        src0 = jnp.take_along_axis(src0, ridx, axis=1)
        src1 = jnp.take_along_axis(src1, ridx, axis=1)

        def step(rings, xs):
            (i0, i1, o0_, o1_, wid, m, fb, ld, rd, dry, fbg, lg, rg) = xs
            L, R = rings
            i0 = i0.astype(jnp.int64)
            i1 = i1.astype(jnp.int64)
            tap = lambda buf, dl: jnp.take(
                buf, (wid - dl) & (_FBD_BUFSIZE - 1)).astype(jnp.int64)
            o0 = (tap(R, fb) * fbg) >> 16
            o1 = (tap(L, fb) * fbg) >> 16
            Lw = jnp.where(m, (i0 + o0).astype(jnp.int32),
                           jnp.take(L, wid))
            Rw = jnp.where(m, (i1 + o1).astype(jnp.int32),
                           jnp.take(R, wid))
            L = L.at[wid].set(Lw)
            R = R.at[wid].set(Rw)
            o0 = o0 + ((tap(L, ld) * lg) >> 16)
            o1 = o1 + ((tap(R, rd) * rg) >> 16)
            o0 = o0 + ((i0 * dry) >> 16)
            o1 = o1 + ((i1 * dry) >> 16)
            return (L, R), (o0.astype(jnp.int32), o1.astype(jnp.int32))

        xs = (src0, src1, old0, old1, widx, msk,
              a[:, 6], a[:, 7], a[:, 8], a[:, 9], a[:, 10], a[:, 11],
              a[:, 12])
        (L, R), (out0, out1) = jax.lax.scan(
            step, (ring[0][0], ring[0][1]), xs)
        ring[0] = jnp.stack([L, R])
        ring[1] = int((bufpos0 + frames.sum()) % (1 << 62))

        add = fd["add"]
        stereoout = fd["stereoout"]
        # roll outputs back to bus frame positions [o, o+f)
        backidx = jnp.clip(nvec - oj, 0, FRAG - 1)
        omask = (nvec >= oj) & (nvec < oj + fj)
        out0 = jnp.take_along_axis(out0, backidx, axis=1)
        out1 = jnp.take_along_axis(out1, backidx, axis=1)
        if add:
            d0 = jnp.where(omask, out0, 0)
            d1 = jnp.where(omask, out1, 0) if stereoout else None
        else:
            d0 = jnp.where(omask, out0 - old0, 0)
            d1 = jnp.where(omask, out1 - old1, 0) if stereoout else None
        slots = slots.at[a[:, 2], 0].add(d0)
        if stereoout:
            slots = slots.at[a[:, 3], 1].add(d1)
        return slots

    def reset_instance(self, unit_id):
        self._rings.pop(unit_id, None)
