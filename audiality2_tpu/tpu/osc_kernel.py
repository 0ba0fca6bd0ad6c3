"""Pallas TPU oscillator kernel: exact-integer batched wtosc rows.

This is the production device path for wavetable-oscillator row
evaluation.  The round-1 row kernel (row_kernel.py) lowered its table
reads to XLA gathers, which run at ~130M int32 lookups/s on the TPU
and bound the kernel at ~15M voice-samples/s.  This kernel instead
uses the hardware's per-sublane 128-lane shuffle (Mosaic lowers
``jnp.take_along_axis(src, idx, axis=1)`` to it) and a split-index
scheme: a wavetable of S entries is covered by ceil(S/128) "passes",
each pass shuffling one 128-wide atlas row into place.  The driver-
captured rate is ``tpu_osc_kernel_msamples_s`` in the newest
BENCH_r*.json (284M exact hifi voice-samples/s in BENCH_r04 at the
worst-case mip-0 pass count); in-session bests have reached ~350M in
fair relay weather, and typical musical content selects mips 2..5
(1-4 passes) and runs faster.  hermite2's shared
window cuts hifi to 3 lookups/sample (~4/3x on the shuffle bound).

Exactness: all arithmetic is int32 with x86 wrap semantics, matching
the native runtime (native/a2rt_units.inc hermite) which is bit-exact
with the C reference (reference a2_dsp.h:64-74 Hermite, built with
-fwrapv; reference src/units/wtosc.c:29-33 2x oversampled HIFI
interpolation).  The only >32-bit product, (v * amp) >> 17
(wtosc.c:216), is computed exactly via a 3-limb decomposition: with
amp = a2*2^28 + a1*2^14 + a0 and |v| <= 2^18,

    (v*amp) >> 17 == ((v*a2) << 11) + ((v*a1 + ((v*a0) >> 14)) >> 3)

(each partial product fits int32; the identity holds for arithmetic
shifts because floor((A*2^28 + B)/2^17) = A*2^11 + floor(B/2^17)).

Row layout: 128 rows per block on the lane axis, 64 frames on the
sublane axis.  Phase is carried as (pos, frac24) int32 pairs instead
of the 48:24 int64 of the XLA path — exact because the mip selector
caps dph at 2 samples/frame (A2_MAXPHINC<<16 in 48:24), so
n*frac24 < 2^30 and positions stay well inside int32.

Rows are bucketed by (wave, mip) — every row in a 128-row block reads
the same table, whose atlas location arrives per-block via scalar
prefetch.  Blocks are grouped into "pass classes" (1,2,4,8,18 passes)
so each pallas_call only pays for the table span it actually needs.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import A2_MAXFRAG, A2_WAVEPRE

FRAG = A2_MAXFRAG           # 64 frames per row
RPB = 128                   # rows per block (lane axis)
NPARAM = 16                 # packed param sublanes per block

# param sublane indices within a block's (NPARAM, RPB) tile.
# Slots 6..12 feed the FUSED per-row panmix (reference
# src/units/panmix.c panmix_process12/process11): the vol/pan ramp
# bases+deltas (int32-wrap per-sample recurrences), the row's valid
# sample range [OFF, END), and the row mode bits.
(P_POS0, P_F0, P_DPOS, P_DF, P_AMP0, P_DAMP,
 P_VOL0, P_DVOL, P_PAN0, P_DPAN, P_OFF, P_END, P_MODE) = range(13)

# row mode bits (shared with superblock.py's row tables)
ROW_HASPM = 1               # row passes through a panmix stage
ROW_STEREO = 2              # panmix 1->2 (else 1->1 vol only)
ROW_CLAMP = 4               # panmix clamps v0/v1 at 2*vol

# pass classes compiled as separate kernels; 18 covers a mip-0
# 2048-entry table plus its interpolation/run-ahead padding
PASS_CLASSES = (1, 2, 4, 8, 18)


def _ta_rows(src, idx, interpret):
    """take_along_axis(src, idx, axis=1) with int32 indices.

    jnp.take_along_axis promotes indices to int64 under
    jax_enable_x64, which neither Mosaic nor the Pallas interpreter
    accepts; this builds the identical batched gather it would build
    without x64 (Mosaic lowers it to the per-sublane lane shuffle)."""
    del interpret
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,),
        start_index_map=(1,), operand_batching_dims=(0,),
        start_indices_batching_dims=(0,))
    return jax.lax.gather(
        src, idx[..., None].astype(jnp.int32), dnums,
        slice_sizes=(1, 1), fill_value=None,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _mul_shr24(x, y):
    """Low 32 bits of ((int64)x * y) >> 24 in pure int32 lanes —
    the panmix product (reference panmix.c:91,104-110: the C engine
    assigns the shifted 64-bit product to a 32-bit int, and the
    downstream audio accumulation wraps at 32 bits anyway).

    16-bit limb decomposition with unsigned low halves:
        P = x*y = 2^32*(xh*yh + (t>>16) + (t2>>16))
                  + 2^16*(t2 & 0xFFFF) + (p0 & 0xFFFF)
        t  = xh*yl + (p0 >>> 16)      (exact: |xh*yl| < 2^31 - 2^16)
        t2 = xl*yh + (t & 0xFFFF)
    so bits 24..55 of P are ((hi << 8) | (lo >>> 24)) with hi/lo the
    two product words (hi only needed mod 2^32)."""
    xl = x & 0xFFFF
    xh = x >> 16
    yl = y & 0xFFFF
    yh = y >> 16
    p0 = xl * yl
    t = xh * yl + jax.lax.shift_right_logical(p0, 16)
    t2 = xl * yh + (t & 0xFFFF)
    hi = xh * yh + (t >> 16) + (t2 >> 16)
    lo = (t2 << 16) | (p0 & 0xFFFF)
    return (hi << 8) | jax.lax.shift_right_logical(lo, 24)


def _make_kernel(npass, interpret=False, quality=0, fused_pm=True,
                 mono=False):
    def kern(tbase_ref, param_ref, atlas_ref, out_ref):
        n = jax.lax.broadcasted_iota(jnp.int32, (FRAG, RPB), 0)
        P = param_ref[:]
        pos0 = P[P_POS0][None, :]
        f0 = P[P_F0][None, :]
        dpos = P[P_DPOS][None, :]
        df = P[P_DF][None, :]
        amp0 = P[P_AMP0][None, :]
        damp = P[P_DAMP][None, :]

        # exact 48:24 phase via (pos, frac24) split
        fr = f0 + n * df
        pos = pos0 + n * dpos + (fr >> 24)
        fr = fr & 0xFFFFFF
        ph16 = (pos << 8) | (fr >> 16)          # 16:8 table position
        dph16 = (dpos << 8) | (df >> 16)

        tb = tbase_ref[pl.program_id(0)]

        if interpret:
            # the split-index lane shuffle is a TPU lowering trick;
            # in the interpreter a direct gather is numerically
            # identical (live lookups are always in range: pos >=
            # A2_WAVEPRE, so i-1 >= 0; dead rows have amp 0 and every
            # output limb multiplies by it) and compiles a graph
            # npass times smaller — this is what keeps the CPU test
            # suite's interpret-mode jit compiles tractable
            flat = atlas_ref[:].reshape(-1)

            def lookup_pair(j):
                idx = jnp.clip(tb * RPB + j, 0, flat.shape[0] - 1)
                return jnp.take(flat, idx)
        else:
            def lookup_pair(j):
                # j: pair index relative to the block's table base
                # row; returns int32-packed (d[j+1] << 16 | u16(d[j]))
                hi = j >> 7
                lo = j & 127
                acc = jnp.zeros_like(j)
                for r in range(npass):
                    row = atlas_ref[pl.ds(tb + r, 1), :]
                    src = jnp.broadcast_to(row, (FRAG, RPB))
                    g = _ta_rows(src, lo, interpret)
                    acc = jnp.where(hi == r, g, acc)
                return acc

        def hermite_poly(dm1, d0, d1, d2, x):
            # a2_Hermite (a2_dsp.h:64-74), int32 wrap products
            c = (d1 - dm1) >> 1
            a = (3 * (d0 - d1) + d2 - dm1) >> 1
            b = dm1 - d0 + c - a
            a = (a * x) >> 15
            a = ((a + b) * x) >> 15
            return d0 + (((a + c) * x) >> 15)

        def hermite2(ph, dhalf):
            # both HIFI 2x-oversampled Hermite taps (wtosc.c:216:
            # sample at ph and at ph + dph/2) from THREE pair lookups
            # instead of four: dph16 <= A2_MAXPHINC (the record pass
            # only emits rows with dph <= MAXPHINC<<16,
            # a2rt_record.inc:603), so the second tap's base index i2
            # advances by at most 1 and its window d[i2-1..i2+2] sits
            # inside d[i-1..i+3] — covered by pairs at i-1, i+1, i+3.
            # pc's high half d[i+4] is never used (and never read
            # out of bounds: the split-index lookup selects only
            # within the block's npass rows).
            i = ph >> 8
            x1 = (ph & 0xFF) << 7
            ph2 = ph + dhalf
            i2 = ph2 >> 8
            x2 = (ph2 & 0xFF) << 7
            pa = lookup_pair(i - 1)             # (d[i-1], d[i])
            pb = lookup_pair(i + 1)             # (d[i+1], d[i+2])
            pc = lookup_pair(i + 3)             # (d[i+3], .)
            dm1 = (pa << 16) >> 16
            d0 = pa >> 16
            d1 = (pb << 16) >> 16
            d2 = pb >> 16
            d3 = (pc << 16) >> 16
            v1 = hermite_poly(dm1, d0, d1, d2, x1)
            adv = i2 != i                       # 0 or 1 by the cap
            em1 = jnp.where(adv, d0, dm1)
            e0 = jnp.where(adv, d1, d0)
            e1 = jnp.where(adv, d2, d1)
            e2 = jnp.where(adv, d3, d2)
            return v1 + hermite_poly(em1, e0, e1, e2, x2)

        def lerp16(ph):
            # a2_Lerp16 (a2_dsp.h:58-61): one pair lookup per sample
            # (the pair packs both interpolation endpoints), so the
            # lofi kernel runs ~3x fewer lane shuffles than hermite
            i = ph >> 8
            x = ph & 0xFF
            pa = lookup_pair(i)                 # (d[i], d[i+1])
            d0 = (pa << 16) >> 16
            d1 = pa >> 16
            return (d0 * (256 - x) + d1 * x) >> 8

        # interpolation quality (wtosc.c:27-46): 0 = A2_HIFI
        # 2x-oversampled Hermite, 1 = default 2x lerp, 2 = A2_LOFI
        # single lerp doubled
        if quality == 0:
            v = hermite2(ph16, dph16 >> 1)
        elif quality == 1:
            v = lerp16(ph16) + lerp16(ph16 + (dph16 >> 1))
        else:
            v = lerp16(ph16) << 1

        # (v * amp) >> 17, exact 3-limb decomposition
        amp = amp0 + n * damp
        a2 = amp >> 28
        a1 = (amp >> 14) & 0x3FFF
        a0 = amp & 0x3FFF
        x = (((v * a2) << 11)
             + (((v * a1) + ((v * a0) >> 14)) >> 3))

        # fused per-row panmix (panmix.c panmix_process12/11): the
        # vol/pan per-sample ramps, stereo position, 2*vol clamp and
        # the row's [OFF, END) validity window all evaluate here in
        # int32 lanes — C's exact semantics (the reference computes
        # in 32-bit ints with 64-bit products) — so the XLA side
        # never materializes a per-sample int64 row matrix.
        off = P[P_OFF][None, :]
        end = P[P_END][None, :]
        valid = (n >= off) & (n < end)
        if not fused_pm:
            # attribution variant (A2_COMPUTE_PROBE=nopanmix): raw
            # amped oscillator rows, masked, mono
            out_ref[0:FRAG] = jnp.where(valid, x, 0)
            if not mono:
                out_ref[FRAG:] = jnp.zeros((FRAG, RPB), jnp.int32)
            return
        mode = P[P_MODE][None, :]
        haspm = (mode & ROW_HASPM) != 0
        vol = P[P_VOL0][None, :] + n * P[P_DVOL][None, :]
        if mono:
            # mono program (no row carries ROW_STEREO): the panmix
            # collapses to the vol ramp alone (panmix.c
            # panmix_process11) — channel 1 is identically zero, so
            # the kernel emits only channel 0 and the whole
            # downstream accumulation runs at half the lane traffic
            mch0 = _mul_shr24(x, vol)
            out_ref[0:FRAG] = jnp.where(
                valid, jnp.where(haspm, mch0, x), 0)
            return
        pan = P[P_PAN0][None, :] + n * P[P_DPAN][None, :]
        vp = _mul_shr24(pan, vol)
        v0 = vol - vp
        v1 = vol + vp
        lim = vol << 1
        clampf = (mode & ROW_CLAMP) != 0
        v0 = jnp.where(clampf, jnp.minimum(v0, lim), v0)
        v1 = jnp.where(clampf, jnp.minimum(v1, lim), v1)
        stereo = (mode & ROW_STEREO) != 0
        mch0 = _mul_shr24(x, vol)
        lch = _mul_shr24(x, v0)
        rch = _mul_shr24(x, v1)
        ch0 = jnp.where(haspm, jnp.where(stereo, lch, mch0), x)
        ch1 = jnp.where(haspm & stereo, rch, 0)
        out_ref[0:FRAG] = jnp.where(valid, ch0, 0)
        out_ref[FRAG:] = jnp.where(valid, ch1, 0)
    return kern


def _osc_call(npass, tbase, params, atlas_pairs, interpret=False,
              quality=0, fused_pm=True, mono=False):
    """One pass-class pallas call: params (NPARAM, NB*RPB) int32
    (16 flat param vectors — a pure slice/concat on the XLA side,
    where the old (NB*NPARAM, RPB) interleave cost a real on-device
    relayout), tbase (NB,) int32 -> (C*FRAG, NB*RPB) int32 pan-mixed
    audio (sublanes 0..63 = channel 0, 64..127 = channel 1; mono
    programs emit C = 1 channel and halve every downstream byte).

    interpret=True runs the kernel in the Pallas interpreter — used by
    the default (CPU) test suite so the device code path is exercised
    on every pytest run.  quality selects the interpolator
    (0 hifi / 1 normal / 2 lofi, reference wtosc.c:27-46); lofi costs
    one pair lookup per sample instead of hifi's three (hermite2's
    shared-window scheme), lifting the gather-bound kernel ceiling
    ~3x."""
    NB = params.shape[1] // RPB
    C = 1 if mono else 2
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[pl.BlockSpec((NPARAM, RPB), lambda b, tb: (0, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C * FRAG, RPB), lambda b, tb: (0, b),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        _make_kernel(npass, interpret, quality, fused_pm, mono),
        grid_spec=gs, interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((C * FRAG, NB * RPB),
                                       jnp.int32))
    # x64 mode makes Pallas' grid/index machinery trace as i64, which
    # Mosaic cannot legalize; the kernel itself is pure int32, so
    # trace it with x64 off (the global flag is set by tpu/kernels.py
    # for the XLA int64 row path).
    from jax._src.config import enable_x64
    with enable_x64(False):
        return f(tbase, params, atlas_pairs)


class PairAtlas:
    """Wave atlas packed as int32 (d[k+1]<<16 | u16(d[k])) pairs,
    reshaped to (rows, 128) for the kernel's split-index lookup.

    Each (wave, mip) level's padded data (A2_WAVEPRE + size + post)
    is placed at a 128-aligned offset so a block's table base is a
    whole row; lookup() returns (tbase_row, npass, pos_offset) where
    pos_offset is added to the oscillator's sample position (d[0]
    relative) to form the kernel's pair index."""

    def __init__(self):
        import threading
        self._rows = []          # list of (128,) int32 rows
        self._index = {}         # (wave_key, mip) -> (tbase, npass, off)
        self.data = None         # jnp (T, 128) after finalize
        self.np_pairs = None     # numpy flat pairs (for the twin)
        self.version = 0
        # fleet-shared atlases (serve.render_multiplexed) are mutated
        # from worker record threads when a stream's first superblock
        # meets an unseen wave; add_wave's tbase=len(_rows) read and
        # the extend are a check-then-act that must not interleave.
        # Reentrant so callers can hold it across their own
        # check-then-act (device_render.atlas_entry).
        self.lock = threading.RLock()

    def add_wave(self, key, wave):
        with self.lock:
            for mm in range(wave.miplevels):
                d = np.asarray(wave.data[mm], dtype=np.int32)
                # pairs P[k] = (d16[k+1]<<16) | u16(d16[k]); one
                # extra 0 beyond the padded data is never read
                # (lookups stay within PRE+size+POST-1)
                lo = d & 0xFFFF
                hi = np.empty_like(d)
                hi[:-1] = d[1:]
                hi[-1] = 0
                pairs = (hi << 16) | lo
                npad = (-len(pairs)) % 128
                if npad:
                    pairs = np.concatenate(
                        [pairs, np.zeros(npad, np.int32)])
                tbase = len(self._rows)
                self._rows.extend(pairs.reshape(-1, 128))
                npass = len(pairs) // 128
                # oscillator positions are relative to data[0] =
                # index A2_WAVEPRE within the padded block
                self._index[(key, mm)] = (tbase, npass, A2_WAVEPRE)

    def finalize(self):
        with self.lock:
            if self._rows:
                arr = np.stack(self._rows)
            else:
                arr = np.zeros((1, 128), dtype=np.int32)
            self.np_pairs = arr.reshape(-1)
            self.data = arr
            self.version += 1
            return self.data

    def lookup(self, key, mip):
        with self.lock:
            return self._index[(key, mip)]


def pass_class(npass):
    for c in PASS_CLASSES:
        if npass <= c:
            return c
    raise ValueError("table too large for pass classes: %d" % npass)


class OscBatch:
    """Accumulates oscillator rows bucketed by (tbase, npass) and
    evaluates them in one device dispatch (one pallas call per pass
    class).  Returns audio in the original row order."""

    def __init__(self, atlas):
        self.atlas = atlas
        self.rows = []           # (tbase, npass, pos0, f0, dpos, df, amp0, damp)
        self.n = 0

    def add(self, tbase, npass, pos_off, ph0, dph, amp0, damp):
        """ph0/dph are 48:24 ints relative to d[0]; amp 8:24 int32."""
        pos0 = (ph0 >> 24) + pos_off
        f0 = ph0 & 0xFFFFFF
        dpos = dph >> 24
        df = dph & 0xFFFFFF
        self.rows.append((tbase, npass, pos0, f0, dpos, df,
                          _i32(amp0), _i32(damp)))
        self.n += 1
        return self.n - 1

    def build(self):
        """Groups rows into pass-class calls.  Returns a list of
        (npass_class, tbase_np, params_np, row_indices) plus the
        total row order mapping."""
        buckets = {}
        for i, r in enumerate(self.rows):
            key = (pass_class(r[1]), r[0])
            buckets.setdefault(key, []).append(i)
        calls = {cls: [] for cls in PASS_CLASSES}
        for (cls, tbase), idxs in sorted(buckets.items()):
            calls.setdefault(cls, []).append((tbase, idxs))
        out = []
        for cls, groups in calls.items():
            # pack each bucket into 128-row blocks (pad within bucket)
            blocks = []          # (tbase, [row indices padded w/ -1])
            for tbase, idxs in groups:
                for s in range(0, len(idxs), RPB):
                    blk = idxs[s:s + RPB]
                    blk = blk + [-1] * (RPB - len(blk))
                    blocks.append((tbase, blk))
            # pad the block count to a power of two (min 8) so jit
            # shapes stabilize across superblocks; every pass class is
            # always present for the same reason (dead blocks have
            # amp=0 and order=-1, so they cost a little compute and
            # no correctness)
            dead = [-1] * RPB
            target = 8
            while target < len(blocks):
                target <<= 1
            while len(blocks) < target:
                blocks.append((0, dead))
            NB = len(blocks)
            params = np.zeros((NB, NPARAM, RPB), np.int32)
            tbase_arr = np.zeros(NB, np.int32)
            order = np.zeros((NB, RPB), np.int64)
            for b, (tbase, blk) in enumerate(blocks):
                tbase_arr[b] = tbase
                for l, ri in enumerate(blk):
                    order[b, l] = ri
                    if ri < 0:
                        continue
                    _, _, pos0, f0, dpos, df, amp0, damp = self.rows[ri]
                    params[b, :6, l] = (pos0, f0, dpos, df, amp0, damp)
                    # no panmix: mode 0 passes the amped sample
                    # through on channel 0, full validity window
                    params[b, P_END, l] = FRAG
            out.append((cls, tbase_arr,
                        params.transpose(1, 0, 2).reshape(NPARAM, -1),
                        order))
        return out


def _i32(x):
    return int(np.int64(x).astype(np.int32))


def evaluate_osc_batch(batch, device_atlas, interpret=False,
                       quality=0):
    """Evaluates an OscBatch on the TPU.  Returns int32[n, FRAG]
    oscillator audio in row order (numpy).  device_atlas: jnp array
    of batch.atlas.data."""
    if not batch.n:
        return np.zeros((0, FRAG), np.int32)
    calls = batch.build()
    outs = np.zeros((batch.n, FRAG), np.int32)
    for cls, tbase_arr, params, order in calls:
        res = _osc_call(cls, jnp.asarray(tbase_arr),
                        jnp.asarray(params), device_atlas,
                        interpret=interpret, quality=quality)
        # (2*FRAG, NB*RPB): channel-0 sublanes carry the raw amped
        # rows (OscBatch packs mode=0 = no panmix, END=FRAG)
        res = np.asarray(res)[:FRAG]
        flat = order.reshape(-1)
        keep = flat >= 0
        outs[flat[keep]] = res.T[keep]
    return outs


# ---------------------------------------------------------------
# numpy twin (for tests off-TPU); mirrors the kernel bit for bit
# ---------------------------------------------------------------

def osc_rows_numpy(atlas_pairs_flat, tbase, npass, pos0, f0, dpos, df,
                   amp0, damp, quality=0):
    """atlas_pairs_flat: int32[T*128]; all params int32 arrays[R]."""
    n = np.arange(FRAG, dtype=np.int64)[None, :]
    fr = f0[:, None].astype(np.int64) + n * df[:, None]
    pos = pos0[:, None] + n * dpos[:, None] + (fr >> 24)
    fr = fr & 0xFFFFFF
    ph16 = (pos << 8) | (fr >> 16)
    dph16 = (dpos << 8) | (df >> 16)
    base = (tbase[:, None].astype(np.int64)) * 128

    def lookup(j):
        return atlas_pairs_flat[base + j].astype(np.int64)

    def herm(ph):
        i = ph >> 8
        x = (ph & 0xFF) << 7
        pa = lookup(i - 1)
        pb = lookup(i + 1)
        dm1 = (pa.astype(np.int32) << 16) >> 16
        d0 = pa.astype(np.int32) >> 16
        d1 = (pb.astype(np.int32) << 16) >> 16
        d2 = pb.astype(np.int32) >> 16
        i32 = np.int32
        c = i32(d1 - dm1) >> 1
        a = (i32(3) * i32(d0 - d1) + d2 - dm1) >> 1
        b = i32(dm1 - d0) + c - a
        with np.errstate(over="ignore"):
            a = i32(a * i32(x)) >> 15
            a = i32(i32(a + b) * i32(x)) >> 15
            return i32(d0 + (i32(i32(a + c) * i32(x)) >> 15))

    def lrp(ph):
        i = ph >> 8
        x = (ph & 0xFF).astype(np.int64)
        pa = lookup(i)
        d0 = (pa.astype(np.int32) << 16) >> 16
        d1 = pa.astype(np.int32) >> 16
        return ((d0 * (256 - x) + d1 * x) >> 8).astype(np.int32)

    if quality == 0:
        v = herm(ph16).astype(np.int64) \
            + herm(ph16 + (dph16[:, None] >> 1)).astype(np.int64)
    elif quality == 1:
        v = lrp(ph16).astype(np.int64) \
            + lrp(ph16 + (dph16[:, None] >> 1)).astype(np.int64)
    else:
        v = lrp(ph16).astype(np.int64) << 1
    amp = amp0[:, None].astype(np.int64) + n * damp[:, None]
    return ((v * amp) >> 17).astype(np.int32)
