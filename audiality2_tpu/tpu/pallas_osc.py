"""Pallas TPU kernel: the voice-batched wavetable oscillator.

This is the hand-scheduled path for the engine's dominant op (wtosc
row evaluation, see tpu/row_kernel.py; reference hot loop:
src/units/wtosc.c:163-268).  Design:

  * The wave atlas lives in HBM as a 2-D (M, 128) int32 array; each
    oscillator row DMAs an aligned 16x128 window (2048 samples —
    Hermite pre-pad + 64 frames x <=2 samples/frame + alignment slack)
    into VMEM scratch, with all of a block's DMAs issued before the
    first wait so they overlap.
  * Sample gathers become MXU work: the block's 8 row windows stack
    into one (128, 128) matrix, and each Hermite tap gathers all
    8x64 samples with a single (512, 128) one-hot matmul — the
    TPU-native way to do a dynamic gather (no scatter, no serial
    loads, no tiny per-row ops).
  * 16-bit samples are split into hi/lo byte planes so the default
    bf16 MXU path stays exact (bf16 rounding of raw 16-bit samples
    would cost ~-62 dB).
  * Phase arithmetic is exact int32 (24:8 phase, 48:24 increment
    split into dph>>24 / dph&0xFFFFFF); the Hermite interpolation and
    amplitude ramp run in float32 — within ~-90 dB of the exact
    integer path (the engine's default row path stays integer-exact).

Measured on one v5e chip (R=16384 rows, staged device inputs):
~6 ms/call.  The XLA gather path (tpu/kernels.wtosc_fragments) is
substantially faster for this access pattern (XLA lowers jnp.take to
native TPU dynamic-gather, while the one-hot emulation pays
O(window) MXU work per sample), so the engine's row dispatcher
(tpu/row_kernel.py) keeps the XLA path as the default backend; this
kernel is the validated hand-scheduled alternative and the template
for ops XLA does NOT handle well (fused osc+filter+mix chains).

Mosaic alignment rules this encodes: HBM slices must be tile-aligned
(8 sublanes), so windows are fetched at 1024-sample granularity with
the residual offset folded into the gather index (pl.multiple_of
carries the divisibility proof); VMEM DMA destinations slice only the
untiled leading dim of a 3-D scratch buffer; index-map constants and
all kernel indices are explicit int32 (x64 tracing would promote bare
python ints to i64, which Mosaic rejects).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

FRAG = 64
WCOL = 128          # atlas columns (lanes)
WROWS = 16          # window rows: 2048 samples
ALIGN_ROWS = 8      # HBM slice offset/shape granularity (sublane tile)
ALIGN = ALIGN_ROWS * WCOL                 # 1024-sample start alignment
WINDOW = WROWS * WCOL                     # 2048-sample window
ROWBLK = 8          # oscillator rows per grid step
NARROW = 4          # window rows an osc row's frames can touch
_CSH = WCOL.bit_length() - 1              # log2(WCOL)
_B = ROWBLK * FRAG                        # samples per block
_WR = ROWBLK * WROWS                      # stacked window rows
_NR = ROWBLK * NARROW                     # stacked narrowed rows
_RSH = FRAG.bit_length() - 1              # log2(FRAG)
_WSH = WROWS.bit_length() - 1             # log2(WROWS)
_NSH = NARROW.bit_length() - 1            # log2(NARROW)


def _kernel(win_start_ref, frac0_ref, dph_ref, amp_ref, damp_ref,
            atlas_hbm, out_ref, win_vmem, sem):
    """One grid step: DMA ROWBLK windows, evaluate them as one batch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    blk = pl.program_id(0)
    nblk = pl.num_programs(0)

    def arow(row):
        # window start in atlas rows, aligned down to the tile;
        # pl.multiple_of() lets Mosaic prove the slice is tile-aligned
        return pl.multiple_of(
            (win_start_ref[row] >> jnp.int32(_CSH))
            & jnp.int32(~(ALIGN_ROWS - 1)), ALIGN_ROWS)

    def issue(b, slot):
        for r in range(ROWBLK):
            ri = jnp.int32(r)
            pltpu.make_async_copy(
                atlas_hbm.at[pl.ds(arow(b * ROWBLK + ri), WROWS)],
                win_vmem.at[slot, ri], sem.at[slot, ri]).start()

    def wait(b, slot):
        for r in range(ROWBLK):
            ri = jnp.int32(r)
            pltpu.make_async_copy(
                atlas_hbm.at[pl.ds(arow(b * ROWBLK + ri), WROWS)],
                win_vmem.at[slot, ri], sem.at[slot, ri]).wait()

    # double-buffered window fetch: prime both slots on step 0, then
    # prefetch step b+1 while computing step b
    slot = lax.rem(blk, jnp.int32(2))

    @pl.when(blk == 0)
    def _():
        issue(jnp.int32(0), jnp.int32(0))
        issue(jnp.int32(1), jnp.int32(1))

    @pl.when((blk > 0) & (blk + 1 < nblk))
    def _():
        issue(blk + 1, 1 - slot)

    wait(blk, slot)

    # stacked block window: (ROWBLK*WROWS, WCOL)
    wini = win_vmem[slot].reshape(_WR, WCOL)
    win_hi = (wini >> 8).astype(jnp.float32)
    win_lo = (wini & 255).astype(jnp.float32)

    # flat sample index i in [0, _B): row r_of, frame n_of
    i = lax.broadcasted_iota(jnp.int32, (_B, 1), 0)
    r_of = i >> _RSH
    n_of = i & (FRAG - 1)
    rsel = lax.broadcasted_iota(jnp.int32, (_B, _NR), 1)
    csel = lax.broadcasted_iota(jnp.int32, (_B, WCOL), 1)

    def bcast(ref, f=lambda v: v):
        """Broadcast 8 per-row scalars to (512, 1) via select chain
        (exact int32 — a one-hot matmul would round >2^24 values)."""
        acc = jnp.zeros((_B, 1), ref.dtype if ref.dtype != jnp.int32
                        else jnp.int32)
        for r in range(ROWBLK):
            v = f(ref[blk * ROWBLK + jnp.int32(r)])
            acc = jnp.where(r_of == jnp.int32(r), v, acc)
        return acc

    woff = bcast(win_start_ref, lambda v: v & jnp.int32(ALIGN - 1))
    frac0 = bcast(frac0_ref)
    dph = bcast(dph_ref)
    amp0 = bcast(amp_ref)
    damp = bcast(damp_ref)
    dph_i = dph >> 24
    dph_f = dph & 0xFFFFFF

    # Narrow each osc row's 16-row window to the NARROW rows its
    # frames actually touch (span <= 1 + 64*2 + 3 samples starting at
    # woff&127 + 1): rows [woff>>_CSH, +NARROW).  One stacked
    # selection matmul replaces 16-wide one-hot gathers with 4-wide —
    # a 4x cut in the MXU cost of every Hermite tap.
    nsel_r = lax.broadcasted_iota(jnp.int32, (_NR, 1), 0)
    nsel_c = lax.broadcasted_iota(jnp.int32, (_NR, _WR), 1)
    rbase = bcast(win_start_ref,
                  lambda v: (v & jnp.int32(ALIGN - 1)) >> _CSH)
    # per narrowed row j: source global row = (j>>_NSH)*WROWS +
    # rbase(owner) + (j & (NARROW-1))
    own = nsel_r >> _NSH
    acc = jnp.zeros((_NR, 1), jnp.int32)
    for r in range(ROWBLK):
        v = ((win_start_ref[blk * ROWBLK + jnp.int32(r)]
              & jnp.int32(ALIGN - 1)) >> _CSH)
        acc = jnp.where(own == jnp.int32(r), v, acc)
    src = (own << jnp.int32(_WSH)) + acc + (nsel_r & (NARROW - 1))
    nmat = (nsel_c == src).astype(jnp.float32)         # (_NR, _WR)
    nar_hi = nmat @ win_hi                             # (_NR, WCOL)
    nar_lo = nmat @ win_lo

    def gather(idx):
        """narrowed.flat[r_of*NARROW*WCOL + idx'] for idx:(B,1),
        where idx is window-relative and idx' subtracts the narrowed
        base row."""
        irg = (r_of << jnp.int32(_NSH)) \
            + (idx >> _CSH) - (rbase >> 0)             # narrowed row
        ic = idx & (WCOL - 1)
        oh = (rsel == irg).astype(jnp.float32)         # (B, _NR)
        sel = (oh @ nar_hi) * 256.0 + (oh @ nar_lo)    # (B, WCOL)
        return jnp.sum(
            sel * (csel == ic).astype(jnp.float32),
            axis=1, keepdims=True)

    def tap(P):
        """Hermite at 8:8 window position P (matches the exact path's
        ph>>16 truncation before the oversample offset)."""
        idx = P >> 8
        x = (P & 0xFF).astype(jnp.float32) / 256.0
        dm1 = gather(idx - 1)
        d0 = gather(idx)
        d1 = gather(idx + 1)
        d2 = gather(idx + 2)
        c = (d1 - dm1) * 0.5
        a = (3.0 * (d0 - d1) + d2 - dm1) * 0.5
        b = dm1 - d0 + c - a
        return ((a * x + b) * x + c) * x + d0

    ftot = frac0 + n_of * dph_f                        # < 2^31
    P = (((woff + 1 + n_of * dph_i) + (ftot >> 24)) << 8) \
        + ((ftot >> 16) & 0xFF)                        # 8:8 position
    v = tap(P) + tap(P + (dph >> 17))     # 2x oversampled (A2_HIFI)
    amp = amp0 + n_of.astype(jnp.float32) * damp
    # reference scale: (v_dbl * amp8_24) >> 17 with v doubled;
    # float path: v/2 * amp, normalized to 1.0 == full scale
    res = v * amp * (0.5 / 32768.0)            # (512, 1)
    out_ref[...] = res.reshape(ROWBLK, FRAG)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(atlas2d, win_start, frac0, dph, amp0, damp, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = win_start.shape[0]
    grid = (R // ROWBLK,)
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (ROWBLK, FRAG), lambda b, *_: (b, jnp.int32(0)),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, ROWBLK, WROWS, WCOL), jnp.int32),
                pltpu.SemaphoreType.DMA((2, ROWBLK)),
            ]),
        out_shape=jax.ShapeDtypeStruct((R, FRAG), jnp.float32),
        interpret=interpret,
    )(win_start, frac0, dph, amp0, damp, atlas2d)


def osc_rows_pallas(atlas, base, ph0, dph, amp0, damp,
                    interpret=None):
    """Evaluate oscillator rows with the Pallas kernel.

    atlas: int32[N]; base/ph0/dph int64 row arrays (as in
    tpu/kernels.wtosc_fragments); amp ramps in 8:24.
    Returns float32[R, 64] voice audio with 1.0 == full scale.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    base = np.asarray(base)
    ph0 = np.asarray(ph0)
    R0 = base.shape[0]
    R = ((R0 + ROWBLK - 1) // ROWBLK) * ROWBLK
    pad = R - R0

    def p(x, dt=np.int32):
        return np.concatenate([np.asarray(x, dtype=dt),
                               np.zeros(pad, dtype=dt)])

    win_start = p(base + (ph0 >> 24) - 1)
    frac0 = p(ph0 & 0xFFFFFF)
    dphp = p(dph)
    amp = p(np.asarray(amp0, np.float64) / (1 << 24), np.float32)
    dampp = p(np.asarray(damp, np.float64) / (1 << 24), np.float32)
    # atlas must extend one full window past the last aligned start
    n_atlas = ((len(atlas) + ALIGN - 1) // ALIGN) * ALIGN + WINDOW
    atlas_p = np.zeros(n_atlas, dtype=np.int32)
    atlas_p[:len(atlas)] = atlas
    atlas2d = atlas_p.reshape(-1, WCOL)
    out = _run(jnp.asarray(atlas2d), jnp.asarray(win_start),
               jnp.asarray(frac0), jnp.asarray(dphp),
               jnp.asarray(amp), jnp.asarray(dampp),
               interpret=interpret)
    return np.asarray(out)[:R0]
