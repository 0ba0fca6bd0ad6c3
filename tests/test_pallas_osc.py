"""Pallas oscillator kernel (tpu/pallas_osc.py) validation.

The real kernel needs a TPU backend (its manual-DMA interpret mode is
impractically slow on CPU), so CPU CI validates the kernel's exact
algorithm through a numpy emulation that mirrors the kernel's
arithmetic (window alignment, 8:8 phase truncation, hi/lo sample
split, float32 Hermite) against the integer-exact XLA path; the
device run is gated to a live TPU.  On-TPU measured accuracy matches
the emulation bit-for-bit in structure: rms ~-90 dB vs exact."""

import math

import numpy as np
import pytest

import audiality2_tpu as a2
from audiality2_tpu.fixmath import p2i

_CACHE = {}


def _exact(data, rows):
    """Pure-numpy mirror of tpu/kernels.wtosc_fragments (the
    integer-exact XLA path) — avoids slow eager jax in CI."""
    bases, ph0, dphs, amp0, damp = rows
    n = np.arange(64, dtype=np.int64)
    ph = ph0[:, None] + n[None, :] * dphs[:, None]
    ph16 = ph >> 16
    dph16 = (dphs >> 16)[:, None]

    def herm(pos, x):
        dm1 = data[pos - 1].astype(np.int64)
        d0 = data[pos].astype(np.int64)
        d1 = data[pos + 1].astype(np.int64)
        d2 = data[pos + 2].astype(np.int64)
        xx = x << 7
        c = (d1 - dm1) >> 1
        a = (3 * (d0 - d1) + d2 - dm1) >> 1
        b = dm1 - d0 + c - a
        a = (a * xx) >> 15
        a = ((a + b) * xx) >> 15
        return d0 + (((a + c) * xx) >> 15)

    p1 = bases[:, None] + (ph16 >> 8)
    v1 = herm(p1, ph16 & 0xFF)
    ph2 = ph16 + (dph16 >> 1)
    p2 = bases[:, None] + (ph2 >> 8)
    v2 = herm(p2, ph2 & 0xFF)
    out = ((v1 + v2) * (amp0[:, None] + n[None, :] * damp[:, None])) \
        >> 17
    return out / 8388608.0


def _mk_rows(R=64):
    if R in _CACHE:
        return _CACHE[R]
    from audiality2_tpu.tpu import kernels as K
    i = a2.open_engine(44100, 1024, 1)
    atlas = K.WaveAtlas()
    w = i.get_wave(i.get(0, "sine"))
    atlas.add_wave("sine", w)
    data = atlas.finalize()
    mm = 3
    base, size = atlas.lookup("sine", mm)
    dph = (p2i(-484777) * w.period) >> mm
    bases = np.full(R, base, dtype=np.int64)
    ph0 = (np.arange(R, dtype=np.int64) * 999331) % (size << 24)
    dphs = np.full(R, dph, dtype=np.int64)
    amp0 = np.full(R, 1 << 24, dtype=np.int64)
    damp = np.full(R, -2000, dtype=np.int64)
    rows = (bases, ph0, dphs, amp0, damp)
    ref = _exact(data, rows)
    _CACHE[R] = (data, rows, ref)
    return _CACHE[R]


def _emulate(data, rows):
    """Numpy mirror of the pallas kernel's arithmetic."""
    from audiality2_tpu.tpu.pallas_osc import ALIGN, WINDOW
    bases, ph0, dphs, amp0, damp = rows
    n_atlas = ((len(data) + ALIGN - 1) // ALIGN) * ALIGN + WINDOW
    ap = np.zeros(n_atlas, np.int32)
    ap[:len(data)] = data
    win_start = (bases + (ph0 >> 24) - 1).astype(np.int64)
    aligned = win_start & ~(ALIGN - 1)
    woff = win_start & (ALIGN - 1)
    frac0 = ph0 & 0xFFFFFF
    n = np.arange(64)
    out = np.zeros((len(bases), 64), np.float32)
    for r in range(len(bases)):
        win = ap[aligned[r]:aligned[r] + WINDOW].astype(np.float32)
        dph_i = dphs[r] >> 24
        dph_f = dphs[r] & 0xFFFFFF
        ftot = frac0[r] + n * dph_f
        P = (((woff[r] + 1 + n * dph_i) + (ftot >> 24)) << 8) \
            + ((ftot >> 16) & 0xFF)

        def tap(P):
            idx = P >> 8
            x = (P & 0xFF).astype(np.float32) / 256.0
            dm1, d0 = win[idx - 1], win[idx]
            d1, d2 = win[idx + 1], win[idx + 2]
            c = (d1 - dm1) * np.float32(0.5)
            a = (np.float32(3.0) * (d0 - d1) + d2 - dm1) \
                * np.float32(0.5)
            b = dm1 - d0 + c - a
            return ((a * x + b) * x + c) * x + d0

        v = tap(P) + tap(P + (dphs[r] >> 17))
        amp = np.float32(amp0[r] / (1 << 24)) \
            + n.astype(np.float32) * np.float32(damp[r] / (1 << 24))
        out[r] = v * amp * np.float32(0.5 / 32768.0)
    return out


def test_pallas_algorithm_matches_exact_path():
    data, rows, ref = _mk_rows(64)
    out = _emulate(data, rows)
    err = out - ref
    rms = math.sqrt(np.mean(err * err))
    assert 20 * math.log10(max(rms, 1e-12)) < -85.0
    assert np.abs(err).max() < 2e-4


def test_pallas_kernel_on_tpu():
    import os
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("needs a TPU backend (interpret mode too slow)")
    if not os.environ.get("A2_TPU_TESTS"):
        pytest.skip("set A2_TPU_TESTS=1 to run the on-device check "
                    "(~3 min: Mosaic compile + run)")
    from audiality2_tpu.tpu.pallas_osc import osc_rows_pallas
    data, rows, ref = _mk_rows(64)
    out = osc_rows_pallas(data, *rows, interpret=False)
    err = out - ref
    rms = math.sqrt(np.mean(err * err))
    assert 20 * math.log10(max(rms, 1e-12)) < -85.0
