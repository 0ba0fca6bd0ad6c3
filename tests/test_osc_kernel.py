"""Pallas oscillator kernel parity tests.

Validates the split-index device kernel (tpu/osc_kernel.py) against
the established row semantics (tpu/row_kernel.rows_numpy, itself
bit-exact with the C reference via the golden suite):

  * numpy twin vs rows_numpy on real builtin waves across mip levels
  * Pallas kernel (interpret mode on CPU, real Mosaic on TPU) vs twin

These run in the default suite — the device code path is exercised on
every pytest run (VERDICT.md round-1 item 7).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiality2_tpu.engine.state import open_engine
from audiality2_tpu.tpu import kernels as K
from audiality2_tpu.tpu import osc_kernel as OK
from audiality2_tpu.tpu.row_kernel import rows_numpy


@pytest.fixture(scope="module")
def waves():
    i = open_engine(48000, 1024, 1)
    out = {}
    for name in ("saw", "triangle", "sine", "square", "pulse10"):
        out[name] = i.get_wave(i.get(0, name))
    return out


def _make_rows(waves, n_per=64, seed=0):
    """Random rows over several (wave, mip) buckets; returns both
    atlas forms plus per-row arrays."""
    rng = np.random.default_rng(seed)
    atlas = K.WaveAtlas()
    patlas = OK.PairAtlas()
    for name, w in waves.items():
        atlas.add_wave(name, w)
        patlas.add_wave(name, w)
    atlas.finalize()
    patlas.finalize()

    rows = []
    for name, w in waves.items():
        for mm in (0, 1, 3, 5):
            size = w.size[mm]
            if not size:
                continue
            base, _ = atlas.lookup(name, mm)
            tbase, npass, off = patlas.lookup(name, mm)
            for _ in range(n_per):
                ph0 = int(rng.integers(0, size << 24))
                dph = int(rng.integers(1 << 18, 2 << 24))
                amp0 = int(rng.integers(-(1 << 27), 1 << 27))
                damp = int(rng.integers(-(1 << 20), 1 << 20))
                rows.append((name, mm, base, tbase, npass, off,
                             ph0, dph, amp0, damp))
    return atlas, patlas, rows


def test_twin_matches_rows_numpy(waves):
    atlas, patlas, rows = _make_rows(waves)
    R = len(rows)
    base = np.array([r[2] for r in rows], np.int64)
    ph0 = np.array([r[6] for r in rows], np.int64)
    dph = np.array([r[7] for r in rows], np.int64)
    amp0 = np.array([r[8] for r in rows], np.int64)
    damp = np.array([r[9] for r in rows], np.int64)
    z = np.zeros(R, np.int64)
    zb = np.zeros(R, bool)
    ref = rows_numpy(atlas.data, base, ph0, dph, amp0, damp,
                     zb, zb, zb, z, z, z, z)[:, 0, :]   # osc, no panmix

    tbase = np.array([r[3] for r in rows], np.int32)
    npass = np.array([r[4] for r in rows], np.int32)
    pos0 = ((ph0 >> 24) + np.array([r[5] for r in rows])).astype(np.int32)
    f0 = (ph0 & 0xFFFFFF).astype(np.int32)
    dpos = (dph >> 24).astype(np.int32)
    df = (dph & 0xFFFFFF).astype(np.int32)
    got = OK.osc_rows_numpy(patlas.np_pairs, tbase, npass, pos0, f0,
                            dpos, df, amp0.astype(np.int32),
                            damp.astype(np.int32))
    assert (got.astype(np.int64) == ref).all()


def test_pallas_matches_twin(waves):
    atlas, patlas, rows = _make_rows(waves, n_per=32, seed=1)
    batch = OK.OscBatch(patlas)
    for name, mm, base, tbase, npass, off, ph0, dph, amp0, damp in rows:
        batch.add(tbase, npass, off, ph0, dph, amp0, damp)
    interpret = jax.default_backend() != "tpu"
    dev_atlas = jnp.asarray(patlas.data)
    got = OK.evaluate_osc_batch(batch, dev_atlas, interpret=interpret)

    tbase = np.array([r[3] for r in rows], np.int32)
    npass = np.array([r[4] for r in rows], np.int32)
    ph0 = np.array([r[6] for r in rows], np.int64)
    dph = np.array([r[7] for r in rows], np.int64)
    pos0 = ((ph0 >> 24) + np.array([r[5] for r in rows])).astype(np.int32)
    f0 = (ph0 & 0xFFFFFF).astype(np.int32)
    dpos = (dph >> 24).astype(np.int32)
    df = (dph & 0xFFFFFF).astype(np.int32)
    amp0 = np.array([r[8] for r in rows], np.int32)
    damp = np.array([r[9] for r in rows], np.int32)
    want = OK.osc_rows_numpy(patlas.np_pairs, tbase, npass, pos0, f0,
                             dpos, df, amp0, damp)
    assert (got == want).all()


@pytest.mark.parametrize("quality", [1, 2])
def test_pallas_quality_matches_native(waves, quality):
    """lerp kernels (normal=2x lerp, lofi=single lerp doubled) vs a
    direct scalar port of the native interpolators
    (native/a2rt_units.inc lerp16, reference wtosc.c:37-46)."""
    atlas, patlas, rows = _make_rows(waves, n_per=16, seed=2)
    batch = OK.OscBatch(patlas)
    for name, mm, base, tbase, npass, off, ph0, dph, amp0, damp in rows:
        batch.add(tbase, npass, off, ph0, dph, amp0, damp)
    interpret = jax.default_backend() != "tpu"
    dev_atlas = jnp.asarray(patlas.data)
    got = OK.evaluate_osc_batch(batch, dev_atlas, interpret=interpret,
                                quality=quality)

    # scalar reference
    i16 = atlas.data.astype(np.int64)      # flat padded sample data

    def lerp16(base, ph):
        i = int(ph >> 8)
        x = int(ph & 0xFF)
        return (int(i16[base + i]) * (256 - x)
                + int(i16[base + i + 1]) * x) >> 8

    for ri, (name, mm, base, tbase, npass, off, ph0, dph, amp0,
             damp) in enumerate(rows):
        for n in (0, 1, 31, 63):
            ph = ph0 + n * dph
            ph16 = ph >> 16
            dph16 = dph >> 16
            if quality == 1:
                v = lerp16(base, ph16) \
                    + lerp16(base, ph16 + (dph16 >> 1))
            else:
                v = lerp16(base, ph16) << 1
            amp = np.int32(np.int64(amp0) + n * damp)
            want = np.int32((v * np.int64(amp)) >> 17)
            assert got[ri, n] == want, (ri, n, quality)
