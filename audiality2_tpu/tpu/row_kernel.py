"""Row kernel: the fused wtosc(+panmix) voice-slice kernel.

The block engine (engine/block_engine.py) lowers every deferred
oscillator slice to one control ROW; this module evaluates all rows of
a superblock in one batched dispatch:

    row -> 64 frames of  hermite-interpolated wavetable  ->  vol/pan

Two backends with identical integer semantics:
  * JAX (jit, runs on the TPU; int64 ops) — the production path
  * numpy — used when JAX/TPU is unavailable and by the parity tests

Both are exact mirrors of the host units' int64 math, which is
bit-exact with the C reference (tests/test_golden.py).

Row layout (int64 unless noted):
  base   atlas offset of d[0] for the chosen mip level
  ph0    48:24 phase at slice start (mip-shifted)
  dph    48:24 per-frame increment
  amp0   8:24 amplitude at slice start,  damp per-frame delta
  haspm  bool: fused panmix stage present
  stereo bool: panmix has 2 outputs
  clamp  bool: panmix over-pan clamping active (panmix.c:119-135)
  vol0/dvol, pan0/dpan : 8:24 panmix ramps

Output: int64[N, 2, 64] per-row audio (ch1 all-zero for mono rows).
"""

import numpy as np

FRAG = 64


def _hermite_np(atlas, pos, x):
    dm1 = atlas[pos - 1].astype(np.int64)
    d0 = atlas[pos].astype(np.int64)
    d1 = atlas[pos + 1].astype(np.int64)
    d2 = atlas[pos + 2].astype(np.int64)
    xx = x << 7
    c = (d1 - dm1) >> 1
    a = (3 * (d0 - d1) + d2 - dm1) >> 1
    b = dm1 - d0 + c - a
    a = (a * xx) >> 15
    a = ((a + b) * xx) >> 15
    return d0 + (((a + c) * xx) >> 15)


def rows_numpy(atlas, base, ph0, dph, amp0, damp, haspm, stereo, clamp,
               vol0, dvol, pan0, dpan):
    n = np.arange(FRAG, dtype=np.int64)
    ph = ph0[:, None] + n[None, :] * dph[:, None]
    ph16 = ph >> 16
    dph16 = (dph >> 16)[:, None]
    p1 = base[:, None] + (ph16 >> 8)
    v1 = _hermite_np(atlas, p1, ph16 & 0xFF)
    ph2 = ph16 + (dph16 >> 1)
    p2 = base[:, None] + (ph2 >> 8)
    v2 = _hermite_np(atlas, p2, ph2 & 0xFF)
    v = v1 + v2
    amp = amp0[:, None] + n[None, :] * damp[:, None]
    osc = (v * amp) >> 17

    vol = vol0[:, None] + n[None, :] * dvol[:, None]
    pan = pan0[:, None] + n[None, :] * dpan[:, None]
    vp = (pan * vol) >> 24
    v0 = vol - vp
    v1g = vol + vp
    lim = vol << 1
    cl = clamp[:, None]
    v0 = np.where(cl, np.minimum(v0, lim), v0)
    v1g = np.where(cl, np.minimum(v1g, lim), v1g)
    mono_pm = (osc * vol) >> 24
    l_pm = (osc * v0) >> 24
    r_pm = (osc * v1g) >> 24

    st = stereo[:, None]
    hp = haspm[:, None]
    ch0 = np.where(hp, np.where(st, l_pm, mono_pm), osc)
    ch1 = np.where(hp & st, r_pm, np.zeros_like(osc))
    return np.stack([ch0, ch1], axis=1)


_JAX_FN = None


def _build_jax():
    global _JAX_FN
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    def _hermite(atlas, pos, x):
        dm1 = jnp.take(atlas, pos - 1).astype(jnp.int64)
        d0 = jnp.take(atlas, pos).astype(jnp.int64)
        d1 = jnp.take(atlas, pos + 1).astype(jnp.int64)
        d2 = jnp.take(atlas, pos + 2).astype(jnp.int64)
        xx = x << 7
        c = (d1 - dm1) >> 1
        a = (3 * (d0 - d1) + d2 - dm1) >> 1
        b = dm1 - d0 + c - a
        a = (a * xx) >> 15
        a = ((a + b) * xx) >> 15
        return d0 + (((a + c) * xx) >> 15)

    def rows(atlas, base, ph0, dph, amp0, damp, haspm, stereo, clamp,
             vol0, dvol, pan0, dpan):
        n = jnp.arange(FRAG, dtype=jnp.int64)
        ph = ph0[:, None] + n[None, :] * dph[:, None]
        ph16 = ph >> 16
        dph16 = (dph >> 16)[:, None]
        p1 = base[:, None] + (ph16 >> 8)
        v1 = _hermite(atlas, p1, ph16 & 0xFF)
        ph2 = ph16 + (dph16 >> 1)
        p2 = base[:, None] + (ph2 >> 8)
        v2 = _hermite(atlas, p2, ph2 & 0xFF)
        v = v1 + v2
        amp = amp0[:, None] + n[None, :] * damp[:, None]
        osc = (v * amp) >> 17

        vol = vol0[:, None] + n[None, :] * dvol[:, None]
        pan = pan0[:, None] + n[None, :] * dpan[:, None]
        vp = (pan * vol) >> 24
        v0 = vol - vp
        v1g = vol + vp
        lim = vol << 1
        cl = clamp[:, None]
        v0 = jnp.where(cl, jnp.minimum(v0, lim), v0)
        v1g = jnp.where(cl, jnp.minimum(v1g, lim), v1g)
        mono_pm = (osc * vol) >> 24
        l_pm = (osc * v0) >> 24
        r_pm = (osc * v1g) >> 24

        st = stereo[:, None]
        hp = haspm[:, None]
        ch0 = jnp.where(hp, jnp.where(st, l_pm, mono_pm), osc)
        ch1 = jnp.where(hp & st, r_pm, jnp.zeros_like(osc))
        return jnp.stack([ch0, ch1], axis=1)

    _JAX_FN = jax.jit(rows)
    return _JAX_FN


_DEV_ATLAS = {}      # version -> device array


def rows_jax(atlas_obj, *args):
    """atlas_obj: WaveAtlas (numpy .data + .version).  The atlas is
    uploaded to the device once per version, not per dispatch."""
    import jax.numpy as jnp
    fn = _JAX_FN or _build_jax()
    dev = _DEV_ATLAS.get(atlas_obj.version)
    if dev is None:
        _DEV_ATLAS.clear()
        dev = jnp.asarray(atlas_obj.data)
        _DEV_ATLAS[atlas_obj.version] = dev
    return np.asarray(fn(dev, *args))


def _next_pow2(n):
    p = 64
    while p < n:
        p <<= 1
    return p


class RowBatch:
    """Accumulates rows during a superblock; evaluated in one call."""

    __slots__ = ("base", "ph0", "dph", "amp0", "damp", "haspm",
                 "stereo", "clamp", "vol0", "dvol", "pan0", "dpan",
                 "n", "wavemip")

    def __init__(self):
        self.base = []
        self.ph0 = []
        self.dph = []
        self.amp0 = []
        self.damp = []
        self.haspm = []
        self.stereo = []
        self.clamp = []
        self.vol0 = []
        self.dvol = []
        self.pan0 = []
        self.dpan = []
        self.wavemip = []        # (wave, mip) per row, for the pallas path
        self.n = 0

    def add_osc(self, base, ph0, dph, amp0, damp, wave=None, mip=0):
        self.wavemip.append((wave, mip))
        self.base.append(base)
        self.ph0.append(ph0)
        self.dph.append(dph)
        self.amp0.append(amp0)
        self.damp.append(damp)
        self.haspm.append(False)
        self.stereo.append(False)
        self.clamp.append(False)
        self.vol0.append(0)
        self.dvol.append(0)
        self.pan0.append(0)
        self.dpan.append(0)
        self.n += 1
        return self.n - 1

    def attach_panmix(self, row, vol0, dvol, pan0, dpan, stereo, clamp):
        self.haspm[row] = True
        self.stereo[row] = stereo
        self.clamp[row] = clamp
        self.vol0[row] = vol0
        self.dvol[row] = dvol
        self.pan0[row] = pan0
        self.dpan[row] = dpan

    # Below this row count, the host->device round trip costs more
    # than evaluating the batch in numpy; the device wins only for
    # large fan-outs (or once the full fragment loop lives on-device).
    JAX_MIN_ROWS = 8192

    def evaluate(self, atlas_obj, use_jax=True):
        """Returns int64[n, 2, 64] row audio.  atlas_obj is a
        WaveAtlas (numpy data + version for device caching)."""
        if not self.n:
            return np.zeros((0, 2, FRAG), dtype=np.int64)
        if use_jax and self.n < self.JAX_MIN_ROWS:
            use_jax = False
        # Pad to a power of two only for the device path (bucketed jit
        # shapes); numpy evaluates the exact row count.
        pad = _next_pow2(self.n) if use_jax else self.n

        def arr(x, dt=np.int64):
            a = np.zeros(pad, dtype=dt)
            a[:self.n] = x
            return a

        args = (arr(self.base), arr(self.ph0), arr(self.dph),
                arr(self.amp0), arr(self.damp),
                arr(self.haspm, bool), arr(self.stereo, bool),
                arr(self.clamp, bool),
                arr(self.vol0), arr(self.dvol), arr(self.pan0),
                arr(self.dpan))
        if use_jax:
            out = rows_jax(atlas_obj, *args)
        else:
            out = rows_numpy(atlas_obj.data, *args)
        return out[:self.n]
