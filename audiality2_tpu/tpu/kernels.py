"""TPU voice-batched DSP kernels (JAX/XLA).

The core TPU win (SURVEY.md §2.6): instead of the reference's
sequential per-voice C loops, ALL live voices are processed per audio
fragment in one device dispatch, as SoA arrays:

    voices x 64-frame fragments -> gather + Hermite + ramp multiply
    -> per-bus segmented sum

The control plane (VM, event scheduling, rampers, pitch->increment)
stays on the host and is bit-exact with the reference; the device
receives per-(voice, fragment) control rows:

    base   : wave-atlas offset of the selected mip level's data[0]
    ph0    : 48:24 phase at fragment start (mip-shifted, pre-wrapped)
    dph    : 48:24 per-frame phase increment
    amp0   : 8:24 amplitude at fragment start
    damp   : 8:24 per-frame amplitude delta
    vol/pan: panmix gains (8:24 start + per-frame delta)
    bus    : output bus id for the segmented mix-down

All oscillator arithmetic is integer (int64 on device, emulated as
int32 pairs by XLA) and matches the host engine's int64 numpy exactly;
the host engine in turn is bit-exact with the C reference (see
tests/test_golden.py).  Audio leaves the device as int32 8:24.

Reference behavior contracts: wtosc.c:200-236 (fragment loop),
a2_dsp.h:64-74 (Hermite), wtosc.c:29-33 (2x oversampled HIFI
interpolation), panmix.c:49-135.
"""

import os

import numpy as np

import jax
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax import lax

from ..constants import A2_MAXFRAG, A2_MIPLEVELS, A2_WAVEPRE

FRAG = A2_MAXFRAG


# =========================================================
#   Wave atlas
# =========================================================

class WaveAtlas:
    """All mip levels of all waves packed into one int32 array.

    Entry (wave, mip) gives the atlas offset of d[0] (i.e. after the
    A2_WAVEPRE pad) and the level's size.  `data` is host numpy; the
    row kernel keeps a per-version device copy (uploaded once, not per
    dispatch)."""

    def __init__(self):
        self._chunks = []
        self._offsets = {}      # (wave_key, mip) -> (base, size)
        self._pos = 0
        self.data = None
        self.version = 0

    def add_wave(self, key, wave):
        for mm in range(wave.miplevels):
            d = wave.data[mm]
            self._chunks.append(d.astype(np.int32))
            self._offsets[(key, mm)] = (self._pos + A2_WAVEPRE,
                                        wave.size[mm])
            self._pos += len(d)

    def finalize(self):
        if self._chunks:
            self.data = np.concatenate(self._chunks)
        else:
            self.data = np.zeros(1, dtype=np.int32)
        self.version += 1
        return self.data

    def lookup(self, key, mip):
        return self._offsets[(key, mip)]


# =========================================================
#   Batched oscillator kernel
# =========================================================

def _hermite(atlas, pos, x):
    """a2_Hermite on atlas[pos-1..pos+2] with 8-bit frac x<<7.
    All int64; matches the host engine's integer math exactly."""
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


def wtosc_fragments(atlas, base, ph0, dph, amp0, damp):
    """Render one 64-frame fragment for V voices.

    atlas: int32[N] packed wave data
    base:  int64[V] atlas offset of d[0] for the selected mip
    ph0:   int64[V] 48:24 start phase (relative to wave start)
    dph:   int64[V] 48:24 per-frame increment
    amp0:  int64[V] 8:24 amplitude at frame 0
    damp:  int64[V] per-frame amplitude delta

    Returns int64[V, 64] voice audio (8:24).
    """
    n = jnp.arange(FRAG, dtype=jnp.int64)
    ph = ph0[:, None] + n[None, :] * dph[:, None]       # (V, 64) 48:24
    ph16 = ph >> 16
    dph16 = (dph >> 16)[:, None]
    # 2x oversampled Hermite (A2_HIFI)
    p1 = base[:, None] + (ph16 >> 8)
    v1 = _hermite(atlas, p1, ph16 & 0xFF)
    ph2 = ph16 + (dph16 >> 1)
    p2 = base[:, None] + (ph2 >> 8)
    v2 = _hermite(atlas, p2, ph2 & 0xFF)
    v = v1 + v2
    amp = amp0[:, None] + n[None, :] * damp[:, None]    # (V, 64) 8:24
    return (v * amp) >> 17


def panmix_mono(voice_out, vol0, dvol):
    """panmix 1->1: out = in * vol >> 24 (panmix.c:49-65)."""
    n = jnp.arange(FRAG, dtype=jnp.int64)
    vol = vol0[:, None] + n[None, :] * dvol[:, None]
    return (voice_out * vol) >> 24


def panmix_stereo(voice_out, vol0, dvol, pan0, dpan):
    """panmix 1->2 with clamped over-pan (panmix.c:78-135)."""
    n = jnp.arange(FRAG, dtype=jnp.int64)
    vol = vol0[:, None] + n[None, :] * dvol[:, None]
    pan = pan0[:, None] + n[None, :] * dpan[:, None]
    vp = (pan * vol) >> 24
    v0 = vol - vp
    v1 = vol + vp
    lim = vol << 1
    clamp = ((pan0 > 0xFFFFFF) | (pan0 < -0xFFFFFF))[:, None]
    v0 = jnp.where(clamp, jnp.minimum(v0, lim), v0)
    v1 = jnp.where(clamp, jnp.minimum(v1, lim), v1)
    return ((voice_out * v0) >> 24, (voice_out * v1) >> 24)


def mix_to_buses(voice_out, bus, nbus):
    """Segmented sum of (V, 64) voice audio into (nbus, 64) buses."""
    return jax.ops.segment_sum(voice_out, bus, num_segments=nbus)


# (the round-1 "voice farm" multi-fragment scan that lived here was
# retired with farm.py — the production throughput path is the
# superblock mixer, tpu/superblock.py)
