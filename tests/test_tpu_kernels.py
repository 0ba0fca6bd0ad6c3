"""TPU kernel tests (run on CPU backend via conftest env): the batched
oscillator kernel must match the host engine's integer DSP exactly."""

import numpy as np
import pytest

import audiality2_tpu as a2
from audiality2_tpu.constants import A2_WAVEPRE
from audiality2_tpu.fixmath import p2i


@pytest.fixture(scope="module")
def engine():
    return a2.open_engine(44100, 1024, 1)


def test_wtosc_kernel_matches_host(engine):
    from audiality2_tpu.tpu import kernels as K
    i = engine
    atlas = K.WaveAtlas()
    w = i.get_wave(i.get(0, "sine"))
    atlas.add_wave("sine", w)
    data = atlas.finalize()

    # Host reference: one fragment of the mip-path inner loop
    from audiality2_tpu.units.host_units import _inter_vec
    mm = 0
    d32 = w.data[mm].astype(np.int64)
    dph = p2i(-484777) * w.period       # middle C at 44.1 kHz
    ph0 = 12345
    amp0 = 1 << 24
    damp = -1000
    n = np.arange(64, dtype=np.int64)
    phs = ph0 + n * dph
    av = amp0 + n * damp
    host = (_inter_vec(d32, phs >> 16, dph >> 16) * av) >> 17

    base, size = atlas.lookup("sine", mm)
    import jax.numpy as jnp
    dev = K.wtosc_fragments(
        data,
        jnp.array([base], dtype=jnp.int64),
        jnp.array([ph0], dtype=jnp.int64),
        jnp.array([dph], dtype=jnp.int64),
        jnp.array([amp0], dtype=jnp.int64),
        jnp.array([damp], dtype=jnp.int64))
    assert np.array_equal(np.asarray(dev[0]), host)


def test_panmix_kernel_matches_host(engine):
    from audiality2_tpu.tpu import kernels as K
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    vin = rng.integers(-(1 << 23), 1 << 23, size=(3, 64), dtype=np.int64)
    vol0 = np.array([1 << 24, 1 << 23, 3 << 22], dtype=np.int64)
    dvol = np.array([0, 100, -100], dtype=np.int64)
    pan0 = np.array([0, -(1 << 23), 1 << 23], dtype=np.int64)
    dpan = np.array([0, 0, 50], dtype=np.int64)
    l, r = K.panmix_stereo(jnp.asarray(vin), jnp.asarray(vol0),
                           jnp.asarray(dvol), jnp.asarray(pan0),
                           jnp.asarray(dpan))
    # host formula (panmix.c:89-114, no clamp case)
    n = np.arange(64, dtype=np.int64)
    vol = vol0[:, None] + n * dvol[:, None]
    pan = pan0[:, None] + n * dpan[:, None]
    vp = (pan * vol) >> 24
    assert np.array_equal(np.asarray(l), (vin * (vol - vp)) >> 24)
    assert np.array_equal(np.asarray(r), (vin * (vol + vp)) >> 24)




def test_mix_to_buses():
    from audiality2_tpu.tpu import kernels as K
    import jax.numpy as jnp
    vo = jnp.ones((4, 64), dtype=jnp.int64)
    bus = jnp.array([0, 1, 0, 1])
    mixed = K.mix_to_buses(vo, bus, 2)
    assert mixed.shape == (2, 64)
    assert int(mixed[0, 0]) == 2
