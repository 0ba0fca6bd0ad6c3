"""Device stages for the effect chain units (round-3 additions).

filter12 / dcblock / waveshaper / limiter now run ON the device
(instance-batched per-sample scans / vectorized int64 shaping,
tpu/superblock.py _apply_filter and the "ws" stage) instead of as
host-rendered subtrees.  The corpus songs cover filter12/dcblock/
waveshaper (wstest, importtest2, k2intro...); the limiter has no
corpus script, so these synthetic songs exercise it in both widths.

Reference: src/units/limiter.c:84-131, waveshaper.c:67-105,
filter12.c:94-118, dcblock.c.
"""

import numpy as np

import audiality2_tpu as a2
from audiality2_tpu.native import NativeRenderer
from audiality2_tpu.engine.device_render import DeviceRenderer

_LIM_MONO = """
Song(V=1)
{
	struct { wtosc; limiter; panmix }
	release 24; threshold .2
	w saw; a (V * .9); p 0n
	d 400
	threshold .6
	a .1
	d 400
	a 0; d 100
}
export SongMain(V=1)
{
	struct { inline; panmix }
	1:Song V
	d 900
}
"""

_LIM_STEREO = """
Song(V=1)
{
	struct { wtosc; panmix 1 2; limiter 2 > }
	release 24; threshold .2
	w saw; a (V * .9); p 0n; pan .3
	d 800
	a 0; d 100
}
export SongMain(V=1)
{
	struct { inline 0 2; panmix 2 > }
	1:Song V
	d 900
}
"""


def _render(cls, src, nch, secs, **kw):
    i = a2.open_engine(44100, 4096, nch, batched=False)
    prog = i.get(i.load_string(src, "fx"), "SongMain")
    r = cls(i, **kw)
    r.timestamp_reset()
    r.start(0, prog)
    out = []
    n = 0
    while n < int(secs * 44100):
        out.append(np.asarray(r.run(5 * 4096)))
        n += 5 * 4096
    fb = getattr(r, "fell_back", None)
    r.close()
    return np.concatenate(out, axis=1), fb


def test_limiter_mono_device_exact():
    nat, _ = _render(NativeRenderer, _LIM_MONO, 1, 0.9, channels=1)
    dev, fb = _render(DeviceRenderer, _LIM_MONO, 1, 0.9, channels=1,
                      interpret=True)
    assert not fb
    assert np.abs(nat).max() > 0
    assert (nat == dev).all()


def test_limiter_stereo_device_exact():
    nat, _ = _render(NativeRenderer, _LIM_STEREO, 2, 0.9, channels=2)
    dev, fb = _render(DeviceRenderer, _LIM_STEREO, 2, 0.9,
                      channels=2, interpret=True)
    assert not fb
    assert np.abs(nat).max() > 0
    assert (nat == dev).all()


def test_dispatch_fault_bridges_natively():
    """A relay fault mid-pipeline (dispatch raising) must drop the
    in-flight superblocks and restart at the emitted frontier on the
    native path, sample-exactly (the serving resilience contract)."""
    import audiality2_tpu as a2
    from audiality2_tpu.engine.device_render import DeviceRenderer

    gold = np.fromfile("/root/repo/goldens/k2loader-5s-44100.raw",
                       np.int32)
    N = int(2.0 * 44100)
    i = a2.open_engine(44100, 4096, 1, batched=False)
    prog = i.get(i.load("/root/reference/benchmark/k2loader.a2s"),
                 "Song")
    r = DeviceRenderer(i, channels=1, interpret=True)
    r.timestamp_reset()
    r.start(0, prog)
    calls = [0]
    orig = r.mixer.dispatch

    def flaky(p):
        calls[0] += 1
        if calls[0] == 3:
            raise RuntimeError("injected relay fault")
        return orig(p)

    r.mixer.dispatch = flaky
    out = r.render(N, bufsize=16 * 64)
    r.close()
    m = N - N % 4096
    assert r.fell_back
    assert (out[0][:m] == gold[:m]).all()
