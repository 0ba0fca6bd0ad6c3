"""Interpolation quality modes (reference wtosc.c:27-46).

The reference builds one of three wtosc interpolators: A2_HIFI
(2x-oversampled Hermite — the default build and the main golden
corpus), default "normal" (2x-oversampled linear), and A2_LOFI
(plain linear, doubled).  fm is unaffected (fm.c never includes
config.h, so its oversampling table is build-independent).

Goldens here were rendered from reference builds with config.h edited
accordingly (see tools/README.md)."""

import numpy as np
import pytest

import audiality2_tpu as a2
from audiality2_tpu.native import render_native

BENCH = "/root/reference/benchmark"
GOLD = "/root/repo/goldens"

CASES = [("k2trance", "k2trance-5s-44100-%s.raw", 2.0),
         ("fmtest3", "fmtest3-2s-44100-%s.raw", 2.0),
         ("pulsetronic", "pulsetronic-2s-44100-%s.raw", 2.0)]


def _host_render(script, secs, quality):
    i = a2.open_engine(44100, 4096, 1, batched=True, quality=quality)
    i.state.core.use_jax = False
    song = i.get(i.load(script), "Song")
    out = []
    i.sink_callback(lambda bufs, n: out.append(np.array(bufs[0])))
    i.timestamp_reset()
    i.starta(i.root_voice(), song, [])
    n = 0
    while n < int(secs * 44100):
        i.run(4096)
        n += 4096
    return np.concatenate(out)


@pytest.mark.parametrize("quality", ["normal", "lofi"])
@pytest.mark.parametrize("song,gold,secs", CASES,
                         ids=[c[0] for c in CASES])
def test_quality_native_golden(song, gold, secs, quality):
    i = a2.open_engine(44100, 4096, 1, batched=False, quality=quality)
    h = i.get(i.load(f"{BENCH}/{song}.a2s"), "Song")
    mine = render_native(i, h, seconds=secs)
    g = np.fromfile(f"{GOLD}/{gold % quality}", np.int32)
    m = min(len(g), len(mine))
    assert (mine[:m] == g[:m]).all()


@pytest.mark.parametrize("quality", ["normal", "lofi"])
def test_quality_host_golden(quality):
    mine = _host_render(f"{BENCH}/k2trance.a2s", 1.0, quality)
    g = np.fromfile(f"{GOLD}/k2trance-5s-44100-{quality}.raw",
                    np.int32)[:len(mine)]
    assert (mine == g).all()


@pytest.mark.parametrize("quality", ["normal", "lofi"])
def test_quality_device_golden(quality):
    # the device path's lerp kernels (tpu/osc_kernel.py _make_kernel
    # quality 1/2): deferred rows render with the engine's configured
    # interpolator, bit-exact vs the reference quality goldens
    from audiality2_tpu.engine.device_render import DeviceRenderer
    i = a2.open_engine(44100, 4096, 1, batched=False,
                       quality=quality)
    h = i.get(i.load(f"{BENCH}/k2trance.a2s"), "Song")
    r = DeviceRenderer(i, channels=1)
    r.timestamp_reset()
    r.start(0, h)
    out = []
    n = 0
    while n < int(2.0 * 44100):
        out.append(r.run(4096))
        n += 4096
    fb = r.fell_back
    r.close()
    mine = np.concatenate(out, axis=1)[0]
    g = np.fromfile(f"{GOLD}/k2trance-5s-44100-{quality}.raw",
                    np.int32)[:len(mine)]
    assert not fb
    assert (mine == g).all()


def test_quality_shared_mixer_mismatch_rejected():
    from audiality2_tpu.engine.device_render import DeviceRenderer
    from audiality2_tpu.serve import _SharedCore
    from audiality2_tpu.tpu.superblock import DeviceMixer
    core = _SharedCore()
    mixer = DeviceMixer(core, interpret=True, quality=0)
    i = a2.open_engine(44100, 4096, 1, batched=False, quality="lofi")
    with pytest.raises(ValueError):
        DeviceRenderer(i, channels=1, mixer=mixer)


def test_quality_modes_differ():
    outs = {}
    for q in ("hifi", "normal", "lofi"):
        i = a2.open_engine(44100, 4096, 1, batched=False, quality=q)
        h = i.get(i.load(f"{BENCH}/k2trance.a2s"), "Song")
        outs[q] = render_native(i, h, seconds=0.5)
    assert (outs["hifi"] != outs["normal"]).any()
    assert (outs["normal"] != outs["lofi"]).any()


def test_quality_rejects_unknown():
    with pytest.raises(ValueError):
        a2.open_engine(44100, 1024, 1, quality="ultra")
