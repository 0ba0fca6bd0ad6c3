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


# ---------------------------------------------------------------
# stage_mode="float": production-tier filter stages (associative
# scans instead of per-sample serial recurrences — superblock.py
# _apply_filter_float).  Budget is BASELINE.md's -80 dB RMS, not
# bit-exactness; weakly damped resonator classes auto-fall back to
# the exact scan (_FLOAT_TIER_MINQ gate).
# ---------------------------------------------------------------

_FLOAT_SRC = """
FilterLead(P V=1)
{
        struct { wtosc; filter12; dcblock db; panmix }
        lp .5; bp .4; hp .2
        w saw; p P; a (V * .3); set a
        cutoff 3; q 1.5; set cutoff; set q
        db.cutoff 2n
        d 200
        10 {
                cutoff (rand 4 + 1); q (rand 2 + .3)
                set cutoff; set q
                d 180
        }
        a 0; d 400
}

export Song(P V=1)
{
        struct { inline 0 2; panmix PM 2 2; limiter L 2 > }
        L.release 64; L.threshold 4
        PM.vol .8
        1:FilterLead (P + 2); d 300
        1:FilterLead P; d 1800
        end
}
"""

# script q is RESONANCE (filter12 q write: internal damping
# = (65536<<8)//q16): q .1 -> internal Q ~ 0.039, far below
# _FLOAT_TIER_MINQ (0.15) -> the class must stay on the exact scan
_RESO_SRC = """
export Song(P V=1)
{
        struct { wtosc; filter12; panmix }
        lp 1; bp 1; hp .5
        q .1; set q; cutoff (P + 3); set cutoff
        w saw; a .8; set a; p P
        d 900; a 0; d 300
}
"""


def _rms_db(mine, ref):
    d = mine.astype(np.float64) - ref.astype(np.float64)
    r = np.sqrt((ref.astype(np.float64) ** 2).mean()) + 1e-30
    return 20 * np.log10(np.sqrt((d ** 2).mean()) / r + 1e-30)


def _float_vs_exact(src, secs, channels=2):
    from audiality2_tpu.engine.device_render import DeviceRenderer
    from audiality2_tpu.native import NativeRenderer
    frames = int(secs * 44100) // 64 * 64
    outs = {}
    for mode in ("exact", "float"):
        i = a2.open_engine(44100, 4096, channels, batched=False)
        p = i.get(i.load_string(src), "Song")
        r = DeviceRenderer(i, channels=channels, interpret=True,
                           stage_mode=mode)
        r.timestamp_reset()
        r.start(0, p)
        out = np.stack(r.render(frames, bufsize=frames))
        assert not r.fell_back
        r.close()
        outs[mode] = out
    return outs


def test_stage_mode_float_within_budget():
    # damped filter12 + dcblock + limiter content: the float tier
    # must land within the production budget vs the exact tier
    outs = _float_vs_exact(_FLOAT_SRC, 1.8)
    db = _rms_db(outs["float"], outs["exact"])
    assert db <= -80.0, f"float tier {db:.1f} dB"
    # and it is genuinely the float path, not silently exact
    assert (outs["float"] != outs["exact"]).any()


def test_stage_mode_float_resonant_class_stays_exact():
    # q=.01 is far below _FLOAT_TIER_MINQ: the damping gate must
    # keep this class on the exact serial scan, so float == exact
    # bit-for-bit
    outs = _float_vs_exact(_RESO_SRC, 1.0, channels=1)
    assert (outs["float"] == outs["exact"]).all()


def test_stage_mode_rejects_unknown():
    from audiality2_tpu.engine.device_render import DeviceRenderer
    i = a2.open_engine(44100, 4096, 1, batched=False)
    with pytest.raises(ValueError):
        DeviceRenderer(i, channels=1, interpret=True,
                       stage_mode="approx")
