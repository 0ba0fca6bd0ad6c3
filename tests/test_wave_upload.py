"""Wave upload conversion parity (waves.c:155-237 a2_do_write).

goldens/upconv_{in,out}.bin were produced by a probe linking the
reference library: random samples in each format uploaded through
a2_UploadWave, the converted int16 mip-0 data dumped back.  Every
format conversion must be byte-identical."""

import os

import numpy as np

import audiality2_tpu as a2
from audiality2_tpu.constants import SampleFormat, WaveType
from conftest import GOLDEN_DIR

N = 256


def test_upload_format_conversions():
    raw = open(os.path.join(GOLDEN_DIR, "upconv_in.bin"), "rb").read()
    i8 = np.frombuffer(raw[:N], dtype=np.int8)
    i16 = np.frombuffer(raw[N:3 * N], dtype=np.int16)
    i24 = np.frombuffer(raw[3 * N:7 * N], dtype=np.int32)
    i32 = np.frombuffer(raw[7 * N:11 * N], dtype=np.int32)
    f32 = np.frombuffer(raw[11 * N:15 * N], dtype=np.float32)
    exp = np.frombuffer(
        open(os.path.join(GOLDEN_DIR, "upconv_out.bin"), "rb").read(),
        dtype=np.int16).reshape(5, N)
    i = a2.open_engine(44100, 1024, 1)
    cases = [(SampleFormat.I8, i8), (SampleFormat.I16, i16),
             (SampleFormat.I24, i24), (SampleFormat.I32, i32),
             (SampleFormat.F32, f32)]
    for k, (fmt, data) in enumerate(cases):
        wh = i.upload_wave(WaveType.WAVE, 0, 0, fmt, data)
        mine = i.get_wave(wh).data[0][1:1 + N]
        assert np.array_equal(mine, exp[k]), fmt.name
        i.release(wh)


def test_upload_postprocess_and_normalize():
    """XFADE/REVMIX loop post-processing (waves.c:310-346) and
    A2_NORMALIZE gain (waves.c:241-306) vs reference probe dumps."""
    from audiality2_tpu.objects.waves import (A2_LOOPED, A2_NORMALIZE,
                                              A2_REVMIX, A2_XFADE)
    inp = np.frombuffer(
        open(os.path.join(GOLDEN_DIR, "upconv2_in.bin"), "rb").read(),
        dtype=np.int16)
    exp = np.frombuffer(
        open(os.path.join(GOLDEN_DIR, "upconv2_out.bin"), "rb").read(),
        dtype=np.int16).reshape(5, N)
    flagsets = [A2_XFADE, A2_REVMIX, A2_NORMALIZE,
                A2_NORMALIZE | A2_XFADE, A2_LOOPED | A2_XFADE]
    i = a2.open_engine(44100, 1024, 1)
    for k, fl in enumerate(flagsets):
        wh = i.upload_wave(WaveType.WAVE, 0, fl, SampleFormat.I16, inp)
        mine = i.get_wave(wh).data[0][1:1 + N]
        assert np.array_equal(mine, exp[k]), f"flagset {k}"
        i.release(wh)


def test_nomip_wave_device_rows():
    """Non-mipmapped uploaded waves (WaveType.WAVE) that fit the
    kernel's largest pass class ride device ROWS at mip 0 (native
    a2rt_record.inc wtosc_record case 2) — bit-exact with the native
    engine, with zero stash audio.  Both looped and one-shot; pitch
    kept below the unchecked-regime bound (dph*period <= 2^25 — the
    reference's per-sample-checked fast-pitch variant stays on the
    exact host path)."""
    from audiality2_tpu.constants import A2_LOOPED
    from audiality2_tpu.native import NativeRenderer
    from audiality2_tpu.engine.device_render import DeviceRenderer

    src = """
export Song(W V=1)
{
	struct { wtosc; panmix }
	w W; a (V * .5); @p -2
	d 500
	a 0; d 50
}
"""
    rng = np.random.default_rng(7)
    data = (rng.standard_normal(512) * 12000).astype(np.int16)
    N = 44100
    for flags in (A2_LOOPED, 0):
        outs = []
        for dev in (False, True):
            i = a2.open_engine(44100, 4096, 1, batched=False)
            wh = i.upload_wave(WaveType.WAVE, 512, flags,
                               SampleFormat.I16, data)
            song = i.get(i.load_string(src, "nomip"), "Song")
            if dev:
                r = DeviceRenderer(i, channels=1, interpret=True)
                r.timestamp_reset()
                r.start(0, song, wh << 16)
                # row-path proof: one recorded superblock has rows
                # and ZERO stash patches
                rows, stages, stash, nfrag = r.nr.record(16 * 64)
                assert len(rows) > 0 and len(stash) == 0, \
                    "nomip wave did not take the row path"
                r.close()
                i2 = a2.open_engine(44100, 4096, 1, batched=False)
                wh2 = i2.upload_wave(WaveType.WAVE, 512, flags,
                                     SampleFormat.I16, data)
                song2 = i2.get(i2.load_string(src, "nomip"), "Song")
                r = DeviceRenderer(i2, channels=1, interpret=True)
                r.timestamp_reset()
                r.start(0, song2, wh2 << 16)
                out = r.render(N, bufsize=31 * 64)
                assert not r.fell_back
                outs.append(out[0])
                r.close()
            else:
                r = NativeRenderer(i, channels=1)
                r.timestamp_reset()
                r.start(0, song, wh << 16)
                chunks = []
                n = 0
                while n < N:
                    chunks.append(r.run(4096)[0])
                    n += 4096
                r.close()
                outs.append(np.concatenate(chunks)[:N])
        assert np.array_equal(outs[0], outs[1]), \
            f"nomip flags={flags}: device != native"
        assert np.abs(outs[0]).max() > 0


def test_nomip_wave_row_stash_handoff():
    """A pitch ramp crossing the unchecked-regime bound (dph*period
    = 2^25) makes consecutive slices alternate between device rows
    and exact host stash within ONE voice — the handoff must stay
    sample-exact in both directions."""
    from audiality2_tpu.constants import A2_LOOPED
    from audiality2_tpu.native import NativeRenderer
    from audiality2_tpu.engine.device_render import DeviceRenderer

    src = """
export Song(W V=1)
{
	struct { wtosc; panmix }
	w W; a (V * .5); @p 0n
	p -2; d 250
	p 0n; d 250
	a 0; d 50
}
"""
    rng = np.random.default_rng(11)
    data = (rng.standard_normal(512) * 12000).astype(np.int16)
    N = 44100
    outs = []
    for dev in (False, True):
        i = a2.open_engine(44100, 4096, 1, batched=False)
        wh = i.upload_wave(WaveType.WAVE, 512, A2_LOOPED,
                           SampleFormat.I16, data)
        song = i.get(i.load_string(src, "nomip2"), "Song")
        if dev:
            r = DeviceRenderer(i, channels=1, interpret=True)
            r.timestamp_reset()
            r.start(0, song, wh << 16)
            out = r.render(N, bufsize=31 * 64)
            assert not r.fell_back
            outs.append(out[0])
            r.close()
        else:
            r = NativeRenderer(i, channels=1)
            r.timestamp_reset()
            r.start(0, song, wh << 16)
            chunks = []
            n = 0
            while n < N:
                chunks.append(r.run(4096)[0])
                n += 4096
            r.close()
            outs.append(np.concatenate(chunks)[:N])
    assert np.array_equal(outs[0], outs[1]), "handoff mismatch"
    assert np.abs(outs[0]).max() > 0
