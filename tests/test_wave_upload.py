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
