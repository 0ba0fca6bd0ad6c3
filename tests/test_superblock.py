"""Device superblock mixer parity tests (tpu/superblock.py).

Renders whole songs twice through the batched engine — once with host
replay (golden-validated, bit-exact with the C reference) and once
with the full device mixer (rows + bus mixing + fbdelay + master on
the TPU; Pallas interpret mode off-TPU) — and requires bit-identical
master output.  Also verifies clean fallback to host replay for songs
using units the device program doesn't support yet.
"""

import numpy as np
import pytest

import audiality2_tpu as a2

BENCH = "/root/reference/benchmark"


def _render(script, secs=0.4, sr=44100, device=False):
    i = a2.open_engine(sr, 4096, 1, batched=True, device_mix=device)
    i.state.core.use_jax = False
    song = i.get(i.load(script), "Song")
    out = []
    i.state.core.sinks.append(lambda bufs, n: out.append(
        np.stack([b[:n].copy() for b in bufs])))
    i.timestamp_reset()
    i.starta(i.root_voice(), song, [])
    n = 0
    while n < int(secs * sr):
        i.run(4096)
        n += 4096
    return np.concatenate(out, axis=1)


@pytest.mark.parametrize("song", ["k2trance", "k2intro"])
def test_device_mix_bit_exact(song):
    script = f"{BENCH}/{song}.a2s"
    host = _render(script, device=False)
    dev = _render(script, device=True)
    assert host.shape == dev.shape
    assert (host == dev).all()


def test_device_mix_fallback_unsupported():
    # wstest uses the waveshaper unit (no device kernel yet): the
    # device-mix engine must fall back to host replay, bit-exactly
    script = f"{BENCH}/wstest.a2s"
    host = _render(script, secs=0.3, device=False)
    dev = _render(script, secs=0.3, device=True)
    assert (host == dev).all()
