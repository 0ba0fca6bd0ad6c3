"""The docs/examples corpus: every example must compile and render
non-silent audio through the production native runtime — the
examples are user-facing documentation (docs/voicemanagement.md), so
CI keeps them honest.

Pattern parity with the reference's worked examples
(/root/reference/docs/examples/voice-management-*.a2s)."""

import glob
import os

import numpy as np
import pytest

import audiality2_tpu as a2
from audiality2_tpu.native import NativeRenderer

EXAMPLES = sorted(glob.glob(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "examples", "*.a2s")))

SECS = 2


def _native(path, channels):
    i = a2.open_engine(44100, 4096, channels, batched=False)
    song = i.get(i.load(path), "Song")
    r = NativeRenderer(i, channels=channels)
    r.timestamp_reset()
    r.start(0, song)
    out = np.asarray(r.run(SECS * 44100))
    r.close()
    return out


@pytest.mark.parametrize("path", EXAMPLES,
                         ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_renders(path):
    out = _native(path, 2)
    peak = np.abs(out).max() / (1 << 24)
    assert 0.01 < peak <= 1.5, f"{path}: peak {peak}"


def test_examples_present():
    # the documented voice-management patterns must all exist
    names = {os.path.basename(p) for p in EXAMPLES}
    for want in ("voice-attached.a2s", "voice-detached.a2s",
                 "voice-anonymous.a2s", "voice-groups.a2s",
                 "voice-pool.a2s"):
        assert want in names, want
