"""Extended golden corpus: the reference test/data scripts.

Beyond the 9 benchmark songs (test_golden.py), these exercise env
curves/timing modes, control ramping, noise phase, microtonality,
imports, recursion and the pulse/triangle builtin waves.  Goldens are
10 s mono renders from tools/golden_dump.c linked against the
reference build.

These found three real parity bugs when introduced: pulse1's
uninitialized stale sample (waves.c:643-647 UB), and a signed
overflow in the native env LUT interpolation (reference env.c uses
uint32_t there).
"""

import os

import numpy as np
import pytest

import audiality2_tpu as a2
from conftest import GOLDEN_DIR

DATA_DIR = "/root/reference/test/data"

SPECS = [
    ("a2jingle", "Song"), ("a2siftest", "Song"), ("constexptest", "Song"),
    ("envtest", "Song"), ("envtest2", "Song"), ("envtest3", "Song"),
    ("envtest4", "Song"), ("evilnoises", "Song"), ("evtest", "Song"),
    ("fmtest", "Song"), ("fmtest2", "Song"), ("miditest", "Song"),
    ("importtest", "Song"), ("importtest2", "Song"),
    ("microtonal", "Song"), ("noisephase", "Song"), ("pitchenvtest", "Song"), ("ramptest", "Song"),
    ("ramptest2", "Song"), ("ramptestenv", "Song"), ("recursetest", "Song"),
    ("bassline", "Bassline"), ("chords", "Chords"), ("octaves", "Octaves"),
]


def _golden(name):
    return np.fromfile(
        os.path.join(GOLDEN_DIR, f"data-{name}-10s-44100.raw"),
        dtype=np.int32)


@pytest.mark.parametrize("name,prog", SPECS)
def test_corpus_native(name, prog):
    from audiality2_tpu.native import NativeRenderer
    gold = _golden(name)
    i = a2.open_engine(44100, 4096, 1, batched=False)
    song = i.get(i.load(os.path.join(DATA_DIR, f"{name}.a2s")), prog)
    r = NativeRenderer(i, channels=1)
    r.timestamp_reset()
    r.start(0, song)
    out = []
    n = 0
    while n < len(gold):
        out.append(r.run(4096)[0])
        n += 4096
    r.close()
    mine = np.concatenate(out)[:len(gold)]
    assert np.array_equal(mine, gold), \
        f"{name}: first diff at {int(np.argmax(mine != gold))}"


@pytest.mark.parametrize("batched", [False, True])
@pytest.mark.parametrize("name,prog", [
    ("envtest2", "Song"), ("ramptestenv", "Song"), ("importtest", "Song"),
    ("noisephase", "Song"),
])
def test_corpus_python(name, prog, batched):
    """Host-engine spot checks, interleaved + batched record/replay
    (first 3 s; full 10 s costs too much CI time)."""
    gold = _golden(name)[:3 * 44100]
    i = a2.open_engine(44100, 4096, 1, batched=batched,
                       use_jax=False)
    song = i.get(i.load(os.path.join(DATA_DIR, f"{name}.a2s")), prog)
    out = []
    i.sink_callback(lambda bufs, frames: out.append(np.array(bufs[0])))
    i.timestamp_reset()
    i.starta(i.root_voice(), song, [])
    n = 0
    while n < len(gold):
        i.run(4096)
        n += 4096
    mine = np.concatenate(out)[:len(gold)]
    assert np.array_equal(mine, gold), \
        f"{name}: first diff at {int(np.argmax(mine != gold))}"


@pytest.mark.parametrize("name", [
    "ragingfire",
    pytest.param("megastrings", marks=pytest.mark.slow),
    "rendertest"])
def test_renderwave_scripts_cross_engine(name):
    """Scripts whose wave{} definitions need a2_RenderWave — which the
    REFERENCE's offline configs refuse (NOTIMPLEMENTED), so no golden
    exists.  This engine implements compile-time wave rendering; the
    python and native engines must agree bit-exactly and produce
    audio."""
    from audiality2_tpu.native import NativeRenderer
    path = os.path.join(DATA_DIR, f"{name}.a2s")
    N = 2 * 44100
    i = a2.open_engine(44100, 4096, 1, batched=False)
    song = i.get(i.load(path), "Song")
    out = []
    i.sink_callback(lambda bufs, frames: out.append(np.array(bufs[0])))
    i.timestamp_reset()
    i.starta(i.root_voice(), song, [])
    n = 0
    while n < N:
        i.run(4096)
        n += 4096
    py = np.concatenate(out)[:N]

    i2 = a2.open_engine(44100, 4096, 1, batched=False)
    song2 = i2.get(i2.load(path), "Song")
    r = NativeRenderer(i2, channels=1)
    r.timestamp_reset()
    r.start(0, song2)
    out2 = []
    n = 0
    while n < N:
        out2.append(r.run(4096)[0])
        n += 4096
    r.close()
    nat = np.concatenate(out2)[:N]
    assert np.array_equal(py, nat)
    assert np.abs(py).max() > 0


# device-path coverage over the behavior-dense corpus: ramp-heavy
# scripts stress the run-break prediction (a2rt_record.inc
# rec_commit), env/pitch-env scripts the stash paths, importtest2 the
# host-subtree machinery (dcblock+filter12+waveshaper chains)
DEVICE_SPECS = [
    ("ramptest", "Song"), ("ramptest2", "Song"),
    ("ramptestenv", "Song"), ("pitchenvtest", "Song"),
    ("envtest3", "Song"), ("evilnoises", "Song"),
    ("importtest2", "Song"), ("microtonal", "Song"),
    # fm family: device operator-graph scans with per-op `last`
    # state (feedback fm was the last host-computed audio)
    ("fmtest", "Song"), ("fmtest2", "Song"), ("miditest", "Song"),
    # split-panmix chains (wtosc; panmix 1 2; fbdelay 2 >) across
    # multiple concurrent voices: exercises the drop-channel stage
    # pair, per-slice scratch re-claiming and the in-chain ordering
    ("a2jingle", "Song"),
]

# dc rows (STEP mode stays host stash; LINEAR emits device rows) —
# dctest lives in benchmark/, not test/data
BENCH_DIR_SPECS = [("dctest", "Song"), ("fmtest3", "Song"),
                   ("fmtest4", "Song")]


@pytest.mark.parametrize("name,prog", BENCH_DIR_SPECS)
def test_bench_corpus_device(name, prog):
    from audiality2_tpu.engine.device_render import DeviceRenderer
    gold = np.fromfile(os.path.join(GOLDEN_DIR,
                                    f"{name}-5s-44100.raw"),
                       dtype=np.int32)
    N = min(len(gold), 3 * 44100)
    i = a2.open_engine(44100, 4096, 1, batched=False)
    song = i.get(i.load(f"/root/reference/benchmark/{name}.a2s"),
                 prog)
    r = DeviceRenderer(i, channels=1, interpret=True)
    r.timestamp_reset()
    r.start(0, song)
    out = r.render(N, bufsize=31 * 64)
    fb = r.fell_back
    r.close()
    m = N - N % 4096
    assert (out[0][:m] == gold[:m]).all(), name
    assert not fb, f"{name} fell back"


@pytest.mark.parametrize("name,prog", DEVICE_SPECS)
def test_corpus_device(name, prog):
    from audiality2_tpu.engine.device_render import DeviceRenderer
    gold = _golden(name)
    N = min(len(gold), 3 * 44100)
    i = a2.open_engine(44100, 4096, 1, batched=False)
    song = i.get(i.load(os.path.join(DATA_DIR, f"{name}.a2s")), prog)
    r = DeviceRenderer(i, channels=1, interpret=True)
    r.timestamp_reset()
    r.start(0, song)
    out = r.render(N, bufsize=31 * 64)
    fb = r.fell_back
    r.close()
    m = N - N % 4096
    assert (out[0][:m] == gold[:m]).all(), name
    assert not fb, f"{name} fell back"
