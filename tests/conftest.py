import os
import sys
import warnings

# Virtual 8-device CPU mesh for sharding tests; set before jax import.
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

# Test tiers:
#   default            — fast, deterministic, CPU-only (<5 min)
#   A2_DEEP_TESTS=1    — adds the slow interpret-mode / long-golden
#                        tests (marker: slow)
#   A2_TPU_TESTS=1     — runs the device tests against the real TPU
#                        (marker: tpu) and leaves the platform alone
#
# The env var alone is NOT enough to force CPU here: the deployment's
# site hook registers the axon TPU backend and overrides
# JAX_PLATFORMS, so the default tier pins the platform through
# jax.config (must happen before any backend init).
TPU_TIER = os.environ.get("A2_TPU_TESTS") == "1"
DEEP_TIER = os.environ.get("A2_DEEP_TESTS") == "1"
if not TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

warnings.filterwarnings("ignore")

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    skip_slow = pytest.mark.skip(
        reason="deep tier: run with A2_DEEP_TESTS=1")
    skip_tpu = pytest.mark.skip(
        reason="TPU tier: run with A2_TPU_TESTS=1")
    for it in items:
        if "slow" in it.keywords and not DEEP_TIER:
            it.add_marker(skip_slow)
        if "tpu" in it.keywords and not TPU_TIER:
            it.add_marker(skip_tpu)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "goldens")
BENCH_DIR = "/root/reference/benchmark"
DATA_DIR = "/root/reference/test/data"


def render_song(path, program="Song", seconds=2.0, samplerate=44100,
                args=(), batched=False):
    """Render a song offline through the host engine; returns int32
    8:24 mono samples."""
    import audiality2_tpu as a2
    i = a2.open_engine(samplerate, 4096, 1, batched=batched)
    h = i.load(path)
    prog = i.get(h, program)
    out = []
    i.sink_callback(lambda bufs, frames: out.append(np.array(bufs[0])))
    i.timestamp_reset()
    i.starta(i.root_voice(), prog, [int(a * 65536) for a in args])
    n = 0
    total = int(seconds * samplerate)
    while n < total:
        i.run(4096)
        n += 4096
    return np.concatenate(out)


def load_golden(name, nframes=None):
    p = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(p):
        pytest.skip(f"golden {name} not present")
    d = np.fromfile(p, dtype=np.int32)
    return d if nframes is None else d[:nframes]
