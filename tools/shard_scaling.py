"""Virtual-mesh scaling shape for the sharded single render.

Runs `parallel.render_sharded` (the production multi-superblock,
state-carrying sharded path) at 1/2/4/8 shards on the virtual
8-device CPU mesh and reports wall-clock per steady superblock.

This is NOT a performance claim — all virtual devices share this
host's one CPU core, so wall-clock cannot drop with shard count.
What the shape demonstrates is the absence of a serial cliff: total
work must stay ~flat as shards are added (the expansion splits
cleanly across shards; only the replicated stage tail and the psum
are added work).  On real multi-chip ICI hardware the same program's
per-chip time is the per-shard expansion (1/n of it) plus that same
small replicated tail.

Usage: python tools/shard_scaling.py [song] [seconds]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def main(song="k2trance", seconds=1.0, samplerate=44100):
    import audiality2_tpu as a2
    from audiality2_tpu.parallel import render_sharded

    frames = (int(seconds * samplerate) // 64) * 64
    bufsize = 31 * 64
    rows = []
    base = None
    for ndev in (1, 2, 4, 8):
        i = a2.open_engine(samplerate, 4096, 1, batched=False)
        prog = i.get(i.load(
            f"/root/reference/benchmark/{song}.a2s"), "Song")
        # warm: includes the jit compile for this shard count; the
        # shared cache carries compiled shard fns + padding
        # high-water marks into the steady render (per-render device
        # STATE does not persist), so steady measures execution, not
        # retracing
        csh = {}
        t0 = time.perf_counter()
        out = render_sharded(i, prog, frames, n_devices=ndev,
                             bufsize=bufsize, cache=csh)
        twarm = time.perf_counter() - t0
        i2 = a2.open_engine(samplerate, 4096, 1, batched=False)
        prog2 = i2.get(i2.load(
            f"/root/reference/benchmark/{song}.a2s"), "Song")
        t0 = time.perf_counter()
        out2 = render_sharded(i2, prog2, frames, n_devices=ndev,
                              bufsize=bufsize, cache=csh)
        tsteady = time.perf_counter() - t0
        nsb = (frames + bufsize - 1) // bufsize
        per = tsteady / nsb
        if base is None:
            base = per
        rows.append((ndev, twarm, tsteady, per, per / base))
        print(f"shards={ndev}  warm={twarm:6.1f}s  "
              f"steady={tsteady:6.1f}s  per-sb={per * 1e3:7.1f} ms  "
              f"vs-1-shard={per / base:5.2f}x", flush=True)
        assert (out == out2).all()
    print("\n| shards | steady per-superblock | vs 1 shard |")
    print("|---|---|---|")
    for ndev, _, _, per, rel in rows:
        print(f"| {ndev} | {per * 1e3:.0f} ms | {rel:.2f}x |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "k2trance",
         float(sys.argv[2]) if len(sys.argv) > 2 else 1.0)
