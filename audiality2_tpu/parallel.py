"""Sharded single-render: one song's superblocks data-parallel over
a jax Mesh.

The voice-tree mix is an integer sum (reference core.c:364-395 bus
accumulation), so a render parallelizes the scaling-book way: shard
the oscillator RUNS across the mesh, expand each shard through the
production run expansion (ramp-requant replay included), psum the
bus-slot accumulators over ICI, and run the (cheap, serial-ordered)
bus-stage chain replicated.  Output is bit-exact with the solo
device path — integer adds commute, and everything after the psum is
replicated math.

This is the user-facing form of the topology validated by
__graft_entry__.dryrun_multichip (the driver's multichip gate):

    from audiality2_tpu.parallel import render_sharded
    out = render_sharded(interface, program, frames)   # all devices

On this deployment only one real TPU chip is visible, so the tests
exercise it on a virtual host-platform mesh; on real multi-chip
hardware the same code shards over ICI unchanged.

The post-psum bus-stage chain is inherently sequential, so it runs
on shard 0 ONLY (lax.cond on axis_index) and its results — master
audio, fbdelay rings, filter/limiter/fm states — are broadcast with
a second psum (the other shards contribute zeros; integer adds make
that an exact broadcast).  State-carrying items are thus still
REPLICATED between superblocks, but each superblock computes the
tail once instead of n_devices times (VERDICT r4 #7: the replicated
tail made 4-shard total work 1.27x solo).
"""

import numpy as np


def render_sharded(interface, program, frames, args=(),
                   n_devices=None, bufsize=None, channels=None,
                   interpret=None, cache=None):
    """Renders `frames` frames of `program` with oscillator runs
    sharded across a mesh of `n_devices` (default: all JAX devices).
    Returns [channels][frames] int32, bit-exact with the solo device
    path (and therefore with the C reference on golden content).

    cache: optional dict a caller can pass to reuse compiled shard
    functions and sticky padding high-water marks across calls (the
    per-render device STATE never persists — only shapes/compiles)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from .engine.device_render import DeviceRenderer
    from .tpu import superblock as SB
    from .tpu.superblock import program_from_native

    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError("render_sharded: need %d devices, have %d"
                         % (n_devices, len(devs)))
    mesh = Mesh(np.array(devs[:n_devices]), axis_names=("voices",))

    r = DeviceRenderer(interface, channels=channels,
                       interpret=interpret)
    r.timestamp_reset()
    r.start(0, program, *args)
    if bufsize is None:
        bufsize = min(frames, 1376 * 64)
    bufsize -= bufsize % 64 or 0
    # profile pass: ONE jit signature for the whole song
    r._profile(frames, bufsize)
    mixer = r.mixer

    if cache is None:
        cache = {}
    fns = cache.setdefault("fns", {})   # sig -> compiled sharded fn
    state = {}               # carried replicated device state
    hw = cache.setdefault("hw", {})     # sticky high-water pads

    def init_state(ob):
        K = ob["arr"].shape[1]
        if ob["kind"] == "lim":
            return jnp.full((K,), SB._LIM_PEAK0, jnp.int64)
        if ob["kind"] == "fm":
            return jnp.zeros((K, 4), jnp.int32)
        return jnp.zeros((K, 2, 2), jnp.int32)

    def shard_programs(rows, stages, stash, nfrag, prog):
        """Per-shard COMPACTED row programs: shard d owns record
        runs d, d+n, ... and lays out its OWN class blocks from just
        those runs, so each shard's kernel/expansion row space is
        ~1/n of the solo program's instead of the full padded Rtot
        (the r4 scaling table's growth past 2 shards was every shard
        expanding the full row space with only its runs alive).
        Slot numbering is pinned to the full program's instance map
        (program_from_native inst_map).  Returns unified
        (rows_sig, Rtot_u, ramppad_u, stacked tbase list,
        stacked runmat, stacked rampmat)."""
        z_st = stages[:0] if len(stages) else stages
        z_sh = stash[:0] if len(stash) else stash
        sprogs = []
        for d in range(n_devices):
            sp = program_from_native(
                rows[d::n_devices] if len(rows) else rows,
                z_st, z_sh, nfrag, prog.frag_sizes, r.atlas_entry,
                r.master_channels,
                inst_map=(prog.inst_of, prog.ninst))
            sprogs.append(sp)
        # unified per-class NB = pow2(max over shards), STICKY via a
        # render-scoped high-water dict (like DeviceMixer._repad's) —
        # without stickiness every small content drift flips a pow2
        # boundary somewhere and the jit retraces per superblock
        nb_u = {}
        for sp in sprogs:
            for c, NB, _ in sp.class_blocks:
                nb_u[c] = max(nb_u.get(c, 0), NB)
        for c in nb_u:
            if nb_u[c]:
                nb_u[c] = hw[("cls", c)] = max(
                    SB._pow2(nb_u[c], 1), hw.get(("cls", c), 0))
        rows_sig = tuple((c, nb_u.get(c, 0))
                         for c in SB.ALL_CLASSES)
        Rtot_u = sum(NB * SB.OK.RPB for _, NB in rows_sig)
        Nr_u = hw["runs"] = max(
            SB._pow2(max(max((sp.runmat.shape[0]
                              if sp.runmat is not None else 0)
                             for sp in sprogs), 1), 256),
            hw.get("runs", 0))
        ramppad_u = max((sp.rampmat.shape[0] if sp.rampmat
                         is not None else 0) for sp in sprogs)
        if any(sp.has_ramp for sp in sprogs) or prog.has_ramp \
                or hw.get("rampruns", 0):
            ramppad_u = hw["rampruns"] = max(
                SB._pow2(max(ramppad_u, 1), 128),
                hw.get("rampruns", 0))
        tb_sh = [np.zeros((n_devices, NB), np.int32)
                 for _, NB in rows_sig]
        rm_sh = np.zeros((n_devices, Nr_u, SB.BASE_N), np.int32)
        rm_sh[:, :, SB.RC_START] = Rtot_u
        rm_sh[:, :, SB.RC_RIDX] = -1
        rmp_sh = np.zeros((n_devices, max(ramppad_u, 1), SB.RR_N),
                          np.int32)
        for d, sp in enumerate(sprogs):
            # remap this shard's RC_START into the unified row space
            # (same searchsorted-shift scheme as DeviceMixer._repad)
            cb = {c: (NB, tb) for c, NB, tb in sp.class_blocks}
            old_ends = []
            shift = []
            ob = nb = 0
            for i, (c, NBu) in enumerate(rows_sig):
                NB, tb = cb.get(c, (0, None))
                shift.append(nb - ob)
                ob += NB * SB.OK.RPB
                old_ends.append(ob)
                nb += NBu * SB.OK.RPB
                if NB:
                    tb_sh[i][d, :NB] = tb
            shift.append(nb - ob)          # dead-run sentinel
            m = sp.runmat if sp.runmat is not None \
                else np.zeros((0, SB.BASE_N), np.int32)
            Nr = m.shape[0]
            if Nr:
                starts = m[:, SB.RC_START].astype(np.int64)
                ci = np.searchsorted(np.asarray(old_ends), starts,
                                     side="right")
                m = m.copy()
                m[:, SB.RC_START] = (
                    starts
                    + np.asarray(shift, np.int64)[ci]).astype(
                        np.int32)
                rm_sh[d, :Nr] = m
            NrR = sp.rampmat.shape[0] if sp.rampmat is not None \
                else 0
            if NrR:
                rmp_sh[d, :NrR] = sp.rampmat
        return (rows_sig, Rtot_u, ramppad_u, tb_sh, rm_sh, rmp_sh)

    def build(prog, items, rows_sig, Rtot, ramppad):
        """Compiles the sharded superblock fn for this signature.
        rows_sig/Rtot/ramppad describe the unified PER-SHARD row
        space (shard_programs), not the full program's."""
        ninst, F = prog.ninst, prog.F
        nslot = ninst * F + 1
        mch = prog.master_channels
        has_stash = prog.stash_audio is not None \
            and len(prog.stash_audio) > 0
        has_mono = getattr(prog, "stash_mono", None) is not None \
            and len(prog.stash_mono) > 0
        keys = [(tag, key, {"stereoin": ob.get("stereoin"),
                            "stereoout": ob.get("stereoout"),
                            "add": ob.get("add"),
                            "chunk": ob.get("chunk"),
                            "dense": bool(ob.get("dense"))
                            if tag == "fbd" else None,
                            "fbpar": tuple(ob.get(
                                "fbpar", (-1, -1, -1)))})
                for tag, key, ob, _ in items]

        def fn(atlas, tb, rm, rmp, sa, ss, sm, sms, st_in, fa_in,
               fr_in, fp_in, la_in, ls_in):
            slots = jnp.zeros((nslot, 2, SB.FRAG), jnp.int32)
            if Rtot:
                slots = SB._expand_rows(
                    slots, atlas, rows_sig, [t[0] for t in tb],
                    rm[0], rmp[0],
                    ninst * F, mixer.interpret, ramppad > 0,
                    mixer.quality)
            slots = jax.lax.psum(slots, axis_name="voices")

            def tail(slots):
                # the serial bus-stage chain — on shard 0 ONLY (it
                # is inherently sequential, so replicating it across
                # the mesh multiplied total work by n_devices; the
                # r4 virtual-mesh table showed 1.27x total work at 4
                # shards from exactly this replication,
                # VERDICT r4 #7)
                if has_stash:
                    slots = slots.at[ss].add(sa)
                if has_mono:
                    slots = slots.at[sms, 0].add(sm)
                si = fi = gi = 0
                new_rings = []
                new_filt = []
                for tag, key, ex in keys:
                    if tag == "stage":
                        la, da = st_in[si]
                        if da.shape[0]:
                            slots = SB._apply_stage_dense(
                                slots, key, da)
                        if la.shape[0]:
                            slots = SB._apply_stage(slots, key, la)
                        si += 1
                    elif tag == "fbd":
                        if ex["dense"]:
                            slots, ring = SB._apply_fbdelay_dense(
                                slots,
                                (ex["stereoin"], ex["stereoout"],
                                 ex["add"], ex["chunk"])
                                + tuple(ex["fbpar"]),
                                fa_in[fi], fr_in[fi], F)
                        else:
                            slots, ring = SB._apply_fbdelay(
                                slots,
                                (ex["stereoin"], ex["stereoout"],
                                 ex["add"], ex["chunk"]),
                                fa_in[fi], fr_in[fi], fp_in[fi])
                        new_rings.append(ring)
                        fi += 1
                    elif key[2] == "fm":
                        slots, stf = SB._apply_fm(
                            slots, (key[3], key[4], key[5][0]),
                            la_in[gi], ls_in[gi])
                        new_filt.append(stf)
                        gi += 1
                    else:
                        slots, stf = SB._apply_filter(
                            slots, key[2],
                            (key[3], key[4], key[5], key[6], key[7]),
                            la_in[gi], ls_in[gi])
                        new_filt.append(stf)
                        gi += 1
                master = slots[:F, :mch]
                return master, new_rings, new_filt

            def skip(slots):
                z = jax.eval_shape(tail, slots)
                return jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), z)

            res = jax.lax.cond(
                jax.lax.axis_index("voices") == 0, tail, skip, slots)
            # broadcast shard 0's results (the other shards
            # contributed zeros, and integer adds are exact, so this
            # psum IS the broadcast; the out_specs stay replicated)
            return jax.tree_util.tree_map(
                lambda x: jax.lax.psum(x, axis_name="voices"), res)

        nst = sum(1 for t, _, _ in keys if t == "stage")
        nfb = sum(1 for t, _, _ in keys if t == "fbd")
        nfl = sum(1 for t, _, _ in keys if t == "filt")
        return jax.jit(shard_map(
            fn, mesh=mesh,
            in_specs=(P(), [P("voices")] * len(rows_sig),
                      P("voices"), P("voices"), P(), P(),
                      P(), P(), (P(),) * nst, (P(),) * nfb,
                      (P(),) * nfb, P(), (P(),) * nfl,
                      (P(),) * nfl),
            out_specs=(P(), [P()] * nfb, [P()] * nfl),
            check_vma=False))

    out = []
    n = 0
    z32 = jnp.zeros((0,), jnp.int32)
    while n < frames:
        rows, stages, stash, nfrag = r.nr.record(bufsize)
        prog = program_from_native(rows, stages, stash, nfrag,
                                   [64] * (bufsize // 64),
                                   r.atlas_entry, r.master_channels)
        r._tag_prog(prog)
        mixer._repad(prog)
        items = []
        for st in prog.stages:
            items.append(("stage", st["key"], st, ""))
        for fd in prog.fbdelays:
            items.append(("fbd", fd["key"], fd,
                          str(fd["unit_id"])))
        for fl in prog.filters:
            items.append(("filt", fl["key"], fl, ""))
        items.sort(key=lambda t: (t[1], t[3]))
        (srows_sig, Rtot_u, ramppad_u, tb_sh, rm_sh,
         rmp_sh) = shard_programs(rows, stages, stash, nfrag, prog)
        sig = (mixer._signature(prog), srows_sig,
               rm_sh.shape[1], rmp_sh.shape[1])
        if sig not in fns:
            fns[sig] = build(prog, items, srows_sig, Rtot_u,
                             ramppad_u)
        for tag, key, ob, tie in items:
            if tag == "fbd" and ("fbd", key, tie) not in state:
                shp = (2, SB.FBD_TAIL) if ob.get("dense") \
                    else (2, SB._FBD_BUFSIZE)
                state[("fbd", key, tie)] = (jnp.zeros(shp,
                                                      jnp.int32), 0)
            elif tag == "filt" and ("filt", key) not in state:
                state[("filt", key)] = init_state(ob)
        sa = jnp.asarray(prog.stash_audio) \
            if prog.stash_audio is not None \
            and len(prog.stash_audio) else z32
        ss = jnp.asarray(prog.stash_slot) \
            if prog.stash_audio is not None \
            and len(prog.stash_audio) else z32
        sm = getattr(prog, "stash_mono", None)
        sms = jnp.asarray(prog.stash_mono_slot) \
            if sm is not None and len(sm) else z32
        sm = jnp.asarray(sm) if sm is not None and len(sm) else z32
        st_in = tuple((jnp.asarray(ob["arr"]),
                       jnp.asarray(ob["dense"]))
                      for t, _, ob, _ in items if t == "stage")
        fa_in = tuple(jnp.asarray(ob["arr"])
                      for t, _, ob, _ in items if t == "fbd")
        fr_in = tuple(state[("fbd", key, tie)][0]
                      for t, key, ob, tie in items if t == "fbd")
        fp_in = jnp.asarray(
            [state[("fbd", key, tie)][1] & (SB._FBD_BUFSIZE - 1)
             for t, key, ob, tie in items if t == "fbd"]
            or [0], dtype=jnp.int32)
        la_in = tuple(jnp.asarray(ob["arr"])
                      for t, _, ob, _ in items if t == "filt")
        ls_in = tuple(state[("filt", key)]
                      for t, key, ob, _ in items if t == "filt")
        master, rings, filts = fns[sig](
            mixer._atlas(), [jnp.asarray(t) for t in tb_sh],
            jnp.asarray(rm_sh), jnp.asarray(rmp_sh), sa, ss, sm,
            sms, st_in, fa_in, fr_in, fp_in, la_in, ls_in)
        ri = gi = 0
        for t, key, ob, tie in items:
            if t == "fbd":
                nf = 0 if ob.get("dense") \
                    else int(ob["arr"][:, 5].sum())
                pos = state[("fbd", key, tie)][1]
                state[("fbd", key, tie)] = (
                    rings[ri], (pos + nf) % SB._FBD_BUFSIZE)
                ri += 1
            elif t == "filt":
                state[("filt", key)] = filts[gi]
                gi += 1
        m = np.asarray(master)        # [F, mch, FRAG]
        keep = min(bufsize, frames - n)
        flat = m.transpose(1, 0, 2).reshape(r.master_channels, -1)
        out.append(flat[:, :keep])
        n += bufsize
    r.close()
    return np.concatenate(out, axis=1)
