/*
 * a2rt.cpp - audiality2-tpu native runtime: control plane + exact DSP
 *
 * This is the native (C++) implementation of the engine core: the
 * scripting VM, voice tree, event system, control rampers, and the
 * built-in unit DSP, all bit-exact with the Python host engine in
 * audiality2_tpu/engine/core.py + units/host_units.py (which is in
 * turn bit-exact with the reference engine; see tests/test_golden.py).
 *
 * The A2S compiler, object system, and public API stay in Python;
 * compiled programs and prepared waves are serialized into this
 * runtime, which renders audio via a2rt_run().
 *
 * Behavioral contracts are cited from the reference where they are
 * observable: VM semantics (reference src/core.c:1166-1744), ramper
 * semantics (include/a2_dsp.h:105-170), unit behavior (src/units/).
 * This file is an original implementation written against those
 * contracts, structured around the Python engine of this repo.
 */

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>
#include <map>
#include <unordered_map>
#include <unordered_set>

typedef int32_t i32;
typedef uint32_t u32;
typedef int64_t i64;
typedef uint64_t u64;

/* ---- limits (audiality2_tpu/constants.py) ---- */
#define MAXFRAG 64
#define NREGS 64
#define MAXARGS 8
#define MAXEPS 8
#define NESTLIMIT 255
#define INSLIMIT 1000
#define SV_LUT 8
#define MAXCH 8
#define R_TICK 0
#define R_TR 1
#define FIXEDREGS 2
#define DEFAULTTICK (125 << 16)
#define MAXPHINC 512
#define MIPLEVELS 10
#define WAVEPRE 1
#define WAVEPOST 131
#define K_1K_DIV_MIDDLEC 4202608409623LL

/* voice flags */
#define VF_SUBINLINE 0x0100
#define VF_ATTACHED 0x0200
#define VF_APIHANDLE 0x0400
/* unit instantiation flags */
#define UF_PROCADD 0x0001

/* unit kinds, in registration order (units/descriptors.py) */
enum UnitKind {
    U_INLINE = 0, U_WTOSC, U_PANMIX, U_XSINK, U_XSOURCE, U_XINSERT,
    U_DBGUNIT, U_LIMITER, U_FBDELAY, U_FILTER12, U_DCBLOCK,
    U_WAVESHAPER, U_FM1, U_FM2, U_FM3, U_FM4, U_FM3P, U_FM4P, U_FM2R,
    U_FM4R, U_DC, U_ENV, U_NKINDS
};

static const int unit_nregs[U_NKINDS] = {
    0, 4, 2, 0, 0, 0, 0, 2, 7, 5, 1, 1,
    4, 7, 10, 13, 10, 13, 7, 13, 2, 4
};

/* VM opcodes (constants.py Op) */
enum Opcode {
    OP_END = 0, OP_RETURN, OP_CALL, OP_JUMP, OP_LOOP, OP_JZ, OP_JNZ,
    OP_JG, OP_JL, OP_JGE, OP_JLE, OP_DELAY, OP_DELAYR, OP_TDELAY,
    OP_TDELAYR, OP_SLEEP, OP_WAKE, OP_FORCE, OP_SUBR, OP_DIVR,
    OP_P2DR, OP_NEGR, OP_LOAD, OP_LOADR, OP_ADD, OP_ADDR, OP_MUL,
    OP_MULR, OP_MOD, OP_MODR, OP_QUANT, OP_QUANTR, OP_RAND, OP_RANDR,
    OP_GR, OP_LR, OP_GER, OP_LER, OP_EQR, OP_NER, OP_ANDR, OP_ORR,
    OP_XORR, OP_NOTR, OP_SET, OP_SETALL, OP_RAMP, OP_RAMPR,
    OP_RAMPALL, OP_RAMPALLR, OP_PUSH, OP_PUSHR, OP_SPAWN, OP_SPAWNR,
    OP_SPAWND, OP_SPAWNDR, OP_SPAWNV, OP_SPAWNVR, OP_SPAWNA,
    OP_SPAWNAR, OP_SEND, OP_SENDR, OP_SENDA, OP_SENDS, OP_WAIT,
    OP_KILL, OP_KILLR, OP_KILLA, OP_DETACH, OP_DETACHR, OP_DETACHA,
    OP_DEBUG, OP_DEBUGR, OP_INITV, OP_SIZEOF, OP_SIZEOFR
};

static inline int ins_size(int op) {
    switch (op) {
    case OP_DELAY: case OP_TDELAY: case OP_LOAD: case OP_ADD:
    case OP_MUL: case OP_MOD: case OP_QUANT: case OP_RAND:
    case OP_PUSH: case OP_DEBUG: case OP_RAMP: case OP_RAMPALL:
        return 2;
    default:
        return 1;
    }
}

/* error codes (subset; values match errors.py A2Error) */
enum A2rtError {
    E_OK = 0, E_END = 7, E_OVERLOAD = 8, E_ILLEGALOP = 9,
    E_MANYARGS = 11, E_DIVBYZERO = 15, E_VOICEALLOC = 37,
    E_VOICENEST = 39, E_BADPROGRAM = 103, E_BADENTRY = 104,
    E_WRONGTYPE = 35, E_BADVOICE = 105, E_LATEMESSAGE = 10
};

/* ---- pitch LUT (fixmath.py / reference pitch.c:33-96) ---- */
struct PitchTab {
    u32 base[64];
    u32 coeff[64];
    PitchTab() {
        u32 b = 0x80000000u;
        for (int i = 0; i < 64; ++i) {
            float x = (float)((i + 1) * (1.0f / 64));
            float p = powf(2.0f, x);
            u32 b2 = (u32)((double)0x80000000u * (double)p + 0.5);
            base[i] = b;
            coeff[i] = (b2 - b + 128) >> 8;
            b = b2;
        }
    }
};
static PitchTab g_ptab;

static inline u32 p2i(i32 pitch) {
    int n = pitch & 0xffff;
    int oct = pitch >> 16;
    u32 dph = g_ptab.coeff[n >> 10] * (u32)(n & 1023);
    dph >>= 2;
    dph += g_ptab.base[n >> 10];
    return dph >> ((7 - oct) & 31);   /* x86 shift-mask semantics */
}

/* ---- noise LCG (a2_dsp.h:37-42) ---- */
static inline int lcg_next(u32 *s) {
    *s = *s * 1566083941u + 1u;
    return (int)((*s * (*s >> 16)) >> 16);
}

static inline i32 tsdiff(u32 a, u32 b) { return (i32)(a - b); }

/* ---- 8:24 control ramper (a2_dsp.h:105-170) ---- */
struct Ramper {
    i32 value, target, delta, timer;
    void init(i32 v) { value = target = v << 8; delta = timer = 0; }
    void prepare(int frames) {
        if (!timer) { value = target; delta = 0; }
        else if (frames <= (timer >> 8)) {
            delta = (i32)(((i64)(target - value) << 8) / timer);
            timer -= frames << 8;
        } else {
            delta = (target - value) / frames;
            timer = 0;
        }
    }
    void run(int frames) { value += delta * frames; }
    void set(i32 t, u32 start, i32 duration) {
        target = t << 8;
        timer = duration + (i32)start;
        if (timer < 256) value = target;
        else value += (i32)(((i64)delta * (i32)start) >> 8);
    }
};

/* ---- waves ---- */
struct Wave {
    int type;       /* 0 off, 1 noise, 2 wave, 3 mipwave */
    u32 flags;      /* bit 0x100 = looped */
    u32 period;
    u32 size[MIPLEVELS];
    int16_t *data[MIPLEVELS];   /* padded: WAVEPRE + size + WAVEPOST */
    std::vector<int16_t> store;
};

/* ---- programs ---- */
struct Func {
    std::vector<u32> code;
    i32 argdefs[MAXARGS];
    u32 argv, argc, topreg;
};
struct UnitItem { int uindex, ninputs, noutputs, flags; };
struct WireItem { int from_unit, from_output, to_register; };
struct Program {
    std::vector<Func> funcs;
    std::vector<UnitItem> units;
    std::vector<WireItem> wires;
    int eps[MAXEPS];
    u32 vflags;
    int buffers;
};

/* ---- events (engine/core.py Event) ---- */
enum EvAction { EV_PLAY = 0, EV_START, EV_SEND, EV_SENDSUB,
                EV_RELEASE, EV_KILL, EV_KILLSUB };
struct Event {
    Event *next;
    int action;
    u32 timestamp;
    i32 program;       /* program handle or entry point */
    i32 voice;         /* API voice handle for EV_START */
    int argc;
    i32 argv[MAXARGS];
};

struct Voice;
struct State;

/* ---- unit instances ---- */
struct Unit {
    /* chain-walk + dispatch fields first (one line): the voice loop
       reads next/process once per (unit, slice) call */
    Unit *next;
    /* direct process pointer, set at unit_init like the reference's
       per-instance Process field (a2_units.h) — avoids a switch per
       (unit, slice) call in the hot voice loop */
    void (*process)(State *st, Unit *u, int offset, int frames);
    int kind;
    int ninputs, noutputs;
    u32 flags;
    i32 *inputs[MAXCH];
    i32 *outputs[MAXCH];
    Voice *voice;
    State *st;
    int regbase;

    /* per-kind state (union-style; simple members for clarity) */
    /* wtosc */
    Ramper a, p;          /* also: panmix vol/pan, ws amount, dc value */
    Ramper q;             /* filter12 q */
    int wave_id;
    Wave *wave;
    int osc_mode;         /* 0 off, 1 noise, 2 nomip, 3 mip */
    u64 phase;
    u32 dphase;
    int noise_last, p_ramping;
    /* filter12 / dcblock */
    i32 f1, d1[2], d2[2], lp, bp, hp, dcb_cutoff;
    /* limiter */
    i32 lim_release; u32 lim_threshold, lim_peak;
    /* fbdelay (buffers allocated only for fbdelay units) */
    i32 *fbd_l, *fbd_r;
    int fbd_pos, fbd_fb, fbd_ld, fbd_rd;
    i32 fbd_dry, fbd_fbg, fbd_lg, fbd_rg;
    /* dc */
    int dc_mode;
    /* env */
    int env_active; const uint16_t *env_lut;
    i32 env_scale, env_offset, env_out;
    Ramper env_r;
    Unit *env_co_unit; int env_co_idx;   /* wired control output */
    /* fm */
    int fm_nops, fm_structure, fm_osbits;
    struct { Ramper a, fb, p; i32 last_pitch; u32 phase, dphase;
             i32 last; } fm_op[4];
    /* record mode (a2rt_record.inc) */
    i64 serial;
    int chainpos;
    u32 nz_expect;  /* noise run continuation: expected global LCG
                       state at this oscillator's next slice (any
                       intervening draw by another unit breaks the
                       run, never bends audio) */
    /* per-oscillator run state (a2rt_record.inc rec_commit) — lives
       on the UNIT so chains with several oscillators (in-chain
       generators, multi-wtosc stacks) each keep their own open run.
       A RAMP run ships the rampers' (target, timer) snapshot and the
       device re-runs a2_PrepareRamper's per-fragment requantization;
       sim_* hold the live ramper/phase state as of the end of the
       run's last fully-committed fragment, and every new-fragment
       extension replays ONE fragment from sim and must match the
       candidate exactly (a mismatch breaks the run, never audio). */
    int run_idx;            /* open run row index, -1 = none */
    i64 run_epoch;          /* record-call epoch the run belongs to */
    int run_dirty;          /* wtosc/panmix register write since the
                               last fragment-boundary commit */
    int run_ramp_ok;        /* replay-from-snapshot still valid */
    int run_ramp_committed; /* run emitted with RF_RAMP=1 */
    int run_snap;           /* fragment-0 snapshot written to row */
    Ramper sim_a, sim_vol, sim_pan, sim_pt;
    i32 sim_pramping;
    u32 sim_dphraw;
    u64 sim_phase;          /* mip-scaled kernel-domain phase */
    /* live PRE-prepare state at the current slice, captured at the
       top of the record call (wtosc/dc: a + pitch; panmix: vol +
       pan).  sim_predict_match compares it to the sim snapshot
       directly: state equality implies the device's prepare-replay
       reproduces the candidate (candidates are prepare-derived), so
       the old per-fragment re-prepare — up to four integer divisions
       per slice — is unnecessary.  Non-prepare ramper bookkeeping
       (dc STEP's manual timer countdown) always mutates the state,
       so it can never merge wrongly — it breaks the run instead. */
    Ramper pre_a, pre_b;
    i32 pre_pramping;
    u32 pre_dphraw;
    u64 pre_phase;
};

/* ---- voices ---- */
struct Voice {
    /* The first cache line holds everything a sleeping voice's
       per-fragment visit touches (process_voices -> process_voice ->
       process_vm_ev fast path + the unit-chain head): the tree walk
       itself is the dominant control-plane cost at ~23M visits per
       500 s render, so these fields must not straddle the 256 B of
       r[] or the 1 KB of cregs[]. */
    Voice *next;
    Voice *sub;         /* newest first */
    Unit *units;
    Event *events;
    u32 waketime;
    int vstate;        /* 0 run 1 wait 2 irq 3 ending 4 finalizing */
    u32 flags;
    u32 func, pc;
    Program *program;
    /* VM state */
    i32 r[NREGS];
    i32 handle;
    int nestlevel;
    int ncregs;
    struct CReg { Unit *unit; int idx; } cregs[NREGS];
    Voice *sv[SV_LUT];
    int noutputs;
    i32 **outputs;      /* points at bus channel pointer array;
                           REDIRECTED to the inline unit's buffers at
                           unit init (subvoices spawn into them) */
    int ext_noutputs;   /* the voice's EXTERNAL outputs (parent bus),
                           untouched by the inline redirect — what
                           the chain's final units write */
    i32 **ext_outputs;
    int defer;              /* wtosc(+panmix) leaf: emit device rows */
    int hostsub;            /* chain has host-only units: in record
                               mode the whole subtree renders natively
                               and ships as stash patches */
    int pending_row;        /* -3: candidate awaiting panmix attach */
    int pending_stash;
    i32 stash_tmp[MAXFRAG];
    /* call stack */
    struct StackEntry {
        int state; u32 waketime, pc, func;
        int firstreg, topreg, interrupt;
        i32 regs[NREGS];
    };
    std::vector<StackEntry> stack;
};

enum VState { VS_RUN = 0, VS_WAIT, VS_IRQ, VS_END, VS_FINAL };

struct Bus {
    int channels;
    i32 *bufs[MAXCH];
    i32 store[MAXCH][MAXFRAG];
    Bus(int ch) : channels(ch) {
        for (int i = 0; i < MAXCH; ++i) bufs[i] = store[i];
        clear_all();
    }
    void ensure(int ch) { if (ch > channels) channels = ch; }
    void clear(int off, int n) {
        for (int i = 0; i < channels; ++i)
            memset(bufs[i] + off, 0, n * sizeof(i32));
    }
    void clear_all() {
        for (int i = 0; i < MAXCH; ++i)
            memset(store[i], 0, sizeof(store[i]));
    }
};

/* env LUTs (host_units.py _env_build_luts / reference env.c:255-297) */
struct EnvLuts {
    uint16_t lut[8][66];
    EnvLuts() {
        for (int i = 0; i < 64; ++i)
            lut[0][i] = (uint16_t)((1.0 - cos(i * M_PI / 63)) * 16384.0
                                   + 0.5);
        static const int deg[7] = {1, 2, 3, 4, 6, 9, 13};
        for (int j = 0; j < 7; ++j) {
            double c = pow(0.1, (double)deg[j]);
            double rc = 0.002 + 0.1 * pow(0.8, (double)deg[j]);
            for (int i = 0; i < 64; ++i) {
                double x = 1.0 - i / 64.0;
                double rr = (1.0 - x) * rc;
                lut[1 + j][i] = (uint16_t)((pow(c, x) * (1.0 - rr) + rr
                                            - c * x) * 32768.0 + 0.5);
            }
        }
        for (int j = 0; j < 8; ++j) lut[j][64] = lut[j][65] = 32768;
    }
};
static EnvLuts g_env;

/* fm sine table (host_units.py _fm_sine) */
struct FmSine {
    int16_t t[2049];
    FmSine() {
        for (int s = 0; s < 2049; ++s)
            t[s] = (int16_t)(sin(s * 2.0 * M_PI / 2048) * 32767.0);
    }
};
static FmSine g_fmsine;

/* ---- API message ---- */
struct ApiMsg {
    i32 target;
    Event ev;
};

/* ---- engine state ---- */
struct State {
    int samplerate, channels;
    i32 basepitch;
    i64 msdur;
    u32 randstate, noisestate;
    u32 now_fragstart, now_frames;
    int last_error;
    int quality;        /* 0 A2_HIFI, 1 default, 2 A2_LOFI
                           (wtosc.c:27-46; fm is unaffected — the
                           reference's fm.c never sees config.h) */

    std::unordered_map<int, Program*> programs;
    std::unordered_map<int, Wave*> waves;

    Bus *master;
    Bus *scratch[NESTLIMIT];

    Voice *rootvoice;
    std::unordered_map<int, Voice*> vhandles;  /* API voice handles */
    int next_vhandle;
    /* pending event queues for not-yet-started API voices.
       Per-State (NOT process-global): serve.py's record pool runs
       a2rt_record on several States concurrently with the GIL
       released, and the API-message pump inserts here while
       event_start erases — a shared map would be unsynchronized
       UB across streams. */
    std::map<int, Event*> pending;
    /* run-compression diagnostics (a2rt_record.inc rec_commit);
       per-State so concurrent records don't tear each other's
       counters. Read via a2rt_rec_stats(st, out). */
    i64 rec_stats[16];

    /* record mode (a2rt_record.inc) */
    int recording;
    int hostsub_active; /* inside a host-rendered subtree */
    i64 rec_epoch;      /* bumped per a2rt_record call; stale
                           voice->run_epoch never matches */
    struct RecBufs *rec;
    /* Per-buffer record metadata (owner serial / slot channel / last
       claim fragment / gen-claimed), keyed by the buffer pointer.
       All keys come from the pooled Bus objects (master + one per
       nestlevel, MAXCH channels each), so the key space is tiny and
       stable — a flat open-addressed table replaces what used to be
       four unordered_map/set lookups per chain-unit slice (the
       dominant record-pass cost after the ramper sim). Entries are
       never removed; "erased" owners go back to -1. */
    struct BusMeta { i32 *buf; i64 owner; i32 chan, frag, gen; };
    static const int BUSMETA_SZ = 512;      /* pow2 >> ~72 live keys */
    BusMeta busmeta[BUSMETA_SZ];
    i64 unit_serial;

    std::vector<ApiMsg> apimsgs;
    std::vector<Voice*> voicepool;
    std::vector<Event*> eventpool;
    std::vector<Unit*> unitpool;

    i64 activevoices, totalvoices, instructions;

    State() : samplerate(48000), channels(1), basepitch(0), msdur(0),
              quality(0),
              randstate(16576), noisestate(324357), now_fragstart(0),
              now_frames(0), last_error(0), master(nullptr),
              rootvoice(nullptr), next_vhandle(0x40000000),
              activevoices(0), totalvoices(0), instructions(0),
              recording(0), hostsub_active(0), rec_epoch(0),
              rec(nullptr), unit_serial(1) {
        memset(scratch, 0, sizeof(scratch));
        memset(busmeta, 0, sizeof(busmeta));
        memset(rec_stats, 0, sizeof(rec_stats));
    }

    Event *alloc_event() {
        if (!eventpool.empty()) {
            Event *e = eventpool.back(); eventpool.pop_back();
            return e;
        }
        return new Event();
    }
    void free_event(Event *e) { eventpool.push_back(e); }

    Unit *alloc_unit() {
        Unit *u;
        if (!unitpool.empty()) {
            u = unitpool.back(); unitpool.pop_back();
        } else
            u = (Unit *)malloc(sizeof(Unit));
        memset(u, 0, sizeof(Unit));
        return u;
    }
    void free_unit(Unit *u) { unitpool.push_back(u); }

    Voice *alloc_voice() {
        Voice *v;
        if (!voicepool.empty()) {
            v = voicepool.back(); voicepool.pop_back();
        } else {
            v = new Voice();
            ++totalvoices;
        }
        v->next = nullptr; v->events = nullptr; v->program = nullptr;
        v->units = nullptr; v->sub = nullptr; v->handle = -1;
        v->flags = 0; v->ncregs = FIXEDREGS;
        v->defer = 0; v->hostsub = 0;
        v->ext_outputs = nullptr; v->ext_noutputs = 0;
        v->pending_row = -1; v->pending_stash = 0;
        v->stack.clear();
        memset(v->sv, 0, sizeof(v->sv));
        memset(v->cregs, 0, sizeof(v->cregs));
        memset(v->r, 0, sizeof(v->r));
        return v;
    }
};

/* send_event: timestamp-sorted insertion, after equals
 * (engine/core.py send_event) */
static void send_event(Event **q, Event *e) {
    Event *pe = *q;
    if (!pe || tsdiff(pe->timestamp, e->timestamp) > 0) {
        e->next = pe;
        *q = e;
        return;
    }
    while (pe->next && tsdiff(pe->next->timestamp, e->timestamp) <= 0)
        pe = pe->next;
    e->next = pe->next;
    pe->next = e;
}

/* forward decls */
static void process_subvoices(State *st, Voice *v, int offset, int n);
static void unit_process(State *st, Unit *u, int offset, int frames);
static void unit_record(State *st, Unit *u, int offset, int frames);
static void voice_free(State *st, Voice **head);

#include "a2rt_units.inc"
#include "a2rt_record.inc"
#include "a2rt_layout.inc"
#include "a2rt_vm.inc"

/* =========================================================
 *  C API
 * ========================================================= */
extern "C" {

State *a2rt_new(int samplerate, int channels, i32 basepitch,
                u32 randseed, u32 noiseseed, int quality) {
    State *st = new State();
    st->quality = quality;          /* 0 hifi, 1 normal, 2 lofi */
    st->samplerate = samplerate;
    st->channels = channels < 1 ? 1 : channels;
    st->basepitch = basepitch;
    /* FLOAT32 like the reference (audiality2.c:499): differs from
       double math at e.g. 96 kHz (6291457 vs 6291456).  volatile
       blocks FMA contraction — the reference's baseline x86-64 build
       rounds the product BEFORE adding .5f, and the fused single
       rounding differs at 192 kHz (12582913 vs 12582914). */
    volatile float msd = (float)samplerate * 65.536f;
    st->msdur = (i64)(float)(msd + .5f);
    st->randstate = randseed;
    st->noisestate = noiseseed;
    st->master = new Bus(st->channels >= 2 ? st->channels : 1);
    return st;
}

void a2rt_free(State *st) {
    /* leak-free enough for session use; pools freed here */
    delete st->master;
    delete st;
}

/* Program blob layout (int32 words), see native.py serializer:
 * [nfuncs nunits nwires vflags buffers eps[8]]
 * per func:  [size argc argv topreg argdefs[8] code[size]]
 * per unit:  [uindex ninputs noutputs flags]
 * per wire:  [from_unit from_output to_register]
 */
int a2rt_add_program(State *st, int handle, const i32 *blob, int nwords) {
    (void)nwords;
    Program *p = new Program();
    const i32 *w = blob;
    int nfuncs = *w++; int nunits = *w++; int nwires = *w++;
    p->vflags = (u32)*w++; p->buffers = *w++;
    for (int i = 0; i < MAXEPS; ++i) p->eps[i] = *w++;
    p->funcs.resize(nfuncs);
    for (int f = 0; f < nfuncs; ++f) {
        Func &fn = p->funcs[f];
        int size = *w++;
        fn.argc = (u32)*w++; fn.argv = (u32)*w++; fn.topreg = (u32)*w++;
        for (int i = 0; i < MAXARGS; ++i) fn.argdefs[i] = *w++;
        /* one 0 pad word: the VM's computed-goto decode reads the
           operand word code[pc + 1] unconditionally (a2rt_vm.inc
           VM_DISPATCH), so the final 1-word instruction must have a
           readable successor */
        fn.code.resize(size + 1, 0);
        for (int i = 0; i < size; ++i) fn.code[i] = (u32)*w++;
    }
    for (int i = 0; i < nunits; ++i) {
        UnitItem ui;
        ui.uindex = *w++; ui.ninputs = *w++; ui.noutputs = *w++;
        ui.flags = *w++;
        p->units.push_back(ui);
    }
    for (int i = 0; i < nwires; ++i) {
        WireItem wi;
        wi.from_unit = *w++; wi.from_output = *w++;
        wi.to_register = *w++;
        p->wires.push_back(wi);
    }
    st->programs[handle] = p;
    return 0;
}

/* Wave: data = concatenated padded mip levels (int16), each level
 * WAVEPRE + size[i] + WAVEPOST samples. */
int a2rt_add_wave(State *st, int handle, int type, u32 flags,
                  u32 period, const u32 *sizes, const int16_t *data) {
    Wave *wv = new Wave();
    wv->type = type; wv->flags = flags; wv->period = period;
    int levels = type == 3 ? MIPLEVELS : (type == 2 ? 1 : 0);
    size_t total = 0;
    for (int i = 0; i < levels; ++i)
        total += WAVEPRE + sizes[i] + WAVEPOST;
    wv->store.assign(data, data + total);
    size_t pos = 0;
    for (int i = 0; i < MIPLEVELS; ++i) {
        wv->size[i] = i < levels ? sizes[i] : 0;
        if (i < levels) {
            wv->data[i] = wv->store.data() + pos + WAVEPRE;
            pos += WAVEPRE + sizes[i] + WAVEPOST;
        } else
            wv->data[i] = nullptr;
    }
    st->waves[handle] = wv;
    return 0;
}

int a2rt_init_root(State *st, int rootprog) {
    Program *p = st->programs.count(rootprog) ? st->programs[rootprog]
                                              : nullptr;
    if (!p) return E_BADPROGRAM;
    Voice *v = st->alloc_voice();
    ++st->activevoices;
    v->nestlevel = 0;
    v->flags = VF_ATTACHED | VF_APIHANDLE;
    v->waketime = st->now_fragstart;
    v->r[R_TICK] = DEFAULTTICK;
    v->r[R_TR] = 0;
    v->noutputs = st->master->channels;
    v->outputs = st->master->bufs;
    v->ext_outputs = st->master->bufs;
    v->ext_noutputs = v->noutputs;
    v->handle = 0;
    st->vhandles[0] = v;
    voice_start(st, v, p, 0, nullptr);
    st->rootvoice = v;
    return 0;
}

/* API messages (timestamped; pumped at the next a2rt_run) */
int a2rt_start(State *st, int parent, int program, int argc,
               const i32 *argv, u32 timestamp) {
    int vh = st->next_vhandle++;
    ApiMsg m;
    m.target = parent;
    m.ev.action = EV_START;
    m.ev.timestamp = timestamp;
    m.ev.program = program;
    m.ev.voice = vh;
    m.ev.argc = argc > MAXARGS ? MAXARGS : argc;
    for (int i = 0; i < m.ev.argc; ++i) m.ev.argv[i] = argv[i];
    st->apimsgs.push_back(m);
    st->vhandles[vh] = nullptr;   /* pending (A2_TNEWVOICE analog) */
    return vh;
}

int a2rt_play(State *st, int parent, int program, int argc,
              const i32 *argv, u32 timestamp) {
    ApiMsg m;
    m.target = parent;
    m.ev.action = EV_PLAY;
    m.ev.timestamp = timestamp;
    m.ev.program = program;
    m.ev.argc = argc > MAXARGS ? MAXARGS : argc;
    for (int i = 0; i < m.ev.argc; ++i) m.ev.argv[i] = argv[i];
    st->apimsgs.push_back(m);
    return 0;
}

int a2rt_send(State *st, int voice, int ep, int argc, const i32 *argv,
              u32 timestamp) {
    ApiMsg m;
    m.target = voice;
    m.ev.action = EV_SEND;
    m.ev.timestamp = timestamp;
    m.ev.program = ep;
    m.ev.argc = argc > MAXARGS ? MAXARGS : argc;
    for (int i = 0; i < m.ev.argc; ++i) m.ev.argv[i] = argv[i];
    st->apimsgs.push_back(m);
    return 0;
}

int a2rt_kill(State *st, int voice, u32 timestamp) {
    ApiMsg m;
    m.target = voice;
    m.ev.action = EV_KILL;
    m.ev.timestamp = timestamp;
    m.ev.argc = 0;
    st->apimsgs.push_back(m);
    return 0;
}

int a2rt_release(State *st, int voice, u32 timestamp) {
    ApiMsg m;
    m.target = voice;
    m.ev.action = EV_RELEASE;
    m.ev.timestamp = timestamp;
    m.ev.argc = 0;
    st->apimsgs.push_back(m);
    return 0;
}

u32 a2rt_now(State *st) { return st->now_frames; }
i64 a2rt_activevoices(State *st) { return st->activevoices; }
i64 a2rt_instructions(State *st) { return st->instructions; }
int a2rt_last_error(State *st) { return st->last_error; }

/* Render `frames` frames; writes master channel 0..channels-1
 * interleaved=no: planar into out (frames per channel). */
int a2rt_run(State *st, int frames, i32 *out) {
#ifdef A2RT_PROF
    extern unsigned long long g_runcyc;
    unsigned long long prof_t0 = __rdtsc();
    struct RunProf {
        unsigned long long t0;
        ~RunProf() { g_runcyc += __rdtsc() - t0; }
    } prof_guard{prof_t0};
#endif
    st->now_frames = st->now_fragstart + ((u32)frames << 8);
    /* pump API messages (engine/core.py pump_api_messages) */
    for (size_t i = 0; i < st->apimsgs.size(); ++i) {
        ApiMsg &m = st->apimsgs[i];
        Event *e = st->alloc_event();
        *e = m.ev;
        e->next = nullptr;
        if (tsdiff(e->timestamp, st->now_fragstart) < 0) {
            st->last_error = E_LATEMESSAGE;
            e->timestamp = st->now_fragstart;
        }
        auto it = st->vhandles.find(m.target);
        if (it == st->vhandles.end()) {
            st->last_error = E_BADVOICE;
            st->free_event(e);
        } else if (it->second) {
            send_event(&it->second->events, e);
        } else {
            /* pending NEWVOICE handle: park on its pending queue */
            send_event(pending_queue(st, m.target), e);
        }
    }
    st->apimsgs.clear();

    int remain = frames, offset = 0;
    while (remain) {
        int frag = remain > MAXFRAG ? MAXFRAG : remain;
        st->master->clear(0, frag);
        Voice *root = st->rootvoice;
        process_voices(st, &root, 0, frag);
        st->rootvoice = root;
        for (int c = 0; c < st->master->channels; ++c)
            memcpy(out + (size_t)c * frames + offset,
                   st->master->bufs[c], frag * sizeof(i32));
        offset += frag;
        remain -= frag;
        st->now_fragstart += (u32)frag << 8;
    }
    return frames;
}

/* Record one superblock: run the control plane, emit rows / stage
 * entries / stash patches for the device mixer (a2rt_record.inc).
 * counts_out: [nrows, nstages, nstash, err].  Returns 0 on success,
 * the record error code otherwise (state HAS advanced either way —
 * on error the caller restarts the song on the pure native path). */
int a2rt_record(State *st, int frames,
                i32 *rows, int maxrows,
                i32 *stages, int maxstages,
                i32 *stash, int maxstash,
                i32 *counts_out) {
    RecBufs rb;
    rb.rows = rows; rb.maxrows = maxrows; rb.nrows = 0;
    rb.stages = stages; rb.maxstages = maxstages; rb.nstages = 0;
    rb.stash = stash; rb.maxstash = maxstash; rb.nstash = 0;
    rb.frag = 0;
    rb.err = 0;
    st->rec = &rb;
    st->recording = 1;
    ++st->rec_epoch;
    for (int c = 0; c < st->master->channels; ++c) {
        State::BusMeta *m = bus_meta(st, st->master->bufs[c]);
        m->owner = 0;
        m->chan = c;
    }

    st->now_frames = st->now_fragstart + ((u32)frames << 8);
    for (size_t i = 0; i < st->apimsgs.size(); ++i) {
        ApiMsg &m = st->apimsgs[i];
        Event *e = st->alloc_event();
        *e = m.ev;
        e->next = nullptr;
        if (tsdiff(e->timestamp, st->now_fragstart) < 0) {
            st->last_error = E_LATEMESSAGE;
            e->timestamp = st->now_fragstart;
        }
        auto it = st->vhandles.find(m.target);
        if (it == st->vhandles.end()) {
            st->last_error = E_BADVOICE;
            st->free_event(e);
        } else if (it->second) {
            send_event(&it->second->events, e);
        } else {
            send_event(pending_queue(st, m.target), e);
        }
    }
    st->apimsgs.clear();

    int remain = frames;
    while (remain && !rb.err) {
        int frag = remain > MAXFRAG ? MAXFRAG : remain;
        Voice *root = st->rootvoice;
        process_voices(st, &root, 0, frag);
        st->rootvoice = root;
        remain -= frag;
        st->now_fragstart += (u32)frag << 8;
        ++rb.frag;
    }
    st->recording = 0;
    st->rec = nullptr;
    counts_out[0] = rb.nrows;
    counts_out[1] = rb.nstages;
    counts_out[2] = rb.nstash;
    counts_out[3] = rb.err;
    return rb.err;
}

} /* extern "C" */

extern "C" u32 a2rt_noisestate(State *st) { return st->noisestate; }

/* debug: dump voice tree as (nestlevel, program_ptr_id, waketime,
 * vstate, nunits) tuples into out; returns count */
static int dump_voice(State *st, Voice *v, i32 *out, int pos, int max,
                      int depth) {
    if (pos + 5 > max) return pos;
    int nu = 0;
    for (Unit *u = v->units; u; u = u->next) ++nu;
    out[pos++] = depth;
    out[pos++] = v->program ? (i32)v->program->funcs[0].code.size() : -1;
    out[pos++] = (i32)v->waketime;
    out[pos++] = v->vstate;
    out[pos++] = nu;
    for (Voice *sv = v->sub; sv; sv = sv->next)
        pos = dump_voice(st, sv, out, pos, max, depth + 1);
    return pos;
}

extern "C" int a2rt_dump_voices(State *st, i32 *out, int max) {
    return dump_voice(st, st->rootvoice, out, 0, max, 0);
}

extern "C" void a2rt_rec_stats(State *st, i64 *out) {
    memcpy(out, st->rec_stats, sizeof(st->rec_stats));
}
