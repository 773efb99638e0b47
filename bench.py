"""Benchmarks: (1) Viterbi DP-cell throughput (GCUPS) of the scoring
sweep, (2) stage-1 prefilter GCUPS, (3) mesh scaling efficiency on a
virtual device mesh, and (4) end-to-end hhblits profile-pairs/s at TWO
operating points — 512 templates (funnel-degenerate, fixed overhead
dominated) and 8192 templates with a long-tail length mix (the regime
the funnel/batch design targets).

Prints one JSON line per metric {"metric", "value", "unit",
"vs_baseline"}; the LAST line is the headline 512-template pairs/s
(comparable across rounds).  Baselines:
  * GCUPS: hhblits-AVX2 best case ~10 GCUPS/socket (BASELINE.md).
  * pairs/s 512: reference hhblits binary (built from /root/reference,
    -O3 AVX2) on the SAME database on this host's 2-core Xeon:
    512/3.51 s = 145.9 pairs/s (-nocontxt -n 1 -cpu 2).
  * pairs/s 8192: same binary, same flags, on the same 8192-template
    DB built by tools/benchdb.py (length_mix): best-of-3 6.58 s =
    1244.4 pairs/s (prefilter passes ~7.1k, realign caps at 500).
End-to-end numbers are best-of-3 after a warmup run; the first-run
wall (compile + parse + upload) is reported as its own line.
Kernel metrics are slope-based (two chained-invocation counts) so
fixed dispatch/transfer latency of remote-TPU setups cancels out.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# persistent XLA compilation cache: the remote-TPU tunnel compiles
# server-side at ~20-60 s/shape, which otherwise dominates bench wall
# time; cached programs load in <1 s on repeat runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp")
# cache sub-second client compiles too: on the tunneled TPU the
# server-side Mosaic build at first execution is the expensive half,
# and it is skipped only on a cache hit (see hhsuite_tpu/__init__.py)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

BASELINE_GCUPS = 10.0
BASELINE_PAIRS_PER_S = 145.9      # reference hhblits, 512-template DB
BASELINE_PAIRS_PER_S_8K = 1244.4  # reference hhblits, 8192-template DB
BENCH_DB_DIR = os.environ.get("HHSUITE_TPU_BENCHDB", "/tmp/hhsuite_benchdb")

# every metric emitted during the run is also collected here and folded
# into the FINAL line, so a tail-truncating log capture still records
# all of them (round 3 lost its kernel numbers to exactly that)
_METRICS = []


def emit(d):
    _METRICS.append(d)
    print(json.dumps(d), flush=True)


def _chained(fn_many, reps):
    import jax

    f = fn_many(reps)
    r = f()
    _ = np.asarray(r)
    best = 1e30
    for _i in range(3):
        t0 = time.perf_counter()
        r = f()
        _ = np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_pair

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    # the tunneled-TPU backend pays a large one-time server-side session
    # spin-up (~110 s measured) on the FIRST device execution of a
    # process — infrastructure cost, not compile/parse/upload; absorb it
    # here and report it as its own metric so first_run_wall below
    # reflects the framework's own cold-start work
    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda x: x + 1)(
        jax.device_put(np.zeros((8, 8), np.float32))))
    emit({
        "metric": "tunnel_init_s",
        "value": round(time.perf_counter() - t0, 2),
        "unit": "s (one-time backend session spin-up)",
        "vs_baseline": 0.0,
    })
    if on_tpu:
        from hhsuite_tpu.ops.viterbi_lanes import viterbi_score_lanes_fused

        def kern(qp, qtr, tp, ttr, co, tL, shift, **kw):
            # the production funnel sweep: fused-Si lanes kernel
            # (Si computed in-kernel, never materialised in HBM)
            s = viterbi_score_lanes_fused(qp, qtr, tp, ttr, tL, shift,
                                          si_mode="fast")
            return s, None, None, jnp.zeros((1, 1, 1), jnp.uint8)
        # one full lanes tile (16x128 templates, the search's
        # sub-batch size), 511x511 profiles
        Lq, Lt, B = 511, 511, 2048
    else:
        from hhsuite_tpu.ops.viterbi import viterbi_batch

        def kern(qp, qtr, tp, ttr, co, tL, shift, **kw):
            co2 = (np.zeros((tp.shape[0], qp.shape[0] - 1,
                             tp.shape[1] - 1), bool) if co is None else co)
            return viterbi_batch(qp, qtr, tp, ttr, co2, tL, shift, 0.0,
                                 0.0, 0.0, **kw)
        Lq, Lt, B = 128, 128, 8

    if on_tpu:
        # ---- batch-marginal slope: time ONE dispatch at B_lo and one
        # at B_hi and divide the extra cells by the extra time.  Both
        # runs pay exactly one dispatch + one scalar fetch, so the
        # ~40 ms link latency cancels, and the 6k-lane delta puts the
        # signal (~8-15 ms) above link jitter.  (The previous
        # chained-repetition slope resolved only ~0.5 ms/rep of signal
        # against that jitter and overstated the sweep by up to 5x —
        # r5 cross-check: absolute B-scaling, VPU op-count analysis
        # and this marginal all agree at ~190-200 GCUPS.) ----
        B_lo, B_hi = 2048, 8192

        def one(Bn):
            qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt,
                                                      B=Bn, seed=1)
            d = [jax.device_put(a) for a in (qp, qtr, tp, ttr, tL)]

            @jax.jit
            def f():
                s, *_r = kern(d[0], d[1], d[2], d[3], None, d[4],
                              np.float32(-0.03), local=True,
                              need_bt=True)
                return s.sum()

            float(np.asarray(f()))          # compile + warm
            best = 1e30
            for _i in range(4):
                t0 = time.perf_counter()
                float(np.asarray(f()))
                best = min(best, time.perf_counter() - t0)
            return best

        t_kernel = max(one(B_hi) - one(B_lo), 1e-9)
        cells = (B_hi - B_lo) * Lq * Lt
    else:
        qp, qtr, tp, ttr, co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B,
                                                 seed=1)
        dargs = [jax.device_put(a) for a in (qp, qtr, tp, ttr, tL)]

        def fn_many(n):
            @jax.jit
            def f(a=dargs):
                acc = jnp.float32(0)
                for r in range(n):
                    s, i2, j2, bt = kern(a[0], a[1], a[2], a[3], None,
                                         a[4],
                                         np.float32(-0.03 - 1e-6 * r),
                                         local=True, need_bt=True)
                    acc = acc + s.sum() + bt[0, 0, 0].astype(jnp.float32)
                return acc
            return f

        t_lo = _chained(fn_many, 1)
        t_hi = _chained(fn_many, 3)
        t_kernel = max((t_hi - t_lo) / 2, 1e-9)
        cells = B * Lq * Lt

    gcups = cells / t_kernel / 1e9
    emit({
        "metric": "viterbi_gcups_per_chip",
        "value": round(gcups, 4),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 4),
    })


def bench_lanes_floor():
    """Lanes-sweep HBM-floor analysis (VERDICT r3 weak #3, r4 next #1).

    The r1-r4 SPLIT sweep materialised the bf16 Si tensor between the
    XLA einsum and the Pallas kernel: a 4 B/cell round-trip that floors
    ANY Si-materialising implementation at bw/4 cells/s (the floor is
    computed against the chip's MEASURED stream bandwidth — a chained
    uint16 elementwise pass with optimization_barriers, slope-based so
    dispatch cancels).  Round 5 fused the profile dot INTO the DP
    kernel (`viterbi_score_lanes_fused`), so Si never touches HBM and
    the production sweep now lands ABOVE the materialisation floor:
    pct_of_floor = floor_time / kernel_time > 100% is the direct
    evidence that the fusion escaped it."""
    import jax
    import jax.numpy as jnp

    if not any(d.platform != "cpu" for d in jax.devices()):
        return
    from __graft_entry__ import _example_pair
    from hhsuite_tpu.ops.viterbi_lanes import viterbi_score_lanes_fused

    Lq, Lt, B = 511, 511, 2048
    cells = B * Lq * Lt
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B, seed=1)
    d = [jax.device_put(np.asarray(a, np.float32))
         for a in (qp, qtr, tp, ttr)]
    tLd = jax.device_put(tL)

    def chained_slope(make, lo, hi):
        f_lo, f_hi = make(lo), make(hi)
        for f in (f_lo, f_hi):
            _ = np.asarray(f())

        def best(f):
            b = 1e30
            for _ in range(4):
                t0 = time.perf_counter()
                _ = np.asarray(f())
                b = min(b, time.perf_counter() - t0)
            return b
        return (best(f_hi) - best(f_lo)) / (hi - lo)

    def sweep_marginal():
        # batch-marginal (see main(): the chained-rep slope under-
        # resolved against link jitter); per-cell sweep time from one
        # dispatch at 2048 lanes vs one at 8192
        def one(Bn):
            qp2, qtr2, tp2, ttr2, _c2, tL2 = _example_pair(
                Lq=Lq, Lt=Lt, B=Bn, seed=1)
            d2 = [jax.device_put(np.asarray(a, np.float32))
                  for a in (qp2, qtr2, tp2, ttr2)]
            tL2d = jax.device_put(tL2)

            @jax.jit
            def f():
                return viterbi_score_lanes_fused(
                    d2[0], d2[1], d2[2], d2[3], tL2d,
                    np.float32(-0.03), si_mode="fast").sum()

            float(np.asarray(f()))
            b = 1e30
            for _ in range(4):
                t0 = time.perf_counter()
                float(np.asarray(f()))
                b = min(b, time.perf_counter() - t0)
            return b

        dt = max(one(8192) - one(2048), 1e-9)
        return dt * B / (8192 - 2048)     # per-B-lane-batch seconds

    x = jax.device_put(np.zeros((cells // 128, 128), np.uint16))

    def make_stream(n):
        @jax.jit
        def f(x=x):
            y = x
            for r in range(n):
                y = jax.lax.optimization_barrier(y + np.uint16(r))
            return y[0, 0]
        return f

    t_k = max(sweep_marginal(), 1e-9)
    t_pass = max(chained_slope(make_stream, 2, 10), 1e-9)
    bw = 2 * cells * 2 / t_pass              # read + write per pass
    t_floor = 4 * cells / bw
    emit({
        "metric": "viterbi_lanes_pct_of_si_floor",
        "value": round(100.0 * t_floor / t_k, 1),
        "unit": (f"% of {round(cells / t_floor / 1e9, 1)} GCUPS floor "
                 f"@ {round(bw / 1e9, 1)} GB/s measured"),
        "vs_baseline": round(t_floor / t_k, 4),
    })


def bench_bt_pipeline():
    """Backtrace-pass device pipeline (template-lanes backtrace kernel
    + words-layout walk) at the funnel's operating shape.  The walk is
    bound by the platform's per-index gather cost (~14 ns/index,
    layout-independent), so this metric tracks the full pipeline, not
    the DP kernel alone."""
    import jax
    import jax.numpy as jnp

    if not any(d.platform != "cpu" for d in jax.devices()):
        return
    from __graft_entry__ import _example_pair
    from hhsuite_tpu.ops import viterbi as V
    from hhsuite_tpu.ops.viterbi_lanes import viterbi_backtrace_lanes

    # 2048 lanes: the funnel dispatches 4096-lane batches (r5), and
    # >= 2048 engages the BT kernel's 2-vreg ILP tile (auto G=16)
    Lq, Lt, B = 288, 320, 2048
    kmax = Lq + Lt + 1
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B, seed=1)
    d = [jax.device_put(np.asarray(a, np.float32))
         for a in (qp, qtr, tp, ttr)]
    tLd = jax.device_put(tL)

    def fn_many(n):
        @jax.jit
        def f(a=d, tL=tLd):
            acc = jnp.int32(0)
            for r in range(n):
                s, i2, j2, btw = viterbi_backtrace_lanes(
                    a[0], a[1], a[2], a[3], tL,
                    np.float32(-0.03 - 1e-6 * r))
                p = V.backtrace_walk_packed8_words(btw, i2, j2, s,
                                                   kmax=kmax, B=B)
                acc = acc + p.astype(jnp.int32).sum()
            return acc
        return f

    t_lo = _chained(fn_many, 1)
    t_hi = _chained(fn_many, 3)
    t_pipe = max((t_hi - t_lo) / 2, 1e-9)
    gcups = B * Lq * Lt / t_pipe / 1e9
    emit({
        "metric": "viterbi_backtrace_pipeline_gcups",
        "value": round(gcups, 2),
        "unit": "GCUPS (kernel+walk, 1024x288x320)",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 4),
    })


def bench_prefilter():
    """Stage-1 ungapped-SW prefilter kernel throughput (GCUPS).

    The reference's AVX2 uint8 kernel (hhprefilter.cpp:214-275) runs 32
    lanes/instruction; its best case is a few tens of GCUPS/socket.
    Slope-based like the Viterbi metric so link latency cancels."""
    import jax
    import jax.numpy as jnp

    if not any(d.platform != "cpu" for d in jax.devices()):
        return
    from hhsuite_tpu.ops.prefilter_pallas import ungapped_scores_pallas

    rng = np.random.RandomState(2)
    NS, Lq, B, Ld = 219, 431, 4096, 256
    qc = rng.randint(0, 200, (NS + 1, Lq)).astype(np.int32)
    db = rng.randint(0, NS, (B, Ld)).astype(np.int32)
    dq = jax.device_put(qc)
    ddb = jax.device_put(db)

    def fn_many(n):
        @jax.jit
        def f(q=dq, d=ddb):
            acc = jnp.int32(0)
            for r in range(n):
                acc = acc + ungapped_scores_pallas(
                    q, d, None, np.int32(50 + r)).sum()
            return acc
        return f

    t_lo = _chained(fn_many, 2)
    t_hi = _chained(fn_many, 10)
    t_kernel = max((t_hi - t_lo) / 8, 1e-9)
    gcups = B * Lq * Ld / t_kernel / 1e9
    emit({
        "metric": "prefilter_stage1_gcups_per_chip",
        "value": round(gcups, 1),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 30.0, 4),   # ~30 GCUPS AVX2 uint8
    })


def bench_scaling():
    """Mesh scaling efficiency of the sharded scoring sweep at 1 vs 8
    VIRTUAL CPU devices (xla_force_host_platform_device_count).

    CPU devices cannot prove TPU speedup; this measures that the
    sharded funnel's dispatch/partition overhead stays small — the
    efficiency term the BASELINE.md north star asks to track (>=85%
    at 2 hosts).  Runs in a subprocess so the TPU backend here is
    untouched."""
    code = r"""
import os, time, json
# the axon TPU plugin's sitecustomize force-updates jax_platforms, so
# the env var alone is not enough (same dance as tests/conftest.py)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax
from hhsuite_tpu.parallel.mesh import make_mesh, use_mesh, \
    sharded_prefilter_scores
from hhsuite_tpu.ops import prefilter as pf

# the sharded stage-1 prefilter sweep (pure lax.scan, compiles
# natively on CPU devices — no interpret-mode noise)
rng = np.random.RandomState(5)
NS, Lq, B, Ld = 219, 256, 16384, 256
qc = rng.randint(0, 200, (NS + 1, Lq)).astype(np.int32)
db = rng.randint(0, NS, (B, Ld)).astype(np.int32)
ln = np.full(B, Ld, np.int32)
off = np.int32(50)


def timed(n_dev):
    def once():
        if n_dev == 1:    # get_mesh() maps 1-device meshes to None
            return pf.ungapped_scores(qc, db, ln, off)
        with use_mesh(make_mesh(n_dev)):
            return sharded_prefilter_scores(pf.ungapped_scores, qc,
                                            db, ln, off)
    np.asarray(once())
    best = 1e30
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(once())
        best = min(best, time.perf_counter() - t0)
    return best

t1 = timed(1)
t8 = timed(8)

# large-shape point (VERDICT r4 next #7): 4x the batch, compute-
# dominated, so partition overhead is fully amortized
B = 65536
db = rng.randint(0, NS, (B, Ld)).astype(np.int32)
ln = np.full(B, Ld, np.int32)
t1L = timed(1)
t8L = timed(8)
print(json.dumps({"t1": t1, "t8": t8, "t1L": t1L, "t8L": t8L}))
"""
    try:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8")
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=900,
                           cwd=os.path.dirname(os.path.abspath(__file__)),
                           env=env)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")][-1]
        d = json.loads(line)
        # virtual CPU devices share the same cores, so wall time cannot
        # shrink; efficiency here = t1 / t8 (overhead ratio of the
        # 8-way partitioned program vs single-device)
        eff = d["t1"] / max(d["t8"], 1e-9)
        emit({
            "metric": "mesh_partition_overhead_ratio_8dev_virtual",
            "value": round(eff, 4),
            "unit": "ratio_t1_over_t8",
            "vs_baseline": round(eff / 0.85, 4),
        })
        effL = d["t1L"] / max(d["t8L"], 1e-9)
        emit({
            "metric": "mesh_partition_ratio_8dev_virtual_large",
            "value": round(effL, 4),
            "unit": ("ratio_t1_over_t8 @ 65536x256 (UPPER-BOUNDED by "
                     "host cores: the 1-device run already saturates "
                     "both CPUs via XLA intra-op threads, so >1 here "
                     "means partitioning is net-free at scale; real "
                     "speedup needs real chips — see MULTICHIP dryrun)"),
            "vs_baseline": round(effL, 4),
        })
    except Exception as e:
        emit({
            "metric": "mesh_partition_overhead_ratio_8dev_virtual",
            "value": 0.0, "unit": f"error:{type(e).__name__}",
            "vs_baseline": 0.0})


def _run_pairs_point(n_templates, base, query, baseline, label,
                     length_mix=False):
    from hhsuite_tpu.constants import Parameters
    from hhsuite_tpu.profiling import (disable_stage_timers,
                                       enable_stage_timers)
    from hhsuite_tpu.search.engine import get_database
    from hhsuite_tpu.search.hhblits import run_hhblits

    def run():
        par = Parameters.hhblits_defaults()
        par.nocontxt = True
        par.num_rounds = 1
        return run_hhblits(par, query, get_database(base), "query.a3m")

    tmr0 = enable_stage_timers()
    t0 = time.perf_counter()
    run()                       # warmup: compiles + parse caches
    first = time.perf_counter() - t0
    disable_stage_timers()
    # first-run composition (VERDICT r4 next #5): parse / upload are
    # direct stage timers; compile cannot be isolated from compute
    # inside the device stages, but on the first run the device stage
    # groups are compile-dominated (steady-state compute is the
    # device_s_stages of the timed runs below)
    first_split = {
        "parse_s": round(tmr0.get("host_template_parse", 0.0), 2),
        "upload_s": round(tmr0.get("template_pack_upload", 0.0), 2),
        "device_stages_incl_compile_s": round(sum(
            tmr0.get(k, 0.0) for k in (
                "prefilter_stage1_ungapped", "prefilter_stage2_gapped",
                "viterbi_lanes_sweep", "viterbi_backtrace_pass",
                "viterbi_backtrace_sharded", "viterbi_fetch_wait",
                "posterior_mac_realign_batch")), 2),
    }
    emit({
        "metric": f"first_run_wall_s_{label}",
        "value": round(first, 2),
        "unit": "s (compile+parse+upload)",
        "vs_baseline": 0.0,
        "split": first_split,
    })
    run()
    best = 1e30
    timers = {}
    for _ in range(3):
        tmr = enable_stage_timers()
        t0 = time.perf_counter()
        run()
        wall = time.perf_counter() - t0
        disable_stage_timers()
        if wall < best:
            best, timers = wall, dict(tmr)
    # ---- wall decomposition (VERDICT r4 weak #5 / next #2,#6): only
    # TOP-LEVEL, main-thread, mutually disjoint stage spans are summed,
    # so device_stage_s + host_s == wall exactly and host_s >= 0.
    # (posterior_fetch_wait / host_realign_* accumulate INSIDE
    # posterior_mac_realign_batch — summing them double-counted and
    # produced r4's negative host_s.)  Each group's per-stage value is
    # published so the dominant device stage is visible per point. ----
    groups = {
        "prefilter": ("prefilter_stage1_ungapped",
                      "prefilter_stage2_gapped"),
        "pack_upload": ("template_pack_upload",),
        "sweep": ("viterbi_lanes_sweep",),
        "backtrace": ("viterbi_backtrace_pass",
                      "viterbi_backtrace_sharded", "viterbi_fetch_wait"),
        "realign": ("posterior_mac_realign_batch",),
    }
    stages = {g: round(sum(timers.get(k, 0.0) for k in keys), 3)
              for g, keys in groups.items()}
    device_s = sum(stages.values())
    # informational host-side timers (may overlap each other or nest
    # inside device spans — NOT summed into the decomposition)
    host_stages = {k: round(v, 3) for k, v in sorted(timers.items())
                   if k.startswith("host_")}
    pairs = n_templates / best
    return {
        "metric": f"hhblits_pairs_per_s{'' if label == '512' else '_' + label}",
        "value": round(pairs, 2),
        "unit": ("pairs/s (device_stage_s = disjoint main-thread device"
                 " spans; host_s = wall - device_stage_s)"),
        "vs_baseline": round(pairs / baseline, 4),
        "wall_s": round(best, 3),
        "device_stage_s": round(device_s, 3),
        "host_s": round(best - device_s, 3),
        "device_s_stages": stages,
        "host_s_stages": host_stages,
    }


def bench_tpu_golden():
    """Correctness assertion ON THE REAL CHIP: golden hhsearch on the
    current platform vs reference-binary fixtures (tools/tpu_check.py).
    Verdict goes into the metric stream AND TPU_GOLDEN.json so the
    driver artifact always records whether TPU-compiled kernels produce
    reference-equivalent output (VERDICT r3 missing item #1)."""
    from hhsuite_tpu.tools.tpu_check import run_check

    verdict = run_check()
    if verdict.get("platform") != "cpu":
        # only a real-accelerator run may overwrite the committed
        # hardware-correctness record; a CPU fallback would silently
        # replace it with a verdict that validates nothing on-chip
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "TPU_GOLDEN.json")
        with open(path, "w") as f:
            json.dump(verdict, f, indent=1)
    emit({
        "metric": "tpu_golden_pass",
        "value": 1.0 if verdict.get("pass") else 0.0,
        "unit": f"bool (platform={verdict.get('platform')})",
        "vs_baseline": 1.0 if verdict.get("pass") else 0.0,
    })


def bench_pairs():
    """End-to-end hhblits -n 1 at the 512- and 8192-template points."""
    from hhsuite_tpu.tools.benchdb import build_bench_db

    os.makedirs(BENCH_DB_DIR, exist_ok=True)
    base = os.path.join(BENCH_DB_DIR, "bench")
    query = build_bench_db(base, n_templates=512)

    base8 = os.path.join(BENCH_DB_DIR, "bench8k")
    query8 = build_bench_db(base8, n_templates=8192, length_mix=True)
    line8 = _run_pairs_point(8192, base8, query8,
                             BASELINE_PAIRS_PER_S_8K, "8192",
                             length_mix=True)
    emit(line8)

    line = _run_pairs_point(512, base, query, BASELINE_PAIRS_PER_S,
                            "512")
    emit(line)


if __name__ == "__main__":
    main()
    bench_lanes_floor()
    bench_bt_pipeline()
    bench_prefilter()
    bench_tpu_golden()
    bench_scaling()
    bench_pairs()
    # FINAL line: the headline 512-pt pairs/s metric, with every other
    # metric folded in under "all" — one compact line the driver's tail
    # capture cannot truncate metric-by-metric
    headline = next((m for m in _METRICS
                     if m["metric"] == "hhblits_pairs_per_s"), None)
    final = dict(headline or {"metric": "hhblits_pairs_per_s",
                              "value": 0.0, "unit": "pairs/s",
                              "vs_baseline": 0.0})
    final["all"] = {m["metric"]: {k: v for k, v in m.items()
                                  if k != "metric"}
                    for m in _METRICS}
    print(json.dumps(final, separators=(",", ":")), flush=True)
