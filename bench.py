"""Benchmark: GenEO-preconditioned CG on a high-contrast Laplacian, real TPU.

Metric (BASELINE.json): CG iters to 1e-8 + setup/solve seconds per MDOF
(high-contrast Laplacian).  The hot path runs in float32 on the MXU; an
outer float64 iterative-refinement loop (device-resident, emulated f64)
drives the TRUE residual ||AX - B|| / ||B|| below 1e-8 — the reference's
all-double semantics, the TPU-native way.

The default mode runs BOTH BASELINE.md config #5 views: the 10M-DOF 3D
high-contrast Laplacian scale target ("10m": 64 subdomains, overlap 2,
efficient GenEO (E1), batched matrix-free LOBPCG eigensolves,
fast-diagonalization subdomain solves — the MUMPS-sparse-LU replacement,
src/geneo.cpp:94-124 / :626-780) as the headline value, plus the actual
problem class — 10.5M-DOF 3D Q1 ELASTICITY ("elas10m", vector DOFs,
inexact-Schwarz level-1) — in a subprocess, merged under "elas_*" keys.
Legacy generic-path modes (xlarge/large/medium: the dense-block MatIS
path at 1M/262k/32k DOF in 2D) remain for comparison.

Emission contract (the driver parses the LAST JSON line on stdout and
keeps only the last ~2000 chars of output): EVERY stdout line is a
COMPACT record — short metric string, scalar keys, no roofline object,
no prose — hard-capped at 1800 bytes by ``_emit`` (r03 recorded nothing
because the line never printed; r04 recorded nothing because the final
line was 2.4 kB and the tail capture started mid-string).  The full
records (long metric prose, the roofline/MFU accounting, the complete
elasticity record) are written to ``BENCH_DETAIL.json`` next to this
file after every stage.  The default mode prints a compact line after
EVERY completed stage — insurance, cold pass, steady pass, elasticity,
roofline — each a strict superset of the previous one, so a wall-budget
kill at any point still leaves a valid record.  A BENCH_BUDGET_S guard
(default 500 s) skips later stages and exits 0 before the driver's own
timeout, recording what was skipped under "skipped".

value = (setup + solve) seconds scaled to one MDOF; lower is better.
vs_baseline compares against the per-MDOF wall target for the
reference's BASELINE.md #5 criterion ("beat a 64-rank MPI CPU run"):
a MEASURED single-core CPU anchor of this framework's own f64 path
(tst/cpu_anchor.py, pinned in tst/golden/cpu_anchor.json) divided by 64
ranks at the documented parallel efficiency — falling back to the
legacy 60 s/MDOF peg only when the anchor file is absent.
vs_baseline = target / ours, so > 1.0 means faster than target.
"""

import json
import os
import sys
import time

import numpy as np

VERBOSE = os.environ.get("BENCH_VERBOSE", "1") == "1"
_T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "500"))


def _log(msg):
    if VERBOSE:
        print(f"[bench {time.perf_counter() - _T0:7.2f}s] {msg}",
              file=sys.stderr, flush=True)


def _elapsed():
    return time.perf_counter() - _T0


def _remaining():
    return BUDGET_S - _elapsed()


MAX_LINE_BYTES = 1800   # driver tail capture is 2000 chars; keep margin
_DETAIL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_DETAIL.json")


def _write_detail(rec):
    """Persist the FULL record (long metric prose, roofline object,
    complete elasticity record) to BENCH_DETAIL.json — the stdout lines
    stay compact so the driver's 2000-char tail capture always parses."""
    try:
        with open(_DETAIL_PATH, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
    except Exception as exc:  # noqa: BLE001 — detail file is advisory
        _log(f"detail write failed: {exc!r}")


def _emit(out):
    """Print the record NOW (flushed): early output is the floor the
    driver can always parse, later lines only ever extend it.  Hard
    contract: every stdout line fits the driver's tail capture — shed
    bulky keys (they live in BENCH_DETAIL.json) before printing."""
    line = json.dumps(out)
    if len(line) > MAX_LINE_BYTES:
        out = dict(out)
        for k in ("roofline", "elas_metric", "metric"):
            out.pop(k, None)
            line = json.dumps(out)
            if len(line) <= MAX_LINE_BYTES:
                break
    assert len(line) <= MAX_LINE_BYTES, \
        f"bench stdout line is {len(line)} bytes (cap {MAX_LINE_BYTES})"
    print(line, flush=True)


# keys copied into the compact stdout record (everything else — metric
# prose, roofline, per-phase breakdowns — lives in BENCH_DETAIL.json)
_COMPACT_KEYS = (
    "value", "unit", "vs_baseline", "baseline_target_s_per_mdof", "pass",
    "n_dof", "n_dom", "overlap", "dim_e", "inner_its", "outer_its",
    "true_res", "converged", "setup_s", "solve_s", "eig_s",
    "cold_setup_s", "cold_solve_s", "cold_value",
    "elas_value", "elas_vs_baseline", "elas_n_dof", "elas_dim_e",
    "elas_setup_s", "elas_solve_s", "elas_eig_s", "elas_converged",
    "elas_inner_its", "elas_outer_its", "elas_true_res",
    "pc_apply_gbps", "pc_apply_frac_hbm", "lobpcg_gbps", "status",
    "skipped", "wall_s", "detail",
)

_SHORT_METRIC = ("setup+solve s/MDOF: 10M-DOF 3D high-contrast "
                 "Laplacian (value) + 10.5M-DOF 3D Q1 elasticity "
                 "(elas_value), GenEO+CG to true 1e-8 on TPU; full "
                 "prose+roofline in BENCH_DETAIL.json")


def _compact(rec):
    out = {"metric": _SHORT_METRIC}
    for k in _COMPACT_KEYS:
        if k in rec:
            out[k] = rec[k]
    rl = rec.get("roofline") or {}
    if "pc_apply" in rl:
        out["pc_apply_gbps"] = rl["pc_apply"].get("achieved_gbps")
        out["pc_apply_frac_hbm"] = rl["pc_apply"].get("frac_of_hbm_peak")
    if "lobpcg_step" in rl:
        out["lobpcg_gbps"] = rl["lobpcg_step"].get("achieved_gbps")
    out["detail"] = "BENCH_DETAIL.json"
    return out


def _emit_stage(rec):
    """Stage emitter for the default mode: full record to the detail
    file, compact superset line to stdout."""
    _write_detail(rec)
    _emit(_compact(rec))


def baseline_target():
    """Per-MDOF wall target for vs_baseline: measured CPU anchor / 64
    ranks at the pinned efficiency (tst/cpu_anchor.py), else the legacy
    60 s/MDOF peg."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tst", "golden", "cpu_anchor.json")
    try:
        with open(path) as f:
            a = json.load(f)
        return float(a["target_s_per_mdof"]), (
            f"measured single-core CPU anchor {a['anchor_s_per_mdof']} "
            f"s/MDOF ({a['config']}) / 64 ranks @ "
            f"{a['parallel_efficiency']} efficiency")
    except Exception:  # noqa: BLE001 — peg is the documented fallback
        return 60.0, "legacy 60 s/MDOF peg (anchor file absent)"


def _start_warmup():
    """Warm the compile service + device->host pull path in the
    background: the FIRST compile RPC and the FIRST pull in a process pay
    a one-time service init (observed minutes in bad weather on tunneled
    platforms); overlapping it with host-side problem construction hides
    part of the wall (the thread blocks on the RPC and releases the GIL).
    Returns the thread — callers JOIN it before starting any timed phase
    so the one-time service init is never misattributed to rhs/setup
    (round-2's 71.5 s "rhs_s" was this init, not the matvec)."""
    import threading

    import jax
    import jax.numpy as jnp

    def _warm():
        ids = jnp.asarray(np.arange(64, dtype=np.int32) % 16)

        def tiny(xw):
            return jax.ops.segment_sum(xw[ids], ids, num_segments=17)

        r = jax.jit(tiny)(jnp.ones(64, jnp.float32))
        jax.block_until_ready(r)
        np.asarray(r)
        # one f64 emulated op: the x64 lowering path has its own first-use
        # cost on tunneled platforms
        r64 = jax.jit(lambda v: v * v + 1.0)(
            jnp.ones(8, jnp.float64))
        jax.block_until_ready(r64)
        _log("device warm-up (compile service + pull path) finished")

    th = threading.Thread(target=_warm, daemon=True)
    th.start()
    return th


def bench_structured(size, dom_g, overlap, emit=None, budget_guard=True):
    """BASELINE #5: 3D high-contrast structured GenEO at scale.

    Returns (record, steady_output_or_None); calls ``emit(record)`` with
    an insurance record as soon as the cold pass completes."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # x64 for the device-resident f64 refinement; every hot-path dtype is
    # an explicit f32, so the MXU path is unaffected
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from geneo4petsc_tpu.config import GenEOOptions, KSPOptions
    from geneo4petsc_tpu.structured.grid import laplacian_grid
    from geneo4petsc_tpu.structured.solve import solve_structured

    warm = _start_warmup()

    _log(f"building {size}^3 grid")
    t0 = time.perf_counter()
    grid = laplacian_grid(size, dim=3, kappa_max=10000.0, interp="minmax")
    t_gen = time.perf_counter() - t0
    warm.join()

    opts = GenEOOptions()
    opts.lvl1 = os.environ.get("BENCH_LVL1", "ASM")
    opts.lvl2 = os.environ.get("BENCH_LVL2", "E1")
    opts.els2.type = "lobpcg"
    opts.els2.max_it = int(os.environ.get("BENCH_EIG_IT", "50"))
    opts.cut = int(os.environ.get("BENCH_CUT", "2"))
    # keep the live tau-pencil arrays for the roofline's lobpcg_step
    # entry (measured on the REAL solve operators, VERDICT r04 #4)
    os.environ.setdefault("GENEO_KEEP_PENCILS", "1")
    # block-layout inner iteration (structured/blockmode.py): the
    # r05 probe measured the global<->brick transposes as the
    # per-iteration wall; BENCH_BLOCK=0 reverts to the global layout
    os.environ.setdefault("GENEO_BLOCK_LAYOUT",
                          os.environ.get("BENCH_BLOCK", "1"))

    _log(f"solving: n={grid.n_nodes}, {dom_g}^3 domains, overlap {overlap}, "
         f"GenEO-{opts.lvl1},{opts.lvl2}")

    def run_once(tag):
        out = solve_structured(grid, (dom_g, dom_g, dom_g), overlap,
                               geneo=opts, ksp=KSPOptions(type="cg"),
                               tol=1e-8)
        _log(f"{tag} solve done")
        _log(f"{tag} timers: " + json.dumps(
            {k: round(v, 2) for k, v in sorted(out.timers.phases.items())}))
        return out

    n = grid.n_nodes
    mdof = n / 1e6
    target, target_note = baseline_target()

    def record(out, pass_name):
        x_true = jnp.arange(1.0, n + 1, dtype=jnp.float64)
        err = float(jnp.max(jnp.abs(jnp.asarray(out.x) - x_true))) / n
        t_setup = out.timers.get("setup")
        t_solve = out.timers.get("solve")
        per_mdof = (t_setup + t_solve) / mdof
        return {
            "metric": "setup+solve sec per MDOF, 10M-DOF 3D "
                      "high-contrast Laplacian, "
                      f"GenEO-{opts.lvl1},{opts.lvl2}+CG to true 1e-8 "
                      "(structured FDM/LOBPCG backend; value = "
                      f"{pass_name} pass" + (
                          ", full setup+solve recomputed, only "
                          "compile-service RPCs amortized — cold pass "
                          "under cold_*" if pass_name == "steady"
                          else "") + f"; vs_baseline target from "
                      f"{target_note})",
            "value": round(per_mdof, 3),
            "unit": "s/MDOF",
            "vs_baseline": round(target / per_mdof, 3),
            "baseline_target_s_per_mdof": round(target, 3),
            "pass": pass_name,
            "n_dof": n,
            "n_dom": dom_g ** 3,
            "overlap": overlap,
            "dim_e": int(out.stats.real_dim_e.sum()),
            "inner_its": out.refined.inner_its,
            "outer_its": out.refined.outer_its,
            "true_res": out.true_res,
            "rel_err_max": err,
            "converged": bool(out.converged),
            "setup_s": round(t_setup, 3),
            "solve_s": round(t_solve, 3),
            "partition_s": round(out.timers.get("partition"), 3),
            "rhs_s": round(out.timers.get("createA"), 3),
            "generator_s": round(t_gen, 3),
            "eig_s": round(out.timers.get("l2_eig"), 3),
            "device": str(jax.devices()[0]),
        }

    # cold pass: pays every compile-service round trip (executable
    # compile/load RPCs through the tunnel — minutes of non-compute wall,
    # wildly weather-dependent); steady pass: every executable resident,
    # the wall is actual device compute + transfers.  Setup (LOBPCG, Z,
    # E, factors) and solve re-run IN FULL — nothing numerical is reused.
    cold_out = run_once("cold")
    rec = record(cold_out, "cold")
    rec["cold_setup_s"] = rec["setup_s"]
    rec["cold_solve_s"] = rec["solve_s"]
    rec["cold_value"] = rec["value"]
    if emit:
        emit(dict(rec, skipped=["steady_pass"]))   # insurance line
    cold = cold_out.timers
    del cold_out
    import gc
    gc.collect()                  # drop the cold pass's device buffers

    # steady pass only when it fits the wall budget (observed steady
    # wall ~ 25-45 s at 10M; leave headroom for the emit + roofline)
    if budget_guard and _remaining() < 90:
        _log(f"budget: skipping steady pass ({_remaining():.0f}s left)")
        rec["skipped"] = ["steady_pass"]
        return rec, None, grid
    out = run_once("steady")
    rec = record(out, "steady")
    rec["cold_setup_s"] = round(cold.get("setup"), 3)
    rec["cold_solve_s"] = round(cold.get("solve"), 3)
    rec["cold_value"] = round((cold.get("setup")
                               + cold.get("solve")) / mdof, 3)
    return rec, out, grid


def _structured_roofline(rec, out, grid, dom_g, overlap, budget_s=None):
    """Attach roofline/MFU accounting for the hot kernels (advisory —
    never fails the bench)."""
    try:
        from geneo4petsc_tpu.utils import roofline as rl
        if budget_s is None:
            budget_s = max(_remaining() - 30, 10)
        # LIVE pencils first (GENEO_KEEP_PENCILS=1 stashes the solve's
        # own tau-pencil arrays on the stats — no rebuild, no extra HBM,
        # valid at any scale); fall back to the rebuild below 4M nodes.
        pencils = getattr(getattr(out, "stats", None), "pencils", None)
        # Pencil rebuild allocates a second set of full-scale fields next
        # to the live solve buffers — at 10M DOF that exhausts v5e HBM
        # (observed ResourceExhausted); the LOBPCG kernel roofline is
        # measured at 1M via `bench.py 3d1m` instead.  The rebuild is
        # gated on (and billed against) the SAME budget the measurement
        # phase gets (ADVICE r04 #2).
        if pencils is None and budget_s > 60 and grid.n_nodes <= 4_000_000:
            t_pb = time.perf_counter()
            try:
                pencils = rl_structured_pencils(grid, dom_g, overlap,
                                                out.pc)
            except Exception as exc:  # noqa: BLE001
                _log(f"roofline pencils skipped: {exc!r}")
            budget_s -= time.perf_counter() - t_pb
        # measure the apply path the solve actually ran: the block-mode
        # wrapper shares every factor with out.pc (one extra small
        # stencil field set)
        blk = None
        if os.environ.get("GENEO_BLOCK_LAYOUT") == "1":
            try:
                import jax.numpy as _jnp

                from geneo4petsc_tpu.structured.blockmode import \
                    build_block_mode
                from geneo4petsc_tpu.structured.decompose import \
                    StructuredDecomposition
                sd_rl = StructuredDecomposition(grid, (dom_g,) * 3,
                                                overlap)
                blk = build_block_mode(out.pc, sd_rl, dtype=_jnp.float32)
            except Exception as exc:  # noqa: BLE001 — advisory
                _log(f"roofline block wrapper skipped: {exc!r}")
        rec["roofline"] = rl.measure_structured(
            out.pc, pencils=pencils,
            solve_s=rec["solve_s"], inner_its=rec["inner_its"],
            budget_s=max(budget_s, 5), blk=blk)
        _log("roofline: " + json.dumps(rec["roofline"]))
    except Exception as exc:  # noqa: BLE001 — roofline is advisory
        rec["roofline_error"] = repr(exc)
        _log(f"roofline failed: {exc!r}")
    return rec


def rl_structured_pencils(grid, dom_g, overlap, pc, k=8):
    """Rebuild the GenEO-1 pencils (A_Neu, D A_Dir D) for the LOBPCG
    step measurement — the same construction as setup_structured
    (structured/geneo.py), on the live grid."""
    import jax.numpy as jnp

    from geneo4petsc_tpu.structured import local_ops as lo
    from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
    from geneo4petsc_tpu.structured.solvers import diag_congruence

    sd = StructuredDecomposition(grid, (dom_g,) * 3, overlap)
    pad1 = tuple(p + 1 if g > 1 else 0
                 for p, g in zip(sd.pad, sd.dom_grid))
    f = lo.slice_inner(lo.gather_fields(sd, dtype=jnp.float32, pad=pad1),
                       sd)
    maskf = f.mask.astype(jnp.float32)
    pou_b = jnp.where(f.mask, 1.0 / jnp.maximum(f.mult, 1.0),
                      0.0).astype(jnp.float32)
    neu = lo.neumann_stencil(f)
    b_dad = diag_congruence(lo.dirichlet_stencil(f), pou_b)
    return (neu, b_dad, maskf, pc.l1, k)


def bench_nonsep(size, dom_g, overlap):
    """BASELINE #5 problem class, scalar form: 10M-DOF 3D Laplacian with
    a NON-SEPARABLE high-contrast coefficient field (spherical
    inclusions) — the FDM fast path cannot factor it, so the general
    inexact solvers (surrogate-FDM-preconditioned PCG, solvers.py) carry
    the level-1 and shift-invert solves, as MUMPS does for arbitrary
    subdomains in the reference (src/geneo.cpp:94-124)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_enable_x64", True)

    from geneo4petsc_tpu.config import GenEOOptions, KSPOptions
    from geneo4petsc_tpu.structured.grid import inclusion_grid
    from geneo4petsc_tpu.structured.solve import solve_structured

    warm = _start_warmup()
    _log(f"building {size}^3 non-separable inclusion grid")
    t0 = time.perf_counter()
    grid = inclusion_grid(size, dim=3, kappa_max=10000.0, n_inc=27)
    t_gen = time.perf_counter() - t0
    warm.join()

    opts = GenEOOptions()
    opts.lvl1 = os.environ.get("BENCH_LVL1", "ASM")
    opts.lvl2 = os.environ.get("BENCH_LVL2", "E1")
    opts.els2.type = "lobpcg"
    opts.els2.max_it = int(os.environ.get("BENCH_EIG_IT", "50"))
    opts.cut = int(os.environ.get("BENCH_CUT", "2"))
    opts.dls1.rtol = float(os.environ.get("BENCH_DLS1_RTOL", "0.05"))
    opts.dls1.max_it = int(os.environ.get("BENCH_DLS1_IT", "40"))

    _log(f"solving: n={grid.n_nodes}, {dom_g}^3 domains, overlap "
         f"{overlap}, GenEO-{opts.lvl1},{opts.lvl2} (inexact Schwarz)")

    def run_once(tag):
        out = solve_structured(grid, (dom_g, dom_g, dom_g), overlap,
                               geneo=opts, ksp=KSPOptions(type="cg"),
                               tol=1e-8)
        _log(f"{tag} solve done")
        _log(f"{tag} timers: " + json.dumps(
            {k: round(v, 2) for k, v in sorted(out.timers.phases.items())}))
        return out

    cold = run_once("cold").timers   # pays compile-service RPCs (10m mode)
    import gc
    gc.collect()                  # drop the cold pass's device buffers
    out = run_once("steady")

    import jax.numpy as jnp
    n = grid.n_nodes
    x_true = jnp.arange(1.0, n + 1, dtype=jnp.float64)
    err = float(jnp.max(jnp.abs(jnp.asarray(out.x) - x_true))) / n
    t_setup = out.timers.get("setup")
    t_solve = out.timers.get("solve")
    per_mdof = (t_setup + t_solve) / (n / 1e6)
    target, target_note = baseline_target()
    return {
        "metric": "setup+solve sec per MDOF, 10M-DOF 3D NON-SEPARABLE "
                  "high-contrast Laplacian (spherical inclusions), "
                  f"GenEO-{opts.lvl1},{opts.lvl2}+flexible-CG to true "
                  "1e-8 (inexact-Schwarz surrogate-PCG backend; "
                  "steady-state = 2nd in-process run, full setup+solve "
                  "recomputed, compile-service RPCs amortized — cold "
                  "pass under cold_*; vs_baseline target from "
                  f"{target_note})",
        "value": round(per_mdof, 3),
        "unit": "s/MDOF",
        "vs_baseline": round(target / per_mdof, 3),
        "n_dof": n, "n_dom": dom_g ** 3, "overlap": overlap,
        "dim_e": int(out.stats.real_dim_e.sum()),
        "inner_its": out.refined.inner_its,
        "outer_its": out.refined.outer_its,
        "true_res": out.true_res, "rel_err_max": err,
        "converged": bool(out.converged),
        "setup_s": round(t_setup, 3), "solve_s": round(t_solve, 3),
        "rhs_s": round(out.timers.get("createA"), 3),
        "generator_s": round(t_gen, 3),
        "eig_s": round(out.timers.get("l2_eig"), 3),
        "cold_setup_s": round(cold.get("setup"), 3),
        "cold_solve_s": round(cold.get("solve"), 3),
        "cold_value": round((cold.get("setup")
                             + cold.get("solve")) / (n / 1e6), 3),
        "device": str(jax.devices()[0]),
    }


def bench_elastic(size, dom_g, overlap, in_process=False):
    """BASELINE #5's actual problem class: 10M-DOF 3D Q1 ELASTICITY
    (3 DOF/node, heterogeneous modulus) on the structured vector backend
    (structured/elastic.py) — batched local eigensolves pick up the
    rigid-body modes, the coarse E is replicated, deflated flexible CG
    converges to true 1e-8.

    in_process=True (the default mode's first choice): jax is already
    initialized and warm — skip config/warm-up AND the cold pass.  This
    saves the subprocess's own compile-service init (measured 130-310 s
    of per-process tunnel tax — the wall that starved the elasticity
    record in r03/r04); the caller frees the headline's device buffers
    first and falls back to the subprocess on ResourceExhausted."""
    import jax

    if not in_process:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_enable_x64", True)

    from geneo4petsc_tpu.config import GenEOOptions
    from geneo4petsc_tpu.structured.elastic import (elastic_grid,
                                                    solve_elastic)

    warm = None if in_process else _start_warmup()
    _log(f"building {size}^3-node elasticity problem")
    t0 = time.perf_counter()
    # spring at the modulus scale: a soft clamp leaves the global
    # operator near-singular (residual 1e-8 then admits O(1) error in
    # the near-rigid boundary modes)
    grid = elastic_grid(size, kappa_max=10000.0, interp="minmax",
                        spring=10000.0)
    t_gen = time.perf_counter() - t0
    if warm is not None:
        warm.join()

    opts = GenEOOptions()
    opts.lvl1 = os.environ.get("BENCH_LVL1", "ASM")
    opts.lvl2 = os.environ.get("BENCH_LVL2", "E1")
    opts.els2.type = "lobpcg"
    opts.els2.max_it = int(os.environ.get("BENCH_EIG_IT", "60"))
    # >= 6 rigid modes per floating domain + high-contrast margin
    opts.cut = int(os.environ.get("BENCH_CUT", "8"))
    opts.dls1.rtol = float(os.environ.get("BENCH_DLS1_RTOL", "0.05"))
    opts.dls1.max_it = int(os.environ.get("BENCH_DLS1_IT", "40"))

    _log(f"solving: n_dof={grid.n_dof}, {dom_g}^3 domains, overlap "
         f"{overlap}, GenEO-{opts.lvl1},{opts.lvl2}")

    def run_once(tag):
        out = solve_elastic(grid, (dom_g, dom_g, dom_g), overlap, opts,
                            tol=1e-8)
        _log(f"{tag} solve done")
        _log(f"{tag} timers: " + json.dumps(
            {k: round(v, 2) for k, v in sorted(out.timers.phases.items())}))
        return out

    # fast path (BENCH_SKIP_COLD=1 or in-process): ONE pass against the
    # persistent compile cache — the cold story is already covered by
    # the Laplacian headline, and the elasticity record must fit the
    # driver wall budget
    skip_cold = in_process or os.environ.get("BENCH_SKIP_COLD") == "1"
    cold = None
    if not skip_cold:
        cold = run_once("cold").timers  # pays compile-service RPCs
        import gc
        gc.collect()              # drop the cold pass's device buffers
    out = run_once("steady" if not skip_cold else "single")

    import jax.numpy as jnp
    n = grid.n_dof
    x_true = jnp.arange(1.0, n + 1, dtype=jnp.float64)
    err = float(jnp.max(jnp.abs(jnp.asarray(out.x) - x_true))) / n
    t_setup = out.timers.get("setup")
    t_solve = out.timers.get("solve")
    per_mdof = (t_setup + t_solve) / (n / 1e6)
    target, target_note = baseline_target()
    pass_note = ("single pass, persistent compile cache warm"
                 if skip_cold else
                 "steady-state = 2nd in-process run, full setup+solve "
                 "recomputed, compile-service RPCs amortized — cold "
                 "pass under cold_*")
    rec = {
        "metric": "setup+solve sec per MDOF, 10M-DOF 3D Q1 ELASTICITY "
                  "(3 dof/node, high-contrast modulus), "
                  f"GenEO-{opts.lvl1},{opts.lvl2}+flexible-CG to true "
                  f"1e-8 (structured vector backend; {pass_note}; "
                  f"vs_baseline target from {target_note})",
        "value": round(per_mdof, 3),
        "unit": "s/MDOF",
        "vs_baseline": round(target / per_mdof, 3),
        "n_dof": n, "n_dom": dom_g ** 3, "overlap": overlap,
        "dim_e": int(out.stats.real_dim_e.sum()),
        "inner_its": out.refined.inner_its,
        "outer_its": out.refined.outer_its,
        "true_res": out.true_res, "rel_err_max": err,
        "converged": bool(out.converged),
        "setup_s": round(t_setup, 3), "solve_s": round(t_solve, 3),
        "rhs_s": round(out.timers.get("createA"), 3),
        "generator_s": round(t_gen, 3),
        "eig_s": round(out.timers.get("l2_eig"), 3),
        "device": str(jax.devices()[0]),
    }
    if cold is not None:
        rec["cold_setup_s"] = round(cold.get("setup"), 3)
        rec["cold_solve_s"] = round(cold.get("solve"), 3)
        rec["cold_value"] = round((cold.get("setup")
                                   + cold.get("solve")) / (n / 1e6), 3)
    return rec


def bench_sharded(size, dom_g, overlap, n_devices=1):
    """The multi-device plumbing on real hardware: solve_structured
    routed through shard_structured on an n-device mesh (1 device on the
    tunneled chip — the sharded code path itself, XLA SPMD partitioner
    included, is what this exercises; tests/test_cli_multidevice.py runs
    the same route on the 8-virtual-device CPU mesh)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from geneo4petsc_tpu.config import GenEOOptions, KSPOptions
    from geneo4petsc_tpu.structured.grid import laplacian_grid
    from geneo4petsc_tpu.structured.solve import solve_structured

    warm = _start_warmup()
    grid = laplacian_grid(size, dim=3, kappa_max=10000.0, interp="minmax")
    warm.join()
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "ASM", "E1"
    opts.els2.type = "lobpcg"
    opts.cut = 2

    def run_once(tag):
        out = solve_structured(grid, (dom_g,) * 3, overlap, geneo=opts,
                               ksp=KSPOptions(type="cg"), tol=1e-8,
                               n_devices=n_devices)
        _log(f"{tag} sharded solve done: " + json.dumps(
            {k: round(v, 2) for k, v in sorted(out.timers.phases.items())}))
        return out

    run_once("cold")
    out = run_once("steady")
    n = grid.n_nodes
    x_true = jnp.arange(1.0, n + 1, dtype=jnp.float64)
    err = float(jnp.max(jnp.abs(jnp.asarray(out.x) - x_true))) / n
    per_mdof = (out.timers.get("setup") + out.timers.get("solve")) / (n / 1e6)
    target, _note = baseline_target()
    return {
        "metric": f"setup+solve sec per MDOF, {size}^3 3D high-contrast "
                  f"Laplacian on a {n_devices}-device mesh "
                  "(z-slab sharded vectors, chunk-sharded domain batch, "
                  "XLA SPMD collectives; steady pass)",
        "value": round(per_mdof, 3), "unit": "s/MDOF",
        "vs_baseline": round(target / per_mdof, 3),
        "n_dof": n, "n_dom": dom_g ** 3, "n_devices": n_devices,
        "inner_its": out.refined.inner_its,
        "true_res": out.true_res, "rel_err_max": err,
        "converged": bool(out.converged),
        "setup_s": round(out.timers.get("setup"), 3),
        "solve_s": round(out.timers.get("solve"), 3),
        "device": str(jax.devices()[0]),
    }


def bench_generic(size, n_grid, large):
    """Legacy generic-path (dense-block MatIS) bench — 2D at <= 1M DOF."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from geneo4petsc_tpu.assembly.assemble import assemble
    from geneo4petsc_tpu.config import GenEOOptions
    from geneo4petsc_tpu.krylov.refine import (make_pc_inner_solver,
                                               refined_solve)
    from geneo4petsc_tpu.models import laplacian
    from geneo4petsc_tpu.partition.decompose import decompose_nodal_fast
    from geneo4petsc_tpu.partition.kway import partition_structured_grid
    from geneo4petsc_tpu.precond.geneo import setup_geneo

    _start_warmup()
    dtype = jnp.float32
    n_dom = n_grid * n_grid

    _log(f"generating mesh size={size}")
    t0 = time.perf_counter()
    mesh = laplacian.get_input(
        f"--size {size} --dim 2 --kappa 10000. minmax")
    t_gen = time.perf_counter() - t0

    _log(f"mesh n={mesh.n_nodes}; partitioning into {n_dom} domains")
    t0 = time.perf_counter()
    node_part = partition_structured_grid((size, size), (n_grid, n_grid))
    decomp = decompose_nodal_fast(mesh, node_part, n_dom)
    t_part = time.perf_counter() - t0

    _log("assembling")
    t0 = time.perf_counter()
    ap = assemble(mesh, decomp, dtype=dtype)
    t_asm = time.perf_counter() - t0

    _log(f"n_max={ap.batch.n_max}; GenEO setup")
    t0 = time.perf_counter()
    opts = GenEOOptions()
    opts.lvl1 = os.environ.get("BENCH_LVL1", "ASM")
    opts.lvl2 = os.environ.get("BENCH_LVL2", "E1")
    opts.dls1.type = "inverse"
    if large:
        opts.els2.type = "lobpcg"
        opts.cut = 4
    pc, stats = setup_geneo(ap.batch, opts, decomp=decomp, a_csr=ap.a_csr)
    jax.block_until_ready(pc.z_loc)
    t_setup = time.perf_counter() - t0

    n = mesh.n_nodes
    x_true = np.arange(1.0, n + 1)
    b = np.asarray(ap.a_csr @ x_true)

    def residual64(x):
        return b - ap.a_csr @ x

    _log(f"setup done dimE={int(stats.real_dim_e.sum())}; compiling solver")
    inner = make_pc_inner_solver(pc)

    t0 = time.perf_counter()
    r0 = refined_solve(None, None, b, residual64, tol=1e-8,
                       max_outer=14, inner_solver=inner)
    t_compile_and_first = time.perf_counter() - t0
    del r0

    _log("warm solve done; timing solve")
    t0 = time.perf_counter()
    r = refined_solve(None, None, b, residual64, tol=1e-8,
                      max_outer=14, inner_solver=inner)
    t_solve = time.perf_counter() - t0
    _log("done")

    err = float(np.abs(r.x - x_true).max() / n)
    mdof = n / 1e6
    per_mdof = (t_setup + t_solve) / mdof

    return {
        "metric": "setup+solve sec per MDOF, high-contrast 2D Laplacian, "
                  f"GenEO-{opts.lvl1},{opts.lvl2}+CG to true 1e-8 "
                  "(generic dense-block path)",
        "value": round(per_mdof, 3),
        "unit": "s/MDOF",
        "vs_baseline": round(baseline_target()[0] / per_mdof, 3),
        "n_dof": n,
        "n_dom": n_dom,
        "dim_e": int(stats.real_dim_e.sum()),
        "inner_its": r.inner_its,
        "outer_its": r.outer_its,
        "true_res": r.true_res,
        "rel_err_max": err,
        "converged": bool(r.converged),
        "setup_s": round(t_setup, 3),
        "solve_s": round(t_solve, 3),
        "compile_s": round(t_compile_and_first - t_solve, 3),
        "partition_s": round(t_part, 3),
        "assemble_s": round(t_asm, 3),
        "generator_s": round(t_gen, 3),
        "device": str(jax.devices()[0]),
    }


def _run_submode(mode, timeout=5400, env_extra=None):
    """Run one bench mode in a SUBPROCESS and parse its JSON line.

    Isolation matters twice over: the 10M-DOF passes leave multi-GB of
    device buffers + executable scratch reservations that a second
    same-process 10M problem then fights (observed ResourceExhausted),
    and a fresh process re-validates the persistent-compile-cache story
    the steady pass claims.  Returns None on failure (the default mode
    degrades to the headline-only record rather than dying)."""
    import subprocess
    env = dict(os.environ)
    env.update(env_extra or {})
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            capture_output=True, text=True, timeout=timeout, env=env)
        for line in reversed(r.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        _log(f"submode {mode} produced no JSON (rc={r.returncode}): "
             f"{r.stderr[-2000:]}")
    except Exception as exc:  # noqa: BLE001 — headline must still print
        _log(f"submode {mode} failed: {exc}")
    return None


def _default_mode():
    """Headline (BASELINE #5 scale target): 10M-DOF separable Laplacian
    in-process; then BASELINE #5's actual problem class — 10.5M-DOF 3D
    Q1 elasticity — in a subprocess (single warm-cache pass, merged
    under "elas_*"); then the roofline with whatever budget remains.
    Elasticity runs BEFORE the roofline: r03/r04 both starved it behind
    advisory stages.  Stdout carries only compact lines (_emit contract);
    the full records land in BENCH_DETAIL.json."""
    skipped = []
    # stage-0 insurance: r03's cold pass alone consumed the driver's
    # wall budget (524 s of tunnel weather) and NOTHING was recorded.
    # A null-value line with the failure mode spelled out is the floor.
    _emit({
        "metric": _SHORT_METRIC,
        "value": None, "unit": "s/MDOF", "vs_baseline": None,
        "status": "INCOMPLETE: killed during the first (cold) 10M pass "
                  "— compile-service weather exceeded the wall budget; "
                  "see cold_* history in BENCH_r03/ROUND3_NOTES",
    })
    rec, steady, grid = bench_structured(216, 4, 2, emit=_emit_stage)
    if steady is None:
        skipped.append("steady_pass")
    rec["skipped"] = skipped
    _emit_stage(rec)                          # the headline line
    _log(f"headline emitted at {_elapsed():.0f}s "
         f"(budget {BUDGET_S:.0f}s)")
    import gc

    # how much wall the in-process elasticity pass needs (single pass,
    # persistent cache warm, NO second compile-service init)
    elas_need = float(os.environ.get("BENCH_ELAS_NEED_S", "150"))

    # roofline first but strictly CAPPED so it can never starve the
    # elasticity record (r03/r04's failure mode): it runs only when the
    # leftover covers elas_need PLUS a meaningful measurement, and its
    # budget is clipped against the reservation.  It must run before
    # the elasticity stage because it measures the LIVE steady-pass
    # operators (freed below to make room for the 10.5M problem).
    if steady is not None and _remaining() - elas_need > 45:
        rec = _structured_roofline(
            rec, steady, grid, 4, 2,
            budget_s=min(_remaining() - elas_need, 120))
        _emit_stage(rec)
    else:
        skipped.append("roofline")
        rec["skipped"] = skipped
        _emit_stage(rec)
    del steady, grid
    gc.collect()

    # elasticity IN-PROCESS (first choice): skips the subprocess's own
    # 130-310 s compile-service init; the headline buffers were just
    # freed.  Subprocess fallback on device-memory pressure.
    elas = None
    if _remaining() > 45:
        try:
            elas = bench_elastic(152, 4, 2, in_process=True)
        except Exception as exc:  # noqa: BLE001 — RESOURCE_EXHAUSTED etc.
            _log(f"in-process elas failed ({exc!r}); "
                 f"subprocess fallback")
            gc.collect()
            if _remaining() > 60:
                elas = _run_submode(
                    "elas10m", timeout=max(_remaining() - 15, 60),
                    env_extra={"BENCH_SKIP_COLD": "1"})
        if elas is not None:
            for k in ("value", "vs_baseline", "n_dof", "dim_e",
                      "true_res", "converged", "setup_s", "solve_s",
                      "eig_s", "outer_its", "inner_its"):
                if k in elas:
                    rec[f"elas_{k}"] = elas[k]
            rec["elas_metric"] = elas.get("metric", "")
        else:
            skipped.append("elas10m (failed/timed out)")
    else:
        skipped.append("elas10m (wall budget)")
    rec["skipped"] = skipped
    rec["wall_s"] = round(_elapsed(), 1)
    _write_detail(rec)
    _emit(_compact(rec))                      # final, most complete line


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "default"
    if mode == "default":
        _default_mode()
        return
    if mode == "10m":
        # BASELINE #5 scale: 10,077,696 DOF (216^3), 64 domains, overlap 2
        out, steady, grid = bench_structured(216, 4, 2, emit=_emit,
                                             budget_guard=False)
        if steady is not None:
            out = _structured_roofline(out, steady, grid, 4, 2)
    elif mode == "nonsep10m":
        # BASELINE #5 problem class, scalar: non-separable coefficients
        out = bench_nonsep(216, 4, 2)
    elif mode == "nonsep1m":
        out = bench_nonsep(108, 4, 2)
    elif mode == "elas10m":
        # BASELINE #5 problem class: 10.5M-DOF vector elasticity
        # (152^3 nodes x 3 components, 4^3 domains)
        out = bench_elastic(152, 4, 2)
    elif mode == "elas1m":
        out = bench_elastic(72, 4, 2)
    elif mode == "sharded1m":
        out = bench_sharded(108, 4, 2, n_devices=1)
    elif mode == "3d1m":
        out, steady, grid = bench_structured(108, 4, 2, budget_guard=False)
        if steady is not None:
            out = _structured_roofline(out, steady, grid, 4, 2)
    elif mode in ("xlarge", "large", "medium"):
        size, n_grid = {"xlarge": (1000, 64), "large": (512, 32),
                        "medium": (180, 16)}[mode]
        out = bench_generic(size, n_grid, mode in ("large", "xlarge"))
    else:
        size = int(sys.argv[1])
        g = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        out, _steady, _g = bench_structured(size, g, 2,
                                            budget_guard=False)
    _emit(out)


if __name__ == "__main__":
    main()
