"""Roofline / MFU accounting for the structured hot kernels.

The reference asserts "fast" implicitly (beat a 64-rank MPI CPU run,
BASELINE.md #5); on TPU the honest form of that claim is a roofline:
analytic bytes moved + FLOPs per kernel invocation vs measured device
time, expressed as a fraction of the chip's HBM bandwidth / MXU peak.
The three hot kernels (SURVEY.md §3.3 / §3.2):

  * ``stencil_matvec`` — the global 7-point SpMV, one per Krylov
    iteration (MatMult role, src/geneo4PETSc.cpp:1233-1281);
  * ``fdm_apply`` — the batched fast-diagonalization subdomain solve,
    both the level-1 M^-1 (directLocalSolve role, src/geneo.cpp:94-124)
    and the LOBPCG shift-invert preconditioner T;
  * ``pc_apply`` — the full per-iteration preconditioner
    (applyGenEOPC, src/geneo.cpp:2051-2098);
  * ``lobpcg_step`` — one iteration of the batched matrix-free LOBPCG
    (the ARPACK-EPSSolve role, src/geneo.cpp:626-780), measured on the
    real GenEO pencils when the caller provides them.

Byte/FLOP models are stated per kernel in the emitted dict (``model``
key) — they are analytic lower bounds on HBM traffic (perfect reuse of
anything that fits in VMEM), so ``frac_of_peak`` is a conservative
fraction: real traffic can only be higher.

All stencil kernels here are bandwidth-bound (arithmetic intensity
< 1 FLOP/byte); fdm_apply is the only MXU-bound one, so it also reports
``achieved_gflops`` against the f32 matmul peak.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

# Chip peaks. HBM GB/s and *f32* matmul TFLOPs (the FDM transforms run
# in f32 on the MXU via multi-pass; bf16 peak given for context).
# Sources: public TPU spec sheets (v5e: 819 GB/s, 197 bf16 TFLOPs;
# v5p: 2765 GB/s, 459 bf16 TFLOPs); f32 ≈ bf16/4 (6-pass ≈ /6, 3-pass
# ≈ /3 — we use /4 as the conventional midpoint).
_PEAKS = {
    "v5 lite": {"hbm_gbps": 819.0, "bf16_tflops": 197.0},
    "v5e": {"hbm_gbps": 819.0, "bf16_tflops": 197.0},
    "v5p": {"hbm_gbps": 2765.0, "bf16_tflops": 459.0},
    "v4": {"hbm_gbps": 1228.0, "bf16_tflops": 275.0},
}


def device_peaks() -> dict | None:
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return dict(peaks, kind=kind)
    return None


def _time_fn(fn, *args, reps: int = 10) -> float:
    """MIN wall of ``fn(*args)`` with block_until_ready, after one warm
    call (compile + cache load excluded).  Min, not median: the wall of
    one dispatch = device time + host/tunnel overhead, and overhead is
    strictly additive — the smallest sample is the least-contended one.
    (Medians on a contended 1-core host produced 27 ms/step phantoms for
    kernels whose true device time is < 50 us — tst/probe_hotpath.py.)"""
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def _time_step(step, op, x, reps: int = 5, lo: int = 2,
               hi: int = 22) -> float:
    """True per-invocation DEVICE time of ``step(op, x) -> y`` (same
    shape/dtype as x): run a fori_loop chain of the step at two lengths
    inside single jits and difference.  A single dispatched call cannot
    resolve sub-ms kernels here — on tunneled platforms each dispatch
    pays a ~20 ms RPC floor that would swamp the measurement (observed:
    27 ms "matvec" at 1M DOF whose device time is < 1 ms).  The chain
    length escalates until the delta clears the RPC jitter (fast kernels
    at small sizes otherwise difference to noise)."""
    from functools import partial

    @partial(jax.jit, static_argnames=("m",))
    def chain(o, v, m):
        # 0.5x per step keeps the carry bounded without an extra pass
        # (the scale fuses into the step's last elementwise op)
        return jax.lax.fori_loop(0, m, lambda _, c: step(o, c) * 0.5, v)

    t_lo = _time_fn(partial(chain, m=lo), op, x, reps=reps)
    noise_floor = 8e-3          # observed dispatch jitter, tunneled TPU
    while True:
        t_hi = _time_fn(partial(chain, m=hi), op, x, reps=reps)
        if t_hi - t_lo > noise_floor or hi >= 2048:
            break
        hi *= 8
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def _entry(secs: float, gbytes: float, gflops: float, model: str,
           peaks: dict | None) -> dict:
    e = {
        "time_ms": round(secs * 1e3, 4),
        "achieved_gbps": round(gbytes / secs, 1),
        "achieved_gflops": round(gflops / secs, 1),
        "model": model,
    }
    if peaks:
        e["frac_of_hbm_peak"] = round(gbytes / secs / peaks["hbm_gbps"], 3)
    return e


def measure_structured(pc, reps: int = 10, pencils=None,
                       solve_s: float | None = None,
                       inner_its: int | None = None,
                       budget_s: float | None = None,
                       blk=None) -> dict:
    """Roofline dict for a StructuredGenEO preconditioner (live on
    device).  ``pencils``: optional (a_st, b_st, maskf, t_tree, k) to
    measure a real LOBPCG step; ``solve_s``/``inner_its``: measured
    solve-phase wall + iteration count for the aggregate entry.
    ``blk``: optional BlockGenEO — when given, the per-iteration apply
    entry measures the block-layout path the solve actually runs
    (structured/blockmode.py) and the analytic bytes drop the global
    gather/scatter terms.

    ``budget_s``: hard wall for the MEASUREMENT phase — each kernel's
    timing (chain compiles through the tunneled compile service can cost
    tens of seconds in bad weather) is skipped once the budget is spent,
    recording what was dropped under ``skipped``.  The analytic
    solve_phase aggregate is free and always emitted."""
    t_start = time.perf_counter()

    def over_budget():
        return (budget_s is not None
                and time.perf_counter() - t_start > budget_s)

    skipped = []
    peaks = device_peaks()
    n = int(np.prod(pc.grid_shape))
    d = int(np.prod(pc.dom_grid))
    lz, ly, lx = pc.local_shape
    n_l = lz * ly * lx
    isz = 4  # f32
    out = {"device_kind": jax.devices()[0].device_kind}
    if peaks:
        out["hbm_peak_gbps"] = peaks["hbm_gbps"]

    x = jnp.arange(1.0, n + 1, dtype=jnp.float32) / n

    # --- global stencil matvec: y = diag*x + sum_axis off*shift(x) ---
    mv_bytes = 6 * n * isz          # x, y, diag, 3 edge-offdiag fields
    mv_flops = 14 * n               # 3 axes x (2 mul + 2 add) + diag fma
    if over_budget():
        skipped.append("stencil_matvec")
    else:
        t = _time_step(lambda g, v: g.matvec(v), pc.gop, x, reps=reps)
        out["stencil_matvec"] = _entry(
            t, mv_bytes / 1e9, mv_flops / 1e9,
            "6 f32 arrays of n (x,y,diag,3 off-fields); 14 flops/node",
            peaks)

    # --- batched level-1 solve (FDM fast-diagonalization) ---
    from ..structured import halo
    from ..structured.fdm import FDMFactor
    xb = halo.to_batch(halo.halo_gather(
        x, pc.grid_shape, pc.dom_grid, pc.pad))
    jax.block_until_ready(xb)
    if isinstance(pc.l1, FDMFactor) and not over_budget():
        t = _time_step(lambda s, v: s.solve(v), pc.l1, xb, reps=reps)
        # 6 axis transforms (3 fwd + 3 inv) + eigen-scale: each pass
        # streams the [d, n_l] block once in + once out
        l1_bytes = (6 * 2 + 2) * d * n_l * isz
        l1_flops = 4 * d * n_l * (lz + ly + lx) + 2 * d * n_l
        e = _entry(t, l1_bytes / 1e9, l1_flops / 1e9,
                   "14 streaming passes over [d,n_l]; 6 axis matmuls "
                   "(2*d*n_l*axis flops each) + diagonal scale", peaks)
        if peaks:
            f32_peak = peaks["bf16_tflops"] / 4 * 1e3  # GFLOP/s
            e["frac_of_mxu_f32_peak"] = round(
                (l1_flops / 1e9) / t / f32_peak, 4)
        out["fdm_apply"] = e
    elif isinstance(pc.l1, FDMFactor):
        skipped.append("fdm_apply")

    # --- full preconditioner apply (per-iteration cost) ---
    # global layout: gather (n + d*n_l) + L1 passes + scatter (d*n_l +
    # n); block layout: extension/fold move only pad layers, so the
    # vector terms shrink to 2n [+ coarse Z einsums: 2 reads of z
    # [d*n_l*k] when a level-2 term runs per-apply]
    if blk is not None:
        pa_bytes = (2 * n + (6 * 2 + 2) * d * n_l) * isz
        pa_model = ("block-layout apply: halo extend + L1 solve + fold "
                    "(structured/blockmode.py; no global transposes)")
    else:
        pa_bytes = (2 * n + 2 * d * n_l + (6 * 2 + 2) * d * n_l) * isz
        pa_model = ("halo gather + L1 solve + scatter-add (+ 2 z-basis "
                    "streams when level-2 applies per-iteration)")
    if pc.lvl2 and not pc.eff_hybrid and pc.z is not None:
        pa_bytes += 2 * d * n_l * pc.k_max * isz
    if over_budget():
        skipped.append("pc_apply")
    else:
        if blk is not None:
            xb = blk.to_block(x)
            jax.block_until_ready(xb)
            t = _time_step(lambda p, v: p.apply(v), blk, xb, reps=reps)
        else:
            t = _time_step(lambda p, v: p.apply(v), pc, x, reps=reps)
        out["pc_apply"] = _entry(t, pa_bytes / 1e9, 0.0, pa_model, peaks)

    # --- one LOBPCG step on the real GenEO pencils ---
    if pencils is not None:
        if over_budget():
            skipped.append("lobpcg_step")
        else:
            try:
                out["lobpcg_step"] = _lobpcg_step(
                    pencils, n_l, d, peaks, reps=max(3, reps // 2))
            except Exception as exc:  # noqa: BLE001 — advisory
                out["lobpcg_step_error"] = repr(exc)

    # --- solve-phase aggregate: measured wall vs analytic per-it HBM ---
    if solve_s and inner_its:
        # per CG iteration: matvec + pc.apply + ~5 n-vector streams
        # (r, p, x updates + dots)
        it_bytes = mv_bytes + pa_bytes + 5 * 2 * n * isz
        agg = {
            "inner_its": int(inner_its),
            "solve_s": round(float(solve_s), 3),
            "analytic_gb_per_it": round(it_bytes / 1e9, 3),
            "achieved_gbps": round(
                it_bytes * inner_its / 1e9 / solve_s, 1),
            "model": "inner_its x (matvec + pc_apply + 5 vector "
                     "streams) analytic bytes / measured solve wall",
        }
        if peaks:
            agg["frac_of_hbm_peak"] = round(
                agg["achieved_gbps"] / peaks["hbm_gbps"], 3)
        out["solve_phase"] = agg
    if skipped:
        out["skipped"] = skipped
    return out


def _lobpcg_step(pencils, n_l: int, d: int, peaks: dict | None,
                 reps: int = 5) -> dict:
    """Per-iteration cost of the batched matrix-free LOBPCG on the real
    (A_Neu, B) pencils: run the fixed-length scan at two lengths and
    difference (isolates the step body from setup/whitening)."""
    from functools import partial

    from ..ops.lobpcg import matfree_lobpcg
    from ..structured.geneo import _lead_ops

    a_st, b_st, maskf, t_tree, k = pencils
    x0 = jax.random.normal(jax.random.PRNGKey(0), (d, n_l, k),
                           jnp.float32)
    x0 = x0 * maskf.reshape(d, n_l)[..., None]

    # operator pytrees as traced ARGUMENTS (a jit closure would
    # constant-fold the stencil fields — the compile-time trap the
    # structured setup documents); lead-layout ops = the production path
    @partial(jax.jit, static_argnames=("m",))
    def run(a, b, mk, t_tr, v0, m):
        a_op, b_op, t_op = _lead_ops(a, b, mk, t_tr)
        return matfree_lobpcg(a_op, b_op, t_op, v0, max_it=m, tol=0.0,
                              ops_layout="mn")

    lo_it, hi_it = 2, 12
    t_lo = _time_fn(partial(run, m=lo_it), a_st, b_st, maskf, t_tree,
                    x0, reps=reps)
    t_hi = _time_fn(partial(run, m=hi_it), a_st, b_st, maskf, t_tree,
                    x0, reps=reps)
    t = max((t_hi - t_lo) / (hi_it - lo_it), 1e-9)

    lz_s = round(n_l ** (1 / 3))
    m = 3 * k            # live set S = [X, W, P]
    # per step: a_op+b_op on [d,n_l,m] local stencils (8 field arrays +
    # in/out), t_op = FDM on m columns, Rayleigh-Ritz ~ 4 gemms of
    # S^T(·)S at (3k)^2 x n_l
    step_bytes = (2 * (8 * d * n_l + 2 * d * n_l * m)
                  + (6 * 2 + 2) * d * n_l * m) * 4
    step_flops = (2 * 14 * d * n_l * m
                  + 4 * d * n_l * m * 3 * lz_s
                  + 4 * 2 * d * n_l * m * m)
    e = _entry(t, step_bytes / 1e9, step_flops / 1e9,
               f"k={k} (live set 3k): 2 pencil stencils + FDM T-op + "
               "4 RR gemms; scan-length differencing", peaks)
    e["k"] = k
    return e
