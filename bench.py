"""Benchmark: GenEO-preconditioned CG on a high-contrast Laplacian, real TPU.

Metric (BASELINE.json): CG iters to 1e-8 + setup/solve seconds per MDOF
(high-contrast Laplacian).  The hot path runs in float32 on the MXU; an
outer float64 iterative-refinement loop drives the TRUE residual
||AX - B|| / ||B|| below 1e-8 (the reference's all-double semantics, the
TPU-native way).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
value = (setup + solve) seconds scaled to one MDOF; lower is better.
vs_baseline compares against the reference's per-MDOF wall target derived
from BASELINE.md config #5 (beat a 64-rank MPI CPU run: we conservatively
peg that at 60 s/MDOF setup+solve for GenEO on this problem class;
vs_baseline = target / ours, so > 1.0 means faster than target).
"""

import json
import os
import sys
import time

import numpy as np

VERBOSE = os.environ.get("BENCH_VERBOSE", "1") == "1"
_T0 = time.perf_counter()


def _log(msg):
    if VERBOSE:
        print(f"[bench {time.perf_counter() - _T0:7.2f}s] {msg}",
              file=sys.stderr, flush=True)


def main():
    # default: the 1M-DOF / 4096-subdomain config — fully on-chip setup
    # (COO-upload of the operator blocks, device L1 factor + pencils,
    # chunked batched LOBPCG), ~110 s/MDOF end-to-end on one v5e chip.
    # "large" = 262k / 1024 domains; "medium" = 32k dense-eigh config.
    mode = sys.argv[1] if len(sys.argv) > 1 else "xlarge"
    if mode == "xlarge":
        size, n_grid = 1000, 64
    elif mode == "large":
        size, n_grid = 512, 32
    elif mode == "medium":
        size, n_grid = 180, 16
    else:
        size = int(sys.argv[1])
        n_grid = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    large = mode in ("large", "xlarge")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from geneo4petsc_tpu.assembly.assemble import assemble
    from geneo4petsc_tpu.config import GenEOOptions
    from geneo4petsc_tpu.krylov.refine import refined_solve
    from geneo4petsc_tpu.models import laplacian
    from geneo4petsc_tpu.partition.decompose import decompose_nodal_fast
    from geneo4petsc_tpu.partition.kway import partition_structured_grid
    from geneo4petsc_tpu.precond.geneo import setup_geneo

    dtype = jnp.float32
    n_dom = n_grid * n_grid

    # --- host-side problem build + partition (structured fast path) ---
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

    # warm up the device compile pipeline in the background: the FIRST
    # gather/scatter compile on tunneled TPU platforms pays a ~3-minute
    # one-time service warm-up; overlapping it with host-side GenEO setup
    # hides most of that wall (the thread blocks on the compile RPC and
    # releases the GIL)
    import threading

    def _warm():
        ids = jnp.asarray(np.arange(64, dtype=np.int32) % 16)

        def tiny(xw):
            return jax.ops.segment_sum(xw[ids], ids, num_segments=17)

        r = jax.jit(tiny)(jnp.ones(64, jnp.float32))
        jax.block_until_ready(r)
        # also warm the device->host transfer path: the FIRST pull in a
        # process pays a one-time service init (observed up to ~5 min in
        # bad weather); a tiny pull here hides it behind host-side setup
        np.asarray(r)
        _log("device gather/scatter warm-up compile finished")

    warm_thread = threading.Thread(target=_warm, daemon=True)
    warm_thread.start()

    # --- GenEO setup (batched eigensolves on the TPU) ---
    _log(f"n_max={ap.batch.n_max}; GenEO setup")
    t0 = time.perf_counter()
    opts = GenEOOptions()
    opts.lvl1 = os.environ.get("BENCH_LVL1", "ASM")
    opts.lvl2 = os.environ.get("BENCH_LVL2", "E1")
    # MXU fast path: precomputed block inverses (one batched matmul per
    # local solve); inner-PC rounding is absorbed by the f64 refinement
    opts.dls1.type = "inverse"
    if large:
        # iterative eigensolve on the chip (the ARPACK-equivalent path):
        # k = cut candidates per domain instead of the full local spectrum
        opts.els2.type = "lobpcg"
        opts.cut = 4
        # NOTE: 30 LOBPCG iterations give the identical tau SELECTION at
        # ~60% of the eigensolve cost, but the kept eigenVECTORS are less
        # converged and CG iterations double (62 -> 126 at 1M) — the
        # default 50 is the measured sweet spot end-to-end
    pc, stats = setup_geneo(ap.batch, opts, decomp=decomp, a_csr=ap.a_csr)
    jax.block_until_ready(pc.z_loc)
    t_setup = time.perf_counter() - t0

    n = mesh.n_nodes
    x_true = np.arange(1.0, n + 1)
    b = np.asarray(ap.a_csr @ x_true)

    def residual64(x):
        return b - ap.a_csr @ x

    _log(f"setup done dimE={int(stats.real_dim_e.sum())}; compiling solver")
    from geneo4petsc_tpu.krylov.refine import make_pc_inner_solver
    # the preconditioner pytree is a traced jit argument (constants would
    # be constant-folded by XLA: compile time scales with operator size)
    inner = make_pc_inner_solver(pc)

    # warm-up / compile (cached in production; reported separately)
    t0 = time.perf_counter()
    r0 = refined_solve(None, None, b, residual64, tol=1e-8,
                       max_outer=8, inner_solver=inner)
    t_compile_and_first = time.perf_counter() - t0

    _log("warm solve done; timing solve")
    t0 = time.perf_counter()
    r = refined_solve(None, None, b, residual64, tol=1e-8,
                      max_outer=8, inner_solver=inner)
    t_solve = time.perf_counter() - t0
    _log("done")

    err = float(np.abs(r.x - x_true).max() / n)
    mdof = n / 1e6
    wall = t_setup + t_solve
    per_mdof = wall / mdof
    target_per_mdof = 60.0  # conservative 64-rank MPI CPU GenEO wall proxy

    out = {
        "metric": "setup+solve sec per MDOF, high-contrast 2D Laplacian, "
                  f"GenEO-{opts.lvl1},{opts.lvl2}+CG to true 1e-8",
        "value": round(per_mdof, 3),
        "unit": "s/MDOF",
        "vs_baseline": round(target_per_mdof / per_mdof, 3),
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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
