"""Cross-implementation iteration parity at medium scale.

The BASELINE.md north star is "identical iteration counts" vs the
PETSc+SLEPc reference.  PETSc cannot be built in this image, so the only
byte-level cross-check used to live on the 8x8 dummy systems
(tst/dummy_check.py).  These tests add MEDIUM-SCALE anchors:
tst/cpu_anchor.py implements GenEO-ASM,E1 INDEPENDENTLY — scipy ``splu``
(SuperLU in the MUMPS role, src/geneo.cpp:94-124), scipy ``eigsh``
shift-invert (ARPACK — the same eigensolver library SLEPc drives,
src/geneo.cpp:626-780), a hand-written numpy PCG with PETSc stopping
semantics — sharing nothing with geneo4petsc_tpu's solver stack beyond
the coefficient-field generator.

Comparison discipline (established empirically, see ROUND4_NOTES):
  * the apples-to-apples object is a SINGLE f64 CG sweep with
    unpreconditioned-norm stopping (the scipy loop's semantics), not
    the production mixed-precision refinement (whose restarts re-run a
    few iterations by design);
  * at 12^3 (1.7k DOF) the two implementations agree EXACTLY;
  * at 24^3 (14k DOF) the operator's dynamic range (1e8 BC penalty x
    1e4 coefficient contrast => local cond ~1e12) makes the f64 CG
    trajectory wobble: both implementations are exact to backward
    error, their FORWARD errors differ, and the count moves by a few
    iterations (verified: the same numpy CG loop run twice, swapping
    only splu for the FDM factor — max elementwise operator difference
    ~1e-6 concentrated at BC-adjacent probes — lands 4 apart).  A
    preconditioner-quality bug moves counts by tens.
"""

import os
import sys

import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tst"))


def _tpu_path(size, dom, overlap, cut):
    """PC + single-sweep f64 CG with the scipy loop's semantics."""
    from geneo4petsc_tpu.config import GenEOOptions, KSPOptions
    from geneo4petsc_tpu.krylov.cg import cg_solve
    from geneo4petsc_tpu.structured.grid import laplacian_grid
    from geneo4petsc_tpu.structured.solve import solve_structured

    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "ASM", "E1"
    opts.cut = cut
    grid = laplacian_grid(size, dim=3, kappa_max=10000.0, interp="minmax")
    out = solve_structured(grid, (dom,) * 3, overlap, geneo=opts,
                           ksp=KSPOptions(type="cg"), tol=1e-8,
                           dtype=jnp.float64)
    assert out.converged and out.true_res <= 1e-8
    _x_true, b = grid.manufactured_rhs()
    b = jnp.asarray(b, jnp.float64)
    res = cg_solve(out.pc.matvec, b, out.pc.apply,
                   x0=out.pc.apply_q(b), rtol=1e-8,
                   norm_type="unpreconditioned", max_it=1000)
    assert bool(res.converged)
    return out, int(res.its)


def _tpu_path_pc(grid, dom, overlap, lvl1, lvl2, optim, cut):
    """Generalized PC + single-sweep f64 CG (unpreconditioned stopping,
    the independent scipy loop's semantics) for any lvl1/lvl2."""
    import jax.numpy as jnp

    from geneo4petsc_tpu.config import GenEOOptions, KSPOptions
    from geneo4petsc_tpu.krylov.cg import cg_solve
    from geneo4petsc_tpu.structured.solve import solve_structured

    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = lvl1, lvl2
    opts.optim, opts.cut = optim, cut
    out = solve_structured(grid, (dom,) * 3, overlap, geneo=opts,
                           ksp=KSPOptions(type="cg"), tol=1e-8,
                           dtype=jnp.float64)
    assert out.converged and out.true_res <= 1.01e-8
    _x_true, b = grid.manufactured_rhs()
    b = jnp.asarray(b, jnp.float64)
    x0 = out.pc.apply_q(b) if lvl2 in ("E1", "E2") else None
    res = cg_solve(out.pc.matvec, b, out.pc.apply, x0=x0, rtol=1e-8,
                   norm_type="unpreconditioned", max_it=2000)
    assert bool(res.converged)
    return out, int(res.its)


# (workload, lvl1, lvl2, optim, cut) — three PC families x two
# workloads (VERDICT r04 #5: ">= 3 PC families x >= 2 workloads")
_ANCHOR_MATRIX = [
    ("laplacian", "ASM", "0", 0.0, -1),
    ("laplacian", "SORAS", "2", 1.0, 4),
    ("heat", "ASM", "0", 0.0, -1),
    ("heat", "ASM", "E1", 0.0, -1),
    ("heat", "SORAS", "2", 1.0, 4),
]


def _make_grid(workload, size):
    from geneo4petsc_tpu.structured.grid import heat_grid, laplacian_grid

    if workload == "laplacian":
        return laplacian_grid(size, dim=3, kappa_max=1e4, interp="minmax")
    return heat_grid(size, dim=3, kappa_max=1e4, interp="minmax",
                     lbd=1.0, dt=0.1)


@pytest.mark.slow
@pytest.mark.parametrize("workload,lvl1,lvl2,optim,cut", _ANCHOR_MATRIX)
def test_pc_matrix_parity_small(workload, lvl1, lvl2, optim, cut):
    """12^3: the independent scipy implementation (tst/cpu_anchor2.py —
    own CSR assembly, splu, eigsh, numpy PCG) and the TPU structured
    path land on the SAME iteration count and coarse dimension across
    one-level / GenEO-1-E1 / GenEO-2-SORAS on both workloads."""
    from cpu_anchor2 import run_pc_anchor

    grid = _make_grid(workload, 12)
    ref = run_pc_anchor(grid, dom=2, overlap=2, lvl1=lvl1, lvl2=lvl2,
                        optim=optim, cut=cut, eig_tol=1e-12)
    assert ref["converged"]
    out, its = _tpu_path_pc(grid, 2, 2, lvl1, lvl2, optim, cut)
    assert int(out.stats.real_dim_e.sum()) == ref["dim_e"]
    # one-level configs see the raw 1e12 operator condition (1e8 BC
    # penalty x 1e4 contrast) with NO coarse correction, and the f64 CG
    # trajectory is reduction-order sensitive near the stopping boundary
    # (verified: the same numpy CG loop driven by the two operator
    # stacks lands 17 vs 18 with end residuals 6.6e-9 vs 1.2e-8) —
    # allow +-1 there.  GenEO-2 ("2") builds its coarse space from TWO
    # pencils, and the kept eigenVECTORS are non-unique (ARPACK start
    # dependence: with v0 seeded per domain the anchor lands 39 where
    # the old global-RNG draw landed 40; dim_e is identical either way)
    # — SURVEY §7 hard-part #2 pins COUNTS, with eigvec non-uniqueness
    # tolerance: +-1 there too.  GenEO-1 (E1) must match exactly.
    band = 1 if lvl2 in ("0", "2") else 0
    assert abs(its - ref["iterations"]) <= band, (
        f"{workload} {lvl1},{lvl2}: tpu path {its} its vs independent "
        f"scipy impl {ref['iterations']}")


@pytest.mark.slow
def test_pc_matrix_parity_medium_soras2():
    """24^3 GenEO-2 SORAS: identical dim_e, iterations within the
    conditioning band (see module docstring)."""
    from cpu_anchor2 import run_pc_anchor

    grid = _make_grid("laplacian", 24)
    ref = run_pc_anchor(grid, dom=2, overlap=2, lvl1="SORAS", lvl2="2",
                        optim=1.0, cut=4, eig_tol=1e-10)
    assert ref["converged"]
    out, its = _tpu_path_pc(grid, 2, 2, "SORAS", "2", 1.0, 4)
    assert int(out.stats.real_dim_e.sum()) == ref["dim_e"]
    assert abs(its - ref["iterations"]) <= 6, (
        f"tpu path {its} its vs independent scipy impl "
        f"{ref['iterations']}")


@pytest.mark.slow
def test_exact_iteration_parity_small():
    """12^3: the independent scipy implementation and the TPU path land
    on the SAME CG iteration count and coarse dimension."""
    from cpu_anchor import run_anchor

    ref = run_anchor(12, dom=2, overlap=2, cut=2, verbose=False,
                     tau=0.1, eig_tol=1e-12)
    assert ref["true_res"] <= 1e-8
    out, its = _tpu_path(12, 2, 2, 2)
    assert int(out.stats.real_dim_e.sum()) == ref["dim_e"]
    assert its == ref["iterations"], (
        f"tpu path {its} its vs independent scipy impl "
        f"{ref['iterations']}")


@pytest.mark.slow
def test_iteration_band_parity_medium():
    """24^3: identical dim_e; iteration counts within the conditioning
    wobble band (see module docstring)."""
    from cpu_anchor import run_anchor

    ref = run_anchor(24, dom=2, overlap=2, cut=2, verbose=False,
                     tau=0.1, eig_tol=1e-10)
    assert ref["true_res"] <= 1e-8
    out, its = _tpu_path(24, 2, 2, 2)
    assert int(out.stats.real_dim_e.sum()) == ref["dim_e"]
    assert abs(its - ref["iterations"]) <= 6, (
        f"tpu path {its} its vs independent scipy impl "
        f"{ref['iterations']}")
    # the production mixed-precision path converges in a comparable
    # total (refinement restarts re-run a few iterations by design)
    assert out.refined.inner_its <= ref["iterations"] + 12
