"""The general structured solvers (round 3): ORAS/SORAS + GenEO-2 + heat
+ non-separable coefficient fields on the scale backend.

Iteration-count parity rows pin the structured backend against the generic
dense path ON THE SAME decomposition (the north-star metric, BASELINE.md):
with the exact block-tridiag local solver the two preconditioners are the
same operator up to eigenvector rotations, so CG/GMRES iteration counts
must match exactly.  The inexact PCG route (forced via a zero block-tridiag
budget) is inexact Schwarz — pinned to convergence + a small iteration
band instead (documented deviation; solvers.py module docstring)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from geneo4petsc_tpu.assembly.assemble import assemble
from geneo4petsc_tpu.config import GenEOOptions
from geneo4petsc_tpu.krylov.cg import cg_solve
from geneo4petsc_tpu.krylov.gmres import gmres_solve
from geneo4petsc_tpu.models import heat, laplacian
from geneo4petsc_tpu.precond.geneo import setup_geneo
from geneo4petsc_tpu.structured import geneo as sg
from geneo4petsc_tpu.structured import solvers
from geneo4petsc_tpu.structured import local_ops as lo
from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
from geneo4petsc_tpu.structured.grid import (heat_grid, inclusion_grid,
                                             laplacian_grid)


def _opts(lvl, **kw):
    o = GenEOOptions(**kw)
    o.lvl1, o.lvl2 = lvl.split(",")
    o.els2.max_it = 250
    # parity pins compare against the generic DENSE eigh route: run the
    # structured LOBPCG well past the reference's loose 1e-3 "good
    # enough" tolerance so near-threshold window membership is exact
    o.els2.rtol = 1e-11
    return o


def _krylov(o):
    return gmres_solve if o.lvl1 in ("RAS", "ORAS") else cg_solve


def _solve_structured(g, sd, o, b):
    pc, st = sg.setup_structured(sd, o, b=jnp.asarray(b),
                                 dtype=jnp.float64)
    x0 = pc.x0 if o.eff_hybrid else None
    kry = _krylov(o)
    extra = {"flexible": not pc.l1_exact} if kry is cg_solve else {}
    res = kry(pc.matvec, jnp.asarray(b), pc.apply, x0=x0,
              rtol=1e-8, **extra)
    return res, st, pc


def _solve_generic(mesh, sd, o, b):
    gen = sd.to_generic(mesh)
    ap = assemble(mesh, gen, dtype=jnp.float64)
    pc, st = setup_geneo(ap.batch, o, b=jnp.asarray(b), decomp=gen)
    x0 = pc.x0 if o.eff_hybrid else None
    res = _krylov(o)(ap.batch.matvec, jnp.asarray(b), pc.apply, x0=x0,
                     rtol=1e-8)
    return res, st


LAP = (12, 2, (3, 2, 1), 2)


@pytest.mark.parametrize("lvl,optim", [
    ("ORAS,0", 1.0), ("SORAS,0", 1.0), ("SORAS,2", 1.0),
    ("SORAS,H2", 1.0), ("SORAS,E2", 1.0), ("ORAS,1", 0.02),
])
def test_soras_geneo2_iteration_parity(lvl, optim):
    """SORAS x {2, H2, E2} structured == generic (src/geneo.cpp:1613-1670
    Robin blocks + :1274-1301 GenEO-2 pencils, realized via block-tridiag
    factors + swapped-pencil LOBPCG)."""
    size, dim, dg, L = LAP
    g = laplacian_grid(size, dim=dim, kappa_max=1000.0, interp="minmax")
    mesh = laplacian.get_input(f"--size {size} --dim {dim} "
                               "--kappa 1000. minmax")
    sd = StructuredDecomposition(g, dg, L)
    _x, b = g.manufactured_rhs()
    r_s, s_s, pc = _solve_structured(g, sd, _opts(lvl, optim=optim), b)
    r_g, s_g = _solve_generic(mesh, sd, _opts(lvl, optim=optim), b)
    assert int(r_s.reason) > 0 and int(r_g.reason) > 0
    assert pc.l1_exact  # block-tridiag fits at this size -> exact solves
    if s_s.raw_dim_e is not None:
        # pre-prune per-domain selections (pencil windows) match exactly;
        # the GenEO-2 windows here are rank-deficient, and the pivoted-
        # Cholesky prune may keep DIFFERENT (equally valid) independent
        # columns per domain — the coarse-space RANK must still agree
        np.testing.assert_array_equal(s_s.raw_dim_e, s_g.raw_dim_e)
        assert int(s_s.real_dim_e.sum()) == int(s_g.real_dim_e.sum())
    else:
        np.testing.assert_array_equal(s_s.real_dim_e, s_g.real_dim_e)
    if lvl.endswith(",2") or lvl.endswith("0") or lvl.endswith(",1"):
        assert int(r_s.its) == int(r_g.its)
    else:
        # H2/E2 converge in O(1) its; allow the +-1 eigenvector-rotation
        # band on the hybrid projections
        assert abs(int(r_s.its) - int(r_g.its)) <= 1
    if "2" in lvl.split(",")[1]:
        # adaptive thresholds flowed through both paths identically
        np.testing.assert_allclose(s_s.tau_loc, s_g.tau_loc, rtol=1e-12)
        np.testing.assert_allclose(s_s.gamma_loc, s_g.gamma_loc,
                                   rtol=1e-12)


@pytest.mark.parametrize("lvl", ["ASM,1", "SRAS,1", "ASM,E1"])
def test_heat_structured_iteration_parity(lvl):
    """The heat workload (mass term breaks separability) on the structured
    backend == the generic element path."""
    g = heat_grid(12, dim=2, kappa_max=1000.0, interp="minmax")
    mesh = heat.get_input("--size 12 --dim 2 --kappa 1000. minmax")
    sd = StructuredDecomposition(g, (3, 2, 1), 2)
    _x, b = g.manufactured_rhs()
    r_s, s_s, pc = _solve_structured(g, sd, _opts(lvl), b)
    r_g, s_g = _solve_generic(mesh, sd, _opts(lvl), b)
    assert int(r_s.reason) > 0 and int(r_g.reason) > 0
    np.testing.assert_array_equal(s_s.real_dim_e, s_g.real_dim_e)
    assert int(r_s.its) == int(r_g.its)


def test_nonseparable_inclusions_converges():
    """High-contrast non-separable kappa (spherical inclusions — the
    BASELINE #5 scalar problem class) through the general solvers."""
    g = inclusion_grid(12, dim=3, kappa_max=1e4, n_inc=6)
    sd = StructuredDecomposition(g, (2, 2, 1), 2)
    x_true, b = g.manufactured_rhs()
    r, st, pc = _solve_structured(g, sd, _opts("ASM,1"), b)
    assert int(r.reason) > 0
    err = np.abs(np.asarray(r.x) - x_true).max() / g.n_nodes
    assert err < 1e-6


def test_inexact_pcg_route_converges(monkeypatch):
    """Force the inexact surrogate-PCG local solver (zero block-tridiag
    budget) — the 10M-DOF route for non-separable operators — and check
    flexible CG still converges with a modest iteration penalty."""
    monkeypatch.setenv("GENEO_BT_BUDGET_GB", "0")
    g = inclusion_grid(12, dim=3, kappa_max=1e4, n_inc=6)
    sd = StructuredDecomposition(g, (2, 2, 1), 2)
    x_true, b = g.manufactured_rhs()
    r, st, pc = _solve_structured(g, sd, _opts("ASM,1"), b)
    assert not pc.l1_exact
    assert int(r.reason) > 0
    err = np.abs(np.asarray(r.x) - x_true).max() / g.n_nodes
    assert err < 1e-6
    monkeypatch.delenv("GENEO_BT_BUDGET_GB")
    r_exact, _st2, pc2 = _solve_structured(g, sd, _opts("ASM,1"), b)
    assert pc2.l1_exact
    # inexact Schwarz: small documented deviation from the exact counts
    assert int(r.its) <= int(r_exact.its) + 10


def test_surrogate_fdm_preconditions_scaled_stencil():
    """The Jacobi-scaled separable surrogate is a genuine approximate
    inverse: PCG with it converges far faster than unpreconditioned CG."""
    g = inclusion_grid(10, dim=3, kappa_max=1e3, n_inc=4)
    sd = StructuredDecomposition(g, (2, 1, 1), 2)
    f = lo.gather_fields(sd, dtype=jnp.float64)
    st = lo.dirichlet_stencil(f)
    maskf = f.mask.astype(jnp.float64)
    pcg = solvers.PCGSolver(st=st, pre=solvers.surrogate_fdm(st, maskf),
                            maskf=maskf, rtol=1e-10, max_it=500)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=st.diag.shape)) * maskf
    b = st.matvec(x)
    u = pcg.solve(b)
    rel = float(jnp.linalg.norm((u - x) * maskf)
                / jnp.linalg.norm(x * maskf))
    assert rel < 1e-7


def test_bt_solver_matches_fdm_on_separable():
    """Block-tridiag and FDM agree (both exact) on a separable field."""
    from geneo4petsc_tpu.structured import fdm
    g = laplacian_grid(10, dim=3, kappa_max=100.0, interp="quad")
    sd = StructuredDecomposition(g, (2, 2, 1), 1)
    f = lo.gather_fields(sd, dtype=jnp.float64)
    st = lo.dirichlet_stencil(f)
    maskf = f.mask.astype(jnp.float64)
    bt = solvers.bt_build(st, sd.local_shape)
    fd = fdm.fdm_factor(fdm.dirichlet_axes(sd), dtype=jnp.float64)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=st.diag.shape)) * maskf
    u_bt = bt.solve(b) * maskf
    u_fd = fd.solve(b) * maskf
    np.testing.assert_allclose(np.asarray(u_bt), np.asarray(u_fd),
                               rtol=0, atol=1e-8)
