"""Structured GenEO: iteration-count parity with the generic dense path.

The north-star metric is iteration-count parity (BASELINE.md); here the
structured FDM/stencil preconditioner is pinned against the generic
dense-block preconditioner ON THE SAME decomposition — same pencils, same
selection windows, same coarse space — so CG must converge in the same
number of iterations (same PC up to eigenvector rotations)."""

import numpy as np
import jax.numpy as jnp
import pytest

from geneo4petsc_tpu.assembly.assemble import assemble, assemble_global_csr
from geneo4petsc_tpu.config import GenEOOptions
from geneo4petsc_tpu.krylov.cg import cg_solve
from geneo4petsc_tpu.krylov.gmres import gmres_solve
from geneo4petsc_tpu.models import laplacian
from geneo4petsc_tpu.precond.geneo import setup_geneo
from geneo4petsc_tpu.structured import geneo as sg
from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
from geneo4petsc_tpu.structured.grid import laplacian_grid


def _setup(size, dim, dg, L, kmax=1000.0, interp="minmax"):
    g = laplacian_grid(size, dim=dim, kappa_max=kmax, interp=interp)
    sd = StructuredDecomposition(g, dg, L)
    arg = f"--size {size} --dim {dim}" + \
        (f" --kappa {kmax} {interp}" if interp else "")
    mesh = laplacian.get_input(arg)
    return g, sd, mesh


def _opts(lvl, **kw):
    o = GenEOOptions(**kw)
    o.lvl1, o.lvl2 = lvl.split(",")
    return o


def _krylov(opts):
    # RAS is a nonsymmetric preconditioner -> GMRES (the reference pairs
    # RAS with -ksp_type gmres in its sweeps); everything else is CG-safe
    return gmres_solve if opts.lvl1 == "RAS" else cg_solve


def _solve_generic(mesh, sd, opts, b):
    gen = sd.to_generic(mesh)
    ap = assemble(mesh, gen, dtype=jnp.float64)
    pc, stats = setup_geneo(ap.batch, opts, b=jnp.asarray(b))
    x0 = pc.x0 if opts.eff_hybrid else None
    res = _krylov(opts)(ap.batch.matvec, jnp.asarray(b), pc.apply, x0=x0,
                        rtol=1e-8)
    return res, stats


def _solve_structured(g, sd, opts, b):
    pc, stats = sg.setup_structured(sd, opts, b=jnp.asarray(b),
                                    dtype=jnp.float64)
    x0 = pc.x0 if opts.eff_hybrid else None
    res = _krylov(opts)(pc.matvec, jnp.asarray(b), pc.apply, x0=x0,
                        rtol=1e-8)
    return res, stats


CASES = [(8, 2, (2, 2, 1), 1), (12, 2, (3, 2, 1), 2),
         (8, 3, (2, 2, 2), 2)]


@pytest.mark.parametrize("size,dim,dg,L", CASES)
@pytest.mark.parametrize("lvl", ["ASM,0", "RAS,0", "ASM,1", "RAS,1",
                                 "SRAS,1", "ASM,H1", "ASM,E1"])
def test_iteration_parity(size, dim, dg, L, lvl):
    g, sd, mesh = _setup(size, dim, dg, L)
    x_true, b = g.manufactured_rhs()
    r_gen, s_gen = _solve_generic(mesh, sd, _opts(lvl), b)
    o_str = _opts(lvl)
    o_str.els2.max_it = 250   # converge the eigenvectors for exact parity
    r_str, s_str = _solve_structured(g, sd, o_str, b)
    assert int(r_gen.reason) > 0 and int(r_str.reason) > 0
    # identical coarse spaces per domain
    np.testing.assert_array_equal(s_gen.real_dim_e, s_str.real_dim_e)
    assert abs(int(r_gen.its) - int(r_str.its)) <= 1
    # both converge to the manufactured solution
    np.testing.assert_allclose(np.asarray(r_str.x), x_true, rtol=1e-5,
                               atol=1e-5 * np.abs(x_true).max())


def test_coarse_e_matches_sparse_ptap():
    """_coarse_e (offset-window contractions) == Z^T A Z through the
    assembled CSR — validates the window algebra independently of the
    eigensolver."""
    import scipy.sparse as sp

    g, sd, mesh = _setup(12, 2, (3, 2, 1), 2)
    opts = _opts("ASM,1")
    pc, stats = sg.setup_structured(sd, opts, dtype=jnp.float64)
    a = assemble_global_csr(mesh)
    # materialize global sparse Z from the structured basis
    counts = stats.real_dim_e
    offs = np.zeros(sd.n_dom, np.int64)
    np.cumsum(counts[:-1], out=offs[1:])
    dim_e = int(counts.sum())
    rows, cols, vals = [], [], []
    zb = np.asarray(pc.z, np.float64)
    for d in range(sd.n_dom):
        gid = sd.dom_gids(d).ravel()
        mask = gid < g.n_nodes
        for j in range(int(counts[d])):
            rows.append(gid[mask])
            cols.append(np.full(mask.sum(), offs[d] + j))
            vals.append(zb[d, ..., j].ravel()[mask])
    zg = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows),
                                np.concatenate(cols))),
        shape=(g.n_nodes, dim_e)).tocsr()
    e_ref = np.asarray((zg.T @ (a @ zg)).todense())
    # recompute the window-contraction E from the same z
    pad_width = [(0, 0)] + [(1, 1) if p else (0, 0)
                            for p in (sd.pad[2], sd.pad[1], sd.pad[0])] \
        + [(0, 0)]
    from geneo4petsc_tpu.structured import local_ops as lo
    pad1 = tuple(p + 1 if gg > 1 else 0
                 for p, gg in zip(sd.pad, sd.dom_grid))
    f_dil = lo.gather_fields(sd, dtype=jnp.float64, pad=pad1)
    dirs_dil = lo.dirichlet_stencil(f_dil)
    z_dil = jnp.pad(pc.z, pad_width)
    y_dil = dirs_dil.matvec(z_dil) * f_dil.mask[..., None]
    e = sg._coarse_e(sd, pc.z, y_dil, counts)
    np.testing.assert_allclose(e, e_ref, rtol=1e-9, atol=1e-9)


def test_structured_high_contrast_robustness():
    """GenEO-1 keeps CG iterations low on a 1e4-contrast laplacian where
    the 1-level PC alone degrades (the GenEO raison d'etre)."""
    g, sd, mesh = _setup(16, 2, (4, 2, 1), 2, kmax=1e4)
    _x, b = g.manufactured_rhs()
    r1, _ = _solve_structured(g, sd, _opts("ASM,0"), b)
    r2, s2 = _solve_structured(g, sd, _opts("ASM,1"), b)
    assert int(r2.reason) > 0
    assert int(r2.its) < int(r1.its)
    assert s2.real_dim_e.sum() > 0


def test_structured_solve_driver_to_1e8():
    """solve_structured: refined mixed-precision CG reaches the true-f64
    1e-8 tolerance with the manufactured-solution oracle."""
    from geneo4petsc_tpu.config import KSPOptions
    from geneo4petsc_tpu.structured.solve import solve_structured

    g = laplacian_grid(12, dim=2, kappa_max=1e3, interp="minmax")
    o = _opts("ASM,E1")
    out = solve_structured(g, (3, 2, 1), 2, geneo=o,
                           ksp=KSPOptions(type="cg"), tol=1e-8,
                           dtype=jnp.float32)
    assert out.converged
    assert out.true_res <= 1e-8
    x_true = np.arange(1.0, g.n_nodes + 1)
    np.testing.assert_allclose(out.x, x_true,
                               atol=1e-6 * np.abs(x_true).max())


def test_structured_accepts_full_pc_family():
    """Round 3: ORAS/SORAS and GenEO-2 run on the structured backend
    (general solvers) — the old rejections are gone.  Full parity rows
    live in tests/test_structured_general.py."""
    g, sd, _ = _setup(8, 2, (2, 2, 1), 1)
    x_true, b = g.manufactured_rhs()
    import jax.numpy as jnp
    for lvl in ("SORAS,0", "ASM,2"):
        o = _opts(lvl)
        o.optim = 1.0
        pc, _stats = sg.setup_structured(sd, o, b=jnp.asarray(b),
                                         dtype=jnp.float64)
        res = cg_solve(pc.matvec, jnp.asarray(b), pc.apply, rtol=1e-8,
                       flexible=not pc.l1_exact)
        assert int(res.reason) > 0


def test_device_refine_matches_host_refine():
    """The device-resident f64 refinement loop must reach the same
    tolerance with the same preconditioner as the host-CSR loop."""
    import jax.numpy as jnp

    from geneo4petsc_tpu.config import GenEOOptions
    from geneo4petsc_tpu.structured.grid import laplacian_grid
    from geneo4petsc_tpu.structured.solve import solve_structured

    grid = laplacian_grid(16, dim=3, kappa_max=1000.0, interp="minmax")
    g = GenEOOptions()
    g.lvl1, g.lvl2 = "ASM", "E1"
    host = solve_structured(grid, (2, 2, 2), 1, geneo=g, tol=1e-9,
                            device_refine=False)
    dev = solve_structured(grid, (2, 2, 2), 1, geneo=g, tol=1e-9,
                           device_refine=True)
    assert host.converged and dev.converged
    assert dev.true_res <= 1e-9
    n = grid.n_nodes
    x_true = np.arange(1.0, n + 1)
    assert np.allclose(np.asarray(dev.x, np.float64), x_true,
                       rtol=1e-6, atol=1e-5)
    # the two refinement drivers agree to the solve tolerance (each stops
    # at its own refinement state below 1e-9, so agreement is ~cond*tol)
    assert np.allclose(np.asarray(dev.x, np.float64),
                       np.asarray(host.x, np.float64), rtol=1e-5, atol=1e-4)
    del jnp


def test_f32_e_assembly_no_false_pruning():
    """E must be assembled in f64 (when x64 is on) even for an f32 PC.

    Z's columns are near-null vectors of A, so the Z^T A Z contraction
    cancels eps(f32)*||A||-scale terms; an f32-assembled E is noise at
    its own scale and the rank detection pruned REAL coarse columns
    (52/64 at this exact configuration before the fix, where the f64 E
    is numerically full rank)."""
    grid = laplacian_grid(32, dim=3, kappa_max=10000.0, interp="minmax")
    sd = StructuredDecomposition(grid, (4, 4, 4), 2)
    pc32, st32 = sg.setup_structured(sd, _opts("ASM,E1"),
                                     dtype=jnp.float32)
    assert st32.e_pruned == 0
    assert int(st32.real_dim_e.sum()) == int(st32.raw_dim_e.sum()) == 64
    # and the f32 coarse space matches the f64 one in size
    pc64, st64 = sg.setup_structured(sd, _opts("ASM,E1"),
                                     dtype=jnp.float64)
    assert int(st64.real_dim_e.sum()) == int(st32.real_dim_e.sum())
