"""3-D structured elasticity backend (structured/elastic.py): element
correctness, Neumann/Dirichlet duality, rigid-body coarse modes, and
end-to-end GenEO convergence — BASELINE #5's problem class."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from geneo4petsc_tpu.config import GenEOOptions
from geneo4petsc_tpu.krylov.cg import cg_solve
from geneo4petsc_tpu.structured import elastic as el
from geneo4petsc_tpu.structured.elastic import (ElasticGrid, _CORNERS,
                                                elastic_grid, elastic_op,
                                                q1_hex_stiffness,
                                                setup_elastic,
                                                solve_elastic)


def _assemble_csr(g: ElasticGrid) -> sp.csr_matrix:
    """Independent scipy assembly (per-cell scatter) — the test oracle."""
    nx, ny, nz = g.shape

    def gid(x, y, z):
        return x + nx * (y + ny * z)

    rows, cols, vals = [], [], []
    for cz in range(nz - 1):
        for cy in range(ny - 1):
            for cx in range(nx - 1):
                nodes = [gid(cx + dx, cy + dy, cz + dz)
                         for dx, dy, dz in _CORNERS]
                dofs = np.array([[3 * n + c for c in range(3)]
                                 for n in nodes]).ravel()
                ke = g.e_cell[cz, cy, cx] * g.k0
                rows.append(np.repeat(dofs, 24))
                cols.append(np.tile(dofs, 24))
                vals.append(ke.ravel())
    bc = g.bc_diag().ravel()
    nzr = np.flatnonzero(bc)
    for n in nzr:
        for c in range(3):
            rows.append(np.array([3 * n + c]))
            cols.append(np.array([3 * n + c]))
            vals.append(np.array([bc[n]]))
    a = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(g.n_dof, g.n_dof)).tocsr()
    a.sum_duplicates()
    return a


def test_hex_stiffness_rigid_modes():
    k = q1_hex_stiffness(1.0, 0.3)
    assert np.allclose(k, k.T)
    w = np.linalg.eigvalsh(k)
    # exactly 6 rigid-body modes (3 translations + 3 rotations)
    assert int(np.sum(np.abs(w) < 1e-12)) == 6
    assert w[6] > 0.05
    # a rotation about z is in the kernel: u = (-y, x, 0)
    u = np.zeros(24)
    for n, (dx, dy, dz) in enumerate(_CORNERS):
        u[3 * n + 0] = -dy
        u[3 * n + 1] = dx
    assert np.abs(k @ u).max() < 1e-12


def test_host_and_device_matvec_match_assembly():
    g = elastic_grid(5, kappa_max=100.0, interp="quad")
    a = _assemble_csr(g)
    rng = np.random.default_rng(0)
    x = rng.normal(size=g.n_dof)
    np.testing.assert_allclose(g.matvec(x), a @ x, rtol=1e-12, atol=1e-9)
    op = elastic_op(g, jnp.float64)
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))),
                               a @ x, rtol=1e-10, atol=1e-8)
    # column form
    xm = rng.normal(size=(g.n_dof, 2))
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(xm))),
                               a @ xm, rtol=1e-10, atol=1e-8)


def test_neumann_partition_reassembles_global():
    """A = sum_d R_d^T A_Neu,d R_d — the MatIS identity that makes the
    weighted Neumann blocks exact (geneo4PETSc.cpp:473-476)."""
    g = elastic_grid(6, kappa_max=10.0, interp="lin")
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "ASM", "0"
    pc, _ = setup_elastic(g, (2, 2, 1), 1, opts, dtype=jnp.float64)
    # rebuild the Neumann operator from setup internals via a fresh call:
    # apply sum_d R^T Neu R x through the pc's gather/scatter + a Neumann
    # op constructed the same way
    sd = el._geom(g, (2, 2, 1), 1)

    def up(h, pad):
        from geneo4petsc_tpu.structured import halo
        a_ = jnp.asarray(np.asarray(h, np.float64).ravel())
        return halo.to_batch(halo.halo_gather(a_, g.shape, sd.dom_grid,
                                              pad))

    em = [sd.axis_edge_mult(a).astype(np.float64) for a in range(3)]
    cmult = em[2][:, None, None] * em[1][None, :, None] \
        * em[0][None, None, :]
    ecn = g.cell_node_field()
    ecn_w = np.where(cmult > 0, ecn / np.maximum(cmult, 1.0), 0.0)
    nm = sd.node_mult().astype(np.float64)
    cw_neu = up(ecn_w, sd.pad)[:, :-1, :-1, :-1]
    bc_neu = up(np.where(nm > 0, g.bc_diag() / np.maximum(nm, 1.0), 0.0),
                sd.pad)
    neu = el.LocalElastic(cw=cw_neu, k0=jnp.asarray(g.k0),
                          diag_add=bc_neu, pads=(0, 0, 0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=g.n_dof))
    xb = pc._gather(x)
    y = pc._scatter(neu.matvec(xb))
    np.testing.assert_allclose(np.asarray(y), g.matvec(np.asarray(x)),
                               rtol=1e-10, atol=1e-8)


def test_geneo_captures_rigid_modes_and_converges():
    """Floating subdomains carry 6 rigid modes each; GenEO-1 must find
    them and the 2-level PC must converge to 1e-8."""
    g = elastic_grid(10, kappa_max=1000.0, interp="minmax")
    x_true, b = g.manufactured_rhs()
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "ASM", "1"
    opts.els2.max_it = 300
    opts.dls1.rtol = 1e-6
    pc, st = setup_elastic(g, (2, 2, 1), 2, opts,
                           b=jnp.asarray(b), dtype=jnp.float64)
    # the z > 0 domain layer floats in z... with a 2x2x1 z-undivided grid
    # every domain touches the clamped face; still, the high-contrast
    # field forces a nontrivial coarse space
    assert int(st.real_dim_e.sum()) >= 1
    res = cg_solve(pc.matvec, jnp.asarray(b), pc.apply, rtol=1e-8,
                   flexible=True)
    assert int(res.reason) > 0
    err = np.abs(np.asarray(res.x) - x_true).max() / np.abs(x_true).max()
    # residual-bound error scales with cond(A): the soft unit spring
    # leaves near-rigid boundary modes poorly controlled
    assert err < 5e-6

    # a z-divided grid has genuinely floating domains -> >= 6 modes
    opts2 = GenEOOptions()
    opts2.lvl1, opts2.lvl2 = "ASM", "1"
    opts2.els2.max_it = 300
    pc2, st2 = setup_elastic(g, (1, 1, 2), 2, opts2,
                             b=jnp.asarray(b), dtype=jnp.float64)
    assert int(st2.real_dim_e[1]) >= 6  # top slab floats: 6 rigid modes


def _solve_elastic_structured(g, dg, overlap, o, b):
    from geneo4petsc_tpu.krylov.cg import cg_solve as _cg
    import jax.numpy as _jnp
    pc, st = setup_elastic(g, dg, overlap, o, b=_jnp.asarray(b),
                           dtype=_jnp.float64)
    x0 = pc.x0 if o.eff_hybrid else None
    res = _cg(pc.matvec, _jnp.asarray(b), pc.apply, x0=x0, rtol=1e-8,
              flexible=True)
    return res, st, pc


def _solve_elastic_generic(g, dg, overlap, o, b):
    """The same problem through the generic dense-block path on the SAME
    box decomposition (to_generic with ncomp=3) — the cross-path oracle
    for the vector backend (BASELINE.md north star: identical iteration
    counts)."""
    import jax.numpy as _jnp
    from geneo4petsc_tpu.assembly.assemble import assemble
    from geneo4petsc_tpu.krylov.cg import cg_solve as _cg
    from geneo4petsc_tpu.models import elasticity as el_model
    from geneo4petsc_tpu.precond.geneo import setup_geneo

    n = g.shape[0]
    mesh = el_model.get_input(f"--size {n} --dim 3 --nu {g.nu} "
                              f"--spring {g.spring}")
    # overwrite the element moduli with g's exact per-cell field (the
    # generator reproduces the separable profiles; non-separable fields
    # come only from g)
    c = n - 1
    for ci in range(c * c * c):
        k, r = divmod(ci, c * c)
        j, i = divmod(r, c)
        mesh.elem_mats[ci] = g.e_cell[k, j, i] * g.k0
    sd = el._geom(g, dg, overlap)
    gen = sd.to_generic(mesh, ncomp=3)
    ap = assemble(mesh, gen, dtype=_jnp.float64)
    pc, st = setup_geneo(ap.batch, o, b=_jnp.asarray(b), decomp=gen)
    x0 = pc.x0 if o.eff_hybrid else None
    res = _cg(ap.batch.matvec, _jnp.asarray(b), pc.apply, x0=x0,
              rtol=1e-8)
    return res, st


def test_generic_3d_elasticity_matches_grid_operator():
    """The element-list twin (models/elasticity.py --dim 3) assembles to
    exactly the ElasticGrid operator."""
    from geneo4petsc_tpu.assembly.assemble import assemble_global_csr
    from geneo4petsc_tpu.models import elasticity as el_model
    g = elastic_grid(5, kappa_max=100.0, interp="minmax", spring=7.0)
    mesh = el_model.get_input("--size 5 --dim 3 --nu 0.3 --spring 7.0 "
                              "--kappa 100. minmax")
    a = assemble_global_csr(mesh)
    rng = np.random.default_rng(3)
    x = rng.normal(size=g.n_dof)
    np.testing.assert_allclose(a @ x, g.matvec(x), rtol=1e-11, atol=1e-9)


@pytest.mark.parametrize("lvl,optim", [
    ("ASM,1", 1.0), ("SORAS,2", 1.0), ("SORAS,E2", 1.0), ("SORAS,H2", 1.0),
])
def test_elastic_structured_vs_generic_parity(lvl, optim):
    """Vector-backend GenEO-1/GenEO-2 windows and iteration counts vs the
    generic path on the same decomposition.  The elastic level-1 solves
    are inexact PCG (no exact factorization exists for 27-point block
    stencils), so iteration counts carry a small documented band; the
    pencil windows (raw_dim_e), coarse rank, and adaptive thresholds
    must match exactly (dense-eigh routes on both sides)."""
    g = elastic_grid(6, kappa_max=1000.0, interp="minmax")
    o = GenEOOptions(optim=optim)
    o.lvl1, o.lvl2 = lvl.split(",")
    o.dls1.rtol = 1e-11             # drive the inexact PCG to near-exact
    o.dls1.max_it = 500
    _xt, b = g.manufactured_rhs()
    r_s, s_s, pc = _solve_elastic_structured(g, (2, 2, 1), 1, o, b)
    o2 = GenEOOptions(optim=optim)
    o2.lvl1, o2.lvl2 = lvl.split(",")
    r_g, s_g = _solve_elastic_generic(g, (2, 2, 1), 1, o2, b)
    assert int(r_s.reason) > 0 and int(r_g.reason) > 0
    if s_s.raw_dim_e is not None and s_g.raw_dim_e is not None:
        np.testing.assert_array_equal(s_s.raw_dim_e, s_g.raw_dim_e)
        assert int(s_s.real_dim_e.sum()) == int(s_g.real_dim_e.sum())
    else:
        np.testing.assert_array_equal(s_s.real_dim_e, s_g.real_dim_e)
    if "2" in lvl.split(",")[1]:
        np.testing.assert_allclose(s_s.tau_loc, s_g.tau_loc, rtol=1e-12)
        np.testing.assert_allclose(s_s.gamma_loc, s_g.gamma_loc,
                                   rtol=1e-12)
    assert abs(int(r_s.its) - int(r_g.its)) <= 2
    x_true = np.arange(1.0, g.n_dof + 1)
    rel = np.linalg.norm(g.matvec(np.asarray(r_s.x, np.float64)) - b) \
        / np.linalg.norm(b)
    assert rel < 1e-7
    np.testing.assert_allclose(np.asarray(r_s.x, np.float64), x_true,
                               atol=1e-4 * np.abs(x_true).max())


def test_solve_elastic_driver_nonsep():
    g = elastic_grid(8, kappa_max=1e3, nonsep=True)
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "ASM", "E1"
    opts.els2.max_it = 300
    out = solve_elastic(g, (2, 1, 1), 2, opts, tol=1e-8,
                        dtype=jnp.float64)
    assert out.converged
    assert out.true_res <= 1e-8
    x_true = np.arange(1.0, g.n_dof + 1)
    np.testing.assert_allclose(np.asarray(out.x, np.float64), x_true,
                               atol=1e-5 * np.abs(x_true).max())
