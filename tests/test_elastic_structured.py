"""3-D structured elasticity backend (structured/elastic.py): element
correctness, Neumann/Dirichlet duality, rigid-body coarse modes, and
end-to-end GenEO convergence — BASELINE #5's problem class."""

import numpy as np
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
