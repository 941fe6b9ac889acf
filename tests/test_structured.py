"""Structured-grid backend: parity with the element/generic path.

Every structured kernel is cross-validated against the generic dense-block
machinery on small grids — the same cross-validation discipline the
reference applies through its dummy goldens (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geneo4petsc_tpu.assembly.assemble import assemble, assemble_global_csr
from geneo4petsc_tpu.models import laplacian
from geneo4petsc_tpu.structured import halo
from geneo4petsc_tpu.structured import local_ops as lo
from geneo4petsc_tpu.structured.block_tridiag import bt_factor, bt_solve
from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
from geneo4petsc_tpu.structured.grid import laplacian_grid

CASES = [(8, 2, (2, 2, 1), 1), (12, 2, (3, 2, 1), 2),
         (8, 3, (2, 2, 2), 2), (9, 3, (3, 3, 1), 1)]


def _setup(size, dim, dg, L, kmax=1000.0, interp="minmax"):
    g = laplacian_grid(size, dim=dim, kappa_max=kmax, interp=interp)
    sd = StructuredDecomposition(g, dg, L)
    arg = f"--size {size} --dim {dim}" + \
        (f" --kappa {kmax} {interp}" if interp else "")
    mesh = laplacian.get_input(arg)
    return g, sd, mesh


@pytest.mark.parametrize("dim,size,kmax,interp", [
    (1, 9, 1.0, ""), (2, 7, 1000.0, "minmax"), (3, 5, 100.0, "quad"),
    (3, 6, 10.0, "lin")])
def test_grid_operator_matches_element_assembly(dim, size, kmax, interp):
    arg = f"--size {size} --dim {dim}" + \
        (f" --kappa {kmax} {interp}" if interp else "")
    mesh = laplacian.get_input(arg)
    a = assemble_global_csr(mesh)
    g = laplacian_grid(size, dim=dim, kappa_max=kmax, interp=interp)
    assert g.n_nodes == mesh.n_nodes
    x = np.random.default_rng(0).standard_normal(g.n_nodes)
    np.testing.assert_allclose(g.matvec(x), a @ x, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("size,dim,dg,L", CASES)
def test_decomposition_parity(size, dim, dg, L):
    g, sd, mesh = _setup(size, dim, dg, L, 100.0)
    gen = sd.to_generic(mesh)
    np.testing.assert_array_equal(sd.node_mult().ravel(), gen.node_mult)
    nx, ny, _nz = g.shape
    ems = [sd.edge_mult(a).ravel() for a in range(3)]
    nm = sd.node_mult().ravel()
    for e in range(mesh.n_elems):
        nodes = mesh.elem_idx[mesh.elem_ptr[e]:mesh.elem_ptr[e + 1]]
        if len(nodes) == 1:
            expect = nm[nodes[0]]
        else:
            v, w = sorted(nodes)
            axis = {1: 0, nx: 1, nx * ny: 2}[w - v]
            expect = ems[axis][v]
        assert expect == gen.elem_mult[e]
    for d in range(sd.n_dom):
        gid = sd.dom_gids(d).ravel()
        np.testing.assert_array_equal(np.sort(gid[gid < g.n_nodes]),
                                      gen.dom_nodes[d])


@pytest.mark.parametrize("size,dim,dg,L", CASES[:3])
def test_halo_gather_scatter(size, dim, dg, L):
    g, sd, mesh = _setup(size, dim, dg, L, 100.0)
    gen = sd.to_generic(mesh)
    ap = assemble(mesh, gen)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(g.n_nodes)
    bl = np.asarray(halo.to_batch(
        halo.halo_gather(jnp.asarray(x), g.shape, sd.dom_grid, sd.pad)))
    gl = np.asarray(ap.batch.gather(jnp.asarray(x)))
    for d in range(sd.n_dom):
        gid = sd.dom_gids(d).ravel()
        mask = gid < g.n_nodes
        order = np.argsort(gid[mask])
        np.testing.assert_allclose(bl[d].ravel()[mask][order],
                                   gl[d][:mask.sum()])
        assert (bl[d].ravel()[~mask] == 0).all()
    yl = rng.standard_normal(bl.shape)
    ys = np.asarray(halo.halo_scatter_add(
        halo.from_batch(jnp.asarray(yl), sd.dom_grid),
        g.shape, sd.dom_grid, sd.pad))
    yref = np.zeros(g.n_nodes)
    for d in range(sd.n_dom):
        gid = sd.dom_gids(d).ravel()
        mask = gid < g.n_nodes
        np.add.at(yref, gid[mask], yl[d].ravel()[mask])
    np.testing.assert_allclose(ys, yref, rtol=1e-12)


@pytest.mark.parametrize("size,dim,dg,L", CASES)
def test_local_stencils_match_generic_blocks(size, dim, dg, L):
    g, sd, mesh = _setup(size, dim, dg, L)
    gen = sd.to_generic(mesh)
    ap = assemble(mesh, gen)
    f = lo.gather_fields(sd, dtype=jnp.float64)
    neu, dirs = lo.neumann_stencil(f), lo.dirichlet_stencil(f)
    sx, sy, sz = sd.local_shape
    rng = np.random.default_rng(2)
    xl = rng.standard_normal((sd.n_dom, sz, sy, sx))
    y_neu = np.asarray(neu.matvec(jnp.asarray(xl)))
    y_dir = np.asarray(dirs.matvec(jnp.asarray(xl)))
    a_neu, a_dir = np.asarray(ap.batch.a_neu), np.asarray(ap.batch.a_dir)
    for d in range(sd.n_dom):
        gid = sd.dom_gids(d).ravel()
        mask = gid < g.n_nodes
        order = np.argsort(gid[mask])
        nreal = mask.sum()
        xg = np.zeros(ap.batch.n_max)
        xg[:nreal] = xl[d].ravel()[mask][order]
        for ys, ab in ((y_neu, a_neu), (y_dir, a_dir)):
            np.testing.assert_allclose(ys[d].ravel()[mask][order],
                                       (ab[d] @ xg)[:nreal],
                                       rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("size,dim,dg,L", CASES)
def test_block_tridiag_solve_matches_dense(size, dim, dg, L):
    g, sd, mesh = _setup(size, dim, dg, L)
    gen = sd.to_generic(mesh)
    ap = assemble(mesh, gen)
    f = lo.gather_fields(sd, dtype=jnp.float64)
    dirs = lo.dirichlet_stencil(f)
    pax = lo.plane_axis(sd.local_shape)
    diag_p, inplane, c = lo.plane_coefficients(dirs, pax)
    fac = bt_factor(diag_p, inplane, c)
    sx, sy, sz = sd.local_shape
    rng = np.random.default_rng(3)
    xl = rng.standard_normal((sd.n_dom, sz, sy, sx))
    up = bt_solve(fac, lo.to_planes(jnp.asarray(xl), pax))
    u = np.asarray(lo.from_planes(up, pax, sd.local_shape))
    a_dir = np.asarray(ap.batch.a_dir)
    for d in range(sd.n_dom):
        gid = sd.dom_gids(d).ravel()
        mask = gid < g.n_nodes
        order = np.argsort(gid[mask])
        nreal = mask.sum()
        xg = np.zeros(ap.batch.n_max)
        xg[:nreal] = xl[d].ravel()[mask][order]
        u_ref = np.linalg.solve(a_dir[d], xg)
        np.testing.assert_allclose(u[d].ravel()[mask][order],
                                   u_ref[:nreal], rtol=1e-8, atol=1e-8)


def test_block_tridiag_bf16_symmetric():
    """bf16 factor storage must stay a SYMMETRIC solve operator (CG
    safety) with ~1e-3 relative solve accuracy."""
    g, sd, _ = _setup(8, 3, (2, 2, 2), 2)
    f = lo.gather_fields(sd, dtype=jnp.float32)
    dirs = lo.dirichlet_stencil(f)
    pax = lo.plane_axis(sd.local_shape)
    diag_p, inplane, c = lo.plane_coefficients(dirs, pax)
    fac = bt_factor(diag_p, inplane, c, factor_dtype=jnp.bfloat16)
    sx, sy, sz = sd.local_shape
    ei = np.zeros((sd.n_dom, sz, sy, sx), np.float32)
    ej = np.zeros_like(ei)
    ei[:, 2, 2, 2] = 1
    ej[:, 3, 1, 4] = 1
    si = np.asarray(lo.from_planes(bt_solve(
        fac, lo.to_planes(jnp.asarray(ei), pax)), pax, sd.local_shape))
    sj = np.asarray(lo.from_planes(bt_solve(
        fac, lo.to_planes(jnp.asarray(ej), pax)), pax, sd.local_shape))
    np.testing.assert_allclose(si[:, 3, 1, 4], sj[:, 2, 2, 2],
                               rtol=1e-5, atol=1e-7)
