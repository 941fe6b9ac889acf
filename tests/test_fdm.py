"""Fast-diagonalization subdomain solver: parity with the dense-block path.

The FDM factor must reproduce the EXACT Dirichlet/Neumann local solves the
generic path gets from dense Cholesky (and the reference from MUMPS,
src/geneo.cpp:94-124) — verified on real slots against dense solves of the
generic a_dir/a_neu blocks across 1/2/3-D, overlap 1-2, high contrast."""

import numpy as np
import jax.numpy as jnp
import pytest

from geneo4petsc_tpu.assembly.assemble import assemble
from geneo4petsc_tpu.models import laplacian
from geneo4petsc_tpu.structured import fdm
from geneo4petsc_tpu.structured import local_ops as lo
from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
from geneo4petsc_tpu.structured.grid import laplacian_grid

CASES = [(8, 1, (2, 1, 1), 2), (8, 2, (2, 2, 1), 1),
         (12, 2, (3, 2, 1), 2), (8, 3, (2, 2, 2), 2),
         (9, 3, (3, 3, 1), 1)]


def _setup(size, dim, dg, L, kmax=1000.0, interp="minmax"):
    g = laplacian_grid(size, dim=dim, kappa_max=kmax, interp=interp)
    sd = StructuredDecomposition(g, dg, L)
    arg = f"--size {size} --dim {dim}" + \
        (f" --kappa {kmax} {interp}" if interp else "")
    mesh = laplacian.get_input(arg)
    return g, sd, mesh


def _dense_blocks(sd, mesh):
    gen = sd.to_generic(mesh)
    ap = assemble(mesh, gen)
    return ap, np.asarray(ap.batch.a_neu), np.asarray(ap.batch.a_dir)


def _box_to_generic(sd, d):
    """(mask over local slots, order mapping masked slots -> sorted gids)."""
    gid = sd.dom_gids(d).ravel()
    mask = gid < sd.grid.n_nodes
    return mask, np.argsort(gid[mask])


@pytest.mark.parametrize("size,dim,dg,L", CASES)
@pytest.mark.parametrize("kind", ["dirichlet", "neumann"])
def test_axes_matvec_matches_stencil(size, dim, dg, L, kind):
    """The Kronecker-sum form equals the stencil operators on real slots."""
    g, sd, _mesh = _setup(size, dim, dg, L)
    f = lo.gather_fields(sd, dtype=jnp.float64)
    if kind == "dirichlet":
        ax = fdm.dirichlet_axes(sd)
        st = lo.dirichlet_stencil(f)
    else:
        ax = fdm.neumann_axes(sd)
        st = lo.neumann_stencil(f)
    sx, sy, sz = sd.local_shape
    rng = np.random.default_rng(0)
    xl = rng.standard_normal((sd.n_dom, sz, sy, sx))
    # zero pad slots so differing pad conventions cannot leak into real rows
    maskb = np.stack([sd.dom_nodes_mask(d) for d in range(sd.n_dom)])
    xl = xl * maskb
    y_k = np.asarray(fdm.axes_matvec(ax, jnp.asarray(xl)))
    y_s = np.asarray(st.matvec(jnp.asarray(xl)))
    np.testing.assert_allclose(y_k[maskb], y_s[maskb], rtol=1e-11,
                               atol=1e-11)


@pytest.mark.parametrize("size,dim,dg,L", CASES)
def test_fdm_dirichlet_solve_matches_dense(size, dim, dg, L):
    g, sd, mesh = _setup(size, dim, dg, L)
    _, _a_neu, a_dir = _dense_blocks(sd, mesh)
    fac = fdm.fdm_factor(fdm.dirichlet_axes(sd), dtype=jnp.float64)
    sx, sy, sz = sd.local_shape
    rng = np.random.default_rng(1)
    xl = rng.standard_normal((sd.n_dom, sz, sy, sx))
    u = np.asarray(fac.solve(jnp.asarray(xl)))
    for d in range(sd.n_dom):
        mask, order = _box_to_generic(sd, d)
        nreal = mask.sum()
        xg = np.zeros(a_dir.shape[1])
        xg[:nreal] = xl[d].ravel()[mask][order]
        u_ref = np.linalg.solve(a_dir[d], xg)
        np.testing.assert_allclose(u[d].ravel()[mask][order],
                                   u_ref[:nreal], rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("size,dim,dg,L", CASES[1:4])
def test_fdm_shifted_neumann_solve(size, dim, dg, L):
    """(A_neu + sigma * kron(D)) solve — the LOBPCG preconditioner — vs a
    dense build of the same shifted matrix."""
    sigma = 0.37
    g, sd, mesh = _setup(size, dim, dg, L)
    _, a_neu, _a_dir = _dense_blocks(sd, mesh)
    ax = fdm.neumann_axes(sd)
    fac = fdm.fdm_factor(ax, shift=sigma, dtype=jnp.float64)
    sx, sy, sz = sd.local_shape
    rng = np.random.default_rng(2)
    xl = rng.standard_normal((sd.n_dom, sz, sy, sx))
    u = np.asarray(fac.solve(jnp.asarray(xl)))
    # kron(D) diagonal on real slots = kappa / node_mult
    kap = np.asarray(sd.grid.kappa, np.float64).ravel()
    nm = sd.node_mult().ravel().astype(np.float64)
    for d in range(sd.n_dom):
        mask, order = _box_to_generic(sd, d)
        nreal = mask.sum()
        gid = sd.dom_gids(d).ravel()[mask][order]
        m = a_neu[d].copy()
        idx = np.arange(nreal)
        m[idx, idx] += sigma * kap[gid] / nm[gid]
        xg = np.zeros(m.shape[0])
        xg[:nreal] = xl[d].ravel()[mask][order]
        u_ref = np.linalg.solve(m, xg)
        np.testing.assert_allclose(u[d].ravel()[mask][order],
                                   u_ref[:nreal], rtol=1e-8, atol=1e-8)


def test_fdm_block_vectors_and_f32():
    """Block-vector solve path ([..., k]) and f32 staging stay consistent
    with the single-vector f64 route."""
    g, sd, _ = _setup(8, 3, (2, 2, 2), 2, kmax=100.0, interp="quad")
    fac64 = fdm.fdm_factor(fdm.dirichlet_axes(sd), dtype=jnp.float64)
    fac32 = fdm.fdm_factor(fdm.dirichlet_axes(sd), dtype=jnp.float32)
    sx, sy, sz = sd.local_shape
    rng = np.random.default_rng(3)
    xk = rng.standard_normal((sd.n_dom, sz, sy, sx, 3))
    uk = np.asarray(fac64.solve(jnp.asarray(xk)))
    for j in range(3):
        u1 = np.asarray(fac64.solve(jnp.asarray(xk[..., j])))
        np.testing.assert_allclose(uk[..., j], u1, rtol=1e-12)
    u32 = np.asarray(fac32.solve(jnp.asarray(xk, jnp.float32)))
    np.testing.assert_allclose(u32, uk, rtol=2e-3, atol=2e-3)


def test_fdm_rejects_nonseparable():
    # generator-stamped grids carry separable_hint=True, which lets the
    # FDM eligibility probe skip its O(N) reconstruction check — so the
    # field it vouches for is frozen: in-place edits must raise
    g = laplacian_grid(8, dim=2, kappa_max=10.0, interp="quad")
    with pytest.raises(ValueError):
        g.kappa[0, 4, 2] *= 1.5
    # an unhinted grid with a genuinely non-separable field goes through
    # the full reconstruction check and is rejected
    k = laplacian_grid(8, dim=2, kappa_max=10.0, interp="quad") \
        .kappa.copy()
    k[0, 4, 2] *= 1.5
    from geneo4petsc_tpu.structured.grid import StructuredGrid
    g2 = StructuredGrid(shape=g.shape, kappa=k, dim=2)
    sd = StructuredDecomposition(g2, (2, 2, 1), 1)
    with pytest.raises(ValueError, match="separable"):
        fdm.dirichlet_axes(sd)
