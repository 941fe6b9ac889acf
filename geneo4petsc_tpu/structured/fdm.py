"""Fast-diagonalization (FDM) subdomain direct solver.

The reference factors every subdomain with MUMPS sparse LU
(directLocalSolve, src/geneo.cpp:94-124).  The block-tridiagonal route
(block_tridiag.py) is the general structured analogue, but its factor
stores n_dom * P * s2^2 floats — O(N * L^2) at scale, which walls out
around ~1M DOF on a 16 GB chip.  This module is the large-scale direct
solver for SEPARABLE coefficient fields, which is exactly what the
reference's laplacian/heat generators produce: kappa(x,y,z) =
kx(x)*ky(y)*kz(z) (tst/laplacian/laplacianServices.cpp:7-39 builds the
coefficient as a product of per-axis profiles).

With a separable kappa, both local operators GenEO needs are Kronecker
sums over per-axis 1-D tridiagonal operators:

  A_loc = T_z (x) D_y (x) D_x  +  D_z (x) T_y (x) D_x  +  D_z (x) D_y (x) T_x

  * Dirichlet block (assembled A restricted to the box,
    src/geneo.cpp:1697-1705): D_a = diag(k_a), T_a = 1-D operator with the
    GLOBAL assembled diagonal (edges leaving the box still contribute
    their diagonal part) and in-box couplings only; the boundary ghost
    element (laplacian.cpp:118-189) adds w*k(0) to the first diagonal
    entry of the last active axis.
  * Neumann block (the MatIS local matrix weighted by 1/elem_mult,
    geneo4PETSc.cpp:473-476): same shape with edge weights k_a/e_a and
    axis factors D_a = diag(k_a/m_a) — separable because the box edge and
    node multiplicities are themselves per-axis interval-count products
    (structured/decompose.py).

Symmetrizing with S = (x)_a D_a^{-1/2} turns the sum into commuting
terms; eigendecomposing the three small 1-D operators
P_a L_a P_a^T = D_a^{-1/2} T_a D_a^{-1/2} gives the EXACT inverse

  A^{-1} = ((x)_a D_a^{-1/2} P_a) (L_z ⊕ L_y ⊕ L_x + sigma)^{-1}
           ((x)_a D_a^{-1/2} P_a)^T

— six batched [n_dom, L, L] x [n_dom, L, L^2...] matmuls on the MXU per
solve, O(L^2) factor memory per domain (~1000x below block-tridiag at
10M DOF).  The optional sigma shifts by sigma * (x)_a D_a — for the
Neumann axes that is sigma * diag(kappa/mult), the SPD shift used as the
LOBPCG shift-invert preconditioner (the ARPACK STSINVERT analogue,
src/geneo.cpp:635-650).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..models import _grid
from .decompose import StructuredDecomposition


@dataclass(frozen=True)
class AxisOps:
    """Host-side per-axis 1-D operators, batched over domains.

    Axis order is (x, y, z); arrays are [n_dom, L_a] / [n_dom, L_a - 1].
    ``d`` is the diagonal Kronecker factor of the OTHER axes' terms;
    out-of-grid pad slots carry d = 1, t_diag = 1, zero couplings — inert
    positive decoupled rows (the FDM analogue of the generic path's
    identity-row padding convention).
    """

    t_diag: tuple   # per axis: [n_dom, L_a]
    t_off: tuple    # per axis: [n_dom, L_a - 1]
    d: tuple        # per axis: [n_dom, L_a]


def _axis_profiles(sd: StructuredDecomposition):
    """Per-axis global kappa profiles (kx, ky, kz) recovered from the
    separable grid field; raises if the field is not separable.

    Memoized on the decomposition: the full-field reconstruction check is
    O(N) host work (~3 s at 10M DOF) and setup calls this three times
    (eligibility probe + Dirichlet + Neumann factors)."""
    cached = getattr(sd, "_axis_profiles_cache", None)
    if cached is not None:
        if isinstance(cached, Exception):
            raise cached
        return cached
    try:
        out = _axis_profiles_impl(sd)
    except ValueError as e:
        object.__setattr__(sd, "_axis_profiles_cache", e)
        raise
    object.__setattr__(sd, "_axis_profiles_cache", out)
    return out


def _axis_profiles_impl(sd: StructuredDecomposition):
    g = sd.grid
    k = np.asarray(g.kappa, np.float64)
    nz, ny, nx = k.shape
    kx = k[0, 0, :].copy()
    ky = k[0, :, 0].copy()
    kz = k[:, 0, 0].copy()
    ref = kx[0]
    if not (ref > 0.0):
        raise ValueError("FDM requires positive kappa")
    # normalize so kx*ky*kz == kappa with ky[0] = kz[0] scale folded into x
    ky = ky / ref
    kz = kz / ref
    hint = getattr(g, "separable_hint", None)
    if hint is False:
        raise ValueError("kappa field is not separable; use the "
                         "block-tridiagonal or generic path")
    if hint is not True:
        # full reconstruction check, z-slab chunked (no 3x full-size
        # temporaries — the O(N) isclose was ~7 s at 10M DOF)
        ky_kx = ky[:, None] * kx[None, :]
        for z in range(nz):
            if not np.allclose(kz[z] * ky_kx, k[z], rtol=1e-12, atol=0.0):
                raise ValueError("kappa field is not separable; use the "
                                 "block-tridiagonal or generic path")
    del nx, ny, nz
    return kx, ky, kz


def _positions(sd: StructuredDecomposition, axis: int) -> np.ndarray:
    """[n_dom] domain-grid position along `axis`."""
    gx, gy, _gz = sd.dom_grid
    d = np.arange(sd.n_dom)
    if axis == 0:
        return d % gx
    if axis == 1:
        return (d // gx) % gy
    return d // (gx * gy)


def _gather_axis(sd, axis, per_pos):
    """[g_a, L] per-position arrays -> [n_dom, L] by domain position."""
    return per_pos[_positions(sd, axis)]


def _bc_axis(sd: StructuredDecomposition) -> int:
    """Axis carrying the Dirichlet ghost elements: the LAST ACTIVE axis
    (laplacian.cpp boundary face; grid.bc_mask)."""
    return sd.grid.dim - 1


def dirichlet_axes(sd: StructuredDecomposition) -> AxisOps:
    """1-D axis operators of the batched Dirichlet blocks."""
    profs = _axis_profiles(sd)
    w = 1.0 + sd.grid.inp_eps
    t_diag, t_off, dd = [], [], []
    for a in range(3):
        n = sd.grid.shape[a]
        g = sd.dom_grid[a]
        ll = sd.local_shape[a]
        k = profs[a]
        # global 1-D assembled diagonal (edge up while not last + edge
        # down while not first) + BC ghost on the last active axis
        tg = np.zeros(n)
        if n > 1:
            tg[:-1] += w * k[:-1]
            tg[1:] += w * k[:-1]
        if a == _bc_axis(sd):
            tg[0] += w * k[0]
        # per-position local windows
        lo = np.arange(g) * sd.inner[a] - sd.pad[a]
        gidx = lo[:, None] + np.arange(ll)[None, :]      # [g, L]
        ok = (gidx >= 0) & (gidx < n)
        td = np.where(ok, tg[np.clip(gidx, 0, n - 1)], 1.0)
        da = np.where(ok, k[np.clip(gidx, 0, n - 1)], 1.0)
        if ll > 1:
            eidx = gidx[:, :-1]
            eok = (eidx >= 0) & (eidx + 1 <= n - 1)
            to = np.where(eok, -k[np.clip(eidx, 0, n - 1)], 0.0)
        else:
            to = np.zeros((g, 0))
        t_diag.append(_gather_axis(sd, a, td))
        t_off.append(_gather_axis(sd, a, to))
        dd.append(_gather_axis(sd, a, da))
    return AxisOps(t_diag=tuple(t_diag), t_off=tuple(t_off), d=tuple(dd))


def neumann_axes(sd: StructuredDecomposition) -> AxisOps:
    """1-D axis operators of the batched weighted Neumann blocks
    (the MatIS local matrices: edge weights 1/elem_mult, BC ghost weight
    1/node_mult — both separable per-axis interval-count products)."""
    profs = _axis_profiles(sd)
    w = 1.0 + sd.grid.inp_eps
    t_diag, t_off, dd = [], [], []
    for a in range(3):
        n = sd.grid.shape[a]
        g = sd.dom_grid[a]
        ll = sd.local_shape[a]
        k = profs[a]
        em = sd.axis_edge_mult(a).astype(np.float64)     # [n], 0 on top
        nm = sd.axis_node_mult(a).astype(np.float64)     # [n]
        lo = np.arange(g) * sd.inner[a] - sd.pad[a]
        gidx = lo[:, None] + np.arange(ll)[None, :]      # [g, L]
        ok = (gidx >= 0) & (gidx < n)
        gc = np.clip(gidx, 0, n - 1)
        # weighted member edges: both endpoints in the (dilated) box —
        # automatic for consecutive local slots — and inside the grid
        if ll > 1:
            eidx = gidx[:, :-1]
            eok = (eidx >= 0) & (eidx + 1 <= n - 1)
            ec = np.clip(eidx, 0, n - 1)
            ce = np.where(eok, k[ec] / np.maximum(em[ec], 1.0), 0.0)
            to = -ce
        else:
            ce = np.zeros((g, 0))
            to = np.zeros((g, 0))
        td = np.zeros((g, ll))
        if ll > 1:
            td[:, :-1] += w * ce
            td[:, 1:] += w * ce
        if a == _bc_axis(sd):
            # ghost weight 1/m_a(0) (the other axes' 1/m_b live in d)
            first = gidx == 0
            td += np.where(first, w * k[0] / nm[0], 0.0)
        td = np.where(ok, td, 1.0)
        da = np.where(ok, k[gc] / nm[gc], 1.0)
        t_diag.append(_gather_axis(sd, a, td))
        t_off.append(_gather_axis(sd, a, to))
        dd.append(_gather_axis(sd, a, da))
    return AxisOps(t_diag=tuple(t_diag), t_off=tuple(t_off), d=tuple(dd))


@partial(jax.tree_util.register_dataclass,
         data_fields=["p", "lam", "shift"], meta_fields=[])
@dataclass(frozen=True)
class FDMFactor:
    """Batched fast-diagonalization factor.

    p[a]:   [n_dom, L_a, L_a] combined transform D_a^{-1/2} P_a
            (columns = whitened eigenvectors), axis order (x, y, z)
    lam[a]: [n_dom, L_a] eigenvalues of D_a^{-1/2} T_a D_a^{-1/2}
    shift:  scalar sigma — solves (A + sigma * (x)_a D_a) u = x
    """

    p: tuple
    lam: tuple
    shift: jax.Array

    def solve(self, x: jax.Array) -> jax.Array:
        """x: [n_dom, lz, ly, lx] or [n_dom, lz, ly, lx, k]."""
        px, py, pz = self.p
        lx, ly, lz = self.lam
        extra = "k" if x.ndim == 5 else ""
        dt = x.dtype
        # adjoint transform (x)_a (D^-1/2 P)^T
        y = jnp.einsum("dzw,dzyx" + extra + "->dwyx" + extra, pz, x,
                       preferred_element_type=dt, precision="highest")
        y = jnp.einsum("dyw,dzyx" + extra + "->dzwx" + extra, py, y,
                       preferred_element_type=dt, precision="highest")
        y = jnp.einsum("dxw,dzyx" + extra + "->dzyw" + extra, px, y,
                       preferred_element_type=dt, precision="highest")
        den = (lz[:, :, None, None] + ly[:, None, :, None]
               + lx[:, None, None, :] + self.shift).astype(dt)
        y = y / (den[..., None] if extra else den)
        # forward transform (x)_a (D^-1/2 P)
        y = jnp.einsum("dzw,dwyx" + extra + "->dzyx" + extra, pz, y,
                       preferred_element_type=dt, precision="highest")
        y = jnp.einsum("dyw,dzwx" + extra + "->dzyx" + extra, py, y,
                       preferred_element_type=dt, precision="highest")
        y = jnp.einsum("dxw,dzyw" + extra + "->dzyx" + extra, px, y,
                       preferred_element_type=dt, precision="highest")
        return y

    def solve_lead(self, x: jax.Array) -> jax.Array:
        """``solve`` with a LEADING block axis: x [n_dom, m, lz, ly,
        lx].  Keeps the minor axis spatial (TPU lane utilization — see
        LocalStencil.matvec_lead); the per-domain factor matrices
        broadcast over the block axis inside the einsums."""
        px, py, pz = self.p
        lx, ly, lz = self.lam
        dt = x.dtype
        y = jnp.einsum("dzw,dmzyx->dmwyx", pz, x,
                       preferred_element_type=dt, precision="highest")
        y = jnp.einsum("dyw,dmzyx->dmzwx", py, y,
                       preferred_element_type=dt, precision="highest")
        y = jnp.einsum("dxw,dmzyx->dmzyw", px, y,
                       preferred_element_type=dt, precision="highest")
        den = (lz[:, :, None, None] + ly[:, None, :, None]
               + lx[:, None, None, :] + self.shift).astype(dt)
        y = y / den[:, None]
        y = jnp.einsum("dzw,dmwyx->dmzyx", pz, y,
                       preferred_element_type=dt, precision="highest")
        y = jnp.einsum("dyw,dmzwx->dmzyx", py, y,
                       preferred_element_type=dt, precision="highest")
        y = jnp.einsum("dxw,dmzyw->dmzyx", px, y,
                       preferred_element_type=dt, precision="highest")
        return y


def fdm_factor(ax: AxisOps, shift: float = 0.0,
               dtype=jnp.float32) -> FDMFactor:
    """Eigendecompose the three whitened 1-D operators (in f64 on host —
    they are tiny) and stage the batched transforms on device."""
    ps, lams = [], []
    for a in range(3):
        td = np.asarray(ax.t_diag[a], np.float64)
        to = np.asarray(ax.t_off[a], np.float64)
        d = np.asarray(ax.d[a], np.float64)
        n_dom, ll = td.shape
        t = np.zeros((n_dom, ll, ll))
        idx = np.arange(ll)
        t[:, idx, idx] = td
        if ll > 1:
            i2 = np.arange(ll - 1)
            t[:, i2, i2 + 1] = to
            t[:, i2 + 1, i2] = to
        ds = 1.0 / np.sqrt(d)
        t = t * ds[:, :, None] * ds[:, None, :]
        lam, q = np.linalg.eigh(t)
        ps.append(jnp.asarray(ds[:, :, None] * q, dtype))
        lams.append(jnp.asarray(lam, dtype))
    return FDMFactor(p=tuple(ps), lam=tuple(lams),
                     shift=jnp.asarray(shift, dtype))


def axes_matvec(ax: AxisOps, x: jax.Array) -> jax.Array:
    """Reference Kronecker-sum matvec (host/testing): applies
    sum_a (x D..) T_a (..D x) to [n_dom, lz, ly, lx]."""
    x64 = jnp.asarray(x, jnp.float64) if x.dtype == jnp.float64 else x
    dt = x64.dtype
    res = jnp.zeros_like(x64)
    ds = [jnp.asarray(ax.d[a], dt) for a in range(3)]
    for a in range(3):
        td = jnp.asarray(ax.t_diag[a], dt)
        to = jnp.asarray(ax.t_off[a], dt)
        arr_ax = 3 - a
        ll = x.shape[arr_ax]
        t = jnp.zeros((td.shape[0], ll, ll), dt)
        idx = jnp.arange(ll)
        t = t.at[:, idx, idx].set(td)
        if ll > 1:
            i2 = jnp.arange(ll - 1)
            t = t.at[:, i2, i2 + 1].set(to)
            t = t.at[:, i2 + 1, i2].set(to)
        sub = {0: "dwx,dzyx->dzyw", 1: "dwy,dzyx->dzwx",
               2: "dwz,dzyx->dwyx"}[a]
        y = x64
        for b in range(3):
            if b == a:
                continue
            shape = [ds[b].shape[0], 1, 1, 1]
            shape[3 - b] = ds[b].shape[1]
            y = y * ds[b].reshape(shape)
        res = res + jnp.einsum(sub, t, y)
    return res
