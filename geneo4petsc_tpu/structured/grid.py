"""Structured-grid problem definition: vectorized heterogeneous Laplacian.

Produces EXACTLY the same assembled operator as the element-path generator
(models/laplacian.py, itself a port of tst/laplacian/laplacian.cpp): 1-D
two-node FEM elements kappa * [[1+eps, -1], [-1, 1+eps]] along every grid
axis, the edge coefficient evaluated at the edge's LOWER endpoint (the
generator's raster-scan emission point), plus a 1-DOF Dirichlet ghost
kappa * (1+eps) on the lower boundary face of the LAST ACTIVE axis
(laplacian.cpp:118-189).  Everything here is vectorized NumPy over the
whole grid — no element lists — so a 10M-node 3-D mesh builds in seconds
instead of minutes.

Array convention: fields are [nz, ny, nx] with node id = x + nx*(y + ny*z)
(x fastest — the generator's d1 axis).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..models import _grid


@dataclass
class StructuredGrid:
    """Host-side structured problem: grid shape + per-node kappa field."""

    shape: tuple[int, int, int]       # (nx, ny, nz); inactive axes = 1
    kappa: np.ndarray                 # [nz, ny, nx] float64
    inp_eps: float = 0.0001
    dim: int = 3
    _diag: np.ndarray | None = field(default=None, repr=False)

    @property
    def n_nodes(self) -> int:
        nx, ny, nz = self.shape
        return nx * ny * nz

    # ---------------- stencil fields ----------------

    def edge_coeff(self, axis: int) -> np.ndarray:
        """Coefficient of the edge (v, v + e_axis) stored at v: -off-diag
        value is kappa(v); zero on the grid's upper face (axis 0 = x)."""
        c = self.kappa.copy()
        ax = 2 - axis                  # array axis for x/y/z
        n = self.shape[axis]
        if n == 1:
            return np.zeros_like(c)
        sl = [slice(None)] * 3
        sl[ax] = slice(n - 1, n)
        c[tuple(sl)] = 0.0
        return c

    def bc_mask(self) -> np.ndarray:
        """Boolean [nz, ny, nx]: nodes carrying the Dirichlet ghost element
        (lower face of the last active axis)."""
        m = np.zeros(self.shape[::-1], dtype=bool)
        ax = 2 - (self.dim - 1)        # array axis of the last active axis
        sl = [slice(None)] * 3
        sl[ax] = slice(0, 1)
        m[tuple(sl)] = True
        return m

    def diag(self) -> np.ndarray:
        """Assembled global diagonal [nz, ny, nx] (float64)."""
        if self._diag is not None:
            return self._diag
        w = 1.0 + self.inp_eps
        d = np.zeros(self.shape[::-1], dtype=np.float64)
        for axis in range(3):
            c = self.edge_coeff(axis)
            ax = 2 - axis
            d += w * c                                   # edge up
            d += w * np.roll(c, 1, axis=ax) * _not_first(self.shape, axis)
        d += w * self.kappa * self.bc_mask()
        self._diag = d
        return d

    # ---------------- host operator ----------------

    def matvec(self, x: np.ndarray) -> np.ndarray:
        """Assembled A @ x, vectorized host stencil apply (float64).

        The f64 truth operator for outer iterative refinement — replaces
        the assembled-CSR SpMV of the generic path at a fraction of the
        memory (no index arrays)."""
        xg = np.asarray(x, np.float64).reshape(self.shape[::-1])
        y = self.diag() * xg
        for axis in range(3):
            if self.shape[axis] == 1:
                continue
            c = self.edge_coeff(axis)
            ax = 2 - axis
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[ax] = slice(None, -1)
            hi[ax] = slice(1, None)
            lo, hi = tuple(lo), tuple(hi)
            y[lo] -= c[lo] * xg[hi]
            y[hi] -= c[lo] * xg[lo]
        return y.ravel()

    def manufactured_rhs(self) -> tuple[np.ndarray, np.ndarray]:
        """(x_true, b) with x_true = (1, 2, 3, ...) — the reference's
        manufactured-solution oracle (createB, geneo4PETSc.cpp:815-834)."""
        x = np.arange(1.0, self.n_nodes + 1)
        return x, self.matvec(x)


@partial(jax.tree_util.register_dataclass,
         data_fields=["diag", "coeff"], meta_fields=["grid_shape"])
@dataclass(frozen=True)
class GlobalStencil:
    """Device twin of StructuredGrid.matvec: the assembled global operator
    as diag + per-axis edge-coefficient fields — the iteration-phase SpMV
    (the distributed MatMult inside KSPSolve, with NO index arrays:
    XLA lowers the shifted adds to contiguous-slice fusion, the structured
    replacement for the generic path's gather/segment_sum SpMV).

    diag:  [nz, ny, nx];  coeff[a]: edge (v, v+e_a) coefficient stored at
    v (upper face zero) — the operator off-diagonal is -coeff."""

    diag: jax.Array
    coeff: tuple
    grid_shape: tuple

    def matvec(self, x: jax.Array) -> jax.Array:
        """x: flat [n] (or [n, k]) -> A @ x, same shape."""
        nx, ny, nz = self.grid_shape
        trailing = x.shape[1:]
        xg = x.reshape((nz, ny, nx) + trailing)
        extra = len(trailing)
        d = self.diag[(...,) + (None,) * extra] if extra else self.diag
        y = d * xg
        for a, c in enumerate(self.coeff):
            ax = 2 - a
            if xg.shape[ax] == 1:
                continue
            ce = c[(...,) + (None,) * extra] if extra else c
            lo = [slice(None)] * xg.ndim
            hi = [slice(None)] * xg.ndim
            lo[ax] = slice(None, -1)
            hi[ax] = slice(1, None)
            lo, hi = tuple(lo), tuple(hi)
            cl = ce[lo]
            y = y.at[lo].add(-cl * xg[hi])
            y = y.at[hi].add(-cl * xg[lo])
        return y.reshape(x.shape)


def global_stencil(g: StructuredGrid, dtype=jnp.float32) -> GlobalStencil:
    """Stage the assembled operator fields on the default device."""
    coeff = tuple(jnp.asarray(g.edge_coeff(a), dtype) for a in range(3))
    return GlobalStencil(diag=jnp.asarray(g.diag(), dtype), coeff=coeff,
                         grid_shape=g.shape)


def _not_first(shape, axis):
    """[nz, ny, nx] mask: 1 where coord along `axis` > 0."""
    nx, ny, nz = shape
    n = shape[axis]
    ax = 2 - axis
    m = np.ones(n)
    m[0] = 0.0
    sh = [1, 1, 1]
    sh[ax] = n
    return m.reshape(sh)


def laplacian_grid(size: int, dim: int = 3, kappa_max: float = 1.0,
                   interp: str = "", inp_eps: float = 0.0001,
                   weak_scaling: int = 1) -> StructuredGrid:
    """Vectorized equivalent of models/laplacian.get_input for structured
    use: kappa(x,y,z) = kx(x)*ky(y)*kz(z) with the reference's per-axis
    profiles (quad/lin/minmax, laplacianServices.cpp:7-39)."""
    n = _grid.grid_size(size, weak_scaling, dim)
    alpha, beta = _grid.init_kappa(n, interp, kappa_max)

    def profile(m):
        if m == 1:
            # inactive axis: the generator evaluates kappa at coord 0
            return np.array([_grid.compute_kappa(interp, alpha, 0.0, beta)])
        xs = np.arange(m, dtype=np.float64)
        if interp == "quad":
            return alpha * xs * xs + beta
        if interp == "lin":
            return alpha * xs + beta
        if interp == "minmax":
            return np.where(xs >= 2.0 * beta, 1.0,
                            np.where(xs >= beta, alpha, 1.0))
        return np.ones(m)

    nx = n
    ny = n if dim >= 2 else 1
    nz = n if dim >= 3 else 1
    kx, ky, kz = profile(nx), profile(ny), profile(nz)
    kappa = kz[:, None, None] * ky[None, :, None] * kx[None, None, :]
    return StructuredGrid(shape=(nx, ny, nz), kappa=kappa,
                          inp_eps=inp_eps, dim=dim)
