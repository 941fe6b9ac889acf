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
    """Host-side structured problem: grid shape + stencil fields.

    Default construction (the laplacian workload) derives the stencil from
    the per-node ``kappa`` field: 1-D two-node elements
    kappa * [[1+eps, -1], [-1, 1+eps]] per axis edge, ghost
    kappa * (1+eps) on the BC face.  Generalized workloads (heat's
    lbd*Laplacian + Mass/dt, non-separable coefficient fields) supply the
    three stencil fields explicitly via ``edge_off_``/``edge_diag_``/
    ``bc_val_`` — any symmetric operator assembled from per-axis 2-node
    edge elements with EQUAL endpoint diagonals plus nodal ghosts fits.
    """

    shape: tuple[int, int, int]       # (nx, ny, nz); inactive axes = 1
    kappa: np.ndarray                 # [nz, ny, nx] float64
    inp_eps: float = 0.0001
    dim: int = 3
    # general stencil fields (None -> derived from kappa, laplacian rules)
    edge_off_: tuple | None = None    # per axis: A[v, v+e_a] stored at v
    edge_diag_: tuple | None = None   # per axis: diag add at BOTH endpoints
    bc_val_: np.ndarray | None = None  # nodal ghost diag add
    _diag: np.ndarray | None = field(default=None, repr=False)
    # generator-set hint: True/False when the builder KNOWS whether kappa
    # is a separable kx*ky*kz product (laplacian_grid: True,
    # inclusion_grid: False); None -> fdm._axis_profiles verifies by full
    # reconstruction (O(N) host work, ~7 s at 10M DOF)
    separable_hint: bool | None = field(default=None, repr=False)
    _edge_off_cache: dict = field(default_factory=dict, repr=False)

    def __post_init__(self):
        # A True hint lets fdm._axis_profiles skip its O(N) reconstruction
        # check, so the field it vouches for must not change under it:
        # freeze the array so an in-place edit raises instead of silently
        # producing a wrong FDM factorization.
        if self.separable_hint is True:
            self.kappa.flags.writeable = False

    @property
    def n_nodes(self) -> int:
        nx, ny, nz = self.shape
        return nx * ny * nz

    @property
    def is_kappa_stencil(self) -> bool:
        """True when the stencil is the pure kappa-derived Laplacian —
        the precondition for the separable FDM fast path (fdm.py)."""
        return self.edge_off_ is None

    # ---------------- stencil fields ----------------

    def edge_coeff(self, axis: int) -> np.ndarray:
        """Kappa coefficient of the edge (v, v + e_axis) stored at v
        (the laplacian-derivation helper); zero on the grid's upper face."""
        c = self.kappa.copy()
        ax = 2 - axis                  # array axis for x/y/z
        n = self.shape[axis]
        if n == 1:
            return np.zeros_like(c)
        sl = [slice(None)] * 3
        sl[ax] = slice(n - 1, n)
        c[tuple(sl)] = 0.0
        return c

    def edge_mask(self, axis: int) -> np.ndarray:
        """1.0 where the edge (v, v + e_axis) exists (upper face zero)."""
        m = np.ones(self.shape[::-1])
        n = self.shape[axis]
        ax = 2 - axis
        if n == 1:
            return np.zeros_like(m)
        sl = [slice(None)] * 3
        sl[ax] = slice(n - 1, n)
        m[tuple(sl)] = 0.0
        return m

    def edge_off(self, axis: int) -> np.ndarray:
        """Off-diagonal VALUE of the edge (v, v + e_axis) stored at v.
        Memoized: setup + the f64 truth operator + checkpoint hashing all
        re-read these O(N) fields."""
        if self.edge_off_ is not None:
            return self.edge_off_[axis]
        key = ("off", axis)
        if key not in self._edge_off_cache:
            self._edge_off_cache[key] = -self.edge_coeff(axis)
        return self._edge_off_cache[key]

    def edge_diag(self, axis: int) -> np.ndarray:
        """Diagonal contribution of the edge stored at v, added to BOTH
        endpoints (symmetric equal-diagonal edge elements)."""
        if self.edge_diag_ is not None:
            return self.edge_diag_[axis]
        key = ("diag", axis)
        if key not in self._edge_off_cache:
            self._edge_off_cache[key] = \
                (1.0 + self.inp_eps) * self.edge_coeff(axis)
        return self._edge_off_cache[key]

    def bc_val(self) -> np.ndarray:
        """Nodal Dirichlet-ghost diagonal contribution field."""
        if self.bc_val_ is not None:
            return self.bc_val_
        key = ("bc",)
        if key not in self._edge_off_cache:
            self._edge_off_cache[key] = \
                (1.0 + self.inp_eps) * self.kappa * self.bc_mask()
        return self._edge_off_cache[key]

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
        d = np.zeros(self.shape[::-1], dtype=np.float64)
        for axis in range(3):
            c = self.edge_diag(axis)
            ax = 2 - axis
            d += c                                       # edge up
            d += np.roll(c, 1, axis=ax) * _not_first(self.shape, axis)
        d += self.bc_val()
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
            c = self.edge_off(axis)
            ax = 2 - axis
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[ax] = slice(None, -1)
            hi[ax] = slice(1, None)
            lo, hi = tuple(lo), tuple(hi)
            y[lo] += c[lo] * xg[hi]
            y[hi] += c[lo] * xg[lo]
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

    diag:  [nz, ny, nx];  coeff[a]: off-diagonal VALUE A[v, v+e_a] stored
    at v (upper face zero)."""

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
            y = y.at[lo].add(cl * xg[hi])
            y = y.at[hi].add(cl * xg[lo])
        return y.reshape(x.shape)


def derive_stencil_fields(raw, grid_shape, bc_ax, inp_eps, explicit):
    """Global stencil fields from the raw upload, mirroring the host
    derivation (StructuredGrid.edge_off/edge_diag/bc_val/diag) op for op
    and in the same f64 addition order (equal to the host fields up to
    XLA FMA contraction — observed identical after the f32 downcast on
    the gathered local fields, ~1 ulp on the f64 diag).

    raw: [1, nz, ny, nx] kappa (explicit=False, laplacian rules) or
         [7, nz, ny, nx] (eoff x3, ediag x3, bcv)."""
    nx, ny, nz = grid_shape
    if explicit:
        eoff = [raw[a] for a in range(3)]
        ediag = [raw[3 + a] for a in range(3)]
        bcv = raw[6]
    else:
        kappa = raw[0]
        eoff, ediag = [], []
        for a in range(3):
            n = grid_shape[a]
            ax = 2 - a
            if n == 1:
                z = jnp.zeros_like(kappa)
                eoff.append(z)
                ediag.append(z)
                continue
            upper = [slice(None)] * 3
            upper[ax] = slice(n - 1, n)
            ec = kappa.at[tuple(upper)].set(0.0)
            eoff.append(-ec)
            ediag.append((1.0 + inp_eps) * ec)
        bc_sl = [slice(None)] * 3
        bc_sl[bc_ax] = slice(0, 1)
        bcv = jnp.zeros_like(kappa)
        bcv = bcv.at[tuple(bc_sl)].set(
            ((1.0 + inp_eps) * kappa)[tuple(bc_sl)])
    diag = jnp.zeros(raw.shape[1:], raw.dtype)
    for a in range(3):
        ax = 2 - a
        c = ediag[a]
        diag = diag + c
        rolled = jnp.roll(c, 1, axis=ax)
        first = [slice(None)] * 3
        first[ax] = slice(0, 1)
        rolled = rolled.at[tuple(first)].set(0.0)   # _not_first mask
        diag = diag + rolled
    diag = diag + bcv
    return tuple(eoff), tuple(ediag), bcv, diag


@partial(jax.jit, static_argnames=("grid_shape", "bc_ax", "inp_eps",
                                   "explicit", "dtype"))
def _stage_global(raw, grid_shape, bc_ax, inp_eps, explicit, dtype):
    nx, ny, nz = grid_shape
    raw = raw.reshape((-1, nz, ny, nx))
    if explicit:
        eoff = tuple(raw[a] for a in range(3))
        diag = raw[3]
    else:
        eoff, _ediag, _bcv, diag = derive_stencil_fields(
            raw, grid_shape, bc_ax, inp_eps, False)
    return GlobalStencil(diag=diag.astype(dtype),
                         coeff=tuple(e.astype(dtype) for e in eoff),
                         grid_shape=grid_shape)


def global_stencil(g: StructuredGrid, dtype=jnp.float32) -> GlobalStencil:
    """Stage the assembled operator fields on the default device.

    Kappa-derived grids upload ONE f64 kappa field and derive
    eoff/diag on device (same f64 op order as the host builder; equal up
    to XLA FMA contraction of the multiply-adds, ~1 ulp on the diag);
    explicit-field grids upload eoff x3 + diag stacked.  One upload + one
    dispatch instead of four."""
    explicit = g.edge_off_ is not None
    if explicit:
        raw = np.stack([np.asarray(g.edge_off(a), np.float64)
                        for a in range(3)]
                       + [np.asarray(g.diag(), np.float64)])
    else:
        raw = np.asarray(g.kappa, np.float64)[None]
    return _stage_global(jnp.asarray(raw), g.shape, 2 - (g.dim - 1),
                         float(g.inp_eps), explicit, jnp.dtype(dtype))


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
                          inp_eps=inp_eps, dim=dim, separable_hint=True)


def heat_grid(size: int, dim: int = 3, kappa_max: float = 1.0,
              interp: str = "", inp_eps: float = 0.0001,
              lbd: float = 1.0, dt: float = 0.1,
              weak_scaling: int = 1) -> StructuredGrid:
    """Vectorized equivalent of models/heat.get_input (itself a port of
    tst/heat/heat.cpp): per-axis edge elements
    lbd * kappa * [[1+eps, -1], [-1, 1+eps]] + [[1/3, 1/6], [1/6, 1/3]]/dt
    with the 3-D kappa evaluated at the edge's lower endpoint, ghost
    lbd * kappa * (1+eps) + (1/3)/dt on the BC face.  The mass term's unit
    other-axis factors break kappa-separability, so heat runs through the
    general (non-FDM) structured solvers."""
    base = laplacian_grid(size, dim=dim, kappa_max=kappa_max, interp=interp,
                          inp_eps=inp_eps, weak_scaling=weak_scaling)
    edge_off, edge_diag = [], []
    for a in range(3):
        em = base.edge_mask(a)
        c = base.edge_coeff(a)
        edge_off.append(-lbd * c + em / (6.0 * dt))
        edge_diag.append(lbd * (1.0 + inp_eps) * c + em / (3.0 * dt))
    bc_val = (lbd * (1.0 + inp_eps) * base.kappa
              + 1.0 / (3.0 * dt)) * base.bc_mask()
    return StructuredGrid(shape=base.shape, kappa=base.kappa,
                          inp_eps=inp_eps, dim=dim,
                          edge_off_=tuple(edge_off),
                          edge_diag_=tuple(edge_diag), bc_val_=bc_val)


def inclusion_grid(size: int, dim: int = 3, kappa_max: float = 1e4,
                   n_inc: int = 27, inp_eps: float = 0.0001,
                   seed: int = 7) -> StructuredGrid:
    """High-contrast NON-SEPARABLE coefficient field: kappa = 1 background
    with ``n_inc`` spherical inclusions of kappa_max at deterministic
    pseudo-random centers.  Spheres are not axis-aligned products, so
    kappa(x,y,z) != kx*ky*kz — this is the BASELINE #5 "elasticity-style"
    scalar stand-in that the separable FDM fast path cannot factor
    (fdm._axis_profiles raises); it exercises the general inexact local
    solvers at scale."""
    nx = size
    ny = size if dim >= 2 else 1
    nz = size if dim >= 3 else 1
    rng = np.random.default_rng(seed)
    kappa = np.ones((nz, ny, nx))
    zz, yy, xx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                             indexing="ij")
    r = max(size // 10, 1)
    for _ in range(n_inc):
        cx = rng.integers(0, nx)
        cy = rng.integers(0, ny) if ny > 1 else 0
        cz = rng.integers(0, nz) if nz > 1 else 0
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2 + (zz - cz) ** 2
        kappa[d2 <= r * r] = kappa_max
    return StructuredGrid(shape=(nx, ny, nz), kappa=kappa,
                          inp_eps=inp_eps, dim=dim, separable_hint=False)
