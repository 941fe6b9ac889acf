"""3-D linear elasticity on the structured scale backend — BASELINE #5's
actual problem class ("10M-DOF 3D elasticity-style SPD") running TPU-native.

The reference handles vector-valued operators transparently: MUMPS factors
any SPD subdomain (directLocalSolve, src/geneo.cpp:94-124) and SLEPc's
eigensolves take arbitrary sparse pencils (:626-780).  This module is the
structured-grid equivalent for trilinear (Q1) hexahedral elasticity with
3 displacement DOFs per grid node:

  * operator      — one reference 24x24 element stiffness K0(nu) scaled by
    a per-cell heterogeneous Young's modulus E(cell) (possibly
    high-contrast and NON-separable).  The matvec is the element-sum form:
    gather the 8 cell corners (static slices), one [cells, 24] x [24, 24]
    MXU matmul, scatter-add back — no sparse indices anywhere;
  * Neumann/Dirichlet duality — Neumann = member cells weighted by
    1/cell_mult (MatIS local block, geneo4PETSc.cpp:473-476); Dirichlet =
    assembled A restricted to the box, realized by applying the cell sum
    on a one-layer-DILATED window with zero-embedded input (out-of-box
    columns vanish, out-of-grid cells carry E=0 from the halo gather);
  * local solves  — inexact surrogate-preconditioned PCG
    (structured/solvers.py): a SCALAR separable surrogate built from the
    component-traced K0 coupling constants + adjacent-cell E sums,
    Jacobi-scaled and FDM-factored, applied per displacement component;
  * GenEO-1       — matrix-free batched LOBPCG on (A_Neu, D A_Dir D); the
    coarse space picks up each floating subdomain's six rigid-body modes
    (3 translations + 3 rotations) plus the high-contrast modes;
  * GenEO-2       — the (A_Neu, A_Rob) tau pencil and the swapped
    (A_Rob, D A_Dir D) gamma pencil ((19)/(21) of R4,
    src/geneo.cpp:1274-1301) with adaptive tauLoc/gammaLoc, through the
    same run_pencil conventions as the scalar backend; an exact dense
    batched-eigh route (identity-probed pencils) serves test scale;
  * E = Z^T A Z   — the same per-offset window contractions as the scalar
    backend (structured/geneo.py:_coarse_e, component-axis aware).

Supported PC family: lvl1 in {ASM, RAS, SRAS, ORAS, SORAS} (Robin =
Dirichlet + optim * border-restricted Neumann, matrix-free), lvl2 in
{0, 1, H1, E1, 2, H2, E2} — the full reference matrix.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from ..config import GenEOOptions
from ..ops.lobpcg import matfree_lobpcg
from ..precond.geneo import (GenEOStats, _gamma_loc, factor_e,
                             prune_dependent_columns)
from . import halo, solvers
from . import local_ops as lo
from .decompose import StructuredDecomposition
from .geneo import _coarse_e
from .grid import StructuredGrid


# ===================== element =====================

def q1_hex_stiffness(e_mod: float, nu: float) -> np.ndarray:
    """24x24 stiffness of a unit Q1 hexahedron (2x2x2 Gauss), isotropic.

    Node order n = dx + 2*dy + 4*dz (corner offsets in {0,1}^3), DOF order
    (ux, uy, uz) per node: dof = 3n + c."""
    lam = e_mod * nu / ((1 + nu) * (1 - 2 * nu))
    mu = e_mod / (2 * (1 + nu))
    d = np.zeros((6, 6))
    d[:3, :3] = lam
    d[np.arange(3), np.arange(3)] = lam + 2 * mu
    d[3:, 3:] = mu * np.eye(3)
    # corner signs in reference coords [-1, 1]^3
    xs = np.array([(-1) ** (1 + (n >> 0 & 1)) for n in range(8)], float)
    ys = np.array([(-1) ** (1 + (n >> 1 & 1)) for n in range(8)], float)
    zs = np.array([(-1) ** (1 + (n >> 2 & 1)) for n in range(8)], float)
    gp = np.array([-1.0, 1.0]) / np.sqrt(3.0)
    k = np.zeros((24, 24))
    for xi in gp:
        for eta in gp:
            for zeta in gp:
                dn_dxi = 0.125 * xs * (1 + ys * eta) * (1 + zs * zeta)
                dn_deta = 0.125 * ys * (1 + xs * xi) * (1 + zs * zeta)
                dn_dzeta = 0.125 * zs * (1 + xs * xi) * (1 + ys * eta)
                # unit cube: J = diag(1/2), det J = 1/8
                dn = np.stack([dn_dxi, dn_deta, dn_dzeta]) * 2.0
                b = np.zeros((6, 24))
                b[0, 0::3] = dn[0]
                b[1, 1::3] = dn[1]
                b[2, 2::3] = dn[2]
                b[3, 0::3] = dn[1]
                b[3, 1::3] = dn[0]
                b[4, 1::3] = dn[2]
                b[4, 2::3] = dn[1]
                b[5, 0::3] = dn[2]
                b[5, 2::3] = dn[0]
                k += (b.T @ d @ b) / 8.0
    return 0.5 * (k + k.T)


_CORNERS = [(n & 1, (n >> 1) & 1, (n >> 2) & 1) for n in range(8)]


# ===================== problem definition =====================

@dataclass
class ElasticGrid:
    """Host-side 3-D Q1 elasticity problem on an (nx, ny, nz) node grid."""

    shape: tuple[int, int, int]
    e_cell: np.ndarray        # [nz-1, ny-1, nx-1] per-cell modulus scale
    nu: float = 0.3
    spring: float = 1.0       # clamped-face ghost spring (per DOF)

    def __post_init__(self):
        self.k0 = q1_hex_stiffness(1.0, self.nu)

    @property
    def n_nodes(self) -> int:
        nx, ny, nz = self.shape
        return nx * ny * nz

    @property
    def n_dof(self) -> int:
        return 3 * self.n_nodes

    def bc_diag(self) -> np.ndarray:
        """[nz, ny, nx] nodal ghost-spring diagonal (z = 0 face clamped —
        the reference's ghost-element Dirichlet idiom, laplacian.cpp
        boundary face, extended per displacement component)."""
        nx, ny, nz = self.shape
        d = np.zeros((nz, ny, nx))
        d[0, :, :] = self.spring
        return d

    def cell_node_field(self) -> np.ndarray:
        """Cell field embedded in a node-shaped array at the cell's lower
        corner (upper faces zero) — the form the halo gather understands."""
        nx, ny, nz = self.shape
        f = np.zeros((nz, ny, nx))
        f[: nz - 1, : ny - 1, : nx - 1] = self.e_cell
        return f

    def matvec(self, x: np.ndarray) -> np.ndarray:
        """Assembled A @ x on the host (f64 truth operator, small scale)."""
        nx, ny, nz = self.shape
        xg = np.asarray(x, np.float64).reshape(nz, ny, nx, 3)
        cz, cy, cx = nz - 1, ny - 1, nx - 1
        xc = np.stack([xg[dz:dz + cz, dy:dy + cy, dx:dx + cx]
                       for dx, dy, dz in _CORNERS], axis=3)
        v = xc.reshape(cz, cy, cx, 24)
        w = np.einsum("ij,zyxj->zyxi", self.k0, v) * self.e_cell[..., None]
        w = w.reshape(cz, cy, cx, 8, 3)
        y = np.zeros_like(xg)
        for n, (dx, dy, dz) in enumerate(_CORNERS):
            y[dz:dz + cz, dy:dy + cy, dx:dx + cx] += w[:, :, :, n]
        y += self.bc_diag()[..., None] * xg
        return y.ravel()

    def manufactured_rhs(self) -> tuple[np.ndarray, np.ndarray]:
        """(x_true, b) with x_true = (1, 2, 3, ...) — the reference's
        manufactured-solution oracle (createB, geneo4PETSc.cpp:815-834)."""
        x = np.arange(1.0, self.n_dof + 1)
        return x, self.matvec(x)


def elastic_grid(size: int, kappa_max: float = 1.0, interp: str = "",
                 nu: float = 0.3, spring: float = 1.0,
                 nonsep: bool = False, seed: int = 7) -> ElasticGrid:
    """Heterogeneous modulus field: the laplacian generator's per-axis
    profiles (separable) or non-separable spherical inclusions."""
    from ..models import _grid
    n = size
    c = n - 1
    if nonsep:
        rng = np.random.default_rng(seed)
        e = np.ones((c, c, c))
        zz, yy, xx = np.meshgrid(*([np.arange(c)] * 3), indexing="ij")
        r = max(n // 10, 1)
        for _ in range(27):
            cx, cy, cz = rng.integers(0, c, size=3)
            e[(xx - cx) ** 2 + (yy - cy) ** 2 + (zz - cz) ** 2 <= r * r] \
                = kappa_max
    else:
        alpha, beta = _grid.init_kappa(n, interp, kappa_max)
        pr = np.array([_grid.compute_kappa(interp, alpha, i + 0.5, beta)
                       for i in range(c)])
        e = pr[:, None, None] * pr[None, :, None] * pr[None, None, :]
    return ElasticGrid(shape=(n, n, n), e_cell=e, nu=nu, spring=spring)


# ===================== device operators =====================

def _cell_apply(k0, cw, x):
    """Batched cell-sum y = sum_cells cw * K0 x_cell, static slices only.

    x:  [..., wz, wy, wx, 3, m]; cw: [..., wz-1, wy-1, wx-1]
    The leading ... is the (optional) domain batch.

    TPU layout note: the element matmul runs in a [24, m*cells] form so
    every large temporary keeps big minor dimensions.  The naive
    [..., cells, 24, m] form leaves tiny minor axes (3, m) that the
    (8, 128) tile pads by up to 43x — observed at 10M DOF as a 330 MB
    temp padded to 13.2 GB, OOMing the 16 GB v5e HBM at compile time."""
    lead = x.shape[:-5]
    nl = len(lead)
    wz, wy, wx, _, m = x.shape[-5:]
    cz, cy, cx = wz - 1, wy - 1, wx - 1
    ncell = cz * cy * cx

    # component-major working copy [..., 3m, wz, wy, wx] — spatial minor
    xt = jnp.moveaxis(x.reshape(lead + (wz, wy, wx, 3 * m)), -1, nl)

    def cut(a, dx, dy, dz):
        c = a[..., dz:dz + cz, dy:dy + cy, dx:dx + cx]
        return c.reshape(lead + (3 * m, ncell))     # compact copy

    v = jnp.stack([cut(xt, dx, dy, dz) for dx, dy, dz in _CORNERS],
                  axis=nl)                          # [..., 8, 3m, ncell]
    v = v.reshape(lead + (24, m * ncell))
    # precision="highest": the TPU MXU's default bf16 passes leave ~1e-3
    # relative error in the f32 element matmul — enough to trip CG's
    # indefiniteness guards (measured: 1.9e-3 matvec error, inner CG
    # exits after 0-4 iterations); the 6-pass product restores true f32
    w = jnp.einsum("ij,...jn->...in", k0, v,
                   preferred_element_type=x.dtype, precision="highest")
    w = w.reshape(lead + (8, 3 * m, cz, cy, cx)) \
        * cw[..., None, None, :, :, :]
    y = jnp.zeros_like(xt)
    for n, (dx, dy, dz) in enumerate(_CORNERS):
        idx = (Ellipsis, slice(dz, dz + cz), slice(dy, dy + cy),
               slice(dx, dx + cx))
        y = y.at[idx].add(w[(Ellipsis, n) + (slice(None),) * 4])
    return jnp.moveaxis(y, nl, -1).reshape(x.shape)


def _with_cols(fn, x, has_m):
    """Run fn on [..., 3, m] form regardless of a trailing column axis."""
    if not has_m:
        return fn(x[..., None])[..., 0]
    return fn(x)


@partial(jax.tree_util.register_dataclass,
         data_fields=["e_cell", "k0", "bc"], meta_fields=["grid_shape"])
@dataclass(frozen=True)
class ElasticOp:
    """Assembled global operator (iteration-phase SpMV on flat [3n]
    vectors — the distributed MatMult role)."""

    e_cell: jax.Array         # [nz-1, ny-1, nx-1]
    k0: jax.Array             # [24, 24]
    bc: jax.Array             # [nz, ny, nx] nodal spring diagonal
    grid_shape: tuple

    def matvec(self, x: jax.Array) -> jax.Array:
        nx, ny, nz = self.grid_shape
        trailing = x.shape[1:]
        xg = x.reshape((nz, ny, nx, 3) + trailing)

        def go(v):
            # z-slab the cell sum when the gather/matmul temporaries
            # would not fit HBM (the 152^3 f64 emulated apply allocates
            # ~16 GB unchunked); each node row is touched by <= 2 slabs.
            # The estimate must use the PADDED cost of the 8 per-corner
            # slice temps: XLA lays [3m, cz, cy, cx] slices out with the
            # tiny 3m axis on the 128-lane dimension (observed 42.7x
            # expansion -> 8 live 1.65 GB temps -> compile-time HBM OOM
            # of the 10.5M inner CG when a fresh dim_e shape missed the
            # executable cache)
            m = v.shape[-1]
            cz = nz - 1
            # r04-validated estimate: [24, m*ncell]-form temporaries
            # (big-minor layout, no tile padding blowup) x a 10x live
            # margin.  A r05 pad-aware variant (x 8*128/(3m) for the
            # per-corner slices) pushed the f32 m=1 inner-CG apply from
            # 1 chunk to 4 — and the chunked z-slab execution crashed
            # the TPU worker ("kernel fault") deterministically at the
            # 10.5M bench, under 2 AND 4 chunks, while this unchunked
            # f32 form is the configuration r04 demonstrably executed.
            # GENEO_ELASTIC_NCHUNKS overrides for diagnosis.
            est = cz * (ny - 1) * (nx - 1) * 24 * m \
                * jnp.dtype(v.dtype).itemsize * 10
            import os as _os
            _force = _os.environ.get("GENEO_ELASTIC_NCHUNKS", "")
            if _force:
                n_chunks = int(_force)
            else:
                n_chunks = int(np.clip(-(-est // int(4e9)), 1,
                                       max(cz, 1)))
            if n_chunks <= 1:
                y = _cell_apply(self.k0, self.e_cell, v)
            else:
                y = jnp.zeros_like(v)
                step = -(-cz // n_chunks)
                for z0 in range(0, cz, step):
                    z1 = min(z0 + step, cz)
                    ys = _cell_apply(self.k0, self.e_cell[z0:z1],
                                     v[z0:z1 + 1])
                    y = y.at[z0:z1 + 1].add(ys)
            return y + self.bc[..., None, None] * v

        return _with_cols(go, xg, bool(trailing)).reshape(x.shape)


def elastic_op(g: ElasticGrid, dtype=jnp.float32) -> ElasticOp:
    return ElasticOp(e_cell=jnp.asarray(g.e_cell, dtype),
                     k0=jnp.asarray(g.k0, dtype),
                     bc=jnp.asarray(g.bc_diag(), dtype),
                     grid_shape=g.shape)


@partial(jax.tree_util.register_dataclass,
         data_fields=["cw", "k0", "diag_add"], meta_fields=["pads"])
@dataclass(frozen=True)
class LocalElastic:
    """Batched local cell-sum operator on (optionally dilated) windows.

    cw:       [n_dom, wz-1, wy-1, wx-1] per-cell weights (0 = excluded)
    diag_add: [n_dom, wz, wy, wx] nodal diagonal (ghost springs)
    pads:     per-array-axis (z, y, x) embedding pads — nonzero means
              matvec inputs are the INNER window and the operator embeds
              them into the dilated window with zeros (the assembled-
              restricted Dirichlet semantics, src/geneo.cpp:1697-1705).
    """

    cw: jax.Array
    k0: jax.Array
    diag_add: jax.Array
    pads: tuple

    def matvec(self, x: jax.Array) -> jax.Array:
        pz, py, px = self.pads

        def go(v):
            if any(self.pads):
                pw = [(0, 0), (pz, pz), (py, py), (px, px), (0, 0), (0, 0)]
                ve = jnp.pad(v, pw)
            else:
                ve = v
            y = _cell_apply(self.k0, self.cw, ve)
            y = y + self.diag_add[..., None, None] * ve
            if any(self.pads):
                sl = (slice(None),
                      slice(pz, y.shape[1] - pz) if pz else slice(None),
                      slice(py, y.shape[2] - py) if py else slice(None),
                      slice(px, y.shape[3] - px) if px else slice(None))
                y = y[sl]
            return y

        return _with_cols(go, x, x.ndim == 6)


@partial(jax.tree_util.register_dataclass,
         data_fields=["op", "d"], meta_fields=[])
@dataclass(frozen=True)
class PouSandwich:
    """D A D for a nodal field d (broadcast over components)."""

    op: object
    d: jax.Array              # [n_dom, wz, wy, wx]

    def matvec(self, x: jax.Array) -> jax.Array:
        extra = x.ndim - 4
        d = self.d[(...,) + (None,) * extra]
        return d * self.op.matvec(d * x)


@partial(jax.tree_util.register_dataclass,
         data_fields=["dir_op", "neu_op", "border", "optim"],
         meta_fields=[])
@dataclass(frozen=True)
class RobinOp:
    """Dirichlet + optim * (R_border A_Neu R_border) — the ORAS/SORAS
    Robin operator matrix-free (createRobinMatrix, geneo.cpp:1613-1670)."""

    dir_op: object
    neu_op: object
    border: jax.Array         # [n_dom, wz, wy, wx] 0/1 nodal mask
    optim: jax.Array

    def matvec(self, x: jax.Array) -> jax.Array:
        extra = x.ndim - 4
        b = self.border[(...,) + (None,) * extra]
        return self.dir_op.matvec(x) + self.optim * b * \
            self.neu_op.matvec(b * x)


@partial(jax.tree_util.register_dataclass,
         data_fields=["fdm"], meta_fields=[])
@dataclass(frozen=True)
class VecFDM:
    """Apply a scalar ScaledFDM per displacement component (the
    component-decoupled surrogate preconditioner)."""

    fdm: solvers.ScaledFDM

    def solve(self, x: jax.Array) -> jax.Array:
        if x.ndim == 5:                       # [d, wz, wy, wx, 3]
            return self.fdm.solve(x)          # components as columns
        # [d, wz, wy, wx, 3, m] -> fold (3, m) into columns
        d, wz, wy, wx, c, m = x.shape
        y = self.fdm.solve(x.reshape(d, wz, wy, wx, c * m))
        return y.reshape(x.shape)


def _scalar_surrogate(g: ElasticGrid, cw: jax.Array, diag_add: jax.Array,
                      maskf: jax.Array, shift: float,
                      dtype) -> solvers.ScaledFDM:
    """Scalar separable surrogate of the (weighted) elasticity operator.

    Couplings from the component trace of K0: diagonal constant
    d0 = tr(K0)/24 per (node, cell) incidence; axis coupling constant
    t_a = mean over the 4 axis-a node pairs of (1/3) sum_c
    K0[(n1,c),(n2,c)].  The stencil fields are then d0 * (adjacent-cell
    weight sums) and t_a * (edge-sharing-cell weight sums) — pure shifted
    adds on the cell-weight field."""
    k0 = np.asarray(g.k0, np.float64)
    d0 = float(np.trace(k0)) / 24.0
    t = []
    for a in range(3):
        vals = []
        for n1, (dx, dy, dz) in enumerate(_CORNERS):
            off = [dx, dy, dz]
            if off[a] == 1:
                continue
            off[a] = 1
            n2 = off[0] + 2 * off[1] + 4 * off[2]
            vals.append(sum(k0[3 * n1 + c, 3 * n2 + c]
                            for c in range(3)) / 3.0)
        t.append(float(np.mean(vals)))

    n_dom, wz, wy, wx = maskf.shape

    def cell_sum(arr, sums_axes):
        """Sum the cell field over corners along the given axes -> node
        field: each node sums cells at offsets {-1, 0} along summed axes,
        {0} along kept axes (the cell array is one shorter per axis and
        aligned at the lower corner; zero padding handles faces)."""
        out = None
        from itertools import product as _prod
        offs = [([0, 1] if ax in sums_axes else [0]) for ax in (1, 2, 3)]
        ae = jnp.pad(arr, [(0, 0), (1, 1), (1, 1), (1, 1)])
        for oz, oy, ox in _prod(*offs):
            sl = (slice(None),
                  slice(1 - oz, 1 - oz + wz),
                  slice(1 - oy, 1 - oy + wy),
                  slice(1 - ox, 1 - ox + wx))
            piece = ae[sl]
            out = piece if out is None else out + piece
        return out

    diag = d0 * cell_sum(cw, {1, 2, 3}) + diag_add
    offs = []
    for a in range(3):
        ax = 3 - a
        other = {1, 2, 3} - {ax}
        edge_cells = cell_sum(cw, other)      # at the edge's lower node
        off = t[a] * edge_cells
        # zero the upper face (no edge beyond the window)
        idx = [slice(None)] * 4
        idx[ax] = slice((wz if ax == 1 else wy if ax == 2 else wx) - 1,
                        None)
        off = off.at[tuple(idx)].set(0.0)
        offs.append(off)
    diag = jnp.where(maskf > 0, jnp.maximum(diag, 1e-30), 1.0)
    offs = [jnp.where(maskf > 0, o, 0.0) for o in offs]
    st = lo.LocalStencil(diag=diag, offs=tuple(offs))
    return solvers.surrogate_fdm(st, maskf, shift=shift, dtype=dtype)


# ===================== preconditioner =====================

@partial(jax.tree_util.register_dataclass,
         data_fields=["gop", "l1", "pou", "maskf", "z", "colids",
                      "e_evecs", "e_eig_inv", "x0"],
         meta_fields=["grid_shape", "dom_grid", "pad", "local_shape",
                      "lvl1", "lvl2", "hybrid", "eff_hybrid", "dim_e",
                      "k_max", "l1_exact"])
@dataclass(frozen=True)
class ElasticGenEO:
    """The vector-DOF twin of StructuredGenEO: same applyGenEOPC
    semantics (src/geneo.cpp:2051-2098) on [.., 3]-component fields."""

    grid_shape: tuple
    dom_grid: tuple
    pad: tuple
    local_shape: tuple
    lvl1: str
    lvl2: int
    hybrid: bool
    eff_hybrid: bool
    dim_e: int
    k_max: int
    gop: ElasticOp
    l1: object                   # local solver (.solve on [d,wz,wy,wx,3])
    pou: jax.Array | None        # [d, wz, wy, wx] nodal partition of unity
    maskf: jax.Array             # [d, wz, wy, wx]
    z: jax.Array | None          # [d, wz, wy, wx, 3, k_max]
    colids: jax.Array | None
    e_evecs: jax.Array | None
    e_eig_inv: jax.Array | None
    x0: jax.Array                # [3n]
    l1_exact: bool = False

    def _gather(self, x: jax.Array) -> jax.Array:
        nx, ny, nz = self.grid_shape
        return halo.to_batch(halo.halo_gather(
            x.reshape(nx * ny * nz, 3), self.grid_shape, self.dom_grid,
            self.pad))

    def _scatter(self, xb: jax.Array) -> jax.Array:
        y = halo.halo_scatter_add(
            halo.from_batch(xb, self.dom_grid), self.grid_shape,
            self.dom_grid, self.pad)
        return y.reshape(-1)

    def matvec(self, x: jax.Array) -> jax.Array:
        return self.gop.matvec(x)

    def apply_q(self, x: jax.Array) -> jax.Array:
        xb = self._gather(x)
        ztx = jnp.einsum("dzyxck,dzyxc->dk", self.z, xb,
                         preferred_element_type=x.dtype,
                         precision="highest")
        w = jax.ops.segment_sum(ztx.ravel(), self.colids.ravel(),
                                num_segments=self.dim_e + 1)[:-1]
        w = self.e_evecs @ (self.e_eig_inv * (self.e_evecs.T @ w))
        wp = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])
        wl = wp[self.colids]
        yb = jnp.einsum("dzyxck,dk->dzyxc", self.z, wl,
                        preferred_element_type=x.dtype,
                        precision="highest")
        return self._scatter(yb)

    def _local_solve(self, x: jax.Array) -> jax.Array:
        xb = self._gather(x)
        if self.lvl1 in ("RAS", "SRAS", "ORAS", "SORAS"):
            xb = xb * self.pou[..., None]           # (1.29) of R1
        ub = self.l1.solve(xb)
        if self.lvl1 in ("SRAS", "SORAS"):
            ub = ub * self.pou[..., None]
        ub = ub * self.maskf[..., None]
        return self._scatter(ub)

    def apply(self, x: jax.Array) -> jax.Array:
        if self.lvl2 and not self.eff_hybrid:
            y = self.apply_q(x)
        else:
            y = jnp.zeros_like(x)
        t = x
        if self.hybrid and not self.eff_hybrid:
            t = t - self.matvec(y)                  # (I - P^T) x
        t = self._local_solve(t)
        if self.hybrid:
            t = t - self.apply_q(self.matvec(t))    # (I - P) t
        return y + t

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.apply(x)


# ===================== setup =====================

@partial(jax.jit, static_argnames=("grid_shape", "dom_grid", "pad"))
def _gather_stack(raw, grid_shape, dom_grid, pad):
    """[F, N] stacked global fields -> F+1 batched local boxes (last =
    gathered ones mask), one dispatch."""
    ones = jnp.ones((1, raw.shape[1]), raw.dtype)
    stack = jnp.concatenate([raw, ones], 0).T
    b = halo.to_batch(halo.halo_gather(stack, grid_shape, dom_grid, pad))
    return tuple(b[..., i] for i in range(raw.shape[0] + 1))


def _geom(g: ElasticGrid, dom_grid, overlap) -> StructuredDecomposition:
    """Node-grid box decomposition (geometry only; kappa unused)."""
    nx, ny, nz = g.shape
    gg = StructuredGrid(shape=g.shape, kappa=np.ones((nz, ny, nx)),
                        dim=3)
    return StructuredDecomposition(gg, tuple(dom_grid), overlap)


def setup_elastic(g: ElasticGrid, dom_grid, overlap: int,
                  opts: GenEOOptions, b: jax.Array | None = None,
                  dtype=jnp.float32, timers=None
                  ) -> tuple[ElasticGenEO, GenEOStats]:
    """Structured setUpGenEOPC for 3-D Q1 elasticity."""
    import os as _os
    import sys as _sys
    import time as _time
    from .geneo import finalize_coarse
    opts.validate()
    _dbg = _os.environ.get("GENEO_SETUP_VERBOSE") == "1"
    _t0 = _time.perf_counter()

    def _vlog(msg):
        if _dbg:
            mem = ""
            try:
                st_ = jax.devices()[0].memory_stats()
                if st_:
                    mem = (f" [dev {st_.get('bytes_in_use', 0) / 1e9:.2f}"
                           f"/{st_.get('bytes_limit', 0) / 1e9:.2f} GB]")
            except Exception:
                pass
            print(f"[esetup {_time.perf_counter() - _t0:7.2f}s] "
                  f"{msg}{mem}", file=_sys.stderr, flush=True)

    def _mark(name, t0):
        if timers is not None:
            timers.add(name, _time.perf_counter() - t0)
        return _time.perf_counter()

    sd = _geom(g, dom_grid, overlap)
    n_dom = sd.n_dom
    sx, sy, sz = sd.local_shape
    n_loc3 = sx * sy * sz * 3
    pad1 = tuple(p + 1 if gg > 1 else 0
                 for p, gg in zip(sd.pad, sd.dom_grid))
    gshape = g.shape

    _t = _time.perf_counter()

    # cell-weight fields (node-embedded at the cell's lower corner);
    # ONE stacked upload + one jitted gather per pad geometry instead of
    # nine eager upload+gather round trips (each ~2 s on the tunnel)
    ecn = g.cell_node_field()
    em = [sd.axis_edge_mult(a).astype(np.float64) for a in range(3)]
    cmult = em[2][:, None, None] * em[1][None, :, None] \
        * em[0][None, None, :]
    ecn_w = np.where(cmult > 0, ecn / np.maximum(cmult, 1.0), 0.0)
    bcd = g.bc_diag()
    nm = sd.node_mult().astype(np.float64)
    bcn = np.where(nm > 0, bcd / np.maximum(nm, 1.0), 0.0)
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    raw = np.empty((5, g.n_nodes), np_dtype)
    for i, h in enumerate((ecn, ecn_w, bcd, bcn, nm)):
        raw[i] = np.asarray(h, np.float64).ravel()
    raw_dev = jnp.asarray(raw)
    d1 = _gather_stack(raw_dev, gshape, sd.dom_grid, pad1)
    d2 = _gather_stack(raw_dev, gshape, sd.dom_grid, sd.pad)
    del raw_dev
    cw_dil = d1[0][:, :-1, :-1, :-1]
    bc_dir_dil = d1[2]
    maskd = d1[5]
    cw_inner = d2[0][:, :-1, :-1, :-1]
    cw_neu = d2[1][:, :-1, :-1, :-1]
    bc_dir = d2[2]
    bc_neu = d2[3]
    mult = d2[4]
    maskf = d2[5]
    k0d = jnp.asarray(g.k0, dtype)
    gop = elastic_op(g, dtype)
    _vlog("fields gathered")

    # window pads of the embed-and-dilate Dirichlet apply
    dil_pads = tuple(1 if gg > 1 else 0 for gg in sd.dom_grid[::-1])

    dir_dil = LocalElastic(cw=cw_dil, k0=k0d, diag_add=bc_dir_dil,
                           pads=(0, 0, 0))
    dir_wrap = LocalElastic(cw=cw_dil, k0=k0d, diag_add=bc_dir_dil,
                            pads=dil_pads)
    neu_op = LocalElastic(cw=cw_neu, k0=k0d, diag_add=bc_neu,
                          pads=(0, 0, 0))

    need_pou = opts.lvl2_num > 0 or opts.lvl1_ras
    pou_b = jnp.where(maskf > 0, 1.0 / jnp.maximum(mult, 1.0), 0.0) \
        .astype(dtype)

    # level-1 solver: inexact surrogate-preconditioned PCG (no exact
    # route exists for 27-point block stencils — the MUMPS equivalent is
    # approximated; pair with flexible CG outer)
    rob_op = None
    if opts.lvl1_oras or opts.lvl2_num == 2:
        border = ((mult > 1.0) & (maskf > 0)).astype(dtype)
        rob_op = RobinOp(dir_op=dir_wrap, neu_op=neu_op, border=border,
                         optim=jnp.asarray(opts.optim, dtype))
    l1_op = rob_op if opts.lvl1_oras else dir_wrap
    # 1-wide component axis: broadcasting inside the solvers replaces a
    # materialized [d, wz, wy, wx, 3] mask (455 MB at the 10M bench)
    maskf3 = maskf[..., None].astype(dtype)
    pre_l1 = VecFDM(_scalar_surrogate(g, cw_inner, bc_dir, maskf,
                                      0.0, dtype))
    l1 = solvers.PCGSolver(st=l1_op, pre=pre_l1, maskf=maskf3,
                           rtol=float(opts.dls1.rtol),
                           max_it=min(int(opts.dls1.max_it), 200))
    _t = _mark("l1_minv", _t)
    _vlog("L1 solver built")

    stats = GenEOStats(
        estim_dim_e=np.zeros(n_dom, np.int64),
        real_dim_e=np.zeros(n_dom, np.int64),
        nicolaides=np.zeros(n_dom, np.int64),
        tau_loc=np.full(n_dom, -1.0), gamma_loc=np.full(n_dom, -1.0))

    if opts.lvl2_num == 0:
        pc = ElasticGenEO(
            grid_shape=gshape, dom_grid=sd.dom_grid, pad=sd.pad,
            local_shape=sd.local_shape, lvl1=opts.lvl1, lvl2=0,
            hybrid=False, eff_hybrid=False, dim_e=0, k_max=0, gop=gop,
            l1=l1, pou=pou_b, maskf=maskf.astype(dtype), z=None,
            colids=None, e_evecs=None, e_eig_inv=None,
            x0=jnp.zeros(g.n_dof, dtype), l1_exact=False)
        return pc, stats

    # ----- GenEO eigensolves -----
    # GenEO-1: (A_Neu, D A_Dir D) <= tau               (Def 7.14 of R1)
    # GenEO-2: (A_Neu, A_Rob) <= tauLoc ((19) of R4) and the swapped
    #          gamma pencil (A_Rob, D A_Dir D), mu <= 1/gammaLoc ((21) of
    #          R4) — the scalar backend's conventions
    #          (structured/geneo.py) on vector-component fields.
    _t = _time.perf_counter()
    b_dad = PouSandwich(op=dir_wrap, d=pou_b)
    max_it = min(int(opts.els2.max_it), 400) \
        if opts.els2.max_it < 10000 else 100
    box = (n_dom, sz, sy, sx, 3, -1)
    flat = (n_dom, n_loc3, -1)
    maskc = jnp.broadcast_to(
        maskf[..., None].astype(dtype),
        maskf.shape + (3,)).reshape(n_dom, n_loc3)

    def _rigid_block():
        """[1, n_loc3, 6] — the six rigid-body modes (3 translations +
        3 rotations about the window center) in the local frame.  They
        are EXACT null vectors of floating Neumann blocks (K0 annihilates
        linearized rigid fields), so seeding the LOBPCG search block with
        them locks the near-kernel instantly — the elasticity
        near-nullspace discipline; a generic random block needs many
        iterations to dig these out through a scalar surrogate
        preconditioner (measured: kept-pair residuals ~1 at 60 its)."""
        zz = np.arange(sz) - (sz - 1) / 2.0
        yy = np.arange(sy) - (sy - 1) / 2.0
        xx = np.arange(sx) - (sx - 1) / 2.0
        z3, y3, x3 = np.meshgrid(zz, yy, xx, indexing="ij")
        scale = max(sx, sy, sz)
        z3, y3, x3 = z3 / scale, y3 / scale, x3 / scale
        cols = np.zeros((sz, sy, sx, 3, 6))
        cols[..., 0, 0] = 1.0                          # t_x
        cols[..., 1, 1] = 1.0                          # t_y
        cols[..., 2, 2] = 1.0                          # t_z
        cols[..., 0, 3], cols[..., 1, 3] = -y3, x3     # r_z
        cols[..., 1, 4], cols[..., 2, 4] = -z3, y3     # r_x
        cols[..., 0, 5], cols[..., 2, 5] = z3, -x3     # r_y
        return jnp.asarray(cols.reshape(1, n_loc3, 6), dtype)

    rigid0 = _rigid_block()
    run_lobpcg = _elastic_lobpcg_jit(box[1:], jnp.dtype(dtype).name,
                                     max_it, float(opts.els2.rtol))

    # chunk the domain batch to a device-memory budget: the dilated cell
    # gathers cost ~8 * n_cells * 24 * 4 bytes per (domain, column) live
    # inside the LOBPCG while-loop (measured: 27.8 GB compile-time
    # allocation for 64 domains x 24 columns at 72^3 — far past HBM);
    # one compiled executable per chunk shape, reused across slices
    budget = float(_os.environ.get("GENEO_LOBPCG_BUDGET_GB", "6")) * 1e9

    def _slice(t, lo_i, hi_i):
        return jax.tree_util.tree_map(
            lambda a: a[lo_i:hi_i]
            if getattr(a, "ndim", 0) >= 1 and a.shape[0] == n_dom else a,
            t)

    def _cat(t1, t2, have):
        return jax.tree_util.tree_map(
            lambda a, c2: jnp.concatenate([a, c2], 0)
            if getattr(a, "ndim", 0) >= 1 and a.shape[0] == have
            else a, t1, t2)

    def run_all(a_t, b_t, t_t, k, seed_rigid=True, x0_prev=None):
        n_cells3 = (sz - 1) * (sy - 1) * (sx - 1) * 24
        per_dom = (n_loc3 * 16 + n_cells3 * 8) * (3 * k) * 4
        chunk = int(np.clip(budget // max(per_dom, 1), 1, n_dom))
        if chunk >= n_dom:
            return run_lobpcg(a_t, b_t, t_t, maskc, rigid0, k,
                              seed_rigid=seed_rigid, x0_prev=x0_prev)
        trees = (a_t, b_t, t_t, maskc, x0_prev)
        n_chunks = (n_dom + chunk - 1) // chunk
        parts = []
        for ci in range(n_chunks):
            lo_i, hi_i = ci * chunk, min((ci + 1) * chunk, n_dom)
            args = [_slice(t, lo_i, hi_i) for t in trees]
            if hi_i - lo_i < chunk:
                pad_n = chunk - (hi_i - lo_i)
                args = [_cat(a, _slice(t, 0, pad_n), hi_i - lo_i)
                        for a, t in zip(args, trees)]
            out = run_lobpcg(args[0], args[1], args[2], args[3], rigid0,
                             k, seed_rigid=seed_rigid, x0_prev=args[4])
            jax.block_until_ready(out[0])
            parts.append(tuple(o[:hi_i - lo_i] for o in out))
            _vlog(f"lobpcg chunk {ci + 1}/{n_chunks} (k={k}) done")
        return tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                     for i in range(3))

    def dense_pencil(a_t, b_t, steer, flip):
        """Materialize the batched pencil from the cell-sum matvecs
        (identity probe — test scale only) and solve with the exact
        batched eigh: the scalar backend's dense route
        (structured/geneo.py dense_pencil) on vector-component fields.
        Pad slots are decoupled rows; ``steer`` pins their eigenvalues
        outside the kept window."""
        eye = jnp.broadcast_to(
            jnp.eye(n_loc3, dtype=dtype), (n_dom, n_loc3, n_loc3))
        box6 = (n_dom, sz, sy, sx, 3, n_loc3)
        a_d = a_t.matvec(eye.reshape(box6)).reshape(
            n_dom, n_loc3, n_loc3)
        b_d = b_t.matvec(eye.reshape(box6)).reshape(
            n_dom, n_loc3, n_loc3)
        padf = 1.0 - maskc
        pad_eye = padf[:, :, None] * padf[:, None, :] \
            * jnp.eye(n_loc3, dtype=dtype)
        from ..ops import batched_linalg as bl
        a_eff = a_d - a_d * pad_eye + steer * pad_eye
        b_eff = b_d - b_d * pad_eye + pad_eye
        w, v_ = bl.generalized_eigh(a_eff, b_eff)
        w_np = np.asarray(w, np.float64)
        v_ = jnp.asarray(v_, dtype)
        if flip:
            w_np = w_np[:, ::-1].copy()
            v_ = v_[:, :, ::-1]
        return w_np, v_

    dense_ok = opts.els2.type != "lobpcg" and n_loc3 <= 1024

    def run_pencil(label, a_t, b_t, t_t, thr, thr_dense, cut_p):
        """One GenEO pencil -> (w_np, v, base, kept_res) with w in the
        PENCIL-LAMBDA convention and the kept window a prefix (ascending
        tau / descending gamma) — structured/geneo.py's run_pencil on
        vector fields; the gamma problem runs the SWAPPED pencil
        (smallest mu = 1/lambda)."""
        gamma_p = label == "gamma"
        if dense_ok:
            if gamma_p:
                # unswapped (D A_Dir D, A_Rob), largest lambda
                w_np, v_ = dense_pencil(b_t, a_t, 1e-6, flip=True)
                base_ = (w_np >= thr_dense[:, None]).sum(1) \
                    .astype(np.int64)
            else:
                w_np, v_ = dense_pencil(a_t, b_t, 1e6, flip=False)
                base_ = (w_np <= thr_dense[:, None]).sum(1) \
                    .astype(np.int64)
            if cut_p > 0:
                base_ = np.minimum(base_, cut_p)
            _vlog(f"dense eigh[{label}] done")
            return w_np, v_, base_, np.zeros(n_dom)
        # iterative route: warm-restarted candidate growth; elasticity
        # floats carry >= 6 rigid modes, so start at 8 (3 translations +
        # 3 rotations + margin)
        k_cand = cut_p if cut_p > 0 else 8
        k_cand = min(k_cand, n_loc3)
        x_prev = None
        while True:
            w, v_, res = run_all(a_t, b_t, t_t, k_cand,
                                 seed_rigid=not gamma_p, x0_prev=x_prev)
            w_np = np.asarray(w, np.float64)
            _vlog(f"lobpcg[{label}] k={k_cand} done")
            if cut_p > 0 or k_cand >= min(128, n_loc3):
                break
            if np.all(w_np[:, -1] > thr):
                break
            x_prev = v_
            k_cand = min(k_cand * 2, min(128, n_loc3))
        res_np = np.asarray(res, np.float64)
        _vlog(f"lobpcg[{label}] w[:,0]="
              f"{np.array2string(w_np[:, 0], precision=4)} max_res="
              f"{np.array2string(np.asarray(res).max(-1), precision=2)}")
        base_ = (w_np <= thr[:, None]).sum(axis=1).astype(np.int64)
        if cut_p > 0:
            base_ = np.minimum(base_, cut_p)
        kept_res = np.zeros(n_dom)
        for p in range(n_dom):
            if base_[p] > 0:
                kept_res[p] = float(res_np[p, :base_[p]].max())
        if gamma_p:
            # map the swapped-pencil mu back to lambda = 1/mu
            w_np = 1.0 / np.maximum(w_np, np.finfo(np.float64).tiny)
        return w_np, v_, base_, kept_res

    # pencil list + shift-invert surrogate preconditioners
    cut_p = opts.cut
    if opts.lvl2_num == 2 and cut_p >= 2:
        cut_p = cut_p // 2                    # halved (geneo.cpp:1275)
    if opts.lvl2_num == 1:
        thr1 = np.full(n_dom, float(opts.tau))
        t1 = None if dense_ok else VecFDM(_scalar_surrogate(
            g, cw_neu, bc_neu, maskf, float(opts.tau), dtype))
        pencils = [("tau", neu_op, b_dad, thr1, thr1, t1)]
    else:
        from .geneo import _tau_loc_structured
        tl = _tau_loc_structured(sd, opts.tau, opts.cst)
        gl = _gamma_loc(sd.adjacency(), n_dom, opts.gamma, opts.cst)
        stats.tau_loc, stats.gamma_loc = tl, gl
        thr2 = 1.0 / np.maximum(gl, 1e-12)    # swapped-pencil mu window
        if dense_ok:
            t1 = t2 = None
        else:
            # surrogates of (A_Neu + mean(tl) A_Rob) and (A_Rob +
            # mean(thr2) DADirD): Robin ~ Dirichlet cellwise (the optim
            # border term and the PoU sandwich are preconditioner-level
            # detail), so fold the Dirichlet weights in scaled
            tl_m = float(np.mean(tl))
            t1 = VecFDM(_scalar_surrogate(
                g, cw_neu + tl_m * cw_inner, bc_neu + tl_m * bc_dir,
                maskf, 0.0, dtype))
            th_m = float(np.mean(thr2))
            t2 = VecFDM(_scalar_surrogate(
                g, (1.0 + th_m) * cw_inner, (1.0 + th_m) * bc_dir,
                maskf, 0.0, dtype))
        pencils = [("tau", neu_op, rob_op, tl, tl, t1),
                   ("gamma", rob_op, b_dad, thr2, gl, t2)]

    runs = []
    for label, a_t, b_t, thr, thr_dense, t_t in pencils:
        _tp = _time.perf_counter()
        w_np, v_p, base_p, kres = run_pencil(label, a_t, b_t, t_t, thr,
                                             thr_dense, cut_p)
        if timers is not None:
            _dt = _time.perf_counter() - _tp
            timers.add("l2_eig", _dt)
            timers.add(f"l2_{label}_eig", _dt)
        runs.append((label, w_np, v_p, base_p, kres))
    if jax.default_backend() != "cpu":
        # drop the LOBPCG executables: their device scratch reservations
        # (sized to the chunk budget) otherwise stay resident and starve
        # the E-assembly allocations (observed ResourceExhausted at a
        # 1 GB pad with < 5 GB of live arrays)
        jax.clear_caches()
    _t = _time.perf_counter()

    w1_np, v1, base1 = runs[0][1], runs[0][2], runs[0][3]
    kept_res = runs[0][4].copy()
    if len(runs) > 1:
        w2_np, v2, base2 = runs[1][1], runs[1][2], runs[1][3]
        kept_res = np.maximum(kept_res, runs[1][4])
        lam2 = w2_np                # already in lambda convention
    else:
        v2, base2, lam2 = None, np.zeros(n_dom, np.int64), None
    stats.estim_dim_e = base1 + base2
    stats.lobpcg_res = kept_res

    # Nicolaides (geneo.cpp:897-955): constant vector over ALL components,
    # tested against the tau pencil's B operator
    b_tau = pencils[0][2]
    ones_b = maskc.reshape(n_dom, sz, sy, sx, 3)
    num_all = np.asarray(jnp.einsum(
        "dzyxc,dzyxc->d", ones_b, neu_op.matvec(ones_b)), np.float64)
    den_all = np.asarray(jnp.einsum(
        "dzyxc,dzyxc->d", ones_b, b_tau.matvec(ones_b)), np.float64)
    eps64 = np.finfo(np.float64).eps
    eps32 = np.finfo(np.float32).eps
    n_real = np.asarray(jnp.sum(maskf.reshape(n_dom, -1), axis=1),
                        np.int64)
    nic = np.zeros(n_dom, bool)
    for p in range(n_dom):
        if n_real[p] == 0:
            continue
        kept_min = w1_np[p, 0] if base1[p] > 0 else np.inf
        if base1[p] > 0 and kept_min < eps64:
            continue
        ratio = abs(num_all[p] / den_all[p]) if den_all[p] != 0 else np.inf
        if ratio <= eps32 or base1[p] + base2[p] == 0:
            nic[p] = True
    stats.nicolaides = nic.astype(np.int64)
    counts = base1 + nic + base2
    stats.real_dim_e = counts.copy()
    stats.raw_dim_e = counts.copy()
    stats.eigenvalues = [
        [float(x) for x in w1_np[p, :base1[p]]]
        + ([0.0] if nic[p] else [])
        + ([float(x) for x in lam2[p, :base2[p]]] if lam2 is not None
           else [])
        for p in range(n_dom)]
    dim_e = int(counts.sum())
    k_max = max(int(counts.max()), 1)
    _vlog(f"columns selected (dim_e={dim_e}, k_max={k_max})")

    # D-weighted Z ((7.49) of R1): per domain the columns are [tau-kept
    # prefix, Nicolaides constant, gamma-kept prefix] — the generic
    # path's column order
    col = np.arange(k_max)

    def pad_cols(v_):
        k_v = v_.shape[-1]
        if k_v < k_max:
            return jnp.concatenate(
                [v_, jnp.zeros((n_dom, n_loc3, k_max - k_v), dtype)],
                axis=-1)
        return v_[:, :, :k_max]

    keepm = jnp.asarray(col[None, :] < base1[:, None], dtype)
    nicm = jnp.asarray((col[None, :] == base1[:, None]) & nic[:, None],
                       dtype)
    z = pad_cols(v1) * keepm[:, None, :] \
        + maskc[..., None] * nicm[:, None, :]
    if v2 is not None:
        lo2 = (base1 + nic)[:, None]
        idx2 = np.clip(col[None, :] - lo2, 0, max(v2.shape[-1] - 1, 0))
        m2 = jnp.asarray((col[None, :] >= lo2)
                         & (col[None, :] < counts[:, None]), dtype)
        z2 = jnp.take_along_axis(
            v2, jnp.asarray(idx2)[:, None, :], axis=-1)
        z = z + z2 * m2[:, None, :]
    z = z.reshape(n_dom, sz, sy, sx, 3, k_max)
    z = z * pou_b[..., None, None] * maskf[..., None, None]
    _t = _mark("l2_z", _t)
    _vlog("Z built")

    # E = Z^T A Z in f64 when x64 is on (near-null coarse columns cancel
    # eps(f32)*||A||-level terms; see structured/geneo.py).  STREAMED:
    # the dilated f64 apply runs per domain chunk inside _coarse_e's
    # y_fn, so no global y (nor f64 z copy) ever materializes — the
    # tunneled TPU runtime reclaims churn poorly and any late GB-scale
    # allocation dies (observed at 152^3).
    del v1, v2, runs               # the raw eigenvector blocks (z owns them)
    if jax.default_backend() != "cpu":
        jax.clear_caches()          # drop the LOBPCG/setup executables
    e_dtype = jnp.float64 if jax.config.jax_enable_x64 else dtype
    dir_e = dir_dil if dtype == e_dtype else LocalElastic(
        cw=cw_dil.astype(e_dtype), k0=k0d.astype(e_dtype),
        diag_add=bc_dir_dil.astype(e_dtype), pads=(0, 0, 0))
    pz, py, px = dil_pads
    pad_width = ((0, 0), (pz, pz), (py, py), (px, px), (0, 0), (0, 0))
    md_e = maskd.astype(e_dtype)

    _y_chunk = _y_chunk_jit(pad_width, jnp.dtype(e_dtype).name)

    def y_fn(lo, size):
        opc = jax.tree_util.tree_map(
            lambda a: a[lo:lo + size]
            if getattr(a, "ndim", 0) >= 1 and a.shape[0] == n_dom else a,
            dir_e)
        return _y_chunk(opc,
                        jax.lax.slice_in_dim(z, lo, lo + size, axis=0),
                        jax.lax.slice_in_dim(md_e, lo, lo + size,
                                             axis=0),
                        size=size)

    # one domain per y chunk when the emulated-f64 dilated apply's
    # compile-time allocation plan would not fit (~4.4 GB/domain at
    # 152^3 with 8 columns; measured 35 GB for an 8-domain chunk)
    n_cd3 = (sz + 1) * (sy + 1) * (sx + 1) * 24
    y_step = int(np.clip(budget // max(n_cd3 * k_max * 8 * 40, 1),
                         1, n_dom))
    e = _coarse_e(sd, z, None, counts, y_fn=y_fn, e_dtype=e_dtype,
                  y_step=y_step)
    _vlog(f"E assembled ({dim_e}x{dim_e}); factoring")
    (z, colids, e_evecs, e_eig_inv, dim_e, k_max,
     counts) = finalize_coarse(e, z, counts, stats, dtype, e_dtype)
    _t = _mark("l2_e", _t)
    _vlog(f"E factored (dim_e={dim_e}, pruned={stats.e_pruned})")

    pc = ElasticGenEO(
        grid_shape=gshape, dom_grid=sd.dom_grid, pad=sd.pad,
        local_shape=sd.local_shape, lvl1=opts.lvl1, lvl2=opts.lvl2_num,
        hybrid=opts.hybrid, eff_hybrid=opts.eff_hybrid, dim_e=dim_e,
        k_max=k_max, gop=gop, l1=l1, pou=pou_b,
        maskf=maskf.astype(dtype), z=z, colids=colids, e_evecs=e_evecs,
        e_eig_inv=e_eig_inv, x0=jnp.zeros(g.n_dof, dtype),
        l1_exact=False)
    if opts.eff_hybrid and b is not None:
        pc = dataclasses.replace(pc, x0=pc.apply_q(jnp.asarray(b, dtype)))
    return pc, stats


@lru_cache(maxsize=None)
def _y_chunk_jit(pad_width, e_dtype):
    """Cached jitted dilated-window A.z chunk producer (see below)."""
    e_dtype = jnp.dtype(e_dtype)

    @partial(jax.jit, static_argnames=("size",))
    def _y_chunk(op_, zc, mc, size):
        del size  # static chunk key; shapes carry it
        zp = jnp.pad(zc.astype(e_dtype), pad_width)
        return op_.matvec(zp) * mc[..., None, None]
    return _y_chunk


@lru_cache(maxsize=None)
def _elastic_lobpcg_jit(box_tail, dtype, max_it, tol):
    """Cached jitted elastic LOBPCG runner: a fresh jit wrapper per
    setup re-loads its executable through the compile service on every
    call (see krylov/refine module note).  ``box_tail`` = (sz, sy, sx,
    3, -1) — the static local-box layout; the batch size comes from the
    (possibly chunk-sliced) arguments."""
    dtype = jnp.dtype(dtype)
    n_loc3 = int(np.prod([s for s in box_tail[:-1]]))

    @partial(jax.jit, static_argnames=("k", "seed_rigid"))
    def run_lobpcg(a_t, b_t, t_t, maskc_, rigid_, k, seed_rigid=True,
                   x0_prev=None):
        # batch size from the (possibly chunk-sliced) arguments
        dd = maskc_.shape[0]
        boxc = (dd,) + box_tail
        flatc = (dd, n_loc3, -1)

        def a_op(v):
            return a_t.matvec(v.reshape(boxc)).reshape(flatc)

        def b_op(v):
            return b_t.matvec(v.reshape(boxc)).reshape(flatc)

        def t_op(v):
            w = t_t.solve(v.reshape(boxc))
            return w.reshape(flatc) * maskc_[..., None]

        d = maskc_.shape[0]          # chunked batch size
        x0 = jax.random.normal(jax.random.PRNGKey(0),
                               (d, n_loc3, k), dtype)
        x0 = t_op(x0 * maskc_[..., None])
        if seed_rigid:
            # rigid modes are exact near-kernel of the tau pencils'
            # A_Neu; the gamma pencil's extremal vectors are unrelated
            nr = min(6, k)
            x0 = x0.at[..., :nr].set(
                jnp.broadcast_to(rigid_[..., :nr],
                                 (d, n_loc3, nr)) * maskc_[..., None])
        if x0_prev is not None:
            x0 = x0.at[..., :x0_prev.shape[-1]].set(x0_prev)
        return matfree_lobpcg(a_op, b_op, t_op, x0, max_it=max_it,
                              tol=tol)
    return run_lobpcg


# ===================== solve driver =====================

@lru_cache(maxsize=None)
def _elastic_inner_jit(eff: bool, inner_max_it: int):
    """Shared jitted inner solver (pc as a traced argument): a fresh
    jit wrapper per solve re-loads its executable through the compile
    service on every call — see krylov/refine module note."""
    from ..krylov.cg import cg_solve

    @jax.jit
    def inner(pc_a, r32, rtol):
        r32 = r32.astype(pc_a.maskf.dtype)
        x0 = pc_a.apply_q(r32).astype(r32.dtype) if eff else None
        # inexact local solves -> flexible CG; stall exit owns the f32
        # floor (the f64 outer loop owns true convergence)
        return cg_solve(pc_a.matvec, r32, pc_a.apply, x0=x0, rtol=rtol,
                        max_it=inner_max_it, stall_its=50, flexible=True)

    return inner


def solve_elastic(g: ElasticGrid, dom_grid, overlap: int,
                  opts: GenEOOptions | None = None, tol: float = 1e-8,
                  dtype=None, timers=None,
                  device_refine: bool | None = None,
                  inner_max_it: int = 2000,
                  n_devices: int | None = None):
    """End-to-end elasticity solve: setup -> mixed-precision refined
    flexible CG to the true-f64 tolerance (the structured solve driver's
    twin, structured/solve.py).

    dtype default: f32 on accelerators (MXU hot path + f64 refinement);
    f64 on CPU backends — the elastic cell-sum matvec's f32
    representation noise (~6e-8 relative, eps32-level even at
    precision="highest") floors the refined residual near 4e-8 at small
    scale, and CPU f64 is native-speed so there is nothing to trade."""
    import time as _time

    from ..krylov.refine import refined_solve, refined_solve_device
    from ..utils.timers import Timers
    from .solve import StructuredSolveOutput

    opts = opts or GenEOOptions()
    timers = timers or Timers()
    if dtype is None:
        dtype = (jnp.float64 if (jax.default_backend() == "cpu"
                                 and bool(jax.config.jax_enable_x64))
                 else jnp.float32)
    if device_refine is None:
        device_refine = (jax.default_backend() != "cpu"
                         and bool(jax.config.jax_enable_x64))
    mesh = None
    if n_devices is not None:
        from .sharded import make_mesh
        mesh = make_mesh(n_devices)

    t0 = _time.perf_counter()
    timers.add("partition", _time.perf_counter() - t0)

    t0 = _time.perf_counter()
    if device_refine:
        op64 = elastic_op(g, jnp.float64)
        x_true = jnp.arange(1.0, g.n_dof + 1, dtype=jnp.float64)
        if mesh is not None:
            from .sharded import shard_refine64
            op64, shard_vec64 = shard_refine64(op64, mesh)
            x_true = shard_vec64(x_true)
        from ..krylov.refine import op_matvec
        b = op_matvec(op64, x_true)
        jax.block_until_ready(b)
    else:
        op64 = None
        _xt, b = g.manufactured_rhs()
    timers.add("createA", _time.perf_counter() - t0)

    t0 = _time.perf_counter()
    from .solve import _setup_with_checkpoint
    pc, stats = _setup_with_checkpoint(
        lambda: setup_elastic(g, dom_grid, overlap, opts,
                              b=jnp.asarray(b, dtype), dtype=dtype,
                              timers=timers),
        g, dom_grid, overlap, opts, dtype, timers)
    shard_vec = None
    if mesh is not None:
        from .sharded import shard_elastic
        _mv, _ap, pc, shard_vec = shard_elastic(pc, mesh)
    jax.block_until_ready(jax.tree_util.tree_leaves(pc.l1))
    timers.add("setup", _time.perf_counter() - t0)

    t0 = _time.perf_counter()
    eff = bool(opts.eff_hybrid)
    inner = _elastic_inner_jit(eff, int(inner_max_it))

    if shard_vec is None:
        inner_fn = lambda r32, rtol: inner(pc, r32, rtol)
    else:
        # residuals handed over by the refinement loop carry the z-slab
        # sharding (host-refine passes uncommitted host arrays)
        inner_fn = lambda r32, rtol: inner(pc, shard_vec(r32), rtol)
    if device_refine:
        ref = refined_solve_device(
            op64, b, inner_fn, tol=tol,
            x0=pc.x0.astype(jnp.float64) if eff else None)
        true_res = ref.true_res
        x_out = ref.x
    else:
        ref = refined_solve(
            None, None, b, residual64=lambda x: b - g.matvec(x),
            tol=tol, inner_solver=inner_fn,
            x0=np.asarray(pc.x0, np.float64) if eff else None)
        bn = np.linalg.norm(b)
        true_res = float(np.linalg.norm(b - g.matvec(ref.x)) / bn)
        x_out = ref.x
    timers.add("solve", _time.perf_counter() - t0)

    return StructuredSolveOutput(
        refined=ref, x=x_out, b=b, pc_name=opts.name, stats=stats,
        timers=timers, true_res=true_res, n_dof=g.n_dof,
        n_dom=int(np.prod(dom_grid)), pc=pc)

