"""Structured GenEO preconditioner — the 10M+ DOF scale path.

The same two-level Schwarz mathematics as precond/geneo.py (and
src/geneo.cpp), rebuilt on the structured backend:

  * local direct solves  -> fast-diagonalization (fdm.py) instead of
    dense Cholesky blocks: O(L^2) factor memory, exact solves as batched
    MXU matmuls (the MUMPS replacement, src/geneo.cpp:94-124);
  * halo exchange        -> block-grid shifts (halo.py) instead of
    gather/segment_sum (VecScatter analogue, src/geneo.cpp:1845-1900);
  * GenEO-1 eigensolve   -> matrix-free batched LOBPCG on the stencil
    pencil (A_Neu, D A_Dir D) with the exact FDM shifted inverse as the
    shift-invert preconditioner (ARPACK STSINVERT, src/geneo.cpp:635-650);
  * E = Z^T A Z          -> per-offset window contractions: A z_d is
    computed with a one-layer-dilated Dirichlet stencil, and each
    neighbor block of E is one batched [n_dom, k, k] einsum over the
    static box-intersection windows (MatPtAP, src/geneo.cpp:1033).

The FULL preconditioner family runs here: lvl1 in {ASM, RAS, SRAS, ORAS,
SORAS}, lvl2 in {0, 1, H1, E1, 2, H2, E2}.  Separable kappa-derived
Laplacian stencils take the exact FDM route; everything else (heat's mass
term, non-separable coefficient fields, border-restricted Robin blocks)
takes the general solvers (structured/solvers.py): exact block-tridiag
factors while the plane blocks fit, surrogate-FDM-preconditioned inexact
PCG above that — the at-scale realizations of MUMPS LU
(src/geneo.cpp:94-124) and the Robin factorization (:1613-1670).
Setup is host-orchestrated (static coarse shapes before compile),
apply is pure and jit/shard_map-able.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import lru_cache, partial
from itertools import product

import numpy as np

import jax
import jax.numpy as jnp

from ..config import GenEOOptions
from ..ops.lobpcg import matfree_lobpcg
from ..precond.geneo import (GenEOStats, _gamma_loc, factor_e,
                             prune_dependent_columns)
from . import fdm, halo, solvers
from . import local_ops as lo
from .decompose import StructuredDecomposition
from .grid import GlobalStencil, global_stencil


@partial(jax.tree_util.register_dataclass,
         data_fields=["gop", "l1", "pou", "maskf", "z", "colids",
                      "e_evecs", "e_eig_inv", "x0"],
         meta_fields=["grid_shape", "dom_grid", "pad", "local_shape",
                      "lvl1", "lvl2", "hybrid", "eff_hybrid", "dim_e",
                      "k_max", "l1_exact"])
@dataclass(frozen=True)
class StructuredGenEO:
    """Immutable setup product; ``apply`` is the per-iteration hot path.

    Mirrors GenEOPreconditioner.apply semantics exactly (applyGenEOPC,
    src/geneo.cpp:2051-2098) so iteration counts match the generic path.
    """

    # --- static configuration ---
    grid_shape: tuple
    dom_grid: tuple
    pad: tuple
    local_shape: tuple
    lvl1: str          # ASM | RAS | SRAS | ORAS | SORAS
    lvl2: int          # 0 | 1 | 2
    hybrid: bool
    eff_hybrid: bool
    dim_e: int
    k_max: int
    # --- data ---
    gop: GlobalStencil           # assembled global operator (iteration SpMV)
    l1: object                   # Dirichlet/Robin local solver (.solve):
    #                              FDMFactor | BTSolver | PCGSolver
    pou: jax.Array | None        # [d, lz, ly, lx] partition of unity
    maskf: jax.Array             # [d, lz, ly, lx] float real-slot mask
    z: jax.Array | None          # [d, lz, ly, lx, k_max] D-weighted basis
    colids: jax.Array | None     # [d, k_max] int32 (pad -> dim_e)
    e_evecs: jax.Array | None    # [K, K] coarse factor W (E^-1 = W D W^T)
    e_eig_inv: jax.Array | None  # [K]
    x0: jax.Array                # [n] initial guess (Q b if eff-hybrid)
    # level-1 solves are exact (FDM / block-tridiag) vs inexact PCG —
    # inexact Schwarz callers should pair with flexible CG
    l1_exact: bool = True

    # ---------------- halo plumbing ----------------
    def _gather(self, x: jax.Array) -> jax.Array:
        return halo.to_batch(halo.halo_gather(
            x, self.grid_shape, self.dom_grid, self.pad))

    def _scatter(self, xb: jax.Array) -> jax.Array:
        return halo.halo_scatter_add(
            halo.from_batch(xb, self.dom_grid), self.grid_shape,
            self.dom_grid, self.pad)

    def matvec(self, x: jax.Array) -> jax.Array:
        return self.gop.matvec(x)

    # ---------------- level 2: Q = Z E^-1 Z^T (applyQ) ----------------
    def apply_q(self, x: jax.Array) -> jax.Array:
        xb = self._gather(x)
        ztx = jnp.einsum("dzyxk,dzyx->dk", self.z, xb,
                         preferred_element_type=x.dtype, precision="highest")
        w = jax.ops.segment_sum(ztx.ravel(), self.colids.ravel(),
                                num_segments=self.dim_e + 1)[:-1]
        w = self.e_evecs @ (self.e_eig_inv * (self.e_evecs.T @ w))
        wp = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])
        wl = wp[self.colids]
        yb = jnp.einsum("dzyxk,dk->dzyx", self.z, wl,
                        preferred_element_type=x.dtype, precision="highest")
        return self._scatter(yb)

    # ---------------- level 1 (applyLevel1) ----------------
    def _local_solve(self, x: jax.Array) -> jax.Array:
        xb = self._gather(x)
        if self.lvl1 in ("RAS", "SRAS", "ORAS", "SORAS"):
            xb = xb * self.pou                      # (1.29) of R1
        ub = self.l1.solve(xb)
        if self.lvl1 in ("SRAS", "SORAS"):
            ub = ub * self.pou
        # pad slots are decoupled in the FDM factor but masking pins them
        # to exact zeros (degenerate 1-D eigenvalues could mix blocks)
        ub = ub * self.maskf
        return self._scatter(ub)

    def apply(self, x: jax.Array) -> jax.Array:
        """Full PC apply (applyGenEOPC): Y = Q X + L1(X) with optional
        hybrid projections — (7.53) of R1."""
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

def _flat_ops(a_st, b_st, maskf, t_tree):
    """LOBPCG operator callables over flat [d, n_loc, m] blocks.

    Internally each apply transposes to the LEAD-block layout [d, m, lz,
    ly, lx] and back: the [.., n_loc, m] layout puts the tiny block axis
    on the TPU's 128 vector lanes (2/128 utilization at k=2 — measured
    10 ms per 10M-bench stencil apply vs ~0.3 ms of traffic,
    tst/probe_eigstep.py), while the lead form streams with the spatial
    axis minor.  The two transposes are single relayout passes that XLA
    fuses into the producer/consumer loops.  a_st/b_st are LocalStencil
    pencils; t_tree is any local solver playing the shift-invert
    preconditioner (lead-layout fast path when it provides
    ``solve_lead``).  Batch size is taken from the arrays (callers slice
    the pytrees to chunk the domain batch)."""
    n_dom, sz, sy, sx = maskf.shape
    box_lead = (n_dom, -1, sz, sy, sx)
    box = (n_dom, sz, sy, sx, -1)
    flat = (n_dom, sz * sy * sx, -1)

    def to_lead(v):
        return jnp.swapaxes(v, 1, 2).reshape(box_lead)

    def from_lead(w):
        m = w.shape[1]
        return jnp.swapaxes(w.reshape(n_dom, m, sz * sy * sx), 1, 2)

    la, lb, lt = _lead_ops(a_st, b_st, maskf, t_tree)

    def a_op(v):
        return from_lead(la(to_lead(v)))

    def b_op(v):
        return from_lead(lb(to_lead(v)))

    def t_op(v):
        return from_lead(lt(to_lead(v)))

    return a_op, b_op, t_op


def _lead_ops(a_st, b_st, maskf, t_tree):
    """LOBPCG operator callables in the LEAD layout: flat [d, m, n_loc]
    in and out ([d, m, n] <-> [d, m, lz, ly, lx] is a free reshape).
    This is the fast form — the whole matfree LOBPCG runs lead-layout
    (ops/lobpcg.py ops_layout="mn"), so no per-apply transposes at all.
    Solvers without a ``solve_lead`` (surrogate-PCG, BT) fall back to
    the trailing-block form behind a transpose pair."""
    n_dom, sz, sy, sx = maskf.shape
    box_lead = (n_dom, -1, sz, sy, sx)
    flat_lead = (n_dom, -1, sz * sy * sx)

    def a_op(v):
        return a_st.matvec_lead(v.reshape(box_lead)).reshape(flat_lead)

    def b_op(v):
        return b_st.matvec_lead(v.reshape(box_lead)).reshape(flat_lead)

    if hasattr(t_tree, "solve_lead"):
        def t_op(v):
            w = t_tree.solve_lead(v.reshape(box_lead)) * maskf[:, None]
            return w.reshape(flat_lead)
    else:
        def t_op(v):
            vt = jnp.swapaxes(v, 1, 2).reshape(
                (n_dom, sz, sy, sx, -1))
            w = t_tree.solve(vt) * maskf[..., None]
            w = w.reshape(n_dom, sz * sy * sx, -1)
            return jnp.swapaxes(w, 1, 2)

    return a_op, b_op, t_op


def finalize_coarse(e: np.ndarray, z: jax.Array, counts: np.ndarray,
                    stats: GenEOStats, dtype, e_dtype):
    """Prune linearly dependent coarse columns (pivoted Cholesky — see
    precond.geneo.prune_dependent_columns) and factor E.  ``z`` is any
    [n_dom, ..., k_max] device basis (column axis last — works for both
    the scalar and the vector/component backends).

    Returns (z, colids, e_evecs, e_eig_inv, dim_e, k_max, counts)."""
    n_dom = counts.shape[0]
    dim_e = int(counts.sum())
    offs = np.zeros(n_dom, np.int64)
    np.cumsum(counts[:-1], out=offs[1:])
    keep = prune_dependent_columns(e, e_dtype)
    if keep is not None:
        # E becomes SPD, dim_e shrinks by exactly the dependency count
        stats.e_pruned = dim_e - keep.size
        kept_mask = np.zeros(dim_e, bool)
        kept_mask[keep] = True
        new_counts = np.array(
            [int(kept_mask[offs[p]:offs[p] + counts[p]].sum())
             for p in range(n_dom)], np.int64)
        new_offs = np.zeros(n_dom, np.int64)
        np.cumsum(new_counts[:-1], out=new_offs[1:])
        new_k_max = max(int(new_counts.max()), 1)
        # column selection as a one-hot matmul (a take_along_axis gather
        # on the big [n_dom, ..., k] basis blows TPU scoped vmem)
        sel = np.zeros((n_dom, z.shape[-1], new_k_max))
        for p in range(n_dom):
            js = np.flatnonzero(kept_mask[offs[p]:offs[p] + counts[p]])
            sel[p, js, np.arange(js.size)] = 1.0
            stats.eigenvalues[p] = [stats.eigenvalues[p][j] for j in js]
        z = jnp.einsum("d...k,dkm->d...m", z, jnp.asarray(sel, dtype),
                       preferred_element_type=dtype)
        e = e[np.ix_(keep, keep)]
        stats.real_dim_e = new_counts.copy()
        counts, offs = new_counts, new_offs
        dim_e, k_max = int(new_counts.sum()), new_k_max
    else:
        k_max = max(int(counts.max()), 1)
    colids_np = np.full((n_dom, k_max), dim_e, np.int32)
    for p in range(n_dom):
        colids_np[p, :counts[p]] = offs[p] + np.arange(counts[p])
    from ..precond.geneo import warn_coarse_replication
    warn_coarse_replication(dim_e)
    ev_np, ew_np, stats.e_null = factor_e(e, dtype, e_dtype=e_dtype)
    return (z, jnp.asarray(colids_np), jnp.asarray(ev_np, dtype),
            jnp.asarray(1.0 / ew_np, dtype), dim_e, k_max, counts)


def _fdm_eligible(sd: StructuredDecomposition) -> bool:
    """True when the exact FDM fast path applies: kappa-derived Laplacian
    stencil with a separable coefficient field."""
    if not sd.grid.is_kappa_stencil:
        return False
    try:
        fdm._axis_profiles(sd)
        return True
    except ValueError:
        return False


def _tau_loc_structured(sd: StructuredDecomposition, tau: float,
                        cst: bool) -> np.ndarray:
    """Local adaptive tau (getLocalGenEOTau, src/geneo.cpp:1097-1118):
    tauLoc = k * tau with k = max DOF multiplicity, clamped to 0.9."""
    if cst:
        return np.full(sd.n_dom, tau)
    k = sd.max_mult().astype(np.float64)
    t = k * tau
    t = np.where(t >= 1.0, 0.9, t)
    return np.where(k > 0, t, tau)


# Cached jit factories for the setup hot path.  A fresh ``jax.jit``
# wrapper per setup call re-traces and re-LOADS its executable through
# the backend compile service on every invocation — on tunneled TPU
# platforms each load is an RPC costing ~seconds, which dominated the
# steady-state setup wall.  These factories close only over PYTHON
# STATICS (shapes, dtypes, window slices — hashable on py3.12), never
# arrays, so one wrapper per configuration is safe to share.

@lru_cache(maxsize=None)
def _all_blocks_jit(offs_used, dom_grid, sub, ptype):
    @jax.jit
    def all_blocks(z_, y_):
        """One compiled program for every neighbor-offset contraction."""
        def one(off, ws):
            ox, oy, oz = off
            ((zwx, ywx), (zwy, ywy), (zwz, ywz)) = ws
            zr = halo.from_batch(z_, dom_grid)      # [gz, gy, gx, ...]
            for gaxis, o in ((2, ox), (1, oy), (0, oz)):
                if o:
                    zr = jnp.roll(zr, -o, axis=gaxis)
            zwin = halo.to_batch(zr)[:, zwz, zwy, zwx].astype(ptype)
            ywin = y_[:, ywz, ywy, ywx]
            return jnp.einsum(sub, zwin, ywin,
                              preferred_element_type=ptype,
                              precision="highest")
        return jnp.stack([one(off, ws)
                          for off, ws in offs_used])  # [n_off, d, k, k]
    return all_blocks


@lru_cache(maxsize=None)
def _stream_chunk_jit(ptype):
    @partial(jax.jit, static_argnames=("ws", "z_start", "size", "y_off"))
    def _stream_chunk(z_, y_c, ws, z_start, size, y_off):
        ((zwx, ywx), (zwy, ywy), (zwz, ywz)) = ws
        zwin = jax.lax.slice_in_dim(
            z_, z_start, z_start + size,
            axis=0)[:, zwz, zwy, zwx].astype(ptype)
        ywin = jax.lax.slice_in_dim(
            y_c, y_off, y_off + size, axis=0)[:, ywz, ywy, ywx]
        kk, mm = zwin.shape[-1], ywin.shape[-1]
        z2 = zwin.reshape(size, -1, kk)
        y2 = ywin.reshape(size, -1, mm)
        return jnp.einsum("dnk,dnm->dkm", z2, y2,
                          preferred_element_type=ptype,
                          precision="highest")
    return _stream_chunk


@lru_cache(maxsize=None)
def _stream_all_jit(offs_used, o_lin_all, ptype):
    @jax.jit
    def _stream_all(z_, y_c, lo_d):
        """ALL offset contractions of a size-1 domain chunk in ONE
        dispatch (the per-offset loop costs 27x the tunnel's RPC
        round trip per chunk); invalid offsets read a clamped row
        whose result the host discards."""
        out = []
        for (off, ws), o_lin in zip(offs_used, o_lin_all):
            ((zwx, _ywx), (zwy, _ywy), (zwz, _ywz)) = ws
            ((_zwx, ywx), (_zwy, ywy), (_zwz, ywz)) = ws
            idx = jnp.clip(lo_d + o_lin, 0, z_.shape[0] - 1)
            zwin = jax.lax.dynamic_slice_in_dim(
                z_, idx, 1, axis=0)[:, zwz, zwy, zwx].astype(ptype)
            ywin = y_c[:, ywz, ywy, ywx]
            kk, mm = zwin.shape[-1], ywin.shape[-1]
            z2 = zwin.reshape(1, -1, kk)
            y2 = ywin.reshape(1, -1, mm)
            out.append(jnp.einsum("dnk,dnm->dkm", z2, y2,
                                  preferred_element_type=ptype,
                                  precision="highest")[0])
        return jnp.stack(out)             # [n_off, k, k]
    return _stream_all


@lru_cache(maxsize=None)
def _one_chunk_jit(ptype):
    @partial(jax.jit, static_argnames=("ws", "lo_d", "size", "o_lin"))
    def _one_chunk(z_, y_, ws, lo_d, size, o_lin):
        ((zwx, ywx), (zwy, ywy), (zwz, ywz)) = ws
        zwin = jax.lax.slice_in_dim(
            z_, lo_d + o_lin, lo_d + o_lin + size,
            axis=0)[:, zwz, zwy, zwx].astype(ptype)
        ywin = jax.lax.slice_in_dim(
            y_, lo_d, lo_d + size, axis=0)[:, ywz, ywy, ywx]
        # flatten the window to a plain batched GEMM [d, N, k] x
        # [d, N, m]: the 6-D emulated-f64 dot lowers with per-axis
        # tiling blowups (compile-time OOM at 152^3)
        kk = zwin.shape[-1]
        mm = ywin.shape[-1]
        z2 = zwin.reshape(size, -1, kk)
        y2 = ywin.reshape(size, -1, mm)
        return jnp.einsum("dnk,dnm->dkm", z2, y2,
                          preferred_element_type=ptype,
                          precision="highest")
    return _one_chunk


@lru_cache(maxsize=None)
def _lobpcg_run_jit(n_loc, dtype, max_it, tol):
    dtype = jnp.dtype(dtype)

    @partial(jax.jit, static_argnames=("k", "g"))
    def run_lobpcg(a_st, b_st, maskf_, t_tree, k, g=0, x0_prev=None):
        # rebind closures on the jitted arguments (operator pytrees must
        # be traced arguments, never closed-over constants).  ``g`` GUARD
        # columns ride along in the block purely to open the spectral
        # gap of the kept k-prefix (the ARPACK ncv > 2k discipline,
        # cpu_anchor2's observed stall without breathing room): kept
        # pairs near the tau window boundary otherwise converge at the
        # rate of a near-zero gap (measured: kept res 0.55 after 50 its
        # at the 10M bench's 58^3 bricks with g=0, 1e-3-converged with
        # guards).  Guards live ONLY inside this solve — Z/E never see
        # them, so coarse-space memory is unchanged.
        a_o, b_o, t_o = _lead_ops(a_st, b_st, maskf_, t_tree)
        d = maskf_.shape[0]
        ktot = k + g
        # same random draw as the historical [d, n, k] layout (the
        # column CONTENT is part of pinned behavior), transposed into
        # the lead layout matfree_lobpcg uses internally
        x0 = jax.random.normal(jax.random.PRNGKey(0), (d, n_loc, ktot),
                               dtype)
        x0 = x0 * maskf_.reshape(d, n_loc)[..., None]
        x0 = jnp.swapaxes(t_o(jnp.swapaxes(x0, 1, 2)), 1, 2)
        if x0_prev is not None:
            # warm restart: keep the previously converged block, top up
            # with fresh preconditioned-random columns only
            x0 = x0.at[..., :x0_prev.shape[-1]].set(x0_prev)
        w, v, res = matfree_lobpcg(a_o, b_o, t_o, x0, max_it=max_it,
                                   tol=tol, k_monitor=k,
                                   ops_layout="mn")
        return w[:, :k], v[..., :k], res[:, :k]
    return run_lobpcg


@lru_cache(maxsize=None)
def _bt_inertia_jit(ip_strides):
    from .block_tridiag import bt_inertia

    @jax.jit
    def inertia(d, cfs, cpl):
        # strides must stay static under jit (they drive slice bounds
        # in _assemble_plane) — close over them and pass only the
        # coefficient arrays as traced operands
        return bt_inertia(d, list(zip(cfs, ip_strides)), cpl)
    return inertia


@jax.jit
def _nicolaides_forms(neu_, btau_, ones_b):
    num = jnp.einsum("dzyx,dzyx->d", ones_b, neu_.matvec(ones_b))
    den = jnp.einsum("dzyx,dzyx->d", ones_b, btau_.matvec(ones_b))
    nr = jnp.sum(ones_b.reshape(ones_b.shape[0], -1) > 0, axis=1)
    return num, den, nr


def _coarse_e(sd: StructuredDecomposition, z: jax.Array,
              y_dil: jax.Array | None, counts: np.ndarray,
              y_fn=None, e_dtype=None, y_step=None) -> np.ndarray:
    """E = Z^T A Z via per-offset window contractions.

    z:     [n_dom, lz, ly, lx(, c), k_max] D-weighted local basis (zero
           pad; optional per-node component axis c for vector problems)
    y_dil: [n_dom, dz, dy, dx(, c), k_max] = A z_d on the one-layer-dilated
           box — or None with ``y_fn(lo, size)`` producing the [size, ...]
           domain chunk on demand (the STREAMED mode: at elasticity scale
           the full f64 y is >1 GB and the tunneled runtime's poor
           reclamation makes any late full-size allocation fatal, so y
           chunks live only inside one domain-chunk iteration)
    Returns the REAL (unpadded) dense symmetric E [dim_e, dim_e] (host).
    """
    gx, gy, gz = sd.dom_grid
    k_max = z.shape[-1]
    n_dom = sd.n_dom
    divided = [g > 1 for g in sd.dom_grid]
    # neighbor radius per axis: boxes (p) and (p+o) overlap the dilated
    # window while |o| * inner < inner + 2 pad + 1
    radius = [int(np.ceil((2 * sd.pad[a] + 1) / sd.inner[a]))
              if divided[a] else 0 for a in range(3)]
    dom_lin = np.arange(n_dom)
    px, py, pz = (dom_lin % gx, (dom_lin // gx) % gy, dom_lin // (gx * gy))

    def windows(a, o):
        """(z_slice, y_slice) along axis a for offset o."""
        ll = sd.local_shape[a]
        if not divided[a]:
            return slice(0, ll), slice(0, ll)
        i = sd.inner[a]
        pp = sd.pad[a]
        if o == 0:
            return slice(0, ll), slice(1, ll + 1)
        length = i - abs(o) * i + 2 * pp + 1
        if o > 0:
            return slice(0, length), slice(o * i + 1, o * i + 1 + length)
        s = -o * i - 1
        return slice(s, s + length), slice(0, length)

    offs_used = []
    for ox, oy, oz in product(*[range(-radius[a], radius[a] + 1)
                                for a in (0, 1, 2)]):
        ws = (windows(0, ox), windows(1, oy), windows(2, oz))
        if any(w.stop - w.start <= 0 for pair in ws for w in pair):
            continue
        offs_used.append(((ox, oy, oz), ws))

    sub = "dzyxck,dzyxcm->dkm" if z.ndim == 6 else "dzyxk,dzyxm->dkm"
    # assembly precision follows y (f64 when x64 is on); z itself may
    # arrive in the device dtype — its values are exact in f32, and the
    # upcast happens PER WINDOW inside the jitted contractions so a full
    # f64 copy of the basis never materializes (at elasticity scale that
    # copy alone is ~1 GB and fragmentation kills the allocation)
    ptype = e_dtype if y_dil is None else y_dil.dtype

    all_blocks = _all_blocks_jit(tuple(offs_used), tuple(sd.dom_grid),
                                 sub, ptype)

    # one fused program when the rolled copies fit comfortably; at
    # elasticity scale (f64 component-blocked z) the n_off-way roll+
    # window+contract liveness exceeds HBM — run offset by offset with
    # the windowed contraction further split over domain chunks
    import os as _os_e
    force_chunked = _os_e.environ.get("GENEO_E_CHUNKED") == "1"
    if y_fn is not None:
        # STREAMED: domain chunks outer (y built on demand), offsets
        # inner — peak extra device memory is ONE y chunk + one window
        _stream_chunk = _stream_chunk_jit(ptype)

        _sdbg = _os_e.environ.get("GENEO_SETUP_VERBOSE") == "1"
        import sys as _sys_e
        import time as _time_e
        _st0 = _time_e.perf_counter()
        o_lin_all = [off[0] + gx * off[1] + gx * gy * off[2]
                     for off, _w in offs_used]
        _stream_all = _stream_all_jit(tuple(offs_used), tuple(o_lin_all),
                                      ptype)

        d_step = y_step if y_step else max(n_dom // 8, 1)
        blocks = np.zeros((len(offs_used), n_dom, k_max, k_max))
        for lo_d in range(0, n_dom, d_step):
            if _sdbg:
                print(f"[coarse_e {_time_e.perf_counter() - _st0:7.2f}s]"
                      f" streamed chunk {lo_d}/{n_dom}",
                      file=_sys_e.stderr, flush=True)
            c_size = min(d_step, n_dom - lo_d)
            y_c = y_fn(lo_d, c_size)
            if c_size == 1:
                all_b = np.asarray(
                    _stream_all(z, y_c, jnp.int32(lo_d)), np.float64)
                for io, o_lin in enumerate(o_lin_all):
                    if 0 <= lo_d + o_lin < n_dom:
                        blocks[io, lo_d] = all_b[io]
                del y_c
                continue
            jax.block_until_ready(y_c)
            for io, (off, ws) in enumerate(offs_used):
                o_lin = o_lin_all[io]
                d0 = max(lo_d, -o_lin)
                d1 = min(lo_d + c_size, n_dom - o_lin)
                if d1 <= d0:
                    continue
                b1 = _stream_chunk(z, y_c, ws=ws, z_start=d0 + o_lin,
                                   size=d1 - d0, y_off=d0 - lo_d)
                jax.block_until_ready(b1)
                blocks[io, d0:d1] = np.asarray(b1, np.float64)
            del y_c
    elif (z.nbytes + y_dil.nbytes) * 4 < 4e9 and not force_chunked:
        blocks = np.asarray(all_blocks(z, y_dil), np.float64)
    else:
        # the neighbor offset is a CONSTANT shift o_lin on the flat
        # domain axis (d = px + gx*(py + gy*pz)).  Rows whose shifted
        # index leaves [0, n_dom) are always invalid (some per-axis
        # coordinate left its range too, so `ok` below is false), so
        # each offset only needs the valid linear row range — every
        # slice is in-bounds and perfectly aligned with NO padding, NO
        # roll, and NO transpose: nothing beyond the window-sized
        # einsum operands is ever allocated (the tunneled TPU runtime
        # reclaims churn poorly; keep late-phase allocations tiny).
        _one_chunk = _one_chunk_jit(ptype)

        d_step = max(n_dom // 8, 1)
        k_m = z.shape[-1]
        parts = []
        for off, ws in offs_used:
            o_lin = off[0] + gx * off[1] + gx * gy * off[2]
            lo_v = max(0, -o_lin)
            hi_v = n_dom - max(0, o_lin)
            blk = np.zeros((n_dom, k_m, k_m))
            for lo_d in range(lo_v, hi_v, d_step):
                size = min(d_step, hi_v - lo_d)
                b1 = _one_chunk(z, y_dil, ws=ws, lo_d=lo_d, size=size,
                                o_lin=o_lin)
                jax.block_until_ready(b1)
                blk[lo_d:lo_d + size] = np.asarray(b1, np.float64)
            parts.append(blk)
        blocks = np.stack(parts)

    rows_i, cols_i, vals = [], [], []
    for io, ((ox, oy, oz), _ws) in enumerate(offs_used):
        # validity: the rolled source d + o must exist (no wraparound)
        ok = ((px + ox >= 0) & (px + ox < gx) & (py + oy >= 0)
              & (py + oy < gy) & (pz + oz >= 0) & (pz + oz < gz))
        f_lin = dom_lin + ox + gx * oy + gx * gy * oz   # row block (d + o)
        for d in np.where(ok)[0]:
            kf, kd = int(counts[f_lin[d]]), int(counts[d])
            if kf == 0 or kd == 0:
                continue
            b = blocks[io, d, :kf, :kd]
            rr = np.repeat(np.arange(kf), kd)
            cc = np.tile(np.arange(kd), kf)
            rows_i.append(f_lin[d] * k_max + rr)
            cols_i.append(d * k_max + cc)
            vals.append(b.ravel())
    import scipy.sparse as _sp
    offs = np.zeros(n_dom, np.int64)
    np.cumsum(counts[:-1], out=offs[1:])
    dim_e = int(counts.sum())
    if dim_e == 0:
        return np.zeros((0, 0))
    e_pad = _sp.coo_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows_i), np.concatenate(cols_i))),
        shape=(n_dom * k_max, n_dom * k_max)).tocsr()
    sel = np.concatenate([p * k_max + np.arange(counts[p])
                          for p in range(n_dom)]).astype(np.int64)
    e = np.asarray(e_pad[np.ix_(sel, sel)].todense())
    return 0.5 * (e + e.T)


def setup_structured(sd: StructuredDecomposition, opts: GenEOOptions,
                     b: jax.Array | None = None, dtype=jnp.float32,
                     timers=None
                     ) -> tuple[StructuredGenEO, GenEOStats]:
    """Structured setUpGenEOPC: fields gather -> FDM factors -> batched
    matrix-free eigensolve -> Z -> E, all device-side except the tiny 1-D
    eigendecompositions and the coarse factorization."""
    import os as _os
    import sys as _sys
    import time as _time
    opts.validate()
    _dbg = _os.environ.get("GENEO_SETUP_VERBOSE") == "1"
    _t0 = _time.perf_counter()

    def _vlog(msg):
        if _dbg:
            print(f"[ssetup {_time.perf_counter() - _t0:7.2f}s] {msg}",
                  file=_sys.stderr, flush=True)

    def _mark(name, t0):
        if timers is not None:
            timers.add(name, _time.perf_counter() - t0)
        return _time.perf_counter()

    n_dom = sd.n_dom
    sx, sy, sz = sd.local_shape
    n_loc = sx * sy * sz
    pad1 = tuple(p + 1 if g > 1 else 0
                 for p, g in zip(sd.pad, sd.dom_grid))

    _t = _time.perf_counter()
    f_dil = lo.gather_fields(sd, dtype=dtype, pad=pad1)
    f = lo.slice_inner(f_dil, sd)
    maskf = f.mask.astype(dtype)
    gop = global_stencil(sd.grid, dtype)
    sep = _fdm_eligible(sd)
    _vlog(f"fields gathered (fdm separable: {sep})")

    # level-1 direct solver: exact FDM for separable Dirichlet blocks;
    # otherwise (Robin/ORAS, heat, non-separable kappa) the general
    # solvers — exact block-tridiag while the factor fits, inexact
    # surrogate-preconditioned PCG at scale (solvers.py policy)
    l1_exact = True
    if opts.lvl1_oras:
        l1_st = lo.robin_stencil(f, opts.optim)
        l1, l1_exact = solvers.select_local_solver(
            l1_st, maskf, sd.local_shape, rtol=float(opts.dls1.rtol),
            max_it=min(int(opts.dls1.max_it), 200), dtype=dtype)
    elif sep:
        l1 = fdm.fdm_factor(fdm.dirichlet_axes(sd), dtype=dtype)
    else:
        l1, l1_exact = solvers.select_local_solver(
            lo.dirichlet_stencil(f), maskf, sd.local_shape,
            rtol=float(opts.dls1.rtol),
            max_it=min(int(opts.dls1.max_it), 200), dtype=dtype)
    _t = _mark("l1_minv", _t)
    _vlog(f"L1 factored (exact={l1_exact})")

    need_pou = opts.lvl2_num > 0 or opts.lvl1_ras
    pou_b = jnp.where(f.mask, 1.0 / jnp.maximum(f.mult, 1.0), 0.0) \
        .astype(dtype) if need_pou else None

    stats = GenEOStats(
        estim_dim_e=np.zeros(n_dom, np.int64),
        real_dim_e=np.zeros(n_dom, np.int64),
        nicolaides=np.zeros(n_dom, np.int64),
        tau_loc=np.full(n_dom, -1.0), gamma_loc=np.full(n_dom, -1.0))

    if opts.lvl2_num == 0:
        pc = StructuredGenEO(
            grid_shape=sd.grid.shape, dom_grid=sd.dom_grid, pad=sd.pad,
            local_shape=sd.local_shape, lvl1=opts.lvl1, lvl2=0,
            hybrid=False, eff_hybrid=False, dim_e=0, k_max=0, gop=gop,
            l1=l1, pou=pou_b, maskf=maskf, z=None, colids=None,
            e_evecs=None, e_eig_inv=None,
            x0=jnp.zeros(sd.grid.n_nodes, dtype), l1_exact=l1_exact)
        return pc, stats

    # ----- GenEO eigensolves -----
    # GenEO-1: (A_Neu, D A_Dir D) <= tau               (Def 7.14 of R1)
    # GenEO-2: (A_Neu, A_Rob) <= tauLoc  ((19) of R4) and the REVERSED
    #          gamma pencil (A_Rob, D A_Dir D) with mu <= 1/gammaLoc
    #          ((21) of R4 — LOBPCG computes smallest, so the pencil is
    #          swapped and kept lambda = 1/mu >= gammaLoc)
    _t = _time.perf_counter()
    neu = lo.neumann_stencil(f)
    dirs = lo.dirichlet_stencil(f)
    b_dad = solvers.diag_congruence(dirs, pou_b)      # D A_Dir D

    max_it = min(int(opts.els2.max_it), 400) \
        if opts.els2.max_it < 10000 else 100

    run_lobpcg = _lobpcg_run_jit(n_loc, jnp.dtype(dtype).name, max_it,
                                 float(opts.els2.rtol))

    # LOBPCG live set ~ 16 k-column [chunk, n_loc] panels; chunk the
    # domain batch to a device-memory budget (one compiled executable per
    # chunk shape, reused across slices — the generic path's discipline)
    budget = float(_os.environ.get("GENEO_LOBPCG_BUDGET_GB", "6")) * 1e9

    def _slice(t, lo_i, hi_i):
        return jax.tree_util.tree_map(
            lambda a: a[lo_i:hi_i] if getattr(a, "ndim", 0) else a, t)

    def _cat(t1, t2):
        return jax.tree_util.tree_map(
            lambda a, c: jnp.concatenate([a, c], 0)
            if getattr(a, "ndim", 0) else a, t1, t2)

    def run_all(a_st, b_st, t_tree, k, x0_prev=None):
        # guard columns (see _lobpcg_run_jit): extra Ritz pairs that
        # open the kept window's boundary-cluster gap.  Default OFF:
        # with unconverged-pair PRUNING as the quality mechanism the
        # guards' accuracy gain no longer buys iterations, while their
        # wider block doubles the eigensolve wall (measured at the 10M
        # bench: g=2 setup 12.1 s / 101 inner its vs g=0 setup 6.9 s /
        # 140 its — total 14.7 vs 9.8 s); set GENEO_LOBPCG_GUARD to
        # re-enable for pencils with pathological boundary clusters
        g = int(_os.environ.get("GENEO_LOBPCG_GUARD", 0))
        per_dom = n_loc * 16 * (k + g) * np.dtype(np.float32).itemsize
        chunk = int(np.clip(budget // max(per_dom, 1), 1, n_dom))
        # BTSolver factors batch domains on dim 1 (plane-major scan
        # layout) — the leading-dim chunk slicer does not apply
        if chunk >= n_dom or isinstance(t_tree, solvers.BTSolver):
            return run_lobpcg(a_st, b_st, maskf, t_tree, k, g, x0_prev)
        trees = (a_st, b_st, maskf, t_tree, x0_prev)
        n_chunks = (n_dom + chunk - 1) // chunk
        parts = []
        for c in range(n_chunks):
            lo_i, hi_i = c * chunk, min((c + 1) * chunk, n_dom)
            args = [_slice(t, lo_i, hi_i) for t in trees]
            if hi_i - lo_i < chunk:
                pad_n = chunk - (hi_i - lo_i)
                args = [_cat(a, _slice(t, 0, pad_n))
                        for a, t in zip(args, trees)]
            out = run_lobpcg(*args[:4], k, g, x0_prev=args[4])
            jax.block_until_ready(out[0])
            # eigenVECTORS stay on device (pulls are the tunneled-TPU
            # wall); w/res are tiny
            parts.append(tuple(o[:hi_i - lo_i] for o in out))
            _vlog(f"lobpcg chunk {c + 1}/{n_chunks} (k={k}) done")
        return tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                     for i in range(3))

    def dense_pencil(a_st, b_st, steer, flip):
        """Materialize the batched pencil densely from the stencil
        matvecs (identity-block probe — n_loc columns, test-scale only)
        and solve with the exact batched eigh: the structured twin of the
        generic path's default els2 route, giving EXACT degenerate-
        cluster multiplicities for iteration-count parity.  ``steer``:
        the pad-diagonal eigenvalue (1e6 sorts pads above an ascending
        tau window, 1e-6 below a descending gamma read — the
        _with_pad_diag discipline); ``flip``: the gamma problem wants the
        LARGEST pencil eigenvalues — return the spectrum descending so
        the kept window is again a prefix."""
        eye = jnp.broadcast_to(
            jnp.eye(n_loc, dtype=dtype), (n_dom, n_loc, n_loc))
        box5 = (n_dom, sz, sy, sx, n_loc)
        a_d = a_st.matvec(eye.reshape(box5)).reshape(n_dom, n_loc, n_loc)
        b_d = b_st.matvec(eye.reshape(box5)).reshape(n_dom, n_loc, n_loc)
        padf = 1.0 - maskf.reshape(n_dom, n_loc)
        pad_eye = padf[:, :, None] * padf[:, None, :] \
            * jnp.eye(n_loc, dtype=dtype)
        from ..ops import batched_linalg as bl
        a_eff = a_d - a_d * pad_eye + steer * pad_eye
        b_eff = b_d - b_d * pad_eye + pad_eye
        w, v = bl.generalized_eigh(a_eff, b_eff)
        w_np = np.asarray(w, np.float64)
        v = jnp.asarray(v, dtype)
        if flip:
            w_np = w_np[:, ::-1].copy()
            v = v[:, :, ::-1]
        return w_np, v

    # dense-eigh is exact but O(n_loc^3): the default els2 route at test
    # scale; LOBPCG is the at-scale route (and the only one above this)
    dense_ok = opts.els2.type != "lobpcg" and n_loc <= 1024

    def run_pencil(label, a_st, b_st, t_tree, thr, thr_dense, cut_p):
        """One GenEO pencil.  Returns (w_np, v, base, kept_res) with w in
        the PENCIL-LAMBDA convention and the kept window always a prefix
        (ascending for tau, descending for gamma).

        Iterative route: candidate growth until every domain's window is
        strictly inside the computed prefix (the Sylvester-estimate role,
        estimateNumberOfEigenValues geneo.cpp:502-560, realized by
        warm-restarted doubling instead of inertia counts); the gamma
        problem runs the SWAPPED pencil (smallest mu = 1/lambda)."""
        gamma_p = label == "gamma"
        if dense_ok:
            if gamma_p:
                # unswapped (D A_Dir D, A_Rob), largest lambda
                w_np, v = dense_pencil(b_st, a_st, 1e-6, flip=True)
                base = (w_np >= thr_dense[:, None]).sum(1).astype(np.int64)
            else:
                w_np, v = dense_pencil(a_st, b_st, 1e6, flip=False)
                base = (w_np <= thr_dense[:, None]).sum(1).astype(np.int64)
            if cut_p > 0:
                base = np.minimum(base, cut_p)
            _vlog(f"dense eigh[{label}] done")
            return w_np, v, base, np.zeros(n_dom)
        syl = None
        if cut_p > 0:
            k_cand = cut_p
        else:
            # Sylvester inertia of (A - theta B) via the block-tridiag
            # LDL^T plane recursion (estimateNumberOfEigenValues,
            # geneo.cpp:502-560) sizes the candidate block up front —
            # one LOBPCG pass in the common case; the warm-restarted
            # doubling below remains the safety net (and the only route
            # when the plane eigendecompositions don't fit)
            s2_est = n_loc // max(sd.local_shape[
                int(np.argmax(sd.local_shape))], 1)
            if not opts.no_syl and s2_est <= 192 and solvers.bt_bytes(
                    n_dom, sd.local_shape) <= 2e9:
                beta = jnp.asarray(-thr, dtype).reshape(-1, 1, 1, 1)
                pen = lo.LocalStencil(
                    diag=a_st.diag + beta * b_st.diag,
                    offs=tuple(ca + beta * cb for ca, cb
                               in zip(a_st.offs, b_st.offs)))
                axis = lo.plane_axis(sd.local_shape)
                dp, ip, cc = lo.plane_coefficients(pen, axis)
                ip_strides = tuple(st for _, st in ip)
                ip_coeffs = [cf for cf, _ in ip]
                syl = np.asarray(
                    _bt_inertia_jit(ip_strides)(dp, ip_coeffs, cc),
                    np.int64)
                k_cand = int(np.clip(syl.max(), 1, min(128, n_loc)))
                _vlog(f"sylvester[{label}] estimates done "
                      f"(k_cand={k_cand})")
            else:
                k_cand = 8
        k_cand = min(k_cand, n_loc)
        x_prev = None
        while True:
            w, v, res = run_all(a_st, b_st, t_tree, k_cand, x_prev)
            w_np = np.asarray(w, np.float64)
            _vlog(f"lobpcg[{label}] k={k_cand} done")
            if cut_p > 0 or k_cand >= min(128, n_loc):
                break
            if np.all(w_np[:, -1] > thr):
                break
            x_prev = v
            k_cand = min(k_cand * 2, min(128, n_loc))
        res_np = np.asarray(res, np.float64)
        _k_used[label] = k_cand
        # selection window is a PREFIX of the ascending candidates, so Z
        # builds ON DEVICE by column masking (no eigenvector pull)
        base = (w_np <= thr[:, None]).sum(axis=1).astype(np.int64)
        if cut_p > 0:
            base = np.minimum(base, cut_p)
        # keep only CONVERGED pairs — the reference uses exactly the
        # EPSGetConverged prefix and post-filters candidates
        # (geneo.cpp:713-714): an unconverged "eigenvector" is a junk
        # direction that E^-1 then amplifies (measured at the 10M bench:
        # one res~0.4 column pushed |Q b| to ~1e11 vs the 1e7-scale
        # solution, killing the E1 deflation start).  The window is a
        # prefix, so truncate at the first unconverged column.
        prune = float(_os.environ.get(
            "GENEO_EIG_PRUNE", 30.0 * float(opts.els2.rtol)))
        if prune > 0:
            for p in range(n_dom):
                j = 0
                while j < base[p] and res_np[p, j] <= prune:
                    j += 1
                base[p] = j
        kept_res = np.zeros(n_dom)
        for p in range(n_dom):
            if base[p] > 0:
                kept_res[p] = float(res_np[p, :base[p]].max())
        if gamma_p:
            # map the swapped-pencil mu back to lambda = 1/mu
            w_np = 1.0 / np.maximum(w_np, np.finfo(np.float64).tiny)
        return w_np, v, base, kept_res

    # assemble the pencil list + shift-invert preconditioners
    _k_used = {}
    cut_p = opts.cut
    if opts.lvl2_num == 2 and cut_p >= 2:
        cut_p = cut_p // 2                    # halved (geneo.cpp:1275)
    t_rtol, t_maxit = 5e-2, 30                # t_op is a preconditioner
    if opts.lvl2_num == 1:
        thr1 = np.full(n_dom, float(opts.tau))
        if dense_ok:
            t1 = None
        elif sep:
            # exact shifted Neumann FDM (the ARPACK STSINVERT analogue)
            t1 = fdm.fdm_factor(fdm.neumann_axes(sd),
                                shift=float(opts.tau), dtype=dtype)
        else:
            t1, _ = solvers.select_local_solver(
                solvers.add_scaled(neu, b_dad, float(opts.tau)), maskf,
                sd.local_shape, rtol=t_rtol, max_it=t_maxit, dtype=dtype)
        pencils = [("tau", neu, b_dad, thr1, thr1, t1)]
    else:
        rob = lo.robin_stencil(f, opts.optim)
        tl = _tau_loc_structured(sd, opts.tau, opts.cst)
        gl = _gamma_loc(sd.adjacency(), n_dom, opts.gamma, opts.cst)
        stats.tau_loc, stats.gamma_loc = tl, gl
        thr2 = 1.0 / np.maximum(gl, 1e-12)    # swapped-pencil mu window
        if dense_ok:
            t1 = t2 = None
        else:
            t1, _ = solvers.select_local_solver(
                solvers.add_scaled(neu, rob, float(np.mean(tl))), maskf,
                sd.local_shape, rtol=t_rtol, max_it=t_maxit, dtype=dtype)
            t2, _ = solvers.select_local_solver(
                solvers.add_scaled(rob, b_dad, float(np.mean(thr2))),
                maskf, sd.local_shape, rtol=t_rtol, max_it=t_maxit,
                dtype=dtype)
        pencils = [("tau", neu, rob, tl, tl, t1),
                   ("gamma", rob, b_dad, thr2, gl, t2)]

    runs = []
    for label, a_st, b_st, thr, thr_dense, t_tree in pencils:
        _tp = _time.perf_counter()
        w_np, v, base, kres = run_pencil(label, a_st, b_st, t_tree, thr,
                                         thr_dense, cut_p)
        if timers is not None:
            _dt = _time.perf_counter() - _tp
            timers.add("l2_eig", _dt)
            timers.add(f"l2_{label}_eig", _dt)
        runs.append((label, w_np, v, base, kres))
    if _os.environ.get("GENEO_KEEP_PENCILS") == "1" and "tau" in _k_used:
        # keep the LIVE tau-pencil operators for the bench roofline's
        # lobpcg_step entry — strictly less memory than the rebuild path
        # (no second full-scale field gather), freed with the stats object
        stats.pencils = (pencils[0][1], pencils[0][2], maskf,
                         pencils[0][5], int(_k_used["tau"]))
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

    # Nicolaides near-kernel test (geneo.cpp:897-955) on the tau pencil:
    # quadratic forms of the constant vector through the stencil operators
    # (one jitted program + one pull of three [n_dom] vectors)
    b_tau = pencils[0][2]
    _num, _den, _nr = _nicolaides_forms(neu, b_tau, maskf)
    num_all = np.asarray(_num, np.float64)
    den_all = np.asarray(_den, np.float64)
    n_real = np.asarray(_nr, np.int64)
    eps64 = np.finfo(np.float64).eps
    eps32 = np.finfo(np.float32).eps

    nic = np.zeros(n_dom, bool)
    for p in range(n_dom):
        if n_real[p] == 0:
            continue
        kept_min = w1_np[p, 0] if base1[p] > 0 else np.inf
        if base1[p] > 0 and kept_min < eps64:
            continue  # a zero eigenvalue is already in the basis
        ratio = abs(num_all[p] / den_all[p]) if den_all[p] != 0 else np.inf
        if ratio <= eps32 or base1[p] + base2[p] == 0:
            # near-kernel constant OR forbidden-empty-set fallback
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

    # D-weighted coarse basis Z ((7.49) of R1), built on device: per
    # domain the columns are [tau-kept prefix, Nicolaides constant,
    # gamma-kept prefix] — matching the generic path's column order
    col = np.arange(k_max)

    def pad_cols(v_):
        k_v = v_.shape[-1]
        if k_v < k_max:
            return jnp.concatenate(
                [v_, jnp.zeros((n_dom, n_loc, k_max - k_v), dtype)],
                axis=-1)
        return v_[:, :, :k_max]

    keepm = jnp.asarray(col[None, :] < base1[:, None], dtype)
    nicm = jnp.asarray((col[None, :] == base1[:, None]) & nic[:, None],
                       dtype)
    z = pad_cols(v1) * keepm[:, None, :] \
        + maskf.reshape(n_dom, n_loc, 1) * nicm[:, None, :]
    if v2 is not None:
        lo2 = (base1 + nic)[:, None]
        idx2 = np.clip(col[None, :] - lo2, 0, max(v2.shape[-1] - 1, 0))
        m2 = jnp.asarray((col[None, :] >= lo2)
                         & (col[None, :] < counts[:, None]), dtype)
        z2 = jnp.take_along_axis(
            v2, jnp.asarray(idx2)[:, None, :], axis=-1)
        z = z + z2 * m2[:, None, :]
    z = z.reshape(n_dom, sz, sy, sx, k_max)
    z = z * pou_b[..., None] * maskf[..., None]
    offs = np.zeros(n_dom, np.int64)
    np.cumsum(counts[:-1], out=offs[1:])
    colids_np = np.full((n_dom, k_max), dim_e, np.int32)
    for p in range(n_dom):
        colids_np[p, :counts[p]] = offs[p] + np.arange(counts[p])
    colids = jnp.asarray(colids_np)
    _t = _mark("l2_z", _t)
    _vlog("Z built")

    # E = Z^T A Z: dilated-stencil apply + window contractions.
    # Assembled in f64 whenever x64 is on: Z's columns are near-null
    # vectors of A, so the contraction cancels eps(f32)*||A||-level terms
    # and an f32-assembled E is noise at its own (tiny) scale — the rank
    # detection below then over-prunes load-bearing GenEO modes (observed:
    # 52/64 columns wrongly pruned at 32^3 where the f64 E is full rank).
    # One-shot cost: a single emulated-f64 stencil apply on k_max columns.
    e_dtype = jnp.float64 if jax.config.jax_enable_x64 else dtype
    f_e = f_dil if f_dil.diag.dtype == e_dtype else dataclasses.replace(
        f_dil, eoff=tuple(e.astype(e_dtype) for e in f_dil.eoff),
        diag=f_dil.diag.astype(e_dtype))
    dirs_dil = lo.dirichlet_stencil(f_e)
    pad_width = [(0, 0)] + [(1, 1) if p else (0, 0)
                            for p in (sd.pad[2], sd.pad[1], sd.pad[0])] \
        + [(0, 0)]
    z_dil = jnp.pad(z.astype(e_dtype), pad_width)
    y_dil = dirs_dil.matvec(z_dil)
    # zero the pad rows of the dilated apply (identity pad rows of the
    # stencil would otherwise inject the zero-padded z — already zero, but
    # the mask keeps out-of-grid halo reads inert)
    y_dil = y_dil * f_dil.mask[..., None].astype(e_dtype)
    e = _coarse_e(sd, z, y_dil, counts)
    _vlog(f"E assembled ({dim_e}x{dim_e}); factoring")
    (z, colids, e_evecs, e_eig_inv, dim_e, k_max,
     counts) = finalize_coarse(e, z, counts, stats, dtype, e_dtype)
    _vlog(f"E factored (dim_e={dim_e}, pruned={stats.e_pruned})")
    _t = _mark("l2_e", _t)

    pc = StructuredGenEO(
        grid_shape=sd.grid.shape, dom_grid=sd.dom_grid, pad=sd.pad,
        local_shape=sd.local_shape, lvl1=opts.lvl1, lvl2=opts.lvl2_num,
        hybrid=opts.hybrid, eff_hybrid=opts.eff_hybrid, dim_e=dim_e,
        k_max=k_max, gop=gop, l1=l1, pou=pou_b, maskf=maskf, z=z,
        colids=colids, e_evecs=e_evecs, e_eig_inv=e_eig_inv,
        x0=jnp.zeros(sd.grid.n_nodes, dtype), l1_exact=l1_exact)
    if opts.eff_hybrid and b is not None:
        pc = dataclasses.replace(
            pc, x0=pc.apply_q(jnp.asarray(b, dtype)))
    return pc, stats
