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

Supported configurations: lvl1 in {ASM, RAS, SRAS}, lvl2 in
{0, 1, H1, E1}.  ORAS/SORAS (border-restricted Robin blocks) and GenEO-2
break kappa-separability and stay on the generic / block-tridiagonal
paths.  Setup is host-orchestrated (static coarse shapes before compile),
apply is pure and jit/shard_map-able.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from itertools import product

import numpy as np

import jax
import jax.numpy as jnp

from ..config import GenEOOptions
from ..ops.lobpcg import matfree_lobpcg
from ..precond.geneo import (GenEOStats, factor_e,
                             prune_dependent_columns)
from . import fdm, halo
from . import local_ops as lo
from .decompose import StructuredDecomposition
from .grid import GlobalStencil, global_stencil


@partial(jax.tree_util.register_dataclass,
         data_fields=["gop", "l1", "pou", "maskf", "z", "colids",
                      "e_evecs", "e_eig_inv", "x0"],
         meta_fields=["grid_shape", "dom_grid", "pad", "local_shape",
                      "lvl1", "lvl2", "hybrid", "eff_hybrid", "dim_e",
                      "k_max"])
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
    lvl1: str          # ASM | RAS | SRAS
    lvl2: int          # 0 | 1
    hybrid: bool
    eff_hybrid: bool
    dim_e: int
    k_max: int
    # --- data ---
    gop: GlobalStencil           # assembled global operator (iteration SpMV)
    l1: fdm.FDMFactor            # Dirichlet FDM factor (level-1 solves)
    pou: jax.Array | None        # [d, lz, ly, lx] partition of unity
    maskf: jax.Array             # [d, lz, ly, lx] float real-slot mask
    z: jax.Array | None          # [d, lz, ly, lx, k_max] D-weighted basis
    colids: jax.Array | None     # [d, k_max] int32 (pad -> dim_e)
    e_evecs: jax.Array | None    # [K, K] coarse factor W (E^-1 = W D W^T)
    e_eig_inv: jax.Array | None  # [K]
    x0: jax.Array                # [n] initial guess (Q b if eff-hybrid)

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
        if self.lvl1 in ("RAS", "SRAS"):
            xb = xb * self.pou                      # (1.29) of R1
        ub = self.l1.solve(xb)
        if self.lvl1 == "SRAS":
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

def _flat_ops(neu, dirs, pou_b, maskf, t_fac: fdm.FDMFactor):
    """LOBPCG operator callables over flat [d, n_loc, m] blocks.

    [d, n_loc, m] <-> [d, lz, ly, lx, m] is a FREE reshape (n_loc is the
    flattened box in the same layout), so the stencil/FDM kernels apply
    directly.  Batch size is taken from the arrays (callers slice the
    pytrees to chunk the domain batch)."""
    n_dom, sz, sy, sx = maskf.shape
    box = (n_dom, sz, sy, sx, -1)
    flat = (n_dom, sz * sy * sx, -1)

    def a_op(v):
        return neu.matvec(v.reshape(box)).reshape(flat)

    def b_op(v):
        w = v.reshape(box) * pou_b[..., None]
        w = dirs.matvec(w) * pou_b[..., None]
        return w.reshape(flat)

    def t_op(v):
        w = t_fac.solve(v.reshape(box)) * maskf[..., None]
        return w.reshape(flat)

    return a_op, b_op, t_op


def _coarse_e(sd: StructuredDecomposition, z: jax.Array,
              y_dil: jax.Array, counts: np.ndarray) -> np.ndarray:
    """E = Z^T A Z via per-offset window contractions.

    z:     [n_dom, lz, ly, lx, k_max] D-weighted local basis (zero pad)
    y_dil: [n_dom, dz, dy, dx, k_max] = A z_d on the one-layer-dilated box
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

    @jax.jit
    def all_blocks(z_, y_):
        """One compiled program for every neighbor-offset contraction."""
        z_b = halo.from_batch(z_, sd.dom_grid)      # [gz, gy, gx, ...]
        out = []
        for (ox, oy, oz), ((zwx, ywx), (zwy, ywy), (zwz, ywz)) in offs_used:
            zr = z_b
            for gaxis, o in ((2, ox), (1, oy), (0, oz)):
                if o:
                    zr = jnp.roll(zr, -o, axis=gaxis)
            zwin = halo.to_batch(zr)[:, zwz, zwy, zwx, :]
            ywin = y_[:, ywz, ywy, ywx, :]
            out.append(jnp.einsum(
                "dzyxk,dzyxm->dkm", zwin, ywin,
                preferred_element_type=jnp.float64
                if z_.dtype == jnp.float64 else jnp.float32,
                precision="highest"))
        return jnp.stack(out)                        # [n_off, d, k, k]

    blocks = np.asarray(all_blocks(z, y_dil), np.float64)

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
    if opts.lvl1_oras:
        raise ValueError(
            "structured path: ORAS/SORAS need border-restricted Robin "
            "blocks (not kappa-separable); use the generic path")
    if opts.lvl2_num == 2:
        raise ValueError(
            "structured path: GenEO-2 needs Robin pencils; use the "
            "generic path")
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
    _vlog("fields gathered")

    # level-1 FDM factor (Dirichlet; exact direct solve)
    l1 = fdm.fdm_factor(fdm.dirichlet_axes(sd), dtype=dtype)
    _t = _mark("l1_minv", _t)
    _vlog("L1 FDM factored")

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
            x0=jnp.zeros(sd.grid.n_nodes, dtype))
        return pc, stats

    # ----- GenEO-1 eigensolve: (A_Neu, D A_Dir D), threshold tau -----
    _t = _time.perf_counter()
    neu = lo.neumann_stencil(f)
    dirs = lo.dirichlet_stencil(f)
    t_fac = fdm.fdm_factor(fdm.neumann_axes(sd), shift=float(opts.tau),
                           dtype=dtype)

    max_it = min(int(opts.els2.max_it), 400) \
        if opts.els2.max_it < 10000 else 100

    @partial(jax.jit, static_argnames=("k",))
    def run_lobpcg(neu_, dirs_, pou_, maskf_, t_, k):
        # rebind closures on the jitted arguments (operator pytrees must
        # be traced arguments, never closed-over constants)
        a_o, b_o, t_o = _flat_ops(neu_, dirs_, pou_, maskf_, t_)
        d = maskf_.shape[0]
        x0 = jax.random.normal(jax.random.PRNGKey(0), (d, n_loc, k),
                               dtype)
        x0 = x0 * maskf_.reshape(d, n_loc)[..., None]
        x0 = t_o(x0)
        return matfree_lobpcg(a_o, b_o, t_o, x0, max_it=max_it,
                              tol=float(opts.els2.rtol))

    # LOBPCG live set ~ 16 k-column [chunk, n_loc] panels; chunk the
    # domain batch to a device-memory budget (one compiled executable per
    # chunk shape, reused across slices — the generic path's discipline)
    import os as _os2
    budget = float(_os2.environ.get("GENEO_LOBPCG_BUDGET_GB", "6")) * 1e9

    def _slice(t, lo_i, hi_i):
        return jax.tree_util.tree_map(
            lambda a: a[lo_i:hi_i] if getattr(a, "ndim", 0) else a, t)

    def _cat(t1, t2):
        return jax.tree_util.tree_map(
            lambda a, c: jnp.concatenate([a, c], 0)
            if getattr(a, "ndim", 0) else a, t1, t2)

    def run_all(k):
        per_dom = n_loc * 16 * k * np.dtype(np.float32).itemsize
        chunk = int(np.clip(budget // max(per_dom, 1), 1, n_dom))
        if chunk >= n_dom:
            return run_lobpcg(neu, dirs, pou_b, maskf, t_fac, k)
        trees = (neu, dirs, pou_b, maskf, t_fac)
        n_chunks = (n_dom + chunk - 1) // chunk
        parts = []
        for c in range(n_chunks):
            lo_i, hi_i = c * chunk, min((c + 1) * chunk, n_dom)
            args = [_slice(t, lo_i, hi_i) for t in trees]
            if hi_i - lo_i < chunk:
                pad_n = chunk - (hi_i - lo_i)
                args = [_cat(a, _slice(t, 0, pad_n))
                        for a, t in zip(args, trees)]
            out = run_lobpcg(*args, k)
            jax.block_until_ready(out[0])
            # eigenVECTORS stay on device (pulls are the tunneled-TPU
            # wall); w/res are tiny
            parts.append(tuple(o[:hi_i - lo_i] for o in out))
            _vlog(f"lobpcg chunk {c + 1}/{n_chunks} (k={k}) done")
        return tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                     for i in range(3))

    # tau-adaptive candidate count: grow the block until every domain's
    # window [0, tau] is strictly inside the computed candidates (the
    # Sylvester-estimate role, estimateNumberOfEigenValues
    # geneo.cpp:502-560, realized by doubling instead of inertia counts)
    k_cand = opts.cut if opts.cut > 0 else 8
    k_cand = min(k_cand, n_loc)
    while True:
        w, v, res = run_all(k_cand)
        w_np = np.asarray(w, np.float64)
        _vlog(f"lobpcg k={k_cand} done")
        if opts.cut > 0 or k_cand >= min(128, n_loc):
            break
        if np.all(w_np[:, -1] > opts.tau):
            break
        k_cand = min(k_cand * 2, min(128, n_loc))
    res_np = np.asarray(res, np.float64)
    if timers is not None:
        _dt = _time.perf_counter() - _t
        timers.add("l2_eig", _dt)
        timers.add("l2_tau_eig", _dt)
    _t = _time.perf_counter()

    # selection: exact [0, tau] window (geneo.cpp:713-714) — eigenvalues
    # ascend, so the kept set is always a PREFIX of the candidates and Z
    # can be built ON DEVICE by column masking (no eigenvector pull —
    # device->host transfers are the tunneled-TPU wall)
    base = (w_np <= opts.tau).sum(axis=1).astype(np.int64)
    if opts.cut > 0:
        base = np.minimum(base, opts.cut)
    stats.estim_dim_e = base.copy()
    # kept-pair residual maxima (the kept set is the ascending prefix)
    kept_res = np.zeros(n_dom)
    for p in range(n_dom):
        if base[p] > 0:
            kept_res[p] = float(res_np[p, :base[p]].max())
    stats.lobpcg_res = kept_res

    # Nicolaides near-kernel test (geneo.cpp:897-955): quadratic forms of
    # the constant vector through the stencil operators
    ones_b = maskf
    num_all = np.asarray(jnp.einsum(
        "dzyx,dzyx->d", ones_b, neu.matvec(ones_b)), np.float64)
    den_all = np.asarray(jnp.einsum(
        "dzyx,dzyx->d", ones_b, pou_b * dirs.matvec(pou_b * ones_b)),
        np.float64)
    eps64 = np.finfo(np.float64).eps
    eps32 = np.finfo(np.float32).eps
    n_real = np.asarray(jnp.sum(maskf.reshape(n_dom, -1), axis=1),
                        np.int64)

    nic = np.zeros(n_dom, bool)
    for p in range(n_dom):
        if n_real[p] == 0:
            continue
        kept_min = w_np[p, 0] if base[p] > 0 else np.inf
        if base[p] > 0 and kept_min < eps64:
            continue  # a zero eigenvalue is already in the basis
        ratio = abs(num_all[p] / den_all[p]) if den_all[p] != 0 else np.inf
        if ratio <= eps32 or base[p] == 0:
            # near-kernel constant OR forbidden-empty-set fallback
            nic[p] = True
    stats.nicolaides = nic.astype(np.int64)
    counts = base + nic
    stats.real_dim_e = counts.copy()
    stats.raw_dim_e = counts.copy()
    stats.eigenvalues = [
        [float(x) for x in w_np[p, :base[p]]] + ([0.0] if nic[p] else [])
        for p in range(n_dom)]
    dim_e = int(counts.sum())
    k_max = max(int(counts.max()), 1)
    _vlog(f"columns selected (dim_e={dim_e}, k_max={k_max})")

    # D-weighted coarse basis Z ((7.49) of R1), built on device:
    # kept prefix columns + the Nicolaides constant in column `base[p]`
    k_v = w_np.shape[1]
    if k_v < k_max:
        v = jnp.concatenate(
            [v, jnp.zeros((n_dom, n_loc, k_max - k_v), dtype)], axis=-1)
    col = np.arange(k_max)
    keepm = jnp.asarray(col[None, :] < base[:, None], dtype)
    nicm = jnp.asarray((col[None, :] == base[:, None]) & nic[:, None],
                       dtype)
    z = v[:, :, :k_max] * keepm[:, None, :] \
        + maskf.reshape(n_dom, n_loc, 1) * nicm[:, None, :]
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
    f_e = f_dil if f_dil.kappa.dtype == e_dtype else dataclasses.replace(
        f_dil, kappa=f_dil.kappa.astype(e_dtype),
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
    e = _coarse_e(sd, z.astype(e_dtype), y_dil, counts)
    _vlog(f"E assembled ({dim_e}x{dim_e}); factoring")
    keep = prune_dependent_columns(e, e_dtype)
    if keep is not None:
        # prune dependent coarse columns (see the generic path): E becomes
        # SPD, dim_e shrinks by exactly the dependency count
        stats.e_pruned = dim_e - keep.size
        kept_mask = np.zeros(dim_e, bool)
        kept_mask[keep] = True
        new_counts = np.array(
            [int(kept_mask[offs[p]:offs[p] + counts[p]].sum())
             for p in range(n_dom)], np.int64)
        new_offs = np.zeros(n_dom, np.int64)
        np.cumsum(new_counts[:-1], out=new_offs[1:])
        new_dim_e = int(new_counts.sum())
        new_k_max = max(int(new_counts.max()), 1)
        gidx = np.zeros((n_dom, new_k_max), np.int64)
        colids_np = np.full((n_dom, new_k_max), new_dim_e, np.int32)
        for p in range(n_dom):
            js = np.flatnonzero(kept_mask[offs[p]:offs[p] + counts[p]])
            gidx[p, :js.size] = js
            colids_np[p, :js.size] = new_offs[p] + np.arange(js.size)
            stats.eigenvalues[p] = [stats.eigenvalues[p][j] for j in js]
        colmask = np.arange(new_k_max)[None, :] < new_counts[:, None]
        z = jnp.take_along_axis(
            z, jnp.asarray(gidx)[:, None, None, None, :], axis=-1) \
            * jnp.asarray(colmask, dtype)[:, None, None, None, :]
        e = e[np.ix_(keep, keep)]
        stats.real_dim_e = new_counts.copy()
        counts, offs = new_counts, new_offs
        dim_e, k_max = new_dim_e, new_k_max
        colids = jnp.asarray(colids_np)
        _vlog(f"pruned {stats.e_pruned} dependent coarse columns "
              f"(dim_e={dim_e})")
    ev_np, ew_np, stats.e_null = factor_e(e, dtype, e_dtype=e_dtype)
    e_evecs = jnp.asarray(ev_np, dtype)
    e_eig_inv = jnp.asarray(1.0 / ew_np, dtype)
    _t = _mark("l2_e", _t)

    pc = StructuredGenEO(
        grid_shape=sd.grid.shape, dom_grid=sd.dom_grid, pad=sd.pad,
        local_shape=sd.local_shape, lvl1=opts.lvl1, lvl2=opts.lvl2_num,
        hybrid=opts.hybrid, eff_hybrid=opts.eff_hybrid, dim_e=dim_e,
        k_max=k_max, gop=gop, l1=l1, pou=pou_b, maskf=maskf, z=z,
        colids=colids, e_evecs=e_evecs, e_eig_inv=e_eig_inv,
        x0=jnp.zeros(sd.grid.n_nodes, dtype))
    if opts.eff_hybrid and b is not None:
        pc = dataclasses.replace(
            pc, x0=pc.apply_q(jnp.asarray(b, dtype)))
    return pc, stats
