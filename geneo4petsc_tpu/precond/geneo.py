"""The GenEO preconditioner — TPU-native two-level Schwarz.

Re-implements the full preconditioner family of src/geneo.cpp as a frozen
pytree + pure functions:

  level 1: ASM / RAS / SRAS / ORAS / SORAS    (applyLevel1, geneo.cpp:1962-2038)
  level 2: 0 / GenEO-1 / GenEO-2, additive / hybrid (H) / efficient-hybrid (E)
           (setUpLevel2 geneo.cpp:1544-1608, applyQ :1435-1542,
            projectOnFineSpace :1902-1960, applyGenEOPC :2051-2098)

Key TPU-native inversions versus the reference:
  * one subdomain per MPI rank  ->  subdomain batch axis (vmapped kernels)
  * MUMPS per-domain LU         ->  batched dense Cholesky/LU on the MXU
  * SLEPc/ARPACK shift-invert   ->  batched dense generalized eigh
  * VecScatter halo exchange    ->  gather / segment-sum scatter-add
  * rank-0 offload of Z and E   ->  replication (every device holds the tiny
    coarse factorization; -geneo_offload is accepted and is a no-op since
    replication strictly dominates a master bottleneck on TPU)

Setup is host-orchestrated (coarse-space sizes become static shapes —
XLA needs them fixed before compile); apply is pure and jit/shard_map-able.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..assembly.assemble import SubdomainBatch, robin_blocks
from ..config import GenEOOptions
from ..ops import batched_linalg as bl


@dataclass
class GenEOStats:
    """Per-domain setup statistics (reported via INFO lines,
    src/geneo4PETSc.cpp:968-988)."""

    estim_dim_e: np.ndarray   # [n_dom] Sylvester estimates
    real_dim_e: np.ndarray    # [n_dom] actual coarse columns (post-prune)
    nicolaides: np.ndarray    # [n_dom] constant vectors added
    tau_loc: np.ndarray       # [n_dom] local tau (GenEO-2)
    gamma_loc: np.ndarray     # [n_dom] local gamma (GenEO-2)
    eigenvalues: list = field(default_factory=list)  # per-domain kept spectra
    # [n_dom] columns SELECTED by the eigenproblem windows + Nicolaides,
    # BEFORE dependent-column pruning — the quantity the eigensolver-path
    # selection-parity contract is about (None until level-2 setup ran)
    raw_dim_e: np.ndarray | None = None
    # number of (near-)null modes of E fixed by the truncating spectral
    # pseudo-inverse — the MUMPS ICNTL(24)/CNTL(5) null-pivot analogue.
    # When > 0 the PC is singular on those directions and CG's default
    # PRECONDITIONED norm is blind to them (the reference shares this
    # property); callers should warn and/or check the true residual.
    e_null: int = 0
    # number of linearly dependent coarse columns REMOVED by the
    # pivoted-Cholesky pruning pass before factorizing E (the real fix for
    # rank-deficient coarse spaces: dim_e shrinks and the pruned E is SPD,
    # so the PC is nonsingular — vs the reference's MUMPS null-pivot
    # fixing, geneo.cpp:76-92, which keeps the singular directions)
    e_pruned: int = 0
    # iterative-eigensolver relative residual, [n_dom] max over the KEPT
    # pairs (None for the dense-eigh route) — surfaced so callers can flag
    # unconverged pairs (the checkEPSSolve role, src/geneo.cpp:577-624):
    # the CLI warns above the EPS tolerance analogue (els2.rtol) and
    # -geneo_chk aborts with per-domain dump files
    lobpcg_res: np.ndarray | None = None
    # live tau-pencil operators (a_st, b_st, maskf, t_tree, k) kept for
    # roofline accounting of the eigensolve phase when the caller sets
    # GENEO_KEEP_PENCILS=1 — reusing the solve-resident arrays avoids the
    # full-scale pencil rebuild that OOMs at 10M DOF (bench.py roofline)
    pencils: tuple | None = None


@partial(jax.tree_util.register_dataclass,
         data_fields=["batch", "l1_factor", "pou", "z_loc", "colids",
                      "e_evecs", "e_eig_inv", "x0"],
         meta_fields=["lvl1", "lvl2", "hybrid", "eff_hybrid", "dim_e",
                      "k_max", "l1_kind", "use_pallas"])
@dataclass(frozen=True)
class GenEOPreconditioner:
    """Immutable setup product; ``apply`` is the hot per-iteration path."""

    # --- static configuration ---
    lvl1: str          # ASM | RAS | SRAS | ORAS | SORAS
    lvl2: int          # 0 | 1 | 2
    hybrid: bool
    eff_hybrid: bool
    dim_e: int         # total coarse-space dimension (0 if lvl2 == 0)
    k_max: int         # max per-domain coarse columns (padded)
    # "chol": l1_factor holds Cholesky factors (two batched triangular
    # solves per apply — bit-matches the reference's direct-solve route).
    # "inv": l1_factor holds precomputed block inverses; the local solve
    # becomes ONE batched matmul on the MXU (the TPU speed-of-light route;
    # inner-PC accuracy loss is absorbed by the f64 refinement loop).
    l1_kind: str
    # --- data ---
    batch: SubdomainBatch
    l1_factor: jax.Array       # [d, n, n] Cholesky of Dirichlet/Robin blocks
    pou: jax.Array | None      # [d, n] partition of unity (None if unused)
    z_loc: jax.Array | None    # [d, n, k_max] D-weighted eigenvectors
    colids: jax.Array | None   # [d, k_max] int32 global coarse column (pad=dim_e)
    e_evecs: jax.Array | None    # [K, K] eigenvectors of E = Z^T A Z
    e_eig_inv: jax.Array | None  # [K] truncated inverse eigenvalues of E
    x0: jax.Array              # [n_dof] initial guess (Q b if eff-hybrid)
    # fuse the level-1 inner chain (PoU-weight, block-inverse matmul,
    # weight, mask) into one Pallas kernel (TPU only, needs l1_kind='inv')
    use_pallas: bool = False

    # ---------------- level 2: Q = Z E^-1 Z^T (applyQ) ----------------
    def apply_q(self, x: jax.Array) -> jax.Array:
        xl = self.batch.gather(x)                       # [d, n]
        ztx = jnp.einsum("dnk,dn->dk", self.z_loc, xl,
                         preferred_element_type=x.dtype)
        w = jax.ops.segment_sum(ztx.ravel(), self.colids.ravel(),
                                num_segments=self.dim_e + 1)[:-1]
        if self.batch.axis is not None:
            # all-reduce the per-shard coarse contributions (the all_gather
            # of EV counts + distributed Z^T x of the reference, over ICI)
            w = jax.lax.psum(w, self.batch.axis)
        # E^-1 via the replicated spectral factorization: exact inverse for
        # nonsingular E; spectral pseudo-inverse (tiny eigenvalues truncated)
        # when coarse columns are dependent — the well-posed equivalent of
        # MUMPS null-pivot fixing (tuneSolver, geneo.cpp:76-92) used by the
        # reference's dcs2_ solver on a rank-deficient E.
        w = self.e_evecs @ (self.e_eig_inv * (self.e_evecs.T @ w))
        wp = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])
        wl = wp[self.colids]                            # [d, k_max]
        yl = jnp.einsum("dnk,dk->dn", self.z_loc, wl,
                        preferred_element_type=x.dtype)
        return self.batch.scatter_add(yl)

    # ---------------- level 1 (applyLevel1) ----------------
    def _local_solve(self, x: jax.Array) -> jax.Array:
        xl = self.batch.gather(x)
        ras = self.lvl1 in ("RAS", "SRAS", "ORAS", "SORAS")
        sras = self.lvl1 in ("SRAS", "SORAS")
        if self.l1_kind == "inv" and self.use_pallas:
            from ..ops.pallas_kernels import fused_local_solve
            d = self.pou if self.pou is not None else jnp.ones_like(xl)
            xl = fused_local_solve(self.l1_factor, d, self.batch.mask, xl,
                                   pre=ras, post=sras)
            return self.batch.scatter_add(xl)
        if ras:
            xl = xl * self.pou                          # (1.29) of R1
        if self.l1_kind == "inv":
            xl = jnp.einsum("dij,dj->di", self.l1_factor, xl,
                            preferred_element_type=xl.dtype)
        elif self.l1_kind == "lu":
            xl = bl.lu_solve(self.l1_factor, xl)
        else:
            xl = bl.cholesky_solve(self.l1_factor, xl)
        if sras:
            xl = xl * self.pou
        return self.batch.scatter_add(xl)

    def apply(self, x: jax.Array) -> jax.Array:
        """Full PC apply (applyGenEOPC): Y = Q X + L1(X) with optional
        hybrid projections — (7.53) of R1."""
        if self.lvl2 and not self.eff_hybrid:
            y = self.apply_q(x)                         # 1st term of (7.53)
        else:
            y = jnp.zeros_like(x)
        t = x
        if self.hybrid and not self.eff_hybrid:
            t = t - self.batch.matvec(y)                # (I - P^T) x, reusing QX
        t = self._local_solve(t)
        if self.hybrid:
            t = t - self.apply_q(self.batch.matvec(t))  # (I - P) t
        return y + t

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.apply(x)


# ===================== setup (setUpGenEOPC equivalent) =====================

def _dadird(batch: SubdomainBatch) -> jax.Array:
    """D A_Dir D (buildCoarseSpaceWithGenEO, geneo.cpp:1243-1247)."""
    d = batch.pou
    return batch.a_dir * d[:, :, None] * d[:, None, :]


def _with_pad_diag(a: jax.Array, mask: jax.Array, value: float) -> jax.Array:
    """Replace the identity pad diagonal with `value` (steers the pencil
    eigenvalues of pad slots out of the selection window)."""
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    pad = (~mask)[:, :, None] * (~mask)[:, None, :] * eye
    return a - pad * 1.0 + pad * value


@jax.jit
def _robin_from_arrays(a_neu, a_dir, mult, mask, optim):
    """Robin blocks from raw arrays (device-side robin_blocks)."""
    border = (mult > 1.0) & mask
    sel = border[:, :, None] & border[:, None, :]
    return a_dir + optim * jnp.where(sel, a_neu, 0.0)


@jax.jit
def _device_inverse(m_blocks):
    """Batched SPD inverse on the accelerator: Cholesky + two triangular
    solves against the identity."""
    fac = bl.cholesky_factor(m_blocks)
    n = m_blocks.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=m_blocks.dtype),
                           m_blocks.shape)
    y = jsl.solve_triangular(fac, eye, lower=True)
    return jsl.solve_triangular(jnp.swapaxes(fac, -1, -2), y, lower=False)


@jax.jit
def _pencil_tau_device(a_neu, a_dir, mult, mask, steer):
    """Device-side GenEO-1 tau pencil: (A_Neu steered, D A_Dir D)."""
    d = 1.0 / mult
    b_eff = a_dir * d[:, :, None] * d[:, None, :]
    n = a_neu.shape[-1]
    eye = jnp.eye(n, dtype=a_neu.dtype)
    pad = (~mask)[:, :, None] * (~mask)[:, None, :] * eye
    a_eff = a_neu - pad * 1.0 + pad * steer
    return a_eff, b_eff


@partial(jax.jit, static_argnums=5)
def _pencil_g2_device(a_neu, a_dir, mult, mask, optim, kind):
    """Device-side GenEO-2 pencils in LOBPCG (smallest-eigenpair) form.

    tau:   (A_Neu steered, A_Rob)            — (19) of R4, smallest lambda
    gamma: (A_Rob steered, D A_Dir D)        — (21) of R4 REVERSED: its
           largest lambda are the smallest mu = 1/lambda of the swapped
           pencil, which is what LOBPCG computes.  Pad slots get a 1e6
           diagonal on the steered side so they never enter the window."""
    a_rob = _robin_from_arrays(a_neu, a_dir, mult, mask, optim)
    n = a_neu.shape[-1]
    eye = jnp.eye(n, dtype=a_neu.dtype)
    pad = (~mask)[:, :, None] * (~mask)[:, None, :] * eye
    if kind == "tau":
        return a_neu - pad * 1.0 + pad * 1e6, a_rob
    d = 1.0 / mult
    dadird = a_dir * d[:, :, None] * d[:, None, :]
    return a_rob - pad * 1.0 + pad * 1e6, dadird


def _tau_loc(mult: np.ndarray, mask: np.ndarray, tau: float, cst: bool
             ) -> np.ndarray:
    """Local adaptive tau (getLocalGenEOTau, geneo.cpp:1097-1118):
    tauLoc = k * tau with k = max DOF multiplicity, clamped to 0.9."""
    n_dom = mult.shape[0]
    if cst:
        return np.full(n_dom, tau)
    k = np.where(mask, mult, 0).max(axis=1)
    t = k * tau
    t = np.where(t >= 1.0, 0.9, t)
    return np.where(k > 0, t, tau)


def _gamma_loc(adj: np.ndarray, n_dom: int, gamma: float, cst: bool
               ) -> np.ndarray:
    """Local adaptive gamma (getLocalGenEOGamma, geneo.cpp:1120-1232).

    NOTE (behavioral parity): the reference builds the connectivity matrix
    with C[p][q] = 1 when domains p and q do NOT intersect (and 0 when they
    do) — the test at geneo.cpp:1139-1145 is inverted relative to its own
    comment.  We reproduce the code's behavior, not the comment.
    C has unit diagonal; F_p = 1/rowsum(C); M = C * F F^T;
    gammaLoc_p = gamma / lambda_max(M) * F_p^2, clamped to 1.1 from below.

    ``adj``: boolean domain-intersection adjacency (Decomposition.adjacency).
    C = J - adj is DENSE (most domain pairs do not intersect), so for large
    batches lambda_max is computed matrix-free on M = f f^T - adj o f f^T
    (rank-1 minus sparse) with Lanczos — O(nnz(adj)) per matvec instead of
    an O(n_dom^3) dense eigensolve.
    """
    if cst:
        return np.full(n_dom, gamma)
    adj = np.asarray(adj, dtype=bool)
    f = 1.0 / (n_dom - adj.sum(axis=1)).astype(np.float64)
    if n_dom <= 1024:
        m = np.where(adj, 0.0, 1.0) * f[:, None] * f[None, :]
        lam = np.max(np.abs(np.linalg.eigvalsh(m)))
    else:
        import scipy.sparse as _sp
        import scipy.sparse.linalg as _spla
        rr, cc = np.nonzero(adj)
        b = _sp.csr_matrix((np.ones(len(rr)), (rr, cc)),
                           shape=(n_dom, n_dom))

        def mv(v):
            fv = f * v.ravel()
            return f * fv.sum() - f * (b @ fv)

        op = _spla.LinearOperator((n_dom, n_dom), matvec=mv,
                                  dtype=np.float64)
        v0 = np.full(n_dom, 1.0 / np.sqrt(n_dom))  # deterministic start
        lam = float(abs(_spla.eigsh(op, k=1, which="LM", v0=v0,
                                    return_eigenvectors=False)[0]))
    g = gamma / lam * f * f
    return np.where(g <= 1.0, 1.1, g)


def _select_columns(w: np.ndarray, kind: str, thr: np.ndarray,
                    n_real: np.ndarray, no_syl: bool, cut: int):
    """Per-domain eigenpair selection (eigenLocalProblem semantics).

    w: [d, n] pencil spectrum ascending, pad eigenvalues already steered out
    of the window.  Returns (keep_idx list per domain, estim per domain).

    ARPACK computes nev pairs nearest the target (the nev smallest for the
    shift-invert tau problem, the nev largest for the gamma problem) with
    nev = Sylvester estimate (estimateNumberOfEigenValues) unless -geneo_no_syl
    (then the EPS default nev = 1), capped by -geneo_cut; kept pairs are then
    filtered to [0, tau] / [gamma, inf) (geneo.cpp:713-714).
    """
    n_dom, n = w.shape
    keep, estim = [], np.zeros(n_dom, dtype=np.int64)
    for p in range(n_dom):
        if kind == "tau":
            count = int(np.sum(w[p, :n_real[p]] < thr[p]))
        else:
            real = w[p]  # gamma: pads steered to tiny values at the bottom
            count = int(np.sum(real[n - n_real[p]:] > thr[p])) \
                if n_real[p] else 0
        count = min(count, int(n_real[p]))
        if cut > 0:
            count = min(count, cut)
        estim[p] = count
        nev = count if not no_syl else min(1, int(n_real[p]))
        if no_syl and cut > 0:
            nev = min(nev, cut)
        if kind == "tau":
            cand = np.arange(nev)
            sel = cand[w[p, cand] <= thr[p]] if nev else cand
        else:
            cand = np.arange(n - 1, n - 1 - nev, -1)
            sel = cand[w[p, cand] >= thr[p]] if nev else cand
        keep.append(sel.astype(np.int64))
    return keep, estim


@partial(jax.jit, static_argnums=2)
def _scatter_fill(idx: jax.Array, val: jax.Array, size: int) -> jax.Array:
    return jnp.zeros(size, val.dtype).at[idx].set(
        val, unique_indices=True, indices_are_sorted=True)


def prune_dependent_columns(e: np.ndarray, dtype) -> np.ndarray | None:
    """Detect linearly dependent coarse columns via pivoted Cholesky.

    E = Z^T A Z with A SPD, so null modes of E correspond exactly to
    dependent columns of Z.  LAPACK dpstrf stops at the numerical rank;
    the dropped pivots identify which columns to prune (the principled
    replacement for MUMPS null-pivot *fixing*, geneo.cpp:76-92: pruning
    shrinks the coarse space and keeps the PC nonsingular).

    Returns the SORTED indices of the independent columns, or None when E
    is already numerically full rank (the common case — zero cost beyond
    one dpstrf)."""
    from scipy.linalg.lapack import dpstrf

    dim_e = e.shape[0]
    if dim_e == 0:
        return None
    dmax = float(np.diagonal(e).max(initial=0.0))
    tol = dim_e * np.finfo(dtype).eps * dmax
    _c, piv, rank, _info = dpstrf(e, lower=1, tol=tol)
    rank = int(rank)
    if rank >= dim_e:
        return None
    return np.sort(piv[:rank] - 1).astype(np.int64)


_REPLICATION_WALL = None


def coarse_replication_wall() -> int:
    """dim_e above which the replicated coarse solve leaves its measured
    comfort zone (host O(dim_e^3) factorization / device factor memory).
    Pinned by tst/measure_coarse.py in tst/golden/coarse_scaling.json;
    falls back to 16384 when the measurement file is absent.  The
    reference solves the same problem with distributed MUMPS
    (src/geneo.cpp:1028-1095); the TPU mitigations above the wall are
    the E1/E2 efficient-hybrid family (coarse apply per OUTER restart,
    not per iteration) and larger/fewer subdomains."""
    global _REPLICATION_WALL
    if _REPLICATION_WALL is None:
        import json
        import os
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "tst", "golden", "coarse_scaling.json")
        try:
            with open(path) as f:
                _REPLICATION_WALL = int(
                    json.load(f)["replication_wall_dim_e"])
        except Exception:  # noqa: BLE001 — measurement file optional
            _REPLICATION_WALL = 16384
    return _REPLICATION_WALL


def warn_coarse_replication(dim_e: int) -> None:
    """WRNG (stderr — stdout is the golden-diffed protocol) when a run's
    coarse space exceeds the measured replication wall."""
    wall = coarse_replication_wall()
    if dim_e > wall:
        import sys
        print(f"WRNG: dim_e = {dim_e} exceeds the measured replicated-"
              f"coarse-solve wall ({wall}): the O(dim_e^3) host "
              "factorization and the dense device factor dominate "
              "(tst/golden/coarse_scaling.json). Prefer E1/E2 "
              "(efficient hybrid), raise tau/cut selectivity, or use "
              "fewer/larger subdomains; the reference's answer at this "
              "scale is a distributed MUMPS factorization "
              "(src/geneo.cpp:1028-1095).", file=sys.stderr)


def factor_e(e: np.ndarray, dtype,
             e_dtype=None) -> tuple[np.ndarray, np.ndarray, int]:
    """Factor the coarse operator E (host LAPACK).

    Returns (W, ew, e_null) with E^-1 applied as W diag(1/ew) W^T.
    Fast path: E is SPD when the selected columns are independent, so a
    Cholesky factor L with W := L^{-T} gives E^{-1} = W diag(1) W^T —
    the exact spectral-apply layout (apply_q) at a fraction of eigh's
    cost (LAPACK dpotrf+dtrtri is ~7x cheaper than dsyevd at dim_e~8k).
    The spectral pseudo-inverse stays as the fallback for (near-)singular
    E — the MUMPS null-pivot-fix analogue (geneo.cpp ICNTL(24)/CNTL(5));
    e_null counts the truncated modes.

    Two precisions: `dtype` (device apply precision) gates the fast
    Cholesky-inverse path — only safe when E is well-conditioned in the
    precision the factors will be applied in; `e_dtype` (the precision E
    was ASSEMBLED in, default = dtype) sets the spectral truncation
    floor — modes above E's own entry-noise level are real GenEO modes
    and must be inverted, not truncated."""
    if e_dtype is None:
        e_dtype = dtype
    dim_e = e.shape[0]
    if dim_e > 0:
        try:
            c = np.linalg.cholesky(e)
            dg = np.diagonal(c)
            # numerically near-singular E must take the truncating
            # spectral fallback even when dpotrf happens to succeed
            if dg.min() ** 2 > dim_e * np.finfo(dtype).eps * dg.max() ** 2:
                from scipy.linalg.lapack import dtrtri as _dtrtri
                linv, info = _dtrtri(c, lower=1)
                if info == 0:
                    return np.ascontiguousarray(linv.T), np.ones(dim_e), 0
        except np.linalg.LinAlgError:
            pass
    ew_np, ev_np = bl.host_eigh(e)
    ew_np = np.asarray(ew_np)
    # GENEO_E_FLOOR: optional RELATIVE truncation floor on top of the
    # assembly-precision one.  E inherits noise from the precision and
    # residual of the Z columns (f32 LOBPCG vectors at scale), not just
    # from its own assembly dtype — eigenvalues below that noise are
    # garbage whose inversion amplifies Q by orders of magnitude (the
    # reference fights the same failure with MUMPS null-pivot FIXING,
    # ICNTL(24)/CNTL(5)=1e20, geneo.cpp:80-88 — functionally a coarse
    # truncation).
    import os as _os
    floor_rel = float(_os.environ.get("GENEO_E_FLOOR", "0"))
    tol = max(dim_e * np.finfo(e_dtype).eps, floor_rel) \
        * np.abs(ew_np).max(initial=0.0)
    e_null = int((ew_np <= tol).sum())
    ew_np = np.where(ew_np > tol, ew_np, np.inf)  # truncated modes
    return np.asarray(ev_np), ew_np, e_null


def _upload_sparse(x, dev) -> jax.Array:
    """Upload a mostly-zero dense batch as COO (values + sorted flat
    indices) and rebuild it on ``dev`` with one scatter.

    The local operator blocks are <1% dense (9-point stencils in 320-wide
    blocks), while the tunnel link runs at ~20-70 MB/s — so shipping the
    3.4 GB dense [n_dom, n_max, n_max] pair costs minutes, the ~250 MB COO
    stream seconds.  ``np.flatnonzero`` yields ascending indices, hence the
    sorted+unique scatter hints."""
    flat = np.asarray(x).ravel()
    idx = np.flatnonzero(flat)
    itype = np.int32 if flat.size < 2**31 else np.int64
    idx_d = jax.device_put(idx.astype(itype, copy=False), dev)
    val_d = jax.device_put(flat[idx], dev)
    return _scatter_fill(idx_d, val_d, flat.size).reshape(x.shape)


def setup_geneo(batch: SubdomainBatch, opts: GenEOOptions,
                b: jax.Array | None = None,
                decomp=None, timers=None, a_csr=None
                ) -> tuple[GenEOPreconditioner, GenEOStats]:
    """Full preconditioner setup (PCSetUp -> setUpGenEOPC path).

    Setup numerics run ENTIRELY on the host (CPU backend + LAPACK): that is
    the reference's cost model (ARPACK/MUMPS/LAPACK setup on CPU,
    src/geneo.cpp:626-780), it avoids one-shot accelerator compiles, and it
    avoids ALL device->host pulls (pathologically slow on tunneled TPU
    platforms).  The finished products — operator blocks, L1 factors, Z,
    the coarse factorization — are uploaded to the accelerator once at the
    end; only iteration-phase kernels ever compile for the accelerator.

    ``timers``: optional utils.timers.Timers — records the reference's
    per-phase setup taxonomy (l1_minv, l2_{tau,gamma}_{loc,syl,eig},
    l2_{syl,eig,z,e}; geneo.hpp:113-123)."""
    import dataclasses

    if jax.default_backend() != "cpu":
        cpu = jax.devices("cpu")[0]
        dev = jax.devices()[0]
        if next(iter(batch.gids.devices())).platform != "cpu":
            batch = jax.device_put(batch, cpu)  # slow pull; assemble on host
        # one-time upload of the raw operator blocks: level-1 factorization
        # and the eigenproblem pencils are computed ON the accelerator
        # (batched Cholesky/elementwise ops compile in seconds with the
        # pytrees as jit arguments), and the a_neu copy is reused directly
        # as the iteration-phase operator — no second upload
        import os as _os
        import sys as _sys
        import time as _timemod
        _dbg_up = _os.environ.get("GENEO_SETUP_VERBOSE") == "1"
        _t_up = _timemod.perf_counter()
        accel = {
            "dev": dev,
            "a_neu": _upload_sparse(batch.a_neu, dev),
            "a_dir": _upload_sparse(batch.a_dir, dev),
            "mask": jax.device_put(batch.mask, dev),
            "mult": jax.device_put(batch.mult, dev),
        }
        if _dbg_up:
            jax.block_until_ready(accel["a_dir"])
            print(f"[setup  upload] COO blocks on device in "
                  f"{_timemod.perf_counter() - _t_up:.2f}s",
                  file=_sys.stderr, flush=True)
        with jax.default_device(cpu):
            pc, stats = _setup_geneo_impl(batch, opts, decomp, timers,
                                          a_csr, accel)
        # assemble the device-resident batch: reuse the uploaded a_neu;
        # the iteration path never touches the Dirichlet blocks
        batch_dev = dataclasses.replace(batch, a_neu=accel["a_neu"],
                                        a_dir=None)
        pc = dataclasses.replace(pc, batch=batch_dev)
        pc = jax.device_put(pc, dev)  # uploads the remaining host leaves
        if opts.eff_hybrid and b is not None:
            pc = dataclasses.replace(pc, x0=pc.apply_q(b))
        return pc, stats
    pc, stats = _setup_geneo_impl(batch, opts, decomp, timers, a_csr)
    if opts.eff_hybrid and b is not None:
        pc = dataclasses.replace(pc, x0=pc.apply_q(b))
    return pc, stats


def _assembled_csr_from_batch(batch: SubdomainBatch, n_real):
    """Host assembled operator from the unassembled blocks (MatIS -> AIJ
    conversion, the setUpGenEOPC MatConvert at geneo.cpp:1692)."""
    import scipy.sparse as _sp
    gids = np.asarray(batch.gids)
    a = np.asarray(batch.a_neu, np.float64)
    rows, cols, vals = [], [], []
    for p in range(batch.n_dom):
        k = int(n_real[p])
        if not k:
            continue
        g = gids[p, :k]
        rows.append(np.repeat(g, k))
        cols.append(np.tile(g, k))
        vals.append(a[p, :k, :k].ravel())
    m = _sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(batch.n_dof, batch.n_dof)).tocsr()
    m.sum_duplicates()
    return m


def _setup_geneo_impl(batch: SubdomainBatch, opts: GenEOOptions,
                      decomp=None, timers=None, a_csr=None, accel=None
                      ) -> tuple[GenEOPreconditioner, GenEOStats]:
    import os as _os
    import sys as _sys
    import time as _time
    opts.validate()
    _dbg = _os.environ.get("GENEO_SETUP_VERBOSE") == "1"
    _dbg_t0 = _time.perf_counter()

    def _vlog(msg):
        if _dbg:
            print(f"[setup {_time.perf_counter() - _dbg_t0:7.2f}s] {msg}",
                  file=_sys.stderr, flush=True)

    def _mark(name, t0):
        if timers is not None:
            timers.add(name, _time.perf_counter() - t0)
        return _time.perf_counter()

    dtype = batch.a_neu.dtype
    n_dom = batch.n_dom
    n_dof = batch.n_dof
    mask_np = np.asarray(batch.mask)
    mult_np = np.asarray(batch.mult)
    n_real = mask_np.sum(axis=1).astype(np.int64)

    # ----- level 1: factor Dirichlet (ASM..SRAS) or Robin (ORAS/SORAS) -----
    _t = _time.perf_counter()
    if accel is not None:
        # device-side blocks (batched elementwise ops + factorization on
        # the accelerator; compiles in seconds with pytree arguments)
        if opts.lvl1_oras:
            m_blocks = _robin_from_arrays(accel["a_neu"], accel["a_dir"],
                                          accel["mult"], accel["mask"],
                                          opts.optim)
        else:
            m_blocks = accel["a_dir"]
    elif opts.lvl1_oras:
        m_blocks = robin_blocks(batch, opts.optim)   # (14) of R4
    else:
        m_blocks = batch.a_dir                       # (1.30) of R1
    _vlog("factoring L1 blocks")
    if opts.dls1.type in ("inverse", "inverse_pallas"):
        l1_kind = "inv"
    elif opts.dls1.type == "lu":
        l1_kind = "lu"
    else:
        l1_kind = "chol"
    if l1_kind == "inv":
        if accel is not None:
            # device inverse via Cholesky + triangular solves vs identity
            l1_factor = _device_inverse(m_blocks)
            l1_factor.block_until_ready()
        else:
            # precomputed block inverses (host LAPACK, f64)
            l1_factor = jnp.asarray(
                np.linalg.inv(np.asarray(m_blocks, np.float64)), dtype)
    elif l1_kind == "lu":
        # batched LU with partial pivoting (the reference's MUMPS-LU route;
        # works for non-SPD user-supplied operators)
        l1_factor = bl.lu_factor(m_blocks)
        l1_factor[0].block_until_ready()
    else:
        l1_factor = bl.cholesky_factor(m_blocks)
        l1_factor.block_until_ready()
    _t = _mark("l1_minv", _t)
    _vlog("L1 factored")

    need_pou = opts.lvl2_num > 0 or opts.lvl1_ras
    pou = batch.pou if need_pou else None

    stats = GenEOStats(
        estim_dim_e=np.zeros(n_dom, np.int64),
        real_dim_e=np.zeros(n_dom, np.int64),
        nicolaides=np.zeros(n_dom, np.int64),
        tau_loc=np.full(n_dom, -1.0), gamma_loc=np.full(n_dom, -1.0))

    if opts.lvl2_num == 0:
        pc = GenEOPreconditioner(
            lvl1=opts.lvl1, lvl2=0, hybrid=False, eff_hybrid=False,
            dim_e=0, k_max=0, l1_kind=l1_kind, batch=batch,
            l1_factor=l1_factor, pou=pou, z_loc=None, colids=None,
            e_evecs=None, e_eig_inv=None, x0=jnp.zeros(n_dof, dtype),
            use_pallas=opts.dls1.type == "inverse_pallas")
        return pc, stats

    # ----- level 2: batched local generalized eigenproblems -----
    dadird = _dadird(batch)
    cut = opts.cut
    problems = []  # (kind, A, B, thr[n_dom])
    if opts.lvl2_num == 1:
        # GenEO-1: A_Neu v = lambda (D A_Dir D) v, threshold tau
        # (Def 7.14 of R1; geneo.cpp:1270-1273)
        problems.append(("tau", batch.a_neu, dadird,
                         np.full(n_dom, opts.tau)))
    else:
        # GenEO-2 halves -geneo_cut between its two problems
        # (geneo.cpp:1275)
        if cut >= 2:
            cut = cut // 2
        a_rob = robin_blocks(batch, opts.optim)
        tl = _tau_loc(mult_np, mask_np, opts.tau, opts.cst)
        gl = _gamma_loc(decomp.adjacency() if decomp is not None else
                        np.zeros((n_dom, n_dom), dtype=bool),
                        n_dom, opts.gamma, opts.cst)
        stats.tau_loc, stats.gamma_loc = tl, gl
        # (19) of R4: A_Neu v = lambda A_Rob v, threshold tauLoc
        problems.append(("tau", batch.a_neu, a_rob, tl))
        # (21) of R4: (D A_Dir D) v = lambda A_Rob v, threshold gammaLoc
        problems.append(("gamma", dadird, a_rob, gl))

    eps64 = np.finfo(np.float64).eps
    eps32 = np.finfo(np.float32).eps
    cols: list[list[np.ndarray]] = [[] for _ in range(n_dom)]
    evals: list[list[float]] = [[] for _ in range(n_dom)]

    for kind, a_p, b_p, thr in problems:
        _t = _time.perf_counter()
        steer = 1e6 if kind == "tau" else 1e-6
        _vlog(f"eigensolve ({kind})")
        use_lobpcg = opts.els2.type == "lobpcg"
        # the gamma problem wants the LARGEST pencil eigenvalues; LOBPCG
        # computes the smallest, so it runs on the SWAPPED pencil (both
        # sides SPD) and the eigenvalues come back as mu = 1/lambda
        reversed_pencil = use_lobpcg and kind == "gamma"
        pencil_on_device = (
            use_lobpcg and accel is not None
            and jax.devices()[0].platform != "cpu"
            and (opts.lvl2_num == 2 or kind == "tau"))
        # the padded-diagonal steering copy is only needed by the host
        # eigensolve paths; the device-pencil path rebuilds it on device
        a_eff = b_eff = None
        if not pencil_on_device:
            if reversed_pencil:
                a_eff = _with_pad_diag(b_p, batch.mask, 1e6)
                b_eff = a_p  # D A_Dir D: SPD, pad diag stays 1
            else:
                a_eff = _with_pad_diag(a_p, batch.mask, steer)
                b_eff = b_p  # pad diag stays 1
        if use_lobpcg:
            # iterative path (the ARPACK-equivalent, SURVEY hard part #1):
            # batched LOBPCG computing only k = -geneo_cut candidates per
            # domain.  Requires an explicit cut (like -geneo_no_syl +
            # krylovschur in the reference, the solver bounds the count).
            from ..ops.lobpcg import batched_lobpcg
            lobpcg_estim = None
            if cut > 0:
                k_cand = cut
            elif opts.no_syl:
                k_cand = 8
            else:
                # no explicit cut: size the candidate block from the
                # Sylvester inertia of (A - theta B), the same estimate
                # the reference feeds ARPACK's nev (geneo.cpp:502-560,
                # 626-661) — via batched LDL^T (Cholesky cost), since a
                # full eigvalsh would defeat the iterative path.  The
                # swapped gamma pencil wants mu < 1/thr, i.e. the same
                # negative-inertia count on its own arrays.
                thr_used = 1.0 / np.maximum(thr, 1e-12) \
                    if reversed_pencil else thr
                if pencil_on_device:
                    if opts.lvl2_num == 1:
                        s_a, s_b = _pencil_tau_device(
                            accel["a_neu"], accel["a_dir"], accel["mult"],
                            accel["mask"], jnp.asarray(steer, dtype))
                    else:
                        s_a, s_b = _pencil_g2_device(
                            accel["a_neu"], accel["a_dir"], accel["mult"],
                            accel["mask"], jnp.asarray(opts.optim, dtype),
                            kind)
                    s_mask = accel["mask"]
                else:
                    s_a, s_b = a_eff, b_eff
                    s_mask = batch.mask
                th = jnp.asarray(thr_used, s_a.dtype)
                n_neg, _pos = bl.ldlt_inertia(
                    s_a - th[:, None, None] * s_b, s_mask)
                lobpcg_estim = np.asarray(n_neg, np.int64)
                k_cand = int(np.clip(lobpcg_estim.max(), 1, 32))
                _vlog(f"inertia estimates done (k_cand={k_cand})")
            k_cand = min(k_cand, batch.n_max)
            # guard vectors: GenEO-2 halves the candidate count per pencil
            # and its near-threshold spectra are clustered — a few extra
            # working columns sharpen the wanted Ritz pairs substantially
            # (the GenEO-1 path stays guard-free: its windows are gapped)
            k_run = min(k_cand + (4 if opts.lvl2_num == 2 else 0),
                        batch.n_max)
            max_it = min(int(opts.els2.max_it), 200) \
                if opts.els2.max_it < 10000 else 50
            # run on the accelerator when one exists: LOBPCG is pure
            # batched matmuls + tiny-eigh Rayleigh-Ritz steps — it compiles
            # in seconds and runs at MXU speed, unlike the full-size dense
            # eigh (host upload of the pencil is fast; only w/v come back)
            _dev = jax.devices()[0]
            shift = float(np.mean(1.0 / np.maximum(thr, 1e-12))
                          if reversed_pencil else np.mean(thr))
            if _dev.platform != "cpu":
                # chunk the domain batch: one compiled executable (fixed
                # chunk shape) reused across slices — very large batches
                # make the Rayleigh-Ritz lowering pathologically slow to
                # compile/run in one piece, and chunking also caps device
                # memory for the pencil staging
                chunk = 1024
                if pencil_on_device:
                    # pencils built ON the accelerator from the uploaded
                    # raw blocks (no host materialization, no extra upload)
                    if opts.lvl2_num == 1:
                        a_full, b_full = _pencil_tau_device(
                            accel["a_neu"], accel["a_dir"], accel["mult"],
                            accel["mask"], jnp.asarray(steer, dtype))
                    else:
                        a_full, b_full = _pencil_g2_device(
                            accel["a_neu"], accel["a_dir"], accel["mult"],
                            accel["mask"], jnp.asarray(opts.optim, dtype),
                            kind)
                    jax.block_until_ready(b_full)
                    slice_dev = True
                    _vlog("lobpcg: pencils built on device")
                else:
                    a_full = np.asarray(a_eff, np.float32)
                    b_full = np.asarray(b_eff, np.float32)
                    slice_dev = False
                    _vlog("lobpcg: pencils materialized on host")
                w_parts, v_parts, r_parts = [], [], []
                n_chunks = (n_dom + chunk - 1) // chunk
                cat = jnp.concatenate if slice_dev else np.concatenate
                for c in range(n_chunks):
                    lo, hi = c * chunk, min((c + 1) * chunk, n_dom)
                    if hi - lo < chunk and n_chunks > 1:
                        # pad the tail slice to the compiled chunk shape
                        pad = chunk - (hi - lo)
                        a_c = cat([a_full[lo:hi], a_full[:pad]], axis=0)
                        b_c = cat([b_full[lo:hi], b_full[:pad]], axis=0)
                    else:
                        a_c, b_c = a_full[lo:hi], b_full[lo:hi]
                    if not slice_dev:
                        a_c = jax.device_put(a_c, _dev)
                        b_c = jax.device_put(b_c, _dev)
                    w_c, v_c, _res = batched_lobpcg(
                        a_c, b_c, k=k_run, max_it=max_it, shift=shift)
                    w_c.block_until_ready()
                    _vlog(f"lobpcg: chunk {c + 1}/{n_chunks} done")
                    take = (hi - lo)
                    # guard columns are dropped on the HOST: a device-side
                    # k-slice is a fresh executable, and one-shot compiles
                    # on the tunneled service can stall for minutes
                    w_parts.append(
                        np.asarray(w_c[:take], np.float64)[:, :k_cand])
                    v_parts.append(
                        np.asarray(v_c[:take], np.float64)[:, :, :k_cand])
                    r_parts.append(
                        np.asarray(_res[:take], np.float64)[:, :k_cand])
                w_np = np.concatenate(w_parts, axis=0)
                v_np = np.concatenate(v_parts, axis=0)
                res_np = np.concatenate(r_parts, axis=0)
                _vlog("lobpcg: eigenpairs on host")
            else:
                w, v, _res = batched_lobpcg(
                    a_eff, b_eff, k=k_run, max_it=max_it, shift=shift)
                w_np = np.asarray(w[:, :k_cand], np.float64)
                v_np = np.asarray(v[:, :, :k_cand], np.float64)
                res_np = np.asarray(_res[:, :k_cand], np.float64)
            if reversed_pencil:
                # map the swapped-pencil mu back to lambda = 1/mu
                w_np = 1.0 / np.maximum(w_np, np.finfo(np.float64).tiny)
        else:
            w, v = bl.generalized_eigh(a_eff, b_eff)
            w_np = np.asarray(w, np.float64)
            v_np = np.asarray(v, np.float64)
        import time as _time2
        if timers is not None:
            dt = _time2.perf_counter() - _t
            timers.add("l2_eig", dt)
            timers.add(f"l2_{kind}_eig", dt)
        _t = _time2.perf_counter()
        _vlog(f"selecting ({kind})")
        if use_lobpcg:
            # all computed candidates inside the window are kept; no
            # inertia estimates (stats follow the no_syl convention)
            if kind == "tau":
                keep = [np.where(w_np[p] <= thr[p])[0]
                        for p in range(n_dom)]
            else:
                # exact [gamma, inf) interval filtering, matching the
                # reference's post-solve filter (geneo.cpp:713-714).
                # Near-threshold Ritz values of the swapped pencil can
                # under-estimate lambda slightly; tests pin selection
                # parity with the dense-eigh path on the dummy/heat
                # GenEO-2 problems (tests/test_lobpcg.py).
                keep = [np.where(w_np[p] >= thr[p])[0]
                        for p in range(n_dom)]
            estim = (lobpcg_estim if lobpcg_estim is not None
                     else np.zeros(n_dom, np.int64))
            # surface KEPT-pair residuals (the checkEPSSolve role,
            # geneo.cpp:577-624): callers warn above the reference's EPS
            # tolerance analogue and -geneo_chk aborts
            kept_res = np.zeros(n_dom)
            for p in range(n_dom):
                if keep[p].size:
                    kept_res[p] = float(res_np[p, keep[p]].max())
            stats.lobpcg_res = kept_res if stats.lobpcg_res is None \
                else np.maximum(stats.lobpcg_res, kept_res)
        else:
            keep, estim = _select_columns(w_np, kind, thr, n_real,
                                          opts.no_syl, cut)
        if timers is not None:
            dt = _time2.perf_counter() - _t
            timers.add("l2_syl", dt)
            timers.add(f"l2_{kind}_syl", dt)
        _t = _time2.perf_counter()
        if not opts.no_syl and (not use_lobpcg or lobpcg_estim is not None):
            stats.estim_dim_e += estim
        # Nicolaides near-kernel test needs only the quadratic forms
        # 1^T A 1 / 1^T B 1 per domain: one batched einsum with an f64
        # accumulator instead of materializing f64 copies of the pencils
        # (the copies alone cost ~36 s at the 1 MDOF scale)
        if kind == "tau":
            ones_all = mask_np.astype(np.float64)
            num_all = np.einsum("dn,dnm,dm->d", ones_all,
                                np.asarray(a_p), ones_all,
                                dtype=np.float64)
            den_all = np.einsum("dn,dnm,dm->d", ones_all,
                                np.asarray(b_p), ones_all,
                                dtype=np.float64)
            _vlog("nicolaides quadratic forms")
        for p in range(n_dom):
            kept_w = w_np[p, keep[p]]
            for i in keep[p]:
                cols[p].append(v_np[p, :, i])
                evals[p].append(float(w_np[p, i]))
            if kind == "tau" and n_real[p] > 0:
                # Nicolaides fallback: if no zero eigenvalue was kept, test
                # the constant vector for near-kernel membership
                # (geneo.cpp:897-955)
                no_zero = len(kept_w) > 0 and kept_w.min() >= eps64
                if no_zero:
                    ones = mask_np[p].astype(np.float64)
                    num, den = num_all[p], den_all[p]
                    ratio = abs(num / den) if den != 0 else np.inf
                    if ratio <= eps32:
                        cols[p].append(ones)
                        evals[p].append(0.0)
                        stats.nicolaides[p] += 1
        _vlog(f"columns selected ({kind})")

    # Empty local coarse set is forbidden: add the constant vector
    # (geneo.cpp:1303-1314).  Empty *domains* contribute no columns.
    for p in range(n_dom):
        if not cols[p] and n_real[p] > 0:
            cols[p].append(mask_np[p].astype(np.float64))
            evals[p].append(0.0)
            stats.nicolaides[p] += 1
        stats.real_dim_e[p] = len(cols[p])

    counts = stats.real_dim_e
    stats.raw_dim_e = counts.copy()
    offsets = np.zeros(n_dom, np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    dim_e = int(counts.sum())
    k_max = max(int(counts.max()), 1)

    # D-weighted coarse basis Z ((7.49) of R1; fillZE2L geneo.cpp:249-286)
    d_np = 1.0 / mult_np
    z_np = np.zeros((n_dom, batch.n_max, k_max), dtype=np.float64)
    colids_np = np.full((n_dom, k_max), dim_e, dtype=np.int32)
    for p in range(n_dom):
        for j, vec in enumerate(cols[p]):
            z_np[p, :, j] = np.where(mask_np[p], d_np[p] * vec, 0.0)
            colids_np[p, j] = offsets[p] + j
    stats.eigenvalues = evals

    _vlog(f"building Z (dim_e={dim_e}, k_max={k_max})")
    _t = _time.perf_counter()
    z_loc = jnp.asarray(z_np, dtype)
    colids = jnp.asarray(colids_np)

    # Global coarse basis (createZE2G role) and E = Z^T A Z (createEEig):
    # sparse PtAP on the host — the exact analogue of the reference's
    # MatPtAP (geneo.cpp:1033), since Z's columns are supported only on
    # their own domain.  The factorization is then replicated on every
    # device (the TPU-idiomatic inversion of rank-0 offload).
    import scipy.sparse as _sp
    gids_np = np.asarray(batch.gids)
    rows, cols_i, vals = [], [], []
    for p in range(n_dom):
        k = int(n_real[p])
        for j in range(int(counts[p])):
            rows.append(gids_np[p, :k])
            cols_i.append(np.full(k, offsets[p] + j, np.int64))
            vals.append(z_np[p, :k, j])
    zg_sp = _sp.coo_matrix(
        (np.concatenate(vals) if vals else np.zeros(0),
         (np.concatenate(rows) if rows else np.zeros(0, np.int64),
          np.concatenate(cols_i) if cols_i else np.zeros(0, np.int64))),
        shape=(n_dof, dim_e)).tocsr()
    a_sp = _assembled_csr_from_batch(batch, n_real) if a_csr is None else a_csr
    _vlog("building E")
    _t = _mark("l2_z", _t)
    e = np.asarray((zg_sp.T @ (a_sp @ zg_sp)).todense())
    e = 0.5 * (e + e.T)
    _vlog(f"E assembled ({dim_e}x{dim_e}); factoring")
    # E is assembled in f64 host arithmetic regardless of the device
    # dtype, so rank detection/truncation use the f64 noise floor — an
    # eps(f32) threshold would prune real (tiny-eigenvalue) GenEO modes
    keep = prune_dependent_columns(e, np.float64)
    if keep is not None:
        # prune the dependent coarse columns so E is SPD and the PC is
        # nonsingular (vs MUMPS null-pivot fixing, geneo.cpp:76-92)
        stats.e_pruned = dim_e - keep.size
        kept_mask = np.zeros(dim_e, bool)
        kept_mask[keep] = True
        new_counts = np.array(
            [int(kept_mask[offsets[p]:offsets[p] + counts[p]].sum())
             for p in range(n_dom)], np.int64)
        new_offsets = np.zeros(n_dom, np.int64)
        np.cumsum(new_counts[:-1], out=new_offsets[1:])
        new_dim_e = int(new_counts.sum())
        new_k_max = max(int(new_counts.max()), 1)
        z2 = np.zeros((n_dom, batch.n_max, new_k_max), np.float64)
        colids_np = np.full((n_dom, new_k_max), new_dim_e, np.int32)
        for p in range(n_dom):
            js = np.flatnonzero(
                kept_mask[offsets[p]:offsets[p] + counts[p]])
            z2[p, :, :js.size] = z_np[p][:, js]
            colids_np[p, :js.size] = new_offsets[p] + np.arange(js.size)
            stats.eigenvalues[p] = [stats.eigenvalues[p][j] for j in js]
        e = e[np.ix_(keep, keep)]
        stats.real_dim_e = new_counts
        counts, offsets = new_counts, new_offsets
        dim_e, k_max, z_np = new_dim_e, new_k_max, z2
        z_loc = jnp.asarray(z_np, dtype)
        colids = jnp.asarray(colids_np)
        _vlog(f"pruned {stats.e_pruned} dependent coarse columns "
              f"(dim_e={dim_e})")
    warn_coarse_replication(dim_e)
    ev_np, ew_np, stats.e_null = factor_e(e, dtype, e_dtype=np.float64)
    # round-trip through host numpy so the factors land on the default
    # (accelerator) device uncommitted
    ev = jnp.asarray(np.asarray(ev_np), dtype)
    e_eig_inv = jnp.asarray(1.0 / ew_np, dtype)
    e_eig_inv.block_until_ready()
    _t = _mark("l2_e", _t)
    _vlog("E factored; transferring products")

    pc = GenEOPreconditioner(
        lvl1=opts.lvl1, lvl2=opts.lvl2_num, hybrid=opts.hybrid,
        eff_hybrid=opts.eff_hybrid, dim_e=dim_e, k_max=k_max,
        l1_kind=l1_kind, batch=batch, l1_factor=l1_factor, pou=pou,
        z_loc=z_loc, colids=colids, e_evecs=ev,
        e_eig_inv=e_eig_inv, x0=jnp.zeros(n_dof, dtype),
        use_pallas=opts.dls1.type == "inverse_pallas")

    # Efficient-hybrid initial guess X0 = Q B (setUpLevel2,
    # geneo.cpp:1601-1604); the caller must run the Krylov solver with
    # nonzero initial guess (contract at hdr/geneo.hpp:21-23).
    return pc, stats
