"""Algebraic multigrid preconditioner (PETSc `-pc_type mg` role).

The reference's test matrices run `-pc_type mg` as a comparison PC next to
bjacobi and the GenEO variants (tst/laplacian/laplacianRun.sh:31).  This is
the TPU-native counterpart: an unsmoothed-aggregation AMG with a symmetric
damped-Jacobi V(1,1) cycle.

TPU-first design notes:
- unsmoothed aggregation makes BOTH grid-transfer operators index maps:
  restriction is one `segment_sum` over the aggregate ids and prolongation
  is one gather — no sparse-matrix product ever materializes on device;
- each level's operator is stored as row-sorted COO, so the level SpMV is
  one gather + one sorted `segment_sum` (the same primitive pair as the
  subdomain scatter path in assembly/assemble.py);
- the Galerkin hierarchy (P^T A P, computed once on the host with scipy)
  keeps every level SPD, and the palindromic V(1,1) with a self-adjoint
  Jacobi smoother keeps the whole PC symmetric positive definite — CG-safe
  in PETSc's default preconditioned norm;
- the coarsest level is a replicated dense Cholesky solve (same
  rank-0-offload inversion as the GenEO coarse factorization).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ..config import default_dtype
from ..ops import batched_linalg as bl


@partial(jax.tree_util.register_dataclass,
         data_fields=["vals", "cols", "rows", "inv_diag", "agg",
                      "coarse_factor"],
         meta_fields=["n_levels", "ns", "omega", "cycle_type",
                      "smooth_down", "smooth_up"])
@dataclass(frozen=True)
class MGPreconditioner:
    n_levels: int              # total levels incl. the dense-coarse one
    ns: tuple                  # per-level sizes (static: segment counts)
    omega: float               # Jacobi damping
    vals: tuple                # [nnz_l] per level, row-sorted COO values
    cols: tuple                # [nnz_l] int32
    rows: tuple                # [nnz_l] int32
    inv_diag: tuple            # [n_l]
    agg: tuple                 # [n_l] int32 aggregate ids, levels 0..L-2
    coarse_factor: jax.Array   # [1, n_c, n_c] Cholesky of the last level
    # -pc_mg_cycle_type {v,w} / -pc_mg_smoothdown / -pc_mg_smoothup
    # (the reference's test matrix runs mg as "w" with 5/5 sweeps,
    # tst/laplacian/laplacianRun.sh MG_OPT)
    cycle_type: str = "v"
    smooth_down: int = 1
    smooth_up: int = 1

    def _spmv(self, lvl: int, x: jax.Array) -> jax.Array:
        prod = self.vals[lvl] * x[self.cols[lvl]]
        return jax.ops.segment_sum(prod, self.rows[lvl],
                                   num_segments=self.ns[lvl],
                                   indices_are_sorted=True)

    def _smooth(self, lvl: int, x: jax.Array, r: jax.Array,
                sweeps: int) -> jax.Array:
        for _ in range(sweeps):
            x = x + self.omega * self.inv_diag[lvl] * (r - self._spmv(lvl, x))
        return x

    def _cycle(self, lvl: int, r: jax.Array) -> jax.Array:
        if lvl == self.n_levels - 1:
            return bl.cholesky_solve(self.coarse_factor, r[None])[0]
        x = self._smooth(lvl, jnp.zeros_like(r), r, self.smooth_down)
        visits = 2 if (self.cycle_type == "w"
                       and lvl + 1 < self.n_levels - 1) else 1
        for _ in range(visits):                            # V or W cycle
            res = r - self._spmv(lvl, x)
            rc = jax.ops.segment_sum(res, self.agg[lvl],   # restrict
                                     num_segments=self.ns[lvl + 1])
            x = x + self._cycle(lvl + 1, rc)[self.agg[lvl]]  # correct
        return self._smooth(lvl, x, r, self.smooth_up)

    def apply(self, x: jax.Array) -> jax.Array:
        return self._cycle(0, x)

    def __call__(self, x):
        return self.apply(x)


def _aggregate(a: sp.csr_matrix) -> np.ndarray:
    """Greedy root aggregation over the operator graph: every not-yet-
    aggregated node (ascending order, deterministic) becomes a root and
    absorbs its unaggregated neighbours."""
    n = a.shape[0]
    indptr, indices = a.indptr, a.indices
    agg = np.full(n, -1, np.int64)
    next_id = 0
    for i in range(n):
        if agg[i] != -1:
            continue
        nb = indices[indptr[i]:indptr[i + 1]]
        agg[i] = next_id
        agg[nb[agg[nb] == -1]] = next_id
        next_id += 1
    return agg


def setup_mg(a_csr: sp.csr_matrix, dtype=None, omega: float = 2.0 / 3.0,
             coarse_max: int = 512, max_levels: int = 10,
             cycle_type: str = "v", smooth_down: int = 1,
             smooth_up: int = 1) -> MGPreconditioner:
    """Build the Galerkin hierarchy on the host, upload per-level COO."""
    if dtype is None:
        dtype = default_dtype()
    mats = [a_csr.tocsr()]
    aggs = []
    while mats[-1].shape[0] > coarse_max and len(mats) < max_levels:
        agg = _aggregate(mats[-1])
        n_c = int(agg.max()) + 1
        if n_c >= mats[-1].shape[0]:
            break
        p = sp.csr_matrix((np.ones(len(agg)), (np.arange(len(agg)), agg)),
                          shape=(len(agg), n_c))
        mats.append((p.T @ mats[-1] @ p).tocsr())
        aggs.append(agg)

    vals, cols, rows, inv_diag = [], [], [], []
    for m in mats[:-1]:
        coo = m.tocoo()  # CSR->COO is row-major sorted
        vals.append(jnp.asarray(coo.data, dtype))
        cols.append(jnp.asarray(coo.col.astype(np.int32)))
        rows.append(jnp.asarray(coo.row.astype(np.int32)))
        inv_diag.append(jnp.asarray(1.0 / m.diagonal(), dtype))
    dense = np.asarray(mats[-1].todense(), np.float64)
    fac = bl.cholesky_factor(jnp.asarray(dense[None], dtype))
    return MGPreconditioner(
        n_levels=len(mats), ns=tuple(m.shape[0] for m in mats),
        omega=float(omega), cycle_type=cycle_type,
        smooth_down=int(smooth_down), smooth_up=int(smooth_up),
        vals=tuple(vals), cols=tuple(cols), rows=tuple(rows),
        inv_diag=tuple(inv_diag),
        agg=tuple(jnp.asarray(a.astype(np.int32)) for a in aggs),
        coarse_factor=fac)
