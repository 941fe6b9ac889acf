"""Block-Jacobi preconditioner (PETSc PCBJACOBI role).

The reference's comparison PC (`-pc_type bjacobi`, tst/dummy/dummy.sh and
laplacianRun.sh PC matrix): one block per process over the assembled
operator's contiguous row ranges, each block factored with PETSc's default
sub-PC ILU(0).  TPU-native version: contiguous row blocks padded to a
common size; ILU(0) as batched masked rank-1 updates (ops/ilu.py) —
matching PETSc's sub-PC semantics — or exact batched Cholesky
(sub_type="exact", the stronger variant).
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
from ..ops.ilu import ilu0_factor, ilu0_solve


@partial(jax.tree_util.register_dataclass,
         data_fields=["factor", "pattern", "starts", "sizes"],
         meta_fields=["n_dof", "n_blocks", "block_max", "sub_type"])
@dataclass(frozen=True)
class BlockJacobiPreconditioner:
    n_dof: int
    n_blocks: int
    block_max: int
    sub_type: str              # "ilu" (PETSc default) | "exact"
    factor: jax.Array          # [nb, bmax, bmax] ILU(0) or Cholesky factors
    pattern: jax.Array | None  # [nb, bmax, bmax] bool (ilu only)
    starts: jax.Array          # [nb] row offsets
    sizes: jax.Array           # [nb] actual block sizes

    def apply(self, x: jax.Array) -> jax.Array:
        bmax = self.block_max
        xp = jnp.concatenate([x, jnp.zeros((bmax,), x.dtype)])
        idx = self.starts[:, None] + jnp.arange(bmax)[None, :]
        lm = jnp.arange(bmax)[None, :] < self.sizes[:, None]
        xl = jnp.where(lm, xp[idx], 0)
        if self.sub_type == "ilu":
            yl = ilu0_solve(self.factor, self.pattern, xl)
        else:
            yl = bl.cholesky_solve(self.factor, xl)
        yl = jnp.where(lm, yl, 0)
        flat_idx = jnp.where(lm, idx, self.n_dof).ravel()
        y = jax.ops.segment_sum(yl.ravel(), flat_idx,
                                num_segments=self.n_dof + 1)[:-1]
        return y

    def __call__(self, x):
        return self.apply(x)


def setup_bjacobi(a_csr: sp.csr_matrix, n_blocks: int,
                  dtype=None, sub_type: str = "ilu"
                  ) -> BlockJacobiPreconditioner:
    """Split rows into n_blocks contiguous ranges (PETSc PETSC_DECIDE
    layout: even split) and factor the diagonal blocks."""
    if dtype is None:
        dtype = default_dtype()
    n = a_csr.shape[0]
    base, rem = divmod(n, n_blocks)
    sizes = [base + (1 if i < rem else 0) for i in range(n_blocks)]
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)
    bmax = max(sizes) if sizes else 1
    blocks = np.tile(np.eye(bmax), (n_blocks, 1, 1))
    for i, (s, k) in enumerate(zip(starts, sizes)):
        blocks[i, :k, :k] = a_csr[s:s + k, s:s + k].todense()
    if sub_type == "ilu":
        pattern = jnp.asarray(blocks != 0.0)
        factor = ilu0_factor(jnp.asarray(blocks, dtype), pattern)
    else:
        pattern = None
        factor = bl.cholesky_factor(jnp.asarray(blocks, dtype))
    return BlockJacobiPreconditioner(
        n_dof=n, n_blocks=n_blocks, block_max=bmax, sub_type=sub_type,
        factor=factor, pattern=pattern, starts=jnp.asarray(starts),
        sizes=jnp.asarray(np.asarray(sizes, np.int32)))
