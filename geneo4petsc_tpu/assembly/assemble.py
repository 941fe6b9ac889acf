"""Distributed operator assembly, TPU-native data model.

The reference builds one local SeqAIJ block per MPI rank and aggregates them
in an unassembled global MatIS (createA, src/geneo4PETSc.cpp:643-805).  The
MatIS duality is load-bearing for GenEO: the *unassembled* local block is the
Neumann matrix; the *assembled-then-restricted* block is the Dirichlet
matrix (setUpGenEOPC, src/geneo.cpp:1692-1715).

The TPU data model inverts "one subdomain per process" into "one subdomain
per batch slot": all domains are padded to a common size and stored as one
dense [n_dom, n_max, n_max] batch — the unassembled (Neumann) view is the
PRIMARY representation, and the global operator is derived from it as

    A = sum_d R_d^T Aneu_d R_d

(exact because element sub-matrices are pre-scaled by 1/elemMult), which
makes the distributed SpMV a batched dense matmul + scatter-add: the
MXU-friendly formulation of PETSc's MatIS MatMult.

Padding conventions (chosen so padded slots are inert everywhere):
  * gids pad          -> n_dof (a dump slot appended to global vectors)
  * mult pad          -> 1.0   (D = 1, no-op)
  * A_neu/A_dir pad   -> identity rows/cols (factorizations stay well posed;
    pencil eigenvalues at pad slots equal 1, outside both GenEO intervals
    since tau < 1 < gamma)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ..config import default_dtype
from ..io.element_input import ElementMesh
from ..partition.decompose import Decomposition


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.tree_util.register_dataclass,
         data_fields=["gids", "mask", "mult", "a_neu", "a_dir"],
         meta_fields=["n_dof", "n_dom", "n_max"])
@dataclass(frozen=True)
class SubdomainBatch:
    """Batched padded per-subdomain data (the MatIS equivalent)."""

    n_dof: int
    n_dom: int
    n_max: int
    gids: jax.Array   # [n_dom, n_max] int32, pad = n_dof
    mask: jax.Array   # [n_dom, n_max] bool
    mult: jax.Array   # [n_dom, n_max] dtype, pad = 1
    a_neu: jax.Array  # [n_dom, n_max, n_max] weighted local Neumann blocks
    a_dir: jax.Array  # [n_dom, n_max, n_max] Dirichlet blocks

    @property
    def pou(self) -> jax.Array:
        """Partition of unity D = 1/multiplicity (createPartitionOfUnity,
        src/geneo.cpp:965-1000)."""
        return 1.0 / self.mult

    def gather(self, x: jax.Array) -> jax.Array:
        """Global vector [n_dof] -> local overlapped copies [n_dom, n_max]
        (VecScatter forward/INSERT, src/geneo.cpp:1845-1869)."""
        xp = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
        return xp[self.gids]

    def scatter_add(self, xl: jax.Array) -> jax.Array:
        """Local copies [n_dom, n_max] -> global sum [n_dof]
        (VecScatter reverse/ADD, src/geneo.cpp:1871-1900)."""
        flat = jnp.where(self.mask, xl, 0).ravel()
        return jax.ops.segment_sum(flat, self.gids.ravel(),
                                   num_segments=self.n_dof + 1)[:-1]

    def matvec(self, x: jax.Array) -> jax.Array:
        """Global SpMV through the unassembled blocks (MatIS MatMult)."""
        xl = self.gather(x)
        yl = jnp.einsum("dij,dj->di", self.a_neu, xl,
                        preferred_element_type=xl.dtype)
        return self.scatter_add(yl)


@dataclass
class AssembledProblem:
    """Host-side assembly products for one decomposed problem."""

    mesh: ElementMesh
    decomp: Decomposition
    batch: SubdomainBatch
    a_csr: sp.csr_matrix       # assembled global operator (host)
    nnz_loc: np.ndarray        # per-domain local nnz (reporting parity)

    @property
    def n_dof(self) -> int:
        return self.mesh.n_nodes


def _local_triplets(mesh: ElementMesh, decomp: Decomposition, p: int):
    """(li, lj, val, nnz) triplets of domain p's weighted Neumann block."""
    nodes = decomp.dom_nodes[p]
    elems = decomp.elem_doms[p]
    lis, ljs, vals = [], [], []
    pattern: set = set()
    for e in elems:
        gdofs = mesh.elem_nodes(e)
        lidx = np.searchsorted(nodes, gdofs)
        w = 1.0 / decomp.elem_mult[e]
        m = mesh.elem_mats[e] * w
        gi, gj = np.meshgrid(lidx, lidx, indexing="ij")
        lis.append(gi.ravel())
        ljs.append(gj.ravel())
        vals.append(m.ravel())
        pattern.update(zip(gi.ravel().tolist(), gj.ravel().tolist()))
    if lis:
        return (np.concatenate(lis), np.concatenate(ljs),
                np.concatenate(vals), len(pattern))
    return (np.zeros(0, np.int64), np.zeros(0, np.int64),
            np.zeros(0, np.float64), 0)


def assemble_global_csr(mesh: ElementMesh) -> sp.csr_matrix:
    """Assembled global operator (the MatMPIAIJ view)."""
    rows, cols, vals = [], [], []
    for e in range(mesh.n_elems):
        gdofs = mesh.elem_nodes(e)
        gi, gj = np.meshgrid(gdofs, gdofs, indexing="ij")
        rows.append(gi.ravel())
        cols.append(gj.ravel())
        vals.append(mesh.elem_mats[e].ravel())
    a = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(mesh.n_nodes, mesh.n_nodes)).tocsr()
    a.sum_duplicates()
    return a


def assemble(mesh: ElementMesh, decomp: Decomposition,
             dtype=None, pad_to: int = 8) -> AssembledProblem:
    """Build the batched subdomain data + assembled operator."""
    if dtype is None:
        dtype = default_dtype()
    np_dtype = np.dtype(dtype)

    n_dom = decomp.n_dom
    sizes = decomp.dom_sizes
    n_max = _round_up(max(int(sizes.max()), 1), pad_to)
    n_dof = mesh.n_nodes

    gids = np.full((n_dom, n_max), n_dof, dtype=np.int32)
    mask = np.zeros((n_dom, n_max), dtype=bool)
    mult = np.ones((n_dom, n_max), dtype=np_dtype)
    a_neu = np.tile(np.eye(n_max, dtype=np_dtype), (n_dom, 1, 1))
    a_dir = np.tile(np.eye(n_max, dtype=np_dtype), (n_dom, 1, 1))

    a_csr = assemble_global_csr(mesh)
    nnz_loc = np.zeros(n_dom, dtype=np.int64)

    for p in range(n_dom):
        nodes = decomp.dom_nodes[p]
        k = len(nodes)
        if k == 0:
            continue
        gids[p, :k] = nodes
        mask[p, :k] = True
        mult[p, :k] = decomp.node_mult[nodes]
        li, lj, vals, nnz = _local_triplets(mesh, decomp, p)
        nnz_loc[p] = nnz
        blk = np.zeros((n_max, n_max), dtype=np.float64)
        np.add.at(blk, (li, lj), vals)
        blk[k:, k:] = np.eye(n_max - k)
        a_neu[p] = blk.astype(np_dtype)
        dirb = np.asarray(a_csr[np.ix_(nodes, nodes)].todense())
        a_dir[p, :k, :k] = dirb.astype(np_dtype)

    batch = SubdomainBatch(
        n_dof=n_dof, n_dom=n_dom, n_max=n_max,
        gids=jnp.asarray(gids), mask=jnp.asarray(mask),
        mult=jnp.asarray(mult), a_neu=jnp.asarray(a_neu),
        a_dir=jnp.asarray(a_dir))
    return AssembledProblem(mesh=mesh, decomp=decomp, batch=batch,
                            a_csr=a_csr, nnz_loc=nnz_loc)


def robin_blocks(batch: SubdomainBatch, optim: float) -> jax.Array:
    """Robin = Dirichlet + optim * (border-restricted Neumann), border =
    DOFs with multiplicity > 1 (createRobinMatrix, src/geneo.cpp:1613-1670)."""
    border = (batch.mult > 1.0) & batch.mask
    sel = border[:, :, None] & border[:, None, :]
    return batch.a_dir + optim * jnp.where(sel, batch.a_neu, 0.0)
