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
from ..partition.decompose import Decomposition, _ranges


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.tree_util.register_dataclass,
         data_fields=["gids", "mask", "mult", "a_neu", "a_dir",
                      "scatter_perm", "sorted_gids"],
         meta_fields=["n_dof", "n_dom", "n_max", "axis"])
@dataclass(frozen=True)
class SubdomainBatch:
    """Batched padded per-subdomain data (the MatIS equivalent).

    ``axis``: when set, the domain axis is sharded over that mesh axis name
    and the batch is being used inside shard_map — reductions to global
    vectors add a psum over it (the ICI halo-exchange/assembly collective
    replacing PETSc's VecScatter reverse-ADD, src/geneo.cpp:1871-1900).
    """

    n_dof: int
    n_dom: int
    n_max: int
    gids: jax.Array   # [n_dom, n_max] int32, pad = n_dof
    mask: jax.Array   # [n_dom, n_max] bool
    mult: jax.Array   # [n_dom, n_max] dtype, pad = 1
    a_neu: jax.Array  # [n_dom, n_max, n_max] weighted local Neumann blocks
    a_dir: jax.Array  # [n_dom, n_max, n_max] Dirichlet blocks
    # Optional sorted-scatter acceleration (single-device path): a static
    # permutation sorting the flattened gids, so the scatter-add runs as a
    # gather + sorted segment-sum (TPU scatters on unsorted indices are
    # serialized; sorted segment sums vectorize).
    scatter_perm: jax.Array | None = None   # [n_dom*n_max] int32
    sorted_gids: jax.Array | None = None    # [n_dom*n_max] int32 ascending
    axis: str | None = None

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
        if self.scatter_perm is not None and self.axis is None:
            y = jax.ops.segment_sum(flat[self.scatter_perm],
                                    self.sorted_gids,
                                    num_segments=self.n_dof + 1,
                                    indices_are_sorted=True)[:-1]
        else:
            y = jax.ops.segment_sum(flat, self.gids.ravel(),
                                    num_segments=self.n_dof + 1)[:-1]
        if self.axis is not None:
            y = jax.lax.psum(y, self.axis)
        return y

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


def _group_elems_by_size(mesh: ElementMesh):
    """Group elements by DOF count into dense [ne_k, k] / [ne_k, k, k]
    batches (vectorized assembly; elements from the reference generators
    are 1- or 2-node, but any mix of sizes is supported)."""
    sizes = np.diff(mesh.elem_ptr)
    groups = {}
    for k in np.unique(sizes):
        k = int(k)
        e_ids = np.where(sizes == k)[0]
        starts = mesh.elem_ptr[e_ids]
        idx = mesh.elem_idx[starts[:, None] + np.arange(k)[None, :]]
        if isinstance(mesh.elem_mats, np.ndarray) and mesh.elem_mats.ndim == 3:
            mats = mesh.elem_mats[e_ids]
        else:
            mats = np.stack([mesh.elem_mats[e] for e in e_ids])
        groups[k] = (e_ids, idx.astype(np.int64), mats)
    return groups


def _local_triplets(mesh: ElementMesh, decomp: Decomposition, p: int,
                    groups=None):
    """(li, lj, w_vals, nnz) triplets of domain p's WEIGHTED Neumann block
    (element sub-matrices scaled by 1/elemMult — the MatIS local block),
    vectorized over elements grouped by size."""
    nodes = decomp.dom_nodes[p]
    elems = decomp.elem_doms[p]
    if groups is None:
        groups = _group_elems_by_size(mesh)
    lis, ljs, wvals, keys = [], [], [], []
    nmax = len(nodes) + 1
    for k, (e_ids, idx, mats) in groups.items():
        # this size-group's members of the domain (both lists sorted)
        loc = np.searchsorted(e_ids, elems)
        ok = loc < len(e_ids)
        loc = loc[ok]
        gsel = loc[e_ids[loc] == elems[ok]]
        if not len(gsel):
            continue
        gdofs = idx[gsel]                       # [ne, k]
        lidx = np.searchsorted(nodes, gdofs)    # members: all nodes in dom
        w = 1.0 / decomp.elem_mult[e_ids[gsel]]
        flat_m = mats[gsel].reshape(len(gsel), -1)
        li = np.repeat(lidx, k, axis=1).ravel()   # row-major (i, j) pairs
        lj = np.tile(lidx, (1, k)).ravel()
        lis.append(li)
        ljs.append(lj)
        wvals.append((flat_m * w[:, None]).ravel())
        keys.append(li.astype(np.int64) * nmax + lj)
    if lis:
        nnz = len(np.unique(np.concatenate(keys)))
        return (np.concatenate(lis), np.concatenate(ljs),
                np.concatenate(wvals), nnz)
    z = np.zeros(0, np.int64)
    return (z, z, np.zeros(0, np.float64), 0)


def _extract_dirichlet_all(a_csr: sp.csr_matrix, decomp: Decomposition):
    """All Dirichlet blocks at once: for every assembled entry A_ij, emit
    (dom, li, lj, val) for every domain containing BOTH i and j — the
    vectorized equivalent of per-domain MatCreateSubMatrices
    (setUpGenEOPC, geneo.cpp:1697-1705), O(nnz * avg_mult * log)."""
    n = a_csr.shape[0]
    coo = a_csr.tocoo()
    rows, cols, vals = (coo.row.astype(np.int64),
                        coo.col.astype(np.int64), coo.data)

    # (dom, node) -> local index lookup via one sorted key array
    dom_sizes = decomp.dom_sizes
    dom_starts = np.zeros(decomp.n_dom + 1, np.int64)
    np.cumsum(dom_sizes, out=dom_starts[1:])
    all_keys = np.concatenate(
        [p * n + decomp.dom_nodes[p] for p in range(decomp.n_dom)]) \
        if decomp.n_dom else np.zeros(0, np.int64)

    def lookup(doms, nodes_q):
        """local index of nodes_q in domains doms, -1 if absent."""
        key = doms * n + nodes_q
        pos = np.searchsorted(all_keys, key)
        pos = np.minimum(pos, len(all_keys) - 1)
        hit = all_keys[pos] == key
        return np.where(hit, pos - dom_starts[doms], -1), hit

    # node -> domains incidence (sorted by node)
    node_doms_node = np.concatenate(
        [decomp.dom_nodes[p] for p in range(decomp.n_dom)])
    node_doms_dom = np.concatenate(
        [np.full(len(decomp.dom_nodes[p]), p, np.int64)
         for p in range(decomp.n_dom)])
    order = np.argsort(node_doms_node, kind="stable")
    nd_node = node_doms_node[order]
    nd_dom = node_doms_dom[order]
    nd_start = np.searchsorted(nd_node, np.arange(n + 1))

    # expand each entry over the domains of its ROW node
    reps = (nd_start[rows + 1] - nd_start[rows]).astype(np.int64)
    e_ids = np.repeat(np.arange(len(rows)), reps)
    offs = _ranges(reps)
    doms = nd_dom[nd_start[rows].repeat(reps) + offs]
    li, _ = lookup(doms, rows[e_ids])
    lj, hit_j = lookup(doms, cols[e_ids])
    keep = hit_j
    return doms[keep], li[keep], lj[keep], vals[e_ids][keep]


def assemble_global_csr(mesh: ElementMesh, groups=None) -> sp.csr_matrix:
    """Assembled global operator (the MatMPIAIJ view), vectorized."""
    if groups is None:
        groups = _group_elems_by_size(mesh)
    rows, cols, vals = [], [], []
    for k, (e_ids, idx, mats) in groups.items():
        rows.append(np.repeat(idx, k, axis=1).ravel())
        cols.append(np.tile(idx, (1, k)).ravel())
        vals.append(mats.reshape(len(e_ids), -1).ravel())
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
    a_neu = np.zeros((n_dom, n_max, n_max), dtype=np_dtype)
    a_dir = np.zeros((n_dom, n_max, n_max), dtype=np_dtype)
    diag = np.arange(n_max)

    groups = _group_elems_by_size(mesh)
    a_csr = assemble_global_csr(mesh, groups)
    nnz_loc = np.zeros(n_dom, dtype=np.int64)

    for p in range(n_dom):
        nodes = decomp.dom_nodes[p]
        k = len(nodes)
        if k == 0:
            continue
        gids[p, :k] = nodes
        mask[p, :k] = True
        mult[p, :k] = decomp.node_mult[nodes]
        li, lj, wvals, nnz = _local_triplets(mesh, decomp, p, groups)
        nnz_loc[p] = nnz
        np.add.at(a_neu[p], (li, lj), wvals.astype(np_dtype, copy=False))

    # all Dirichlet blocks in one vectorized pass over the assembled entries
    d_dom, d_li, d_lj, d_val = _extract_dirichlet_all(a_csr, decomp)
    a_dir[d_dom, d_li, d_lj] = d_val.astype(np_dtype, copy=False)
    # pad-slot identity diagonal (covers empty domains too — the module's
    # documented padding invariant)
    for p in range(n_dom):
        k = len(decomp.dom_nodes[p])
        a_neu[p, diag[k:], diag[k:]] = 1.0
        a_dir[p, diag[k:], diag[k:]] = 1.0

    # The batch is created on the HOST (CPU backend): setup consumes it
    # there (the reference's setup is CPU-side: ARPACK/MUMPS/LAPACK), and
    # the one-shot upload of the finished preconditioner products to the
    # accelerator happens at the end of setup.  Device->host pulls are
    # avoided entirely (pathologically slow on tunneled TPU platforms).
    cpu = jax.devices("cpu")[0]
    put = lambda x: jax.device_put(x, cpu)
    perm = np.argsort(gids.ravel(), kind="stable").astype(np.int32)
    sorted_gids = gids.ravel()[perm]
    batch = SubdomainBatch(
        n_dof=n_dof, n_dom=n_dom, n_max=n_max,
        gids=put(gids), mask=put(mask),
        mult=put(mult), a_neu=put(a_neu), a_dir=put(a_dir),
        scatter_perm=put(perm), sorted_gids=put(sorted_gids))
    return AssembledProblem(mesh=mesh, decomp=decomp, batch=batch,
                            a_csr=a_csr, nnz_loc=nnz_loc)


def robin_blocks(batch: SubdomainBatch, optim: float) -> jax.Array:
    """Robin = Dirichlet + optim * (border-restricted Neumann), border =
    DOFs with multiplicity > 1 (createRobinMatrix, src/geneo.cpp:1613-1670)."""
    border = (batch.mult > 1.0) & batch.mask
    sel = border[:, :, None] & border[:, None, :]
    return batch.a_dir + optim * jnp.where(sel, batch.a_neu, 0.0)
