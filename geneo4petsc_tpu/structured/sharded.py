"""Multi-device structured GenEO: shard the domain grid's Z axis.

The generic sharded path (parallel/sharded.py) replicates the global
vector and psums every scatter — correct, but each apply moves the whole
vector over ICI.  The structured backend admits the idiomatic TPU
scale-out: *sharded* global vectors and *neighbor* communication.

Layout.  Global vectors are [nz*ny*nx] with z slowest; the subdomain
batch is z-major (d = px + gx*(py + gy*pz)).  Sharding the leading z
dimension over the mesh axis therefore splits BOTH the grid fields and
the domain batch into contiguous z-slabs with aligned ownership:

  * grid fields / vectors  [nz, ny, nx]   -> P('dz') on dim 0
  * domain-batch arrays    [n_dom, ...]   -> P('dz') on dim 0
  * coarse factorization   (E eigvecs)    -> replicated (the TPU
    inversion of rank-0 offload)

Collectives.  StructuredGenEO.apply is pure reshapes / static shifted
slices / einsums / segment-sums.  Under jit with these shardings, XLA's
SPMD partitioner inserts exactly the communication the reference codes
by hand (VecScatter halo, src/geneo.cpp:1845-1900): the z-axis halo
shifts lower to `CollectivePermute` neighbor hops over ICI, the coarse
[dim_e] contributions and Krylov dot products to `AllReduce`.  No
hand-written collective calls — the sharding annotations ARE the
communication model (pick a mesh, annotate, let XLA insert collectives).

Requires nz % n_devices == 0 (vector slab alignment) and
n_dom % n_devices == 0 (equal contiguous domain chunks).  When gz is
divisible too, domain chunks coincide with vector slabs and the halo is
pure neighbor traffic; otherwise (e.g. the 216^3 / 4x4x4 headline bench
on 8 devices: gz = 4) the z-major domain chunks span (pz, py) blocks and
XLA inserts the extra resharding collectives between the slab-sharded
vectors and the chunk-sharded batch — correct on any mesh size, neighbor-
optimal on aligned ones.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.multiproc import global_put
from .geneo import StructuredGenEO


def make_mesh(n_devices: int | None = None, axis: str = "dz") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _grid_sharding(mesh: Mesh, axis: str):
    """[nz, ny, nx] fields and flat [n] vectors: z-slab sharded.

    Flat vectors shard on dim 0 too — n = nz*ny*nx with z slowest, so a
    P(axis) split of the flat vector IS the z-slab split when nz divides
    the mesh size (enforced in shard_structured)."""
    return NamedSharding(mesh, P(axis))


def shard_structured(pc: StructuredGenEO, mesh: Mesh, axis: str = "dz"):
    """Place a set-up StructuredGenEO onto the mesh; returns
    (matvec, apply, pc_sh) with SHARDED global-vector signatures.

    matvec/apply are jit-compiled with sharding-annotated arguments; pass
    them z-slab-sharded vectors (shard_vector) and XLA keeps every
    intermediate sharded, exchanging only halo planes + [dim_e]/scalar
    reductions."""
    n_dev = mesh.shape[axis]
    nx, ny, nz = pc.grid_shape
    gx, gy, gz = pc.dom_grid
    n_dom = gx * gy * gz
    if nz % n_dev or n_dom % n_dev:
        raise ValueError(
            f"nz={nz} (vector slabs) and n_dom={n_dom} (domain chunks) "
            f"must divide the mesh size {n_dev}")

    dom = _grid_sharding(mesh, axis)      # leading-dim shard
    dom1 = NamedSharding(mesh, P(None, axis))   # dim-1 shard (BT factors)
    repl = NamedSharding(mesh, P())

    def put(x, s):
        return global_put(x, s)

    def put_tree(tree, s):
        """Shard leading-dim-divisible leaves; replicate scalars (e.g.
        the FDM shift).  Block-tridiag factors batch domains on dim 1
        (plane-major scan layout, block_tridiag.BlockTridiagFactor) —
        shard those on dim 1 instead."""
        from .solvers import BTSolver
        bt_dim1 = isinstance(tree, BTSolver)

        def one(a):
            nd = getattr(a, "ndim", 0)
            if bt_dim1:
                ok = nd >= 2 and a.shape[1] % n_dev == 0
                return global_put(a, dom1 if ok else repl)
            ok = nd >= 1 and a.shape[0] % n_dev == 0
            return global_put(a, s if ok else repl)
        return jax.tree_util.tree_map(one, tree)

    pc_sh = dataclasses.replace(
        pc,
        gop=dataclasses.replace(
            pc.gop, diag=put(pc.gop.diag, dom),
            coeff=tuple(put(c, dom) for c in pc.gop.coeff)),
        l1=put_tree(pc.l1, dom),
        pou=put(pc.pou, dom), maskf=put(pc.maskf, dom),
        z=put(pc.z, dom), colids=put(pc.colids, dom),
        e_evecs=put(pc.e_evecs, repl), e_eig_inv=put(pc.e_eig_inv, repl),
        x0=put(pc.x0, dom))

    @partial(jax.jit, out_shardings=dom)
    def mv(pc_a, x):
        return pc_a.matvec(x)

    @partial(jax.jit, out_shardings=dom)
    def ap(pc_a, x):
        return pc_a.apply(x)

    shard_vec = lambda v: global_put(jnp.asarray(v), dom)
    return (lambda x: mv(pc_sh, x)), (lambda x: ap(pc_sh, x)), pc_sh, shard_vec


def shard_refine64(op64, mesh: Mesh, axis: str = "dz"):
    """Place the f64 truth operator (GlobalStencil / ElasticOp pytree)
    onto the mesh for the sharded refinement loop: every leaf whose
    leading dim divides the mesh size z-slab shards (fields are
    [nz, ny, nx] with z leading; flat vectors are z-slowest), the rest
    replicates (tiny constants: the 24x24 cell stiffness, scalars).

    Returns (op64_sh, shard_vec) with shard_vec placing flat [n]
    vectors (any dtype) on the same z-slab sharding."""
    n_dev = mesh.shape[axis]
    dom = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def one(a):
        nd = getattr(a, "ndim", 0)
        ok = nd >= 1 and a.shape[0] % n_dev == 0
        return global_put(a, dom if ok else repl)

    op_sh = jax.tree_util.tree_map(one, op64)
    return op_sh, lambda v: global_put(jnp.asarray(v), dom)


def shard_elastic(pc, mesh: Mesh, axis: str = "dz"):
    """Place a set-up ElasticGenEO (structured/elastic.py) onto the mesh.

    Same model as shard_structured: flat [3n] displacement vectors are
    z-slab sharded (z slowest, 3 components fastest — a leading-dim split
    IS the slab split when nz divides the mesh), domain-batched setup
    products shard on the domain dim, and the coarse factorization is
    replicated.  The cell-sum matvec (_cell_apply) is static slices +
    one MXU matmul, so XLA's partitioner inserts the one-plane
    CollectivePermute halos; the per-cell modulus field ([nz-1, ...],
    never mesh-divisible) stays replicated — it is ~14 MB at the 10M
    bench against multi-GB vectors.

    Returns (matvec, apply, pc_sh, shard_vec) with SHARDED [3n]
    signatures."""
    n_dev = mesh.shape[axis]
    nx, ny, nz = pc.grid_shape
    n_dom = int(np.prod(pc.dom_grid))
    if nz % n_dev or n_dom % n_dev:
        raise ValueError(
            f"nz={nz} (vector slabs) and n_dom={n_dom} (domain chunks) "
            f"must divide the mesh size {n_dev}")

    dom = _grid_sharding(mesh, axis)
    repl = NamedSharding(mesh, P())

    def put(x, s):
        return global_put(x, s)

    def put_dom_tree(tree):
        """Shard exactly the [n_dom, ...]-batched leaves; everything else
        (the 24x24 reference stiffness, scalar knobs, 1-D axis factors)
        replicates."""
        def one(a):
            nd = getattr(a, "ndim", 0)
            ok = nd >= 1 and a.shape[0] == n_dom
            return global_put(a, dom if ok else repl)
        return jax.tree_util.tree_map(one, tree)

    pc_sh = dataclasses.replace(
        pc,
        gop=dataclasses.replace(pc.gop, bc=put(pc.gop.bc, dom),
                                e_cell=put(pc.gop.e_cell, repl),
                                k0=put(pc.gop.k0, repl)),
        l1=put_dom_tree(pc.l1),
        pou=put(pc.pou, dom), maskf=put(pc.maskf, dom),
        z=put(pc.z, dom), colids=put(pc.colids, dom),
        e_evecs=put(pc.e_evecs, repl), e_eig_inv=put(pc.e_eig_inv, repl),
        x0=put(pc.x0, dom))

    @partial(jax.jit, out_shardings=dom)
    def mv(pc_a, x):
        return pc_a.matvec(x)

    @partial(jax.jit, out_shardings=dom)
    def ap(pc_a, x):
        return pc_a.apply(x)

    shard_vec = lambda v: global_put(jnp.asarray(v), dom)
    return (lambda x: mv(pc_sh, x)), (lambda x: ap(pc_sh, x)), pc_sh, shard_vec
