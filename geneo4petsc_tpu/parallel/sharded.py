"""Multi-device execution: shard the subdomain batch over a mesh axis.

The reference's parallel model is one subdomain per MPI rank with PETSc
VecScatter halo exchange (SURVEY.md §2.9).  The TPU inversion: subdomains
are a batch axis sharded over the device mesh (`Mesh(..., ('dom',))`), the
global solution vector is replicated, and the only collectives are psums of
assembled contributions riding ICI:

  * level-1 gather (global -> local overlapped copies): pure local indexing
  * level-1 scatter-add / SpMV assembly: psum over 'dom'
  * coarse contributions Z^T x: psum of a [dim_e] vector
  * coarse solve E^-1: replicated on every device (the idiomatic inversion
    of the reference's rank-0 offload — no master bottleneck)
  * Krylov dot products/norms: computed on replicated vectors (free)

Everything composes under jit: the Krylov while_loop runs on replicated
state with shard_map'd matvec/PC-apply inside.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..assembly.assemble import SubdomainBatch
from ..precond.geneo import GenEOPreconditioner


def make_mesh(n_devices: int | None = None, axis: str = "dom") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _pad_domains(batch: SubdomainBatch, n_dom_padded: int) -> SubdomainBatch:
    """Pad the domain axis with inert empty domains (all-pad slots)."""
    extra = n_dom_padded - batch.n_dom
    if extra == 0:
        return dataclasses.replace(batch, scatter_perm=None,
                                   sorted_gids=None)
    def pad(x, fill):
        pad_block = jnp.full((extra,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad_block], axis=0)
    eye = jnp.broadcast_to(jnp.eye(batch.n_max, dtype=batch.a_neu.dtype),
                           (extra, batch.n_max, batch.n_max))
    return dataclasses.replace(
        batch,
        n_dom=n_dom_padded,
        gids=pad(batch.gids, batch.n_dof),
        mask=pad(batch.mask, False),
        mult=pad(batch.mult, 1),
        a_neu=jnp.concatenate([batch.a_neu, eye], axis=0),
        a_dir=None if batch.a_dir is None
        else jnp.concatenate([batch.a_dir, eye], axis=0),
        scatter_perm=None, sorted_gids=None)


def _batch_specs(batch: SubdomainBatch, axis: str) -> SubdomainBatch:
    """Spec pytree with the same treedef (meta) as `batch`, P(axis) leaves.

    The sorted-scatter helper fields are dropped under sharding (their
    flat-index values are only meaningful on an unsharded batch)."""
    return dataclasses.replace(batch, gids=P(axis), mask=P(axis),
                               mult=P(axis), a_neu=P(axis),
                               a_dir=None if batch.a_dir is None else P(axis),
                               scatter_perm=None, sorted_gids=None)


def shard_batch(batch: SubdomainBatch, mesh: Mesh, axis: str = "dom"
                ) -> SubdomainBatch:
    """Pad n_dom to the mesh size and device_put with the domain axis
    sharded (the 'sendDomain' of the reference, as sharded device_puts)."""
    n_dev = mesh.shape[axis]
    n_pad = ((batch.n_dom + n_dev - 1) // n_dev) * n_dev
    batch = _pad_domains(batch, n_pad)
    sharding = NamedSharding(mesh, P(axis))
    return dataclasses.replace(
        batch,
        gids=jax.device_put(batch.gids, sharding),
        mask=jax.device_put(batch.mask, sharding),
        mult=jax.device_put(batch.mult, sharding),
        a_neu=jax.device_put(batch.a_neu, sharding),
        a_dir=None if batch.a_dir is None
        else jax.device_put(batch.a_dir, sharding),
        scatter_perm=None, sorted_gids=None)


def sharded_matvec(batch: SubdomainBatch, mesh: Mesh, axis: str = "dom"):
    """Returns a replicated-in/replicated-out global SpMV running the
    batched block products on the sharded domain axis."""
    batch = shard_batch(batch, mesh, axis)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(_batch_specs(batch, axis), P()), out_specs=P())
    def mv(b_loc, x):
        b_loc = dataclasses.replace(b_loc, axis=axis)
        return b_loc.matvec(x)

    mv_jit = jax.jit(mv)
    return lambda x: mv_jit(batch, x)


def shard_geneo(pc: GenEOPreconditioner, mesh: Mesh, axis: str = "dom"):
    """Shard a set-up GenEO preconditioner over the mesh; returns
    (matvec, pc_apply) closures with replicated vector signatures.

    Domain-batched fields (l1 factors, PoU, Z, colids) shard over `axis`;
    the coarse factorization (e_evecs/e_eig_inv) and x0 replicate.
    """
    n_dev = mesh.shape[axis]
    n_pad = ((pc.batch.n_dom + n_dev - 1) // n_dev) * n_dev
    extra = n_pad - pc.batch.n_dom
    batch = _pad_domains(pc.batch, n_pad)

    def pad_dom(x, fill=0.0):
        if x is None or extra == 0:
            return x
        blk = jnp.full((extra,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, blk], axis=0)

    l1_factor = pad_dom(pc.l1_factor)
    if extra:
        eye = jnp.broadcast_to(
            jnp.eye(pc.batch.n_max, dtype=pc.l1_factor.dtype),
            (extra, pc.batch.n_max, pc.batch.n_max))
        l1_factor = l1_factor.at[pc.batch.n_dom:].set(eye)
    pou = pad_dom(pc.pou, 1.0)
    z_loc = pad_dom(pc.z_loc)
    colids = pad_dom(pc.colids, pc.dim_e) if pc.colids is not None else None

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    put = lambda x, s: None if x is None else jax.device_put(x, s)

    pc_sh = dataclasses.replace(
        pc, batch=shard_batch(batch, mesh, axis),
        l1_factor=put(l1_factor, shard), pou=put(pou, shard),
        z_loc=put(z_loc, shard), colids=put(colids, shard),
        e_evecs=put(pc.e_evecs, repl), e_eig_inv=put(pc.e_eig_inv, repl),
        x0=put(pc.x0, repl))

    batch_spec = _batch_specs(pc_sh.batch, axis)
    pc_spec = dataclasses.replace(
        pc_sh, batch=batch_spec,
        l1_factor=P(axis), pou=None if pou is None else P(axis),
        z_loc=None if z_loc is None else P(axis),
        colids=None if colids is None else P(axis),
        e_evecs=None if pc.e_evecs is None else P(),
        e_eig_inv=None if pc.e_eig_inv is None else P(),
        x0=P())

    def _localize(pc_loc):
        return dataclasses.replace(
            pc_loc, batch=dataclasses.replace(pc_loc.batch, axis=axis))

    @partial(jax.shard_map, mesh=mesh, in_specs=(pc_spec, P()),
             out_specs=P())
    def apply_fn(pc_loc, x):
        return _localize(pc_loc).apply(x)

    @partial(jax.shard_map, mesh=mesh, in_specs=(pc_spec, P()),
             out_specs=P())
    def mv_fn(pc_loc, x):
        return _localize(pc_loc).batch.matvec(x)

    # jit with the preconditioner pytree as a traced ARGUMENT (not a
    # closure constant): large operator pytrees must never be baked into
    # the jaxpr (compile-service payload blow-up at scale).
    apply_jit = jax.jit(apply_fn)
    mv_jit = jax.jit(mv_fn)
    return (lambda x: mv_jit(pc_sh, x)), (lambda x: apply_jit(pc_sh, x)), pc_sh
