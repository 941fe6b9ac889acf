"""Distributed generic path: owner-block sharded vectors + halo exchange.

This is the true VecScatter equivalent for the UNSTRUCTURED path.  The
sibling `parallel/sharded.py` keeps every global vector replicated and
assembles with a full-length psum — correct on any mesh, but the bytes
on the wire do not shrink with the shard count.  Here the global vector
is SHARDED over the device mesh in contiguous owner blocks (one block of
DOFs per device, the PETSc rank-contiguous global ordering), and each
gather/scatter moves ONLY the halo entries a device's subdomains touch,
through one packed `lax.all_to_all` per direction:

  * forward gather  (VecScatter fwd/INSERT, src/geneo.cpp:1845-1869):
      owned slice is a local read; halo entries are packed per owner,
      exchanged with one all_to_all, and placed with a static scatter.
  * reverse scatter-add (VecScatter rev/ADD, src/geneo.cpp:1871-1900):
      the transposed plan — halo contributions pack back to their
      owners through the same all_to_all and segment-sum into the block.

The communication PLAN (who owns what, which entries cross which edge)
is computed once on the host at setup time from the decomposition — the
VecScatterCreate analogue — and shipped as static index arrays sharded
alongside the subdomain batch.  Per-iteration wire bytes are the overlap
surface, not n_dof: this is the scaling model of the reference's
one-subdomain-per-rank MPI layout (SURVEY.md §2.9/§5.8), expressed as
XLA collectives over ICI.

DOF ownership follows the non-overlapped partition when the caller
provides it (`node_part`), falling back to first-containing-domain; DOFs
are renumbered so ownership is block-contiguous (PETSc's rank-contiguous
AO), with `shard_vec`/`unshard_vec` translating at the boundary.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..assembly.assemble import SubdomainBatch
from ..precond.geneo import GenEOPreconditioner
from .sharded import _pad_domains


@partial(jax.tree_util.register_dataclass,
         data_fields=["gids", "mask", "mult", "a_neu", "a_dir",
                      "send_idx", "recv_pos"],
         meta_fields=["n_dof", "n_dom", "n_max", "blk", "n_halo",
                      "n_dev", "axis"])
@dataclass(frozen=True)
class DistBatch:
    """Subdomain batch over owner-block sharded vectors.

    Duck-types the `SubdomainBatch` hot-path surface (gather /
    scatter_add / matvec / pou / mask) so a set-up `GenEOPreconditioner`
    runs unchanged inside shard_map with this batch swapped in.  All
    methods execute INSIDE shard_map: array fields are the local chunk
    (leading domain axis = domains-per-device; plan rows = this device).

    Index conventions (static, built by `_build_plan`):
      gids[p, i]  : local position of the DOF in [own block | halo]:
                    < blk -> owned slice offset; blk + h -> halo slot h;
                    pad/masked -> blk + n_halo (dump).
      send_idx[., d, c] : offsets within THIS device's block of the
                    entries device d needs; pad -> blk (reads 0).
      recv_pos[., o*C + c] : halo slot (as blk + h) where the c-th entry
                    received from owner o lands; pad -> blk + n_halo.
    """

    n_dof: int          # real global DOF count (pre-padding)
    n_dom: int          # padded total domain count (multiple of n_dev)
    n_max: int
    blk: int            # owned block length per device
    n_halo: int         # padded halo length per device
    n_dev: int
    axis: str
    gids: jax.Array     # [n_dom, n_max] int32 local indices (see above)
    mask: jax.Array     # [n_dom, n_max] bool
    mult: jax.Array     # [n_dom, n_max] dtype
    a_neu: jax.Array    # [n_dom, n_max, n_max]
    a_dir: jax.Array | None
    send_idx: jax.Array  # [n_dev, n_dev, max_cnt] int32
    recv_pos: jax.Array  # [n_dev, n_dev * max_cnt] int32

    @property
    def pou(self) -> jax.Array:
        return 1.0 / self.mult

    # -- halo exchange (the per-iteration collectives) --
    def _halo_gather(self, xb: jax.Array) -> jax.Array:
        """Owned block [blk] -> local view [blk + n_halo + 1] (dump last).

        One packed all_to_all: entry bytes = halo surface, not n_dof."""
        xp = jnp.concatenate([xb, jnp.zeros((1,), xb.dtype)])
        packed = xp[self.send_idx[0]]                   # [n_dev, max_cnt]
        recv = jax.lax.all_to_all(packed, self.axis, split_axis=0,
                                  concat_axis=0)        # rows = owners
        halo = jnp.zeros((self.n_halo + 1,), xb.dtype)
        halo = halo.at[self.recv_pos[0] - self.blk].set(recv.ravel())
        return jnp.concatenate([xb, halo])

    def gather(self, x: jax.Array) -> jax.Array:
        """Sharded global vector -> local overlapped copies [dpd, n_max]
        (VecScatter forward/INSERT, src/geneo.cpp:1845-1869)."""
        return self._halo_gather(x)[self.gids]

    def scatter_add(self, xl: jax.Array) -> jax.Array:
        """Local copies [dpd, n_max] -> owned block [blk] of the global
        sum (VecScatter reverse/ADD, src/geneo.cpp:1871-1900)."""
        flat = jnp.where(self.mask, xl, 0).ravel()
        yn = jax.ops.segment_sum(
            flat, self.gids.ravel(),
            num_segments=self.blk + self.n_halo + 1)
        packed = yn[self.recv_pos[0]].reshape(self.n_dev, -1)
        contrib = jax.lax.all_to_all(packed, self.axis, split_axis=0,
                                     concat_axis=0)     # rows = senders
        remote = jax.ops.segment_sum(contrib.ravel(),
                                     self.send_idx[0].ravel(),
                                     num_segments=self.blk + 1)[:-1]
        return yn[:self.blk] + remote

    def matvec(self, x: jax.Array) -> jax.Array:
        """Distributed SpMV through the unassembled Neumann blocks
        (MatIS MatMult over rank-contiguous vectors)."""
        xl = self.gather(x)
        yl = jnp.einsum("dij,dj->di", self.a_neu, xl,
                        preferred_element_type=xl.dtype)
        return self.scatter_add(yl)


@dataclass(frozen=True)
class DistPlan:
    """Host-side communication plan + global renumbering (the
    VecScatterCreate product)."""

    n_dof: int
    n_tot: int           # n_dev * blk (padded sharded vector length)
    blk: int
    n_halo: int
    max_cnt: int
    new_pos: np.ndarray  # [n_dof] old gid -> padded sharded position
    gids: np.ndarray     # [n_dom, n_max] int32 local indices
    send_idx: np.ndarray
    recv_pos: np.ndarray

    @property
    def wire_floats_per_exchange(self) -> int:
        """Off-device floats one gather moves (self-rows and pad slots
        excluded) — the measured-comm-volume hook for
        tst/measure_sharded.py.  The replicated-psum path moves
        n_tot * n_dev floats per reduction for comparison."""
        n_dev = self.send_idx.shape[0]
        off = 0
        for o in range(n_dev):
            for d in range(n_dev):
                if o != d:
                    off += int((self.send_idx[o, d] != self.blk).sum())
        return off


def _build_plan(gids: np.ndarray, mask: np.ndarray, n_dof: int,
                n_dev: int, node_part: np.ndarray | None) -> DistPlan:
    """Ownership, renumbering, and packed exchange plan (host, setup).

    Matches the reference's layout choices: one contiguous block of the
    global ordering per rank (geneo4PETSc.cpp:571-641), halo = the
    overlap closure of the owned rows."""
    n_dom, n_max = gids.shape
    dpd = n_dom // n_dev
    dev_of_dom = np.arange(n_dom) // dpd

    if node_part is not None:
        owner_dom = np.asarray(node_part, np.int64)
        if owner_dom.shape[0] != n_dof:
            raise ValueError("node_part length != n_dof")
    else:
        owner_dom = np.full(n_dof, -1, np.int64)
        for p in range(n_dom):
            g = gids[p][mask[p]]
            fresh = owner_dom[g] < 0
            owner_dom[g[fresh]] = p
        if (owner_dom < 0).any():
            raise ValueError("some DOFs belong to no subdomain")
    node_dev = dev_of_dom[np.minimum(owner_dom, n_dom - 1)]

    counts = np.bincount(node_dev, minlength=n_dev)
    blk = max(int(counts.max()), 1)
    new_pos = np.empty(n_dof, np.int64)
    for d in range(n_dev):
        sel = np.flatnonzero(node_dev == d)        # ascending old gid
        new_pos[sel] = d * blk + np.arange(sel.size)
    n_tot = n_dev * blk

    g_new = np.where(mask, new_pos[np.minimum(gids, n_dof - 1)], -1)

    halo_lists, per_pair = [], {}
    for d in range(n_dev):
        rows = slice(d * dpd, (d + 1) * dpd)
        ids = np.unique(g_new[rows][mask[rows]])
        ids = ids[ids >= 0]
        halo = ids[(ids // blk) != d]              # sorted: owner-major
        halo_lists.append(halo)
        owners = halo // blk
        for o in range(n_dev):
            per_pair[o, d] = halo[owners == o]

    n_halo = max(1, max((h.size for h in halo_lists), default=0))
    max_cnt = max(1, max((v.size for v in per_pair.values()), default=0))

    send_idx = np.full((n_dev, n_dev, max_cnt), blk, np.int32)
    recv_pos = np.full((n_dev, n_dev * max_cnt), blk + n_halo, np.int32)
    for (o, d), ids in per_pair.items():
        if ids.size:
            send_idx[o, d, :ids.size] = ids - o * blk
            pos = np.searchsorted(halo_lists[d], ids)
            recv_pos[d, o * max_cnt:o * max_cnt + ids.size] = blk + pos

    lgids = np.full((n_dom, n_max), blk + n_halo, np.int32)
    for d in range(n_dev):
        halo = halo_lists[d]
        for p in range(d * dpd, (d + 1) * dpd):
            m = mask[p]
            g = g_new[p][m]
            own = (g // blk) == d
            hpos = np.searchsorted(halo, g)        # junk for own g: unused
            lgids[p][m] = np.where(own, g - d * blk,
                                   blk + np.minimum(hpos,
                                                    max(halo.size - 1, 0)))
    return DistPlan(n_dof=n_dof, n_tot=n_tot, blk=blk, n_halo=n_halo,
                    max_cnt=max_cnt, new_pos=new_pos, gids=lgids,
                    send_idx=send_idx, recv_pos=recv_pos)


def _dist_batch(batch: SubdomainBatch, plan: DistPlan, mesh: Mesh,
                axis: str) -> DistBatch:
    shard = NamedSharding(mesh, P(axis))
    put = lambda x: None if x is None else jax.device_put(x, shard)
    n_dev = mesh.shape[axis]
    return DistBatch(
        n_dof=plan.n_dof, n_dom=batch.n_dom, n_max=batch.n_max,
        blk=plan.blk, n_halo=plan.n_halo, n_dev=n_dev, axis=axis,
        gids=put(jnp.asarray(plan.gids)),
        mask=put(batch.mask), mult=put(batch.mult),
        a_neu=put(batch.a_neu), a_dir=put(batch.a_dir),
        send_idx=put(jnp.asarray(plan.send_idx)),
        recv_pos=put(jnp.asarray(plan.recv_pos)))


def _dist_specs(db: DistBatch, axis: str) -> DistBatch:
    return dataclasses.replace(
        db, gids=P(axis), mask=P(axis), mult=P(axis), a_neu=P(axis),
        a_dir=None if db.a_dir is None else P(axis),
        send_idx=P(axis), recv_pos=P(axis))


def dist_geneo(pc: GenEOPreconditioner, mesh: Mesh, axis: str = "dom",
               node_part: np.ndarray | None = None):
    """Re-lay a set-up GenEO preconditioner onto owner-block sharded
    vectors.  Returns (matvec, pc_apply, pc_dist, shard_vec, unshard_vec)
    where matvec/pc_apply take and return SHARDED [n_tot] vectors.

    Pass the non-overlapped partition as `node_part` (e.g.
    `Decomposition`'s originating node_part) for minimal halos; without
    it ownership falls back to first-containing-domain.

    The coarse solve stays replicated (every device factors/solves the
    tiny E — the idiomatic inversion of the reference's rank-0 offload,
    geneo.cpp:1435-1542); the only per-iteration collectives are the two
    halo all_to_alls and a [dim_e] psum."""
    n_dev = mesh.shape[axis]
    n_real = pc.batch.n_dom
    n_pad = ((n_real + n_dev - 1) // n_dev) * n_dev
    extra = n_pad - n_real
    batch = _pad_domains(pc.batch, n_pad)

    plan = _build_plan(np.asarray(batch.gids), np.asarray(batch.mask),
                       pc.batch.n_dof, n_dev, node_part)
    db = _dist_batch(batch, plan, mesh, axis)

    def pad_dom(x, fill=0.0):
        if x is None or extra == 0:
            return x
        blk_pad = jnp.full((extra,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, blk_pad], axis=0)

    l1_factor = pad_dom(pc.l1_factor)
    if extra:
        eye = jnp.broadcast_to(
            jnp.eye(pc.batch.n_max, dtype=pc.l1_factor.dtype),
            (extra, pc.batch.n_max, pc.batch.n_max))
        l1_factor = l1_factor.at[n_real:].set(eye)
    pou = pad_dom(pc.pou, 1.0)
    z_loc = pad_dom(pc.z_loc)
    colids = pad_dom(pc.colids, pc.dim_e) if pc.colids is not None else None

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    put = lambda x, s: None if x is None else jax.device_put(x, s)

    def shard_vec(x) -> jax.Array:
        x = np.asarray(x)
        y = np.zeros(plan.n_tot, x.dtype)
        y[plan.new_pos] = x[:plan.n_dof]
        return jax.device_put(jnp.asarray(y), shard)

    def unshard_vec(xs) -> np.ndarray:
        return np.asarray(xs)[plan.new_pos]

    pc_dist = dataclasses.replace(
        pc, batch=db, use_pallas=False,
        l1_factor=put(l1_factor, shard), pou=put(pou, shard),
        z_loc=put(z_loc, shard), colids=put(colids, shard),
        e_evecs=put(pc.e_evecs, repl), e_eig_inv=put(pc.e_eig_inv, repl),
        x0=shard_vec(np.asarray(pc.x0)))

    pc_spec = dataclasses.replace(
        pc_dist, batch=_dist_specs(db, axis),
        l1_factor=P(axis), pou=None if pou is None else P(axis),
        z_loc=None if z_loc is None else P(axis),
        colids=None if colids is None else P(axis),
        e_evecs=None if pc.e_evecs is None else P(),
        e_eig_inv=None if pc.e_eig_inv is None else P(),
        x0=P(axis))

    @partial(jax.shard_map, mesh=mesh, in_specs=(pc_spec, P(axis)),
             out_specs=P(axis))
    def apply_fn(pc_loc, x):
        return pc_loc.apply(x)

    @partial(jax.shard_map, mesh=mesh, in_specs=(pc_spec, P(axis)),
             out_specs=P(axis))
    def mv_fn(pc_loc, x):
        return pc_loc.batch.matvec(x)

    apply_jit = jax.jit(apply_fn)
    mv_jit = jax.jit(mv_fn)
    return ((lambda x: mv_jit(pc_dist, x)),
            (lambda x: apply_jit(pc_dist, x)),
            pc_dist, shard_vec, unshard_vec)
