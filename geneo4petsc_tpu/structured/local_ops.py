"""Per-domain local operators in stencil form, built ON DEVICE.

The generic path materializes dense [n_dom, n_max, n_max] Neumann and
Dirichlet blocks (assembly/assemble.py).  Here each local operator is four
coefficient fields over the local box — diag + one off-diagonal per axis —
O(n_loc) memory, assembled on the accelerator from halo-gathered global
fields.  Semantics mirror the reference exactly:

* Neumann block = sum of member-element contributions weighted by
  1/elem_mult (the MatIS local block, geneo4PETSc.cpp:473-476 + 683-715);
  an edge is a member iff both endpoints lie in the dilated box, so edges
  leaving the box contribute NOTHING (the Neumann property).
* Dirichlet block = assembled global A restricted to the box
  (MatCreateSubMatrices, src/geneo.cpp:1697-1705): full assembled diagonal,
  off-diagonals kept only when the neighbor is inside the box.
* Robin = Dirichlet + optim * (border-restricted Neumann), border = nodes
  with multiplicity > 1 (createRobinMatrix, src/geneo.cpp:1613-1670).

Pad (out-of-grid) slots carry identity rows/cols — the module-wide inert
padding convention.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import halo
from .decompose import StructuredDecomposition
from .grid import derive_stencil_fields as _derive_stencil_fields


@partial(jax.tree_util.register_dataclass,
         data_fields=["diag", "offs"], meta_fields=[])
@dataclass(frozen=True)
class LocalStencil:
    """Batched local stencil operator.

    diag: [n_dom, lz, ly, lx]
    offs: tuple of 3 arrays, offs[a][..., v] = coefficient of the local
          edge (v, v + e_a) stored at v (0 where absent).  Off-diagonal
          VALUE of the operator (i.e. A[v, v+e_a]), not its negation.
    """

    diag: jax.Array
    offs: tuple

    def _windowed_matvec(self, x, bcast, sp_axes):
        """Shared shifted-window SpMV body.  ``sp_axes`` are x's (z, y,
        x) axes; ``bcast`` lifts a [n_dom, lz, ly, lx] field to x's
        rank.

        Form: ONE zero-extended copy of x, then every stencil term is a
        lazy WINDOW of that buffer feeding a single fused FMA loop —
        neither per-term ``jnp.pad`` (measured 10 ms per 10M-bench
        [64, 58^3, 2] apply: every shifted term materializes a full
        copy) nor ``.at[].add`` (21 ms: dynamic-update-slice chains).
        The coefficient shifts are loop-invariant per apply and hoist
        out of surrounding scan/while loops.  Same per-element
        accumulation order as the slice-add form (added terms are exact
        zeros where that form did not touch), so results are
        bit-identical."""
        nd = x.ndim
        pd = [(0, 0)] * nd
        for ax in sp_axes:
            if x.shape[ax] > 1:
                pd[ax] = (1, 1)
        xe = jnp.pad(x, pd)

        def win(ax=None, off=0):
            """Core window of xe, optionally offset along one axis."""
            idx = [slice(None)] * nd
            for a4 in sp_axes:
                if pd[a4] == (0, 0):
                    continue
                o = off if a4 == ax else 0
                idx[a4] = slice(1 + o, xe.shape[a4] - 1 + o)
            return xe[tuple(idx)]

        def shift_field(c, ax, off):
            """Zero-filled shift of a coefficient field (loop-invariant;
            hoisted by XLA out of iteration loops)."""
            sl = [slice(None)] * c.ndim
            cpd = [(0, 0)] * c.ndim
            if off > 0:
                sl[ax] = slice(1, None)
                cpd[ax] = (0, 1)
            else:
                sl[ax] = slice(None, -1)
                cpd[ax] = (1, 0)
            return jnp.pad(c[tuple(sl)], cpd)

        y = bcast(self.diag) * x
        for a, c in enumerate(self.offs):
            ax = sp_axes[2 - a]             # x's axis for x/y/z stencil a
            if x.shape[ax] == 1:
                continue
            ca = 3 - a                      # same axis in the 4-D field
            # y[v] += c[v] * x[v+e]  and  y[v] += c[v-e] * x[v-e]
            y = y + bcast(c) * win(ax, +1)
            y = y + bcast(shift_field(c, ca, -1)) * win(ax, -1)
        return y

    def matvec(self, x: jax.Array) -> jax.Array:
        """Batched SpMV: x [n_dom, lz, ly, lx] or [..., k] (trailing
        block axis).  See ``_windowed_matvec`` for the kernel form."""
        extra = x.ndim - self.diag.ndim
        if extra:
            def bcast(c):
                return c[(...,) + (None,) * extra]
        else:
            def bcast(c):
                return c
        return self._windowed_matvec(x, bcast, (1, 2, 3))

    def matvec_lead(self, x: jax.Array) -> jax.Array:
        """Batched SpMV with a LEADING block axis: x [n_dom, m, lz, ly,
        lx].  The block axis sits next to the domain axis instead of
        minor-most — TPU tiles put the MINOR axis on the 128 vector
        lanes, so a k=2 trailing block runs at 2/128 lane utilization;
        here the minor axis stays spatial (tst/probe_eigstep.py)."""
        nd = x.ndim
        return self._windowed_matvec(x, lambda c: c[:, None],
                                     (nd - 3, nd - 2, nd - 1))


@partial(jax.tree_util.register_dataclass,
         data_fields=["eoff", "ediag", "bcv", "diag", "mult", "emult",
                      "mask"],
         meta_fields=["grid_shape", "dom_grid", "pad"])
@dataclass(frozen=True)
class LocalFields:
    """Halo-gathered per-domain raw fields ([n_dom, lz, ly, lx] each)."""

    eoff: tuple              # per-axis edge off-diagonal VALUE at v
    ediag: tuple             # per-axis edge diag add (both endpoints)
    bcv: jax.Array           # nodal Dirichlet-ghost diag add
    diag: jax.Array          # assembled global diagonal
    mult: jax.Array          # node multiplicity (float)
    emult: tuple             # per-axis edge multiplicity (float, 0 absent)
    mask: jax.Array          # bool: real grid node
    grid_shape: tuple
    dom_grid: tuple
    pad: tuple


@partial(jax.jit,
         static_argnames=("grid_shape", "dom_grid", "pad", "bc_ax",
                          "inp_eps", "explicit", "dtype"))
def _gather_all(raw, mult_1d, emult_1d, grid_shape, dom_grid, pad,
                bc_ax, inp_eps, explicit, dtype):
    """The whole field pipeline in ONE program: derive stencil fields
    from the raw f64 upload, build the separable multiplicity fields from
    their tiny 1-D profiles, downcast, halo-gather, split into batches.

    One dispatch + a kappa-sized upload instead of 12 eager upload+gather
    round trips (~25 s of RPC + ~500 MB of host fill at 10M DOF)."""
    nx, ny, nz = grid_shape
    raw = raw.reshape((-1, nz, ny, nx))
    eoff, ediag, bcv, diag = _derive_stencil_fields(
        raw, grid_shape, bc_ax, inp_eps, explicit)
    mx, my, mz = (m.astype(raw.dtype) for m in mult_1d)
    mult = mz[:, None, None] * my[None, :, None] * mx[None, None, :]
    emult = []
    for a in range(3):
        fs = list(mult_1d)
        fs[a] = emult_1d[a]
        fs = [f.astype(raw.dtype) for f in fs]
        emult.append(fs[2][:, None, None] * fs[1][None, :, None]
                     * fs[0][None, None, :])
    ones = jnp.ones(raw.shape[1:], dtype)
    fields = [f.astype(dtype) for f in
              (*eoff, *ediag, bcv, diag, mult, *emult)] + [ones]
    stack = jnp.stack(fields, axis=-1).reshape(nz * ny * nx, 13)
    b = halo.to_batch(halo.halo_gather(stack, grid_shape, dom_grid, pad))
    return tuple(b[..., i] for i in range(13))


def gather_fields(sd: StructuredDecomposition, dtype=jnp.float32,
                  pad=None) -> LocalFields:
    """Host fields -> device halo-gathered local batches (one upload).

    ``pad`` overrides the gather window (e.g. sd.pad + 1 for the dilated
    boxes used by the coarse-operator assembly); the decomposition's
    multiplicity fields are global and unaffected by the window size."""
    g = sd.grid
    pad = sd.pad if pad is None else tuple(pad)

    explicit = g.edge_off_ is not None
    if explicit:
        raw = np.stack([np.asarray(g.edge_off(a), np.float64)
                        for a in range(3)]
                       + [np.asarray(g.edge_diag(a), np.float64)
                          for a in range(3)]
                       + [np.asarray(g.bc_val(), np.float64)])
    else:
        raw = np.asarray(g.kappa, np.float64)[None]
    bc_ax = 2 - (g.dim - 1)
    mult_1d = tuple(jnp.asarray(sd.axis_node_mult(a)) for a in range(3))
    emult_1d = tuple(jnp.asarray(sd.axis_edge_mult(a)) for a in range(3))
    parts = _gather_all(jnp.asarray(raw), mult_1d, emult_1d, g.shape,
                        sd.dom_grid, pad, bc_ax, float(g.inp_eps),
                        explicit, jnp.dtype(dtype))
    return LocalFields(eoff=parts[0:3], ediag=parts[3:6], bcv=parts[6],
                       diag=parts[7], mult=parts[8], emult=parts[9:12],
                       mask=parts[12] > 0,
                       grid_shape=g.shape, dom_grid=sd.dom_grid, pad=pad)


@partial(jax.jit, static_argnames=("pads", "out_pad"))
def _slice_inner_jit(f: LocalFields, pads, out_pad) -> LocalFields:
    sl = (slice(None),) + tuple(slice(1, -1) if p else slice(None)
                                for p in pads)

    def cut(x):
        return x[sl]

    return LocalFields(eoff=tuple(cut(e) for e in f.eoff),
                       ediag=tuple(cut(e) for e in f.ediag),
                       bcv=cut(f.bcv), diag=cut(f.diag),
                       mult=cut(f.mult),
                       emult=tuple(cut(e) for e in f.emult),
                       mask=cut(f.mask),
                       grid_shape=f.grid_shape, dom_grid=f.dom_grid,
                       pad=out_pad)


def slice_inner(f: LocalFields, sd: StructuredDecomposition) -> LocalFields:
    """View of dilated fields (gathered at sd.pad + 1) on the sd.pad
    window — one halo gather serves both geometries.  Jitted: 13 eager
    slices are 13 RPC round trips on a tunneled accelerator."""
    return _slice_inner_jit(f, (sd.pad[2], sd.pad[1], sd.pad[0]), sd.pad)


def _edge_ok(mask: jax.Array, a: int):
    """(lo_slice, hi_slice, both-endpoints-in-grid mask on the lo slice)."""
    ax = 3 - a
    nd = mask.ndim
    lo = [slice(None)] * nd
    hi = [slice(None)] * nd
    lo[ax] = slice(None, -1)
    hi[ax] = slice(1, None)
    lo, hi = tuple(lo), tuple(hi)
    return lo, hi, mask[lo] & mask[hi]


@jax.jit
def neumann_stencil(f: LocalFields) -> LocalStencil:
    """Weighted local Neumann operator (the MatIS local block).

    Jitted: one dispatch instead of ~50 eager primitive RPCs (each ~20 ms
    on a tunneled accelerator)."""
    diag = jnp.zeros_like(f.diag)
    offs = []
    for a in range(3):
        lo, hi, ok = _edge_ok(f.mask, a)
        if f.diag.shape[3 - a] == 1:
            offs.append(jnp.zeros_like(f.diag))
            continue
        # edge element / its membership weight; emult >= 1 wherever the
        # edge exists (overlap >= 1 covers every edge)
        wgt = jnp.where(ok & (f.emult[a][lo] > 0),
                        1.0 / jnp.maximum(f.emult[a][lo], 1.0), 0.0)
        off = jnp.zeros_like(f.diag)
        off = off.at[lo].set(wgt * f.eoff[a][lo])
        offs.append(off)
        cd = wgt * f.ediag[a][lo]
        diag = diag.at[lo].add(cd)
        diag = diag.at[hi].add(cd)
    # Dirichlet ghost elements: weight 1/node_mult (they belong to every
    # domain containing the node)
    diag = diag + f.bcv / jnp.maximum(f.mult, 1.0)
    diag = jnp.where(f.mask, diag, 1.0)       # pad identity
    return LocalStencil(diag=diag, offs=tuple(offs))


@jax.jit
def dirichlet_stencil(f: LocalFields) -> LocalStencil:
    """Assembled-A-restricted-to-box operator (the Dirichlet block)."""
    offs = []
    for a in range(3):
        lo, hi, ok = _edge_ok(f.mask, a)
        if f.diag.shape[3 - a] == 1:
            offs.append(jnp.zeros_like(f.diag))
            continue
        off = jnp.zeros_like(f.diag)
        off = off.at[lo].set(jnp.where(ok, f.eoff[a][lo], 0.0))
        offs.append(off)
    diag = jnp.where(f.mask, f.diag, 1.0)
    return LocalStencil(diag=diag, offs=tuple(offs))


@partial(jax.jit, static_argnames=("optim",))
def robin_stencil(f: LocalFields, optim: float) -> LocalStencil:
    """Dirichlet + optim * border-restricted Neumann (ORAS/SORAS)."""
    neu = neumann_stencil(f)
    dir_ = dirichlet_stencil(f)
    border = (f.mult > 1.0) & f.mask
    diag = dir_.diag + optim * jnp.where(
        border, neu.diag - jnp.where(f.mask, 0.0, 1.0), 0.0)
    offs = []
    for a in range(3):
        lo, hi, _ = _edge_ok(f.mask, a)
        if f.diag.shape[3 - a] == 1:
            offs.append(dir_.offs[a])
            continue
        sel = jnp.zeros_like(border)
        sel = sel.at[lo].set(border[lo] & border[hi])
        offs.append(dir_.offs[a] + optim * jnp.where(sel, neu.offs[a], 0.0))
    return LocalStencil(diag=diag, offs=tuple(offs))


# ---------------- plane-block form (for block-tridiag factorization) ------

def plane_axis(local_shape) -> int:
    """Axis (0=x, 1=y, 2=z) used as the plane-sweep direction: the LONGEST
    local extent, so the plane size s2 (= product of the two others) — and
    with it the Schur factor footprint n_loc * s2 — is minimal."""
    return int(np.argmax(local_shape))


def to_planes(x: jax.Array, axis: int) -> jax.Array:
    """[n_dom, lz, ly, lx(, k)] -> [n_dom, P, s2(, k)] with P = extent of
    `axis` and s2 = the flattened remaining two local axes."""
    extra = x.ndim - 4
    ax = 3 - axis
    order = (0, ax) + tuple(i for i in (1, 2, 3) if i != ax) \
        + tuple(4 + i for i in range(extra))
    xt = x.transpose(order)
    n_dom, p = xt.shape[0], xt.shape[1]
    s2 = xt.shape[2] * xt.shape[3]
    return xt.reshape((n_dom, p, s2) + x.shape[4:])


def from_planes(xp: jax.Array, axis: int, local_shape) -> jax.Array:
    """Inverse of to_planes."""
    sx, sy, sz = local_shape
    dims = {1: sz, 2: sy, 3: sx}          # local array axis -> extent
    ax = 3 - axis
    rest = [dims[i] for i in (1, 2, 3) if i != ax]
    extra = xp.shape[3:]
    n_dom, p = xp.shape[0], xp.shape[1]
    xt = xp.reshape((n_dom, p, rest[0], rest[1]) + extra)
    # forward perm: target = x.transpose(order), order = (0, ax, others...)
    order = (0, ax) + tuple(i for i in (1, 2, 3) if i != ax)
    inv = tuple(int(i) for i in np.argsort(np.asarray(order)))
    return xt.transpose(inv + tuple(4 + i for i in range(len(extra))))


def plane_coefficients(st: LocalStencil, axis: int):
    """Stencil -> (diag_p [n_dom, P, s2], in-plane offs [(arrays, strides)],
    inter-plane coupling c [n_dom, P-1, s2]).

    In-plane offsets are returned as (coeff [n_dom, P, s2], stride) pairs:
    coeff[..., r] couples plane slot r with r + stride (zero where the
    edge wraps a row or is absent)."""
    local = st.diag.shape[1:]            # (lz, ly, lx)
    dims_xyz = (local[2], local[1], local[0])   # extents per x/y/z axis
    diag_p = to_planes(st.diag, axis)
    inplane = []
    # the two non-plane axes, in the order they appear inside a plane
    # (to_planes keeps the remaining local axes in (z, y, x) order)
    rest_axes = [a for a in (2, 1, 0) if a != axis]   # e.g. plane=z -> [y, x]
    # fastest-varying axis inside the flattened plane is the LAST one
    strides = {}
    stride = 1
    for a in reversed(rest_axes):
        strides[a] = stride
        stride *= dims_xyz[a]
    for a in rest_axes:
        c = to_planes(st.offs[a], axis)   # coupling (r, r+stride[a])
        inplane.append((c, strides[a]))
    cax = to_planes(st.offs[axis], axis)  # [n_dom, P, s2]; last plane zero
    c = cax[:, :-1]
    return diag_p, inplane, c


def plane_blocks(diag_p, inplane):
    """Dense plane blocks D [n_dom, P, s2, s2] from plane coefficients —
    used by the factorization scan one plane at a time (callers slice)."""
    n_dom, p, s2 = diag_p.shape
    r = jnp.arange(s2)
    d = jnp.zeros((n_dom, p, s2, s2), diag_p.dtype)
    d = d.at[:, :, r, r].set(diag_p)
    for coeff, stride in inplane:
        rr = r[:-stride] if stride else r
        d = d.at[:, :, rr, rr + stride].add(coeff[:, :, :s2 - stride])
        d = d.at[:, :, rr + stride, rr].add(coeff[:, :, :s2 - stride])
    return d
