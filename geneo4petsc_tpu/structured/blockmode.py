"""Block-layout iteration: run the inner Krylov loop in domain-brick
order so the per-iteration preconditioner apply needs NO global<->block
transposes.

Why.  The roofline (BENCH_r04) measured the full ``pc_apply`` at 18.7 ms
= 47 GB/s (5.7% of v5e HBM peak) at 10M DOF while its FDM component runs
at 293 GB/s — the surrounding ``halo_gather``/``halo_scatter_add`` were
the wall, and the expensive part of those is the 6-D block TRANSPOSE
between the global [nz, ny, nx] vector layout and the [gz, gy, gx, iz,
iy, ix] brick layout (the halo extension itself only moves pad layers).
The transposes are pure permutations — running the WHOLE inner CG on
permuted (block-major) flat vectors makes them loop-invariant: one
permutation of the residual into brick order per inner solve (per outer
refinement restart, <= 14x), zero per iteration.  The reference has no
analogue because PETSc vectors are already distribution-native; this is
the TPU equivalent of choosing the right Vec layout once
(src/geneo.cpp:1845-1900 VecScatter contexts are built once, too).

Semantics are IDENTICAL to StructuredGenEO (bit-equal operators):

  * matvec      = assembled stencil on 1-layer-dilated bricks (the
                  Dirichlet-restriction semantics give exactly A's rows
                  at every interior-core node), core slice of the
                  dilated apply;
  * level-1     = brick halo extension by ``pad`` -> the SAME batched
                  L1 factor -> fold-back (linear transpose of the
                  extension);
  * level-2 Q   = the SAME Z/E factors over extension/fold instead of
                  gather/scatter.

Enabled per-solve (solve_structured block_layout=True, or env
GENEO_BLOCK_LAYOUT=1); single-device only — the sharded path keeps the
z-slab layout whose halos already lower to CollectivePermute.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from . import halo
from . import local_ops as lo
from .decompose import StructuredDecomposition
from .geneo import StructuredGenEO


def extend_blocks(b: jax.Array, pad) -> jax.Array:
    """Grow brick-form [gz, gy, gx, iz, iy, ix(, k)] by ``pad`` halo
    layers per divided axis, moving ONLY the pad layers (zeros at the
    grid boundary).  Linear-equal to halo_gather's extension stage."""
    for gaxis, laxis, p in ((2, 5, pad[0]), (1, 4, pad[1]),
                            (0, 3, pad[2])):
        if p == 0:
            continue
        g = b.shape[gaxis]
        nl = b.shape[laxis]
        lo_src = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(b, 0, g - 1, axis=gaxis),
            nl - p, nl, axis=laxis)
        hi_src = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(b, 1, g, axis=gaxis), 0, p, axis=laxis)
        zshape = list(lo_src.shape)
        zshape[gaxis] = 1
        z = jnp.zeros(zshape, b.dtype)
        b = jnp.concatenate(
            [jnp.concatenate([z, lo_src], axis=gaxis), b,
             jnp.concatenate([hi_src, z], axis=gaxis)], axis=laxis)
    return b


def fold_blocks(xe: jax.Array, pad) -> jax.Array:
    """Linear TRANSPOSE of extend_blocks, written with in-place slice
    adds: each brick's halo layers add back into the neighbor they were
    read from.  Requires inner >= 2*pad per divided axis (true for every
    supported decomposition: overlap <= inner/2).

    This explicit form is the REFERENCE implementation (used by the
    parity tests); production folding goes through ``fold_blocks_lt``
    below — the jax.linear_transpose-derived fold measured FASTER on the
    10M headline shape (5.55 vs 7.31 ms per local_solve,
    tst/probe_fold.py on v5e; both bit-identical)."""
    # reverse the extension's axis order (x, y, z) -> fold z, y, x
    for gaxis, laxis, p in ((0, 3, pad[2]), (1, 4, pad[1]),
                            (2, 5, pad[0])):
        if p == 0:
            continue
        g = xe.shape[gaxis]
        ne = xe.shape[laxis]
        nl = ne - 2 * p
        core = jax.lax.slice_in_dim(xe, p, p + nl, axis=laxis)
        lo_h = jax.lax.slice_in_dim(xe, 0, p, axis=laxis)
        hi_h = jax.lax.slice_in_dim(xe, p + nl, ne, axis=laxis)
        # brick i's LOW halo came from brick i-1's tail; its HIGH halo
        # from brick i+1's head (boundary bricks' outer halos are zero
        # by construction and drop off the shifted slices)
        lo_c = jax.lax.slice_in_dim(lo_h, 1, g, axis=gaxis)
        hi_c = jax.lax.slice_in_dim(hi_h, 0, g - 1, axis=gaxis)
        idx_head = [slice(None)] * xe.ndim
        idx_head[laxis] = slice(0, p)
        idx_head[gaxis] = slice(1, g)
        idx_tail = [slice(None)] * xe.ndim
        idx_tail[laxis] = slice(nl - p, nl)
        idx_tail[gaxis] = slice(0, g - 1)
        core = core.at[tuple(idx_head)].add(hi_c)
        core = core.at[tuple(idx_tail)].add(lo_c)
        xe = core
    return xe


def fold_blocks_lt(xe: jax.Array, pad) -> jax.Array:
    """Production fold: the linear transpose of ``extend_blocks`` as
    derived by jax.linear_transpose (concat -> slice adjoints that XLA
    fuses better than the hand-written dynamic-update-slice adds;
    measured 5.55 vs 7.31 ms per 10M local_solve, tst/probe_fold.py).
    Bit-identical to ``fold_blocks`` (parity pinned in
    tests/test_blockmode.py)."""
    core_shape = list(xe.shape)
    for laxis, p in ((3, pad[2]), (4, pad[1]), (5, pad[0])):
        core_shape[laxis] -= 2 * p
    primal = jax.ShapeDtypeStruct(tuple(core_shape), xe.dtype)
    (y,) = jax.linear_transpose(lambda w: extend_blocks(w, pad),
                                primal)(xe)
    return y


def to_block_order(x: jax.Array, grid_shape, dom_grid) -> jax.Array:
    """Global flat [n(, k)] -> brick [gz, gy, gx, iz, iy, ix(, k)] —
    the one transpose, paid per inner solve."""
    return halo.halo_gather(x, grid_shape, dom_grid, (0, 0, 0))


def from_block_order(b: jax.Array, grid_shape) -> jax.Array:
    """Inverse of to_block_order (pure permutation)."""
    nx, ny, nz = grid_shape
    gz, gy, gx, iz, iy, ix = b.shape[:6]
    trailing = b.shape[6:]
    perm = (0, 3, 1, 4, 2, 5) + tuple(6 + i for i in range(len(trailing)))
    xg = b.transpose(perm).reshape((nz, ny, nx) + trailing)
    return xg.reshape((nz * ny * nx,) + trailing)


@partial(jax.tree_util.register_dataclass,
         data_fields=["pc", "st_ext"], meta_fields=[])
@dataclass(frozen=True)
class BlockGenEO:
    """StructuredGenEO twin operating on block-major FLAT vectors.

    ``st_ext``: assembled (Dirichlet-restriction) stencil on the
    1-layer-dilated non-overlapping bricks — every interior-core row of
    A is complete there, so ``core(st_ext.matvec(extend1(x)))`` IS the
    global SpMV in brick order.
    """

    pc: StructuredGenEO
    st_ext: lo.LocalStencil

    # ---------- layout plumbing ----------
    @property
    def _shape6(self):
        gx, gy, gz = self.pc.dom_grid
        nx, ny, nz = self.pc.grid_shape
        return (gz, gy, gx, nz // gz, ny // gy, nx // gx)

    def _unflat(self, xf):
        s6 = self._shape6
        return xf.reshape(s6 + xf.shape[1:])

    def _flat(self, xb):
        n = 1
        for d in self._shape6:
            n *= d
        return xb.reshape((n,) + xb.shape[6:])

    def to_block(self, x):
        return self._flat(to_block_order(x, self.pc.grid_shape,
                                         self.pc.dom_grid))

    def from_block(self, xf):
        return from_block_order(self._unflat(xf), self.pc.grid_shape)

    @property
    def x0(self):
        return self.to_block(self.pc.x0)

    @property
    def eff_hybrid(self):
        return self.pc.eff_hybrid

    @property
    def l1_exact(self):
        return self.pc.l1_exact

    # ---------- operators (flat block-major signatures) ----------
    def matvec(self, xf: jax.Array) -> jax.Array:
        """Global SpMV in brick order: extend ONE layer (zero halos on
        non-divided axes), then the 7-point operator as pure shifted
        core windows of the extended array — elementwise FMA streams
        only, no in-place adds, no concats (the LocalStencil ``.at``
        form measured 8.9 ms vs 2.5 ms for the global stencil at 10M;
        this form is the same fused-window pattern the global stencil
        compiles to)."""
        xb = self._unflat(xf)
        xe = halo.to_batch(extend_blocks(xb, (1, 1, 1)))
        st = self.st_ext

        def win(arr, ax=None, off=0):
            idx = [slice(None)] * 4
            for a4 in (1, 2, 3):
                o = off if a4 == ax else 0
                idx[a4] = slice(1 + o, arr.shape[a4] - 1 + o)
            return arr[tuple(idx)]

        y = win(st.diag) * win(xe)
        for a in range(3):              # stencil axis (x, y, z)
            ax = 3 - a                  # array axis in [d, z, y, x]
            c = st.offs[a]
            y = y + win(c) * win(xe, ax, +1)          # A[v, v+e_a]
            y = y + win(c, ax, -1) * win(xe, ax, -1)  # A[v, v-e_a]
        return self._flat(halo.from_batch(y, self.pc.dom_grid))

    def _extend(self, xb):
        return halo.to_batch(extend_blocks(xb, self.pc.pad))

    def _fold(self, ub):
        return fold_blocks_lt(halo.from_batch(ub, self.pc.dom_grid),
                              self.pc.pad)

    def apply_q(self, xf: jax.Array) -> jax.Array:
        pc = self.pc
        xl = self._extend(self._unflat(xf))
        ztx = jnp.einsum("dzyxk,dzyx->dk", pc.z, xl,
                         preferred_element_type=xf.dtype,
                         precision="highest")
        w = jax.ops.segment_sum(ztx.ravel(), pc.colids.ravel(),
                                num_segments=pc.dim_e + 1)[:-1]
        w = pc.e_evecs @ (pc.e_eig_inv * (pc.e_evecs.T @ w))
        wp = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])
        wl = wp[pc.colids]
        yb = jnp.einsum("dzyxk,dk->dzyx", pc.z, wl,
                        preferred_element_type=xf.dtype,
                        precision="highest")
        return self._flat(self._fold(yb))

    def _local_solve(self, xf: jax.Array) -> jax.Array:
        pc = self.pc
        xl = self._extend(self._unflat(xf))
        if pc.lvl1 in ("RAS", "SRAS", "ORAS", "SORAS"):
            xl = xl * pc.pou
        ub = pc.l1.solve(xl)
        if pc.lvl1 in ("SRAS", "SORAS"):
            ub = ub * pc.pou
        ub = ub * pc.maskf
        return self._flat(self._fold(ub))

    def apply(self, xf: jax.Array) -> jax.Array:
        pc = self.pc
        if pc.lvl2 and not pc.eff_hybrid:
            y = self.apply_q(xf)
        else:
            y = jnp.zeros_like(xf)
        t = xf
        if pc.hybrid and not pc.eff_hybrid:
            t = t - self.matvec(y)
        t = self._local_solve(t)
        if pc.hybrid:
            t = t - self.apply_q(self.matvec(t))
        return y + t

    def __call__(self, xf):
        return self.apply(xf)


def build_block_mode(pc: StructuredGenEO,
                     sd: StructuredDecomposition,
                     dtype=jnp.float32) -> BlockGenEO:
    """Assemble the 1-dilated brick stencil and wrap the preconditioner.
    One extra device field set (~8 arrays over the 1-dilated bricks);
    every factor (L1, Z, E) is shared with ``pc`` by reference."""
    for a in range(3):
        if sd.dom_grid[a] > 1 and sd.inner[a] < 2 * sd.pad[a]:
            raise ValueError(
                "block layout requires inner >= 2*overlap per divided "
                f"axis (axis {a}: inner {sd.inner[a]}, pad {sd.pad[a]})")
    # gather_fields with a 1-layer pad window on EVERY axis (the matvec
    # extends all axes uniformly; non-divided axes get zero halos and
    # zero couplings there).  The Dirichlet stencil uses only the
    # assembled fields + mask, so the original decomposition serves
    # (its multiplicity fields are ignored here).
    f1 = lo.gather_fields(sd, dtype=dtype, pad=(1, 1, 1))
    st_ext = lo.dirichlet_stencil(f1)
    return BlockGenEO(pc=pc, st_ext=st_ext)
