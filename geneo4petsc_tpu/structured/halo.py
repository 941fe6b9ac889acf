"""Structured halo exchange: global grid vector <-> overlapped local boxes.

The generic path's gather/scatter is an index gather + segment-sum over
flat gids (SubdomainBatch.gather/scatter_add) — correct anywhere, but at
10M DOF the 2.5 ns/element random-gather floor makes it the per-iteration
wall.  On a box decomposition the same exchange is pure STRUCTURED data
movement: reshape the grid into domain bricks, then pull each brick's halo
layers from its face/edge/corner neighbors with static shifts.  XLA lowers
this to contiguous copies (no gather units), and under shard_map the grid
shifts become `ppermute` neighbor hops over ICI — the literal analogue of
the reference's VecScatter forward/reverse (src/geneo.cpp:1845-1900).

Layout: global vectors are [nz, ny, nx] (x fastest); local batches are
[gz, gy, gx, lz, ly, lx] ("block-grid" form), flattened on request to
[n_dom, lz, ly, lx] with d = px + gx*(py + gy*pz).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _extend_axis(blocks: jax.Array, gaxis: int, laxis: int, pad: int
                 ) -> jax.Array:
    """Grow the local axis `laxis` by `pad` layers on both sides, pulling
    the data from the neighboring blocks along grid axis `gaxis` (zeros at
    the outer boundary)."""
    if pad == 0:
        return blocks
    zeros_nb = jnp.zeros_like(jax.lax.slice_in_dim(blocks, 0, 1,
                                                   axis=gaxis))
    # neighbor block arrays (shifted along the DOMAIN-grid axis)
    left_nb = jnp.concatenate(
        [zeros_nb, jax.lax.slice_in_dim(blocks, 0, blocks.shape[gaxis] - 1,
                                        axis=gaxis)], axis=gaxis)
    right_nb = jnp.concatenate(
        [jax.lax.slice_in_dim(blocks, 1, blocks.shape[gaxis],
                              axis=gaxis), zeros_nb], axis=gaxis)
    n = blocks.shape[laxis]
    lo = jax.lax.slice_in_dim(left_nb, n - pad, n, axis=laxis)
    hi = jax.lax.slice_in_dim(right_nb, 0, pad, axis=laxis)
    return jnp.concatenate([lo, blocks, hi], axis=laxis)


@partial(jax.jit, static_argnums=(1, 2, 3))
def halo_gather(x: jax.Array, grid_shape, dom_grid, pad) -> jax.Array:
    """[nz*ny*nx] (or [..., k]) -> block-grid local boxes
    [gz, gy, gx, lz, ly, lx, (k)] including `pad` halo layers per divided
    axis.  Out-of-grid halo slots read 0 (the generic dump-slot
    convention).  VecScatter forward/INSERT."""
    nx, ny, nz = grid_shape
    gx, gy, gz = dom_grid
    px, py, pz = pad
    trailing = x.shape[1:]           # optional block-vector axes
    xg = x.reshape((nz, ny, nx) + trailing)
    b = xg.reshape((gz, nz // gz, gy, ny // gy, gx, nx // gx) + trailing)
    # -> [gz, gy, gx, iz, iy, ix, ...]
    perm = (0, 2, 4, 1, 3, 5) + tuple(6 + i for i in range(len(trailing)))
    b = b.transpose(perm)
    # grow halos axis by axis; corners compose automatically because each
    # extension operates on the already-extended neighbor data
    b = _extend_axis(b, gaxis=2, laxis=5, pad=px)   # x
    b = _extend_axis(b, gaxis=1, laxis=4, pad=py)   # y
    b = _extend_axis(b, gaxis=0, laxis=3, pad=pz)   # z
    return b


def halo_scatter_add(xl: jax.Array, grid_shape, dom_grid, pad) -> jax.Array:
    """Linear transpose of halo_gather: overlapped local boxes -> global
    sum [n_dof(, k)].  VecScatter reverse/ADD."""
    nx, ny, nz = grid_shape
    n = nx * ny * nz
    trailing = xl.shape[6:]
    proto = jnp.zeros((n,) + trailing, xl.dtype)
    t = jax.linear_transpose(
        lambda v: halo_gather(v, grid_shape, dom_grid, pad), proto)
    (y,) = t(xl)
    return y


def to_batch(b: jax.Array) -> jax.Array:
    """Block-grid [gz, gy, gx, lz, ly, lx, ...] -> [n_dom, lz, ly, lx, ...]."""
    gz, gy, gx = b.shape[:3]
    return b.reshape((gz * gy * gx,) + b.shape[3:])


def from_batch(xb: jax.Array, dom_grid) -> jax.Array:
    gx, gy, gz = dom_grid
    return xb.reshape((gz, gy, gx) + xb.shape[1:])
