"""Pallas TPU kernels for the Schwarz hot ops.

The per-iteration inner loop of the level-1 apply is, per subdomain:
weight by the partition of unity (RAS), multiply by the precomputed block
inverse (MXU), weight again (SRAS), mask the padding.  XLA emits this as
several HLOs; the Pallas kernel fuses the whole chain with the inverse
blocks streamed HBM->VMEM once and the batched matmul on the MXU — one
kernel launch for the entire subdomain batch.

Grid: one program per BLOCK of 8 subdomains (the TPU sublane quantum:
Mosaic requires the last two block dims divisible by (8, 128) or equal to
the array dims, so a 1-domain block of a [n_dom, n] operand cannot
lower — measured on v5e; the round-1 per-domain grid only ran in
interpreter mode).  n (n_max) is padded to the f32 tile quantum by the
assembly layer; n_dom is padded to 8 here and the result sliced back.

Kernels run on TPU; tests exercise them in interpreter mode on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DB = 8  # domains per program (f32 sublane quantum)


def _resolve_interpret(interpret) -> bool:
    """None -> compile on TPU, interpret everywhere else (CPU/axon dev
    runs would otherwise fail with 'Only interpret mode is supported')."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _pad_dom(x, n_pad):
    if x.shape[0] == n_pad:
        return x
    pad = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _make_fused_kernel(pre: bool, post: bool):
    """Specialize the kernel on the (static) RAS/SRAS weighting flags."""

    def kernel(inv_ref, d_ref, mask_ref, x_ref, o_ref):
        """o = mask * (D^post . (Minv @ (D^pre . x))), 8 subdomains.

        The batched block-inverse product is BANDWIDTH-bound (2 flops per
        4 streamed bytes of inverse), so the MXU buys nothing — and
        Mosaic cannot lower a batched dot with an empty lhs
        non-contracting set anyway.  A VPU broadcast-multiply +
        lane-axis reduction is the speed-of-light formulation."""
        x = x_ref[:]                              # [B, n]
        if pre:
            x = x * d_ref[:]
        # y[b, i] = sum_j inv[b, i, j] x[b, j]
        y = jnp.sum(inv_ref[:] * x[:, None, :], axis=2)
        if post:
            y = y * d_ref[:]
        o_ref[:] = jnp.where(mask_ref[:], y, 0.0)

    return kernel


@partial(jax.jit, static_argnames=("pre", "post", "interpret"))
def fused_local_solve(inv: jax.Array, d: jax.Array, mask: jax.Array,
                      xl: jax.Array, pre: bool = False, post: bool = False,
                      interpret: bool | None = None) -> jax.Array:
    """Batched fused (D.)Minv(D.) apply.

    inv  [n_dom, n, n]  precomputed block inverses (l1_kind='inv')
    d    [n_dom, n]     partition of unity
    mask [n_dom, n]     real-slot mask
    xl   [n_dom, n]     gathered local copies
    pre/post: RAS / SRAS weighting flags (applyLevel1, geneo.cpp:1991-2002)
    """
    interpret = _resolve_interpret(interpret)
    n_dom, n = xl.shape
    dtype = xl.dtype
    n_pad = ((n_dom + _DB - 1) // _DB) * _DB
    inv_p = _pad_dom(inv, n_pad)
    d_p = _pad_dom(d, n_pad)
    mask_p = _pad_dom(mask, n_pad)
    xl_p = _pad_dom(xl, n_pad)
    out = pl.pallas_call(
        _make_fused_kernel(pre, post),
        grid=(n_pad // _DB,),
        in_specs=[
            pl.BlockSpec((_DB, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_DB, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_DB, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_DB, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_DB, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n), dtype),
        interpret=interpret,
    )(inv_p, d_p, mask_p, xl_p)
    return out[:n_dom]


def _block_matvec_kernel(a_ref, x_ref, o_ref):
    """o = A_d @ x_d for 8 subdomains (the MatIS local product)."""
    o_ref[:] = jnp.sum(a_ref[:] * x_ref[:][:, None, :], axis=2)


@partial(jax.jit, static_argnames=("interpret",))
def block_matvec(a: jax.Array, xl: jax.Array,
                 interpret: bool | None = None) -> jax.Array:
    """Batched per-domain A_d @ x_d (the compute core of the MatIS SpMV)."""
    interpret = _resolve_interpret(interpret)
    n_dom, n = xl.shape
    n_pad = ((n_dom + _DB - 1) // _DB) * _DB
    a_p = _pad_dom(a, n_pad)
    xl_p = _pad_dom(xl, n_pad)
    out = pl.pallas_call(
        _block_matvec_kernel,
        grid=(n_pad // _DB,),
        in_specs=[
            pl.BlockSpec((_DB, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_DB, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_DB, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n), xl.dtype),
        interpret=interpret,
    )(a_p, xl_p)
    return out[:n_dom]
