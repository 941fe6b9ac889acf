"""Pallas TPU kernels for the Schwarz hot ops.

The per-iteration inner loop of the level-1 apply is, per subdomain:
weight by the partition of unity (RAS), multiply by the precomputed block
inverse (MXU), weight again (SRAS), mask the padding.  XLA emits this as
several HLOs; the Pallas kernel fuses the whole chain with the inverse
block streamed HBM->VMEM once per domain and the matmul on the MXU —
one kernel launch for the entire subdomain batch.

Grid: one program per subdomain; block specs map [n_dom, n, n] inverses
and [n_dom, n] local vectors to per-domain VMEM tiles.  n (n_max) is
padded to the f32 tile quantum by the assembly layer.

Kernels run on TPU; tests exercise them in interpreter mode on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_fused_kernel(pre: bool, post: bool):
    """Specialize the kernel on the (static) RAS/SRAS weighting flags."""

    def kernel(inv_ref, d_ref, mask_ref, x_ref, o_ref):
        """o = mask * (D^post . (Minv @ (D^pre . x))) for one subdomain."""
        x = x_ref[:]                              # [1, n]
        if pre:
            x = x * d_ref[:]
        y = jax.lax.dot_general(
            x, inv_ref[0],                        # [1, n] x [n, n]
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=x.dtype)
        if post:
            y = y * d_ref[:]
        o_ref[:] = jnp.where(mask_ref[:], y, 0.0)

    return kernel


@partial(jax.jit, static_argnames=("pre", "post", "interpret"))
def fused_local_solve(inv: jax.Array, d: jax.Array, mask: jax.Array,
                      xl: jax.Array, pre: bool = False, post: bool = False,
                      interpret: bool = False) -> jax.Array:
    """Batched fused (D.)Minv(D.) apply.

    inv  [n_dom, n, n]  precomputed block inverses (l1_kind='inv')
    d    [n_dom, n]     partition of unity
    mask [n_dom, n]     real-slot mask
    xl   [n_dom, n]     gathered local copies
    pre/post: RAS / SRAS weighting flags (applyLevel1, geneo.cpp:1991-2002)
    """
    n_dom, n = xl.shape
    dtype = xl.dtype
    return pl.pallas_call(
        _make_fused_kernel(pre, post),
        grid=(n_dom,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_dom, n), dtype),
        interpret=interpret,
    )(inv, d, mask, xl)


def _block_matvec_kernel(a_ref, x_ref, o_ref):
    """o = A_d @ x_d for one subdomain (the MatIS local product)."""
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], a_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=x_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def block_matvec(a: jax.Array, xl: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """Batched per-domain A_d @ x_d (the compute core of the MatIS SpMV)."""
    n_dom, n = xl.shape
    return pl.pallas_call(
        _block_matvec_kernel,
        grid=(n_dom,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_dom, n), xl.dtype),
        interpret=interpret,
    )(a, xl)
