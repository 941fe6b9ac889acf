"""General batched local solvers for the structured scale path.

The reference factors EVERY subdomain operator with MUMPS sparse LU
(directLocalSolve, src/geneo.cpp:94-124) — any sparsity, any coefficient
field.  The TPU-native replacements, in order of preference:

  1. fast diagonalization (fdm.py)    exact, O(L^2) memory — but only for
     separable kappa-derived Laplacian stencils (ASM/RAS/SRAS level 1);
  2. block-tridiagonal Schur factors (block_tridiag.py)   exact for ANY
     7-point stencil (heat, non-separable kappa, Robin blocks), O(N * s2)
     memory — feasible up to moderate plane sizes;
  3. surrogate-FDM-preconditioned batched PCG (this module)   inexact for
     ANY SPD stencil at ANY size, O(N) memory: Jacobi symmetric scaling
     strips the coefficient contrast, a separable Kronecker-sum surrogate
     (per-axis masked means of the scaled couplings) is FDM-factored
     exactly, and a few preconditioned CG iterations per apply close the
     gap.  This is inexact Schwarz: outer iteration counts can deviate
     slightly from the exact-solve reference (documented; the outer Krylov
     should use flexible CG, krylov/cg.py flexible=True).

``select_local_solver`` implements the policy.  Every solver exposes
``solve(x)`` on [n_dom, lz, ly, lx] or [..., k] blocks with inert pad
slots, so they are drop-in interchangeable in StructuredGenEO.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import fdm
from . import local_ops as lo
from .block_tridiag import BlockTridiagFactor, bt_factor, bt_solve


# ---------------- stencil algebra ----------------

def diag_congruence(st: lo.LocalStencil, d: jax.Array) -> lo.LocalStencil:
    """D A D for a diagonal field d [n_dom, lz, ly, lx]."""
    offs = []
    for a, c in enumerate(st.offs):
        ax = 3 - a
        if c.shape[ax] == 1:
            offs.append(c)
            continue
        lo_s = [slice(None)] * 4
        hi_s = [slice(None)] * 4
        lo_s[ax] = slice(None, -1)
        hi_s[ax] = slice(1, None)
        prod = jnp.zeros_like(c)
        prod = prod.at[tuple(lo_s)].set(d[tuple(lo_s)] * d[tuple(hi_s)])
        offs.append(c * prod)
    return lo.LocalStencil(diag=st.diag * d * d, offs=tuple(offs))


def add_scaled(a: lo.LocalStencil, b: lo.LocalStencil,
               beta: float) -> lo.LocalStencil:
    """A + beta * B (same sparsity pattern)."""
    return lo.LocalStencil(
        diag=a.diag + beta * b.diag,
        offs=tuple(ca + beta * cb for ca, cb in zip(a.offs, b.offs)))


# ---------------- block-tridiagonal exact solver ----------------

@partial(jax.tree_util.register_dataclass,
         data_fields=["fac"], meta_fields=["axis", "local_shape"])
@dataclass(frozen=True)
class BTSolver:
    """Exact batched direct solver: block-Thomas factorization over planes
    of the longest local axis (the MUMPS replacement for non-separable
    stencils at moderate plane sizes)."""

    fac: BlockTridiagFactor
    axis: int
    local_shape: tuple

    def solve(self, x: jax.Array) -> jax.Array:
        xp = lo.to_planes(x, self.axis)
        up = bt_solve(self.fac, xp)
        return lo.from_planes(up, self.axis, self.local_shape)


def bt_bytes(n_dom: int, local_shape, itemsize: int = 4) -> int:
    """Factor memory of the block-tridiag route (W blocks dominate)."""
    axis = lo.plane_axis(local_shape)
    p = local_shape[axis]
    s2 = int(np.prod(local_shape)) // p
    return n_dom * p * s2 * s2 * itemsize


def bt_build(st: lo.LocalStencil, local_shape,
             factor_dtype=None) -> BTSolver:
    """Factor a batched 7-point stencil operator exactly."""
    axis = lo.plane_axis(local_shape)
    diag_p, inplane, c = lo.plane_coefficients(st, axis)
    fac = bt_factor(diag_p, inplane, c, factor_dtype=factor_dtype)
    return BTSolver(fac=fac, axis=axis, local_shape=tuple(local_shape))


# ---------------- surrogate FDM (Jacobi-scaled separable projection) -----

@partial(jax.tree_util.register_dataclass,
         data_fields=["fac", "scale", "maskf"], meta_fields=[])
@dataclass(frozen=True)
class ScaledFDM:
    """S * FDM(surrogate)^-1 * S — a LINEAR SPD approximate inverse of a
    general stencil operator.  Used directly as the LOBPCG shift-invert
    preconditioner (only preconditioner quality matters there,
    src/geneo.cpp:635-650) and as the inner preconditioner of PCGSolver."""

    fac: fdm.FDMFactor
    scale: jax.Array          # [n_dom, lz, ly, lx] = 1/sqrt(diag)
    maskf: jax.Array

    def solve(self, x: jax.Array) -> jax.Array:
        extra = x.ndim - self.scale.ndim
        s = self.scale[(...,) + (None,) * extra] if extra else self.scale
        m = self.maskf[(...,) + (None,) * extra] if extra else self.maskf
        return self.fac.solve(x * s) * s * m


def surrogate_fdm(st: lo.LocalStencil, maskf: jax.Array,
                  shift: float = 0.0, dtype=None) -> ScaledFDM:
    """Separable Kronecker-sum surrogate of a general SPD stencil.

    Jacobi symmetric scaling (S = diag(A)^-1/2) first: the scaled operator
    has unit diagonal and couplings bounded by diagonal dominance, so
    per-axis MASKED MEANS of the scaled couplings give 1-D tridiagonal
    operators T_a whose Kronecker sum is spectrally close to S A S even
    under high coefficient contrast.  The unit diagonal is split between
    axes proportionally to each axis's local coupling strength, which
    keeps every T_a diagonally dominant (PSD) by the triangle inequality.
    """
    dtype = dtype or st.diag.dtype
    n_dom = st.diag.shape[0]
    local = st.diag.shape[1:]                 # (lz, ly, lx)
    maskb = maskf > 0
    scale = jnp.where(maskb, 1.0 / jnp.sqrt(jnp.abs(st.diag)), 1.0)
    sh = diag_congruence(st, scale)           # unit diagonal on real slots

    # per-axis coupling-strength field q_a(v) = |off up| + |off down|
    qs = []
    for a in range(3):
        ax = 3 - a
        c = jnp.abs(sh.offs[a])
        if c.shape[ax] == 1:
            qs.append(jnp.zeros_like(c))
            continue
        up = c
        down = jnp.concatenate(
            [jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=ax)),
             jax.lax.slice_in_dim(c, 0, c.shape[ax] - 1, axis=ax)], axis=ax)
        qs.append(up + down)
    q_tot = qs[0] + qs[1] + qs[2]
    n_active = sum(1 for a in range(3) if local[2 - a] > 1)
    n_active = max(n_active, 1)
    share = [jnp.where(q_tot > 0, q / jnp.maximum(q_tot, 1e-30),
                       1.0 / n_active) for q in qs]

    mnum = maskf
    t_diag, t_off, dd = [], [], []
    for a in range(3):
        ax = 3 - a
        ll = local[2 - a]                     # extent along axis a
        red = tuple(i for i in (1, 2, 3) if i != ax)
        cnt = jnp.maximum(jnp.sum(mnum, axis=red), 1.0)      # [n_dom, L]
        td = jnp.sum(share[a] * mnum, axis=red) / cnt
        td = jnp.where(jnp.sum(mnum, axis=red) > 0, td, 1.0)
        if ll > 1:
            lo_s = [slice(None)] * 4
            hi_s = [slice(None)] * 4
            lo_s[ax] = slice(None, -1)
            hi_s[ax] = slice(1, None)
            me = mnum[tuple(lo_s)] * mnum[tuple(hi_s)]
            cnt_e = jnp.maximum(jnp.sum(me, axis=red), 1.0)
            to = jnp.sum(sh.offs[a][tuple(lo_s)] * me, axis=red) / cnt_e
        else:
            to = jnp.zeros((n_dom, 0), dtype)
        t_diag.append(np.asarray(td, np.float64))
        t_off.append(np.asarray(to, np.float64))
        dd.append(np.ones((n_dom, ll)))
    ax_ops = fdm.AxisOps(t_diag=tuple(t_diag), t_off=tuple(t_off),
                         d=tuple(dd))
    fac = fdm.fdm_factor(ax_ops, shift=shift, dtype=dtype)
    return ScaledFDM(fac=fac, scale=scale.astype(dtype), maskf=maskf)


# ---------------- inexact PCG local solver ----------------

@partial(jax.tree_util.register_dataclass,
         data_fields=["st", "pre", "maskf"],
         meta_fields=["rtol", "max_it"])
@dataclass(frozen=True)
class PCGSolver:
    """Inexact batched local solve: preconditioned CG on the stencil
    operator, all domains (and RHS columns) advanced in lockstep until the
    worst relative residual reaches ``rtol`` — the inexact-Schwarz
    replacement for MUMPS LU when both FDM and block-tridiag are out
    (non-separable operators at 10M+ DOF).  Fully jit-able (lax.while_loop
    with a batched max-residual exit)."""

    st: lo.LocalStencil
    pre: ScaledFDM
    maskf: jax.Array
    rtol: float
    max_it: int

    def solve(self, x: jax.Array) -> jax.Array:
        nd = self.maskf.ndim                  # block rank (scalar: 4)
        extra = x.ndim - nd
        m = self.maskf[(...,) + (None,) * extra] if extra else self.maskf
        b = x * m
        dims = tuple(range(1, nd))            # reduce over the block dims

        def dots(u, v):
            return jnp.sum(u * v, axis=dims)  # [n_dom(, k)]

        bn = jnp.sqrt(dots(b, b))
        tol2 = (self.rtol * jnp.maximum(bn, jnp.finfo(b.dtype).tiny)) ** 2

        def amul(v):
            return self.st.matvec(v) * m

        r0 = b
        z0 = self.pre.solve(r0)
        rz0 = dots(r0, z0)

        def ex(a):
            """[n_dom(, k)] -> broadcastable against the block shape."""
            sl = (slice(None),) + (None,) * (nd - 1)
            return a[sl] if extra == 0 else a[sl + (slice(None),)]

        # carry only (u, r, p, rz): the preconditioned residual z is
        # recomputed in the body — one fewer block-sized while-loop
        # carry (double-buffered by XLA, ~1 GB at the 10M elastic bench)
        def cond(state):
            _u, r, _p, _rz, it = state
            rr = dots(r, r)
            return (it < self.max_it) & jnp.any(rr > tol2)

        def body(state):
            u, r, p, rz, it = state
            w = amul(p)
            pw = dots(p, w)
            alpha = jnp.where(pw > 0, rz / jnp.maximum(pw, 1e-30), 0.0)
            u = u + ex(alpha) * p
            r = r - ex(alpha) * w
            z = self.pre.solve(r)
            rz2 = dots(r, z)
            beta = jnp.where(rz > 0, rz2 / jnp.maximum(rz, 1e-30), 0.0)
            p = z + ex(beta) * p
            return u, r, p, rz2, it + 1

        u0 = jnp.zeros_like(b)
        u, _r, _p, _rz, _it = jax.lax.while_loop(
            cond, body, (u0, r0, z0, rz0, jnp.int32(0)))
        return u * m


# ---------------- policy ----------------

def select_local_solver(st: lo.LocalStencil, maskf: jax.Array,
                        local_shape, *, shift: float = 0.0,
                        rtol: float = 1e-8, max_it: int = 200,
                        bt_budget_bytes: int | None = None,
                        dtype=None):
    """Exact block-tridiag when the factor fits, inexact PCG otherwise.

    Returns (solver, exact: bool).  ``shift`` adds shift * diag(A) before
    factoring (used for shift-invert preconditioners)."""
    import os
    dtype = dtype or st.diag.dtype
    if bt_budget_bytes is None:
        bt_budget_bytes = int(float(os.environ.get(
            "GENEO_BT_BUDGET_GB", "2")) * 1e9)
    if shift:
        st = lo.LocalStencil(diag=st.diag * (1.0 + shift), offs=st.offs)
    n_dom = st.diag.shape[0]
    if bt_bytes(n_dom, local_shape,
                jnp.dtype(dtype).itemsize) <= bt_budget_bytes:
        return bt_build(st, local_shape), True
    pre = surrogate_fdm(st, maskf, shift=0.0, dtype=dtype)
    return PCGSolver(st=st, pre=pre, maskf=maskf, rtol=rtol,
                     max_it=max_it), False
