"""Batched dense linear algebra for subdomain-local solves.

The reference delegates per-domain factorizations/solves to MUMPS (LU /
LDL^T, src/geneo.cpp:94-124, 452-500) and per-domain generalized
eigenproblems to SLEPc/ARPACK shift-invert (src/geneo.cpp:626-780), one
process at a time.  On TPU the subdomain axis is a batch dimension: all
domains factorize/solve/eigensolve together as vmapped dense kernels that
XLA tiles onto the MXU.  Padded slots carry identity rows/cols so every
batched operation stays well posed.

MUMPS's null-pivot detection/fixing (ICNTL(24), CNTL(5)=1e20 — makes the
factorization behave like a pseudo-inverse on a singular operator) maps to
a scaled diagonal jitter fallback here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def _sym(a):
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


@partial(jax.jit, static_argnames=("jitter",))
def cholesky_factor(a: jax.Array, jitter: bool = True) -> jax.Array:
    """Batched Cholesky of SPD blocks [d, n, n] with jitter fallback."""
    l = jnp.linalg.cholesky(a)
    if jitter:
        bad = jnp.isnan(l).any(axis=(-1, -2), keepdims=True)
        scale = jnp.mean(jnp.abs(jnp.diagonal(a, axis1=-2, axis2=-1)),
                         axis=-1)[..., None, None]
        eps = jnp.asarray(1e3 * jnp.finfo(a.dtype).eps, a.dtype)
        a2 = a + (eps * scale) * jnp.eye(a.shape[-1], dtype=a.dtype)
        l2 = jnp.linalg.cholesky(a2)
        l = jnp.where(bad, l2, l)
    return l


@jax.jit
def cholesky_solve(l: jax.Array, b: jax.Array) -> jax.Array:
    """Batched triangular solves: (L L^T) x = b, L [d, n, n], b [d, n]."""
    y = jsl.solve_triangular(l, b[..., None], lower=True)
    x = jsl.solve_triangular(jnp.swapaxes(l, -1, -2), y, lower=False)
    return x[..., 0]


@jax.jit
def lu_factor(a: jax.Array):
    """Batched LU with partial pivoting [d, n, n]."""
    return jax.vmap(jsl.lu_factor)(a)


@jax.jit
def lu_solve(lu_piv, b: jax.Array) -> jax.Array:
    return jax.vmap(jsl.lu_solve)(lu_piv, b)


@jax.jit
def lu_factor_nullpivot(a: jax.Array):
    """LU with MUMPS-style null-pivot fixing (tuneSolver, geneo.cpp:76-92:
    ICNTL(24)=1 detect, CNTL(5)=1e20 fix): tiny U pivots are replaced by a
    huge value so the triangular solve contributes ~0 along numerically
    singular directions — a pseudo-inverse-like behavior that keeps a
    rank-deficient coarse operator E usable, exactly like the reference."""
    lu, piv = jsl.lu_factor(a)
    n = a.shape[-1]
    d = jnp.abs(jnp.diagonal(lu, axis1=-2, axis2=-1))
    tol = max(n, 10) * jnp.finfo(a.dtype).eps * jnp.max(d, axis=-1,
                                                        keepdims=True)
    fixed = jnp.where(d <= tol, jnp.asarray(1e20, a.dtype).astype(a.dtype), 0)
    eye = jnp.eye(n, dtype=a.dtype)
    lu = jnp.where((fixed[..., None] * eye) != 0,
                   fixed[..., None] * eye, lu)
    return lu, piv


@jax.jit
def _generalized_eigh_impl(a: jax.Array, b: jax.Array):
    l = cholesky_factor(_sym(b))
    y = jsl.solve_triangular(l, _sym(a), lower=True)            # L^-1 A
    c = jsl.solve_triangular(l, jnp.swapaxes(y, -1, -2), lower=True)
    w, u = jnp.linalg.eigh(_sym(c))
    v = jsl.solve_triangular(jnp.swapaxes(l, -1, -2), u, lower=False)
    return w, v


def _generalized_eigh_host(a, b):
    """Host LAPACK path (float64): batched Cholesky + eigh via numpy."""
    import numpy as np

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    a = 0.5 * (a + a.transpose(0, 2, 1))
    b = 0.5 * (b + b.transpose(0, 2, 1))
    try:
        l = np.linalg.cholesky(b)
    except np.linalg.LinAlgError:
        scale = np.mean(np.abs(np.diagonal(b, axis1=-2, axis2=-1)),
                        axis=-1)[:, None, None]
        jit = 1e3 * np.finfo(np.float64).eps * scale
        l = np.linalg.cholesky(b + jit * np.eye(b.shape[-1]))
    y = np.linalg.solve(l, a)                         # L^-1 A
    c = np.linalg.solve(l, y.transpose(0, 2, 1))      # L^-1 A L^-T
    c = 0.5 * (c + c.transpose(0, 2, 1))
    w, u = np.linalg.eigh(c)
    v = np.linalg.solve(l.transpose(0, 2, 1), u)      # L^-T U
    return w, v


def generalized_eigh(a: jax.Array, b: jax.Array, device: str = "auto"):
    """Batched symmetric-definite generalized eigensolve A v = lambda B v.

    Returns (w [d, n] ascending, v [d, n, n] columns).  B = L L^T,
    C = L^-1 A L^-T, eigh(C), v = L^-T u — the dense equivalent of SLEPc's
    GHEP path; the inner triangular solves are the batched analogue of the
    ST/MUMPS inner LU (src/geneo.cpp:746-780).

    device="auto"/"host": the setup-phase eigensolve runs on the HOST via
    LAPACK in float64 — exactly where (and at the precision) the reference
    runs ARPACK/LAPACK; XLA's eigh lowering is QR-iteration-in-IR and is
    far slower than LAPACK on both CPU and (compile-wise) TPU.  The
    iteration-phase kernels are unaffected.  device="jax" keeps the
    on-device batched implementation (useful once shapes are cached).
    """
    if device in ("auto", "host", "cpu"):
        return _generalized_eigh_host(a, b)
    return _generalized_eigh_impl(a, b)


def host_eigh(a: jax.Array):
    """Setup-phase symmetric eigendecomposition on the host via LAPACK
    (float64) — same rationale as generalized_eigh's host path."""
    import numpy as np

    a = np.asarray(a, np.float64)
    return np.linalg.eigh(0.5 * (a + a.swapaxes(-1, -2)))


@jax.jit
def ldlt_inertia(s: jax.Array, mask: jax.Array):
    """Inertia of symmetric S via unpivoted batched LDL^T — the MUMPS
    ICNTL/INFOG(12) route (estimateNumberOfEigenValues, geneo.cpp:502-560)
    at Cholesky cost, usable at scales where eigvalsh is not.

    ``s``: [d, n, n] symmetric (indefinite allowed); ``mask``: [d, n] valid
    slots.  Pad rows/columns are decoupled to +1 before factoring and
    excluded from the counts.  Returns (n_neg, n_pos) per domain.

    Unpivoted LDL^T on an indefinite matrix can hit small pivots; they are
    clamped away from zero, which can miscount by one when theta falls on
    an eigenvalue — acceptable for the nev ESTIMATES this feeds (the
    reference's MUMPS inertia has the same theta-on-eigenvalue caveat)."""
    n = s.shape[-1]
    sel = mask[:, :, None] & mask[:, None, :]
    eye = jnp.eye(n, dtype=s.dtype)
    s = jnp.where(sel, 0.5 * (s + jnp.swapaxes(s, -1, -2)), 0.0) \
        + (~mask)[:, :, None] * eye
    idx = jnp.arange(n)

    def body(j, mat):
        piv = mat[:, j, j]
        tiny = jnp.asarray(1e-30, mat.dtype)
        safe = jnp.where(jnp.abs(piv) > tiny,
                         piv, jnp.where(piv < 0, -tiny, tiny))
        colj = mat[:, :, j] / safe[:, None]
        upd = colj[:, :, None] * mat[:, j, :][:, None, :]
        trail = idx > j
        scope = trail[:, None] & trail[None, :]
        return jnp.where(scope, mat - upd, mat)

    mat = jax.lax.fori_loop(0, n, body, s)
    d = jnp.diagonal(mat, axis1=-2, axis2=-1)
    n_neg = jnp.sum((d < 0) & mask, axis=-1)
    n_pos = jnp.sum((d > 0) & mask, axis=-1)
    return n_neg, n_pos


@jax.jit
def sylvester_counts(a: jax.Array, b: jax.Array, theta: jax.Array,
                     mask: jax.Array):
    """Sylvester inertia estimate (estimateNumberOfEigenValues,
    src/geneo.cpp:502-560): inertia of S = A - theta*B on the masked slots.

    Returns (n_neg, n_pos) per domain — the counts of eigenvalues of the
    pencil (A, B) below theta / above theta.  Computed from the batched
    LDL^T-free route (eigvalsh of S): identical counts, one fused kernel.
    Padded slots contribute 1 - theta (positive for tau < 1, negative for
    gamma > 1); they are excluded via the mask.
    """
    s = _sym(a) - theta[..., None, None] * _sym(b)
    w = jnp.linalg.eigvalsh(s)
    # sort order of eigvalsh vs mask slots: count with the mask applied to
    # the count of signs, not positions — pad slots have eigenvalue exactly
    # 1 - theta, so subtract their known contribution.
    n_pad = jnp.sum(~mask, axis=-1)
    neg = jnp.sum(w < 0, axis=-1)
    pos = jnp.sum(w > 0, axis=-1)
    pad_sign_neg = (1.0 - theta) < 0
    neg = neg - jnp.where(pad_sign_neg, n_pad, 0)
    pos = pos - jnp.where(pad_sign_neg, 0, n_pad)
    return neg, pos
