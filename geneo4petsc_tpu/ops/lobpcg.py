"""Batched LOBPCG for the generalized symmetric pencil A v = lambda B v.

The reference computes its GenEO eigenpairs with ARPACK shift-invert +
MUMPS inner LU (src/geneo.cpp:626-780): O(nev) eigenpairs at sparse-solve
cost.  The dense-eigh route used for small subdomains costs O(n_max^3) per
domain and becomes the scaling wall.  This module is the TPU-native
equivalent of the ARPACK path: blocked LOBPCG (Knyazev) over the whole
subdomain batch at once — every step is a batched [d, n, 3k] matmul that
XLA tiles onto the MXU, with a shifted-Cholesky preconditioner
T = (A + sigma B)^-1 playing the role of the reference's shift-invert
inner factorization.

Robustness choices for ill-conditioned pencils (hard part #1 of
SURVEY.md §7): B-orthonormalization via eigh-whitening with truncation of
dead directions (instead of Cholesky, which breaks on rank-deficient
search spaces), and spurious-Ritz-value steering so truncated directions
sort last.  Everything is fixed-iteration / static-shape for jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import batched_linalg as bl
from .jacobi import tiny_eigh


def _hi(dt):
    """Dtype for the tiny [m, m] eigendecompositions: f64 on CPU backends.

    CPU (LAPACK) f32 eigh has ~1e-3 residual / orthogonality error —
    repeated whitening with it stalls LOBPCG on ill-conditioned pencils
    (measured: kept Ritz residuals plateau at ~0.5 on the 1M-bench GenEO
    pencil); the grams are tiny, so f64 eigh costs nothing there.  On TPU
    the f64 emulation of eigh is NOT reliable (measured: NaN spectra at
    the 10M bench when x64 is enabled process-wide) — the TPU path stays
    in f32, where the rotation-free symmetric whitening (below) is the
    load-bearing robustness fix; large matmuls use HIGHEST (6-pass bf16)
    MXU precision either way."""
    import jax as _jax
    return jnp.float64 if (_jax.config.jax_enable_x64
                           and _jax.default_backend() == "cpu") else dt


def _whiten(s, bs):
    """B-orthonormalize S [d, n, m]: returns (S W, BS W, proj) with the
    SYMMETRIC pseudo inverse square root W = V diag(e^-1/2) V^T of
    eigh(S^T B S), truncating tiny directions.

    W must be the symmetric root, NOT V diag(e^-1/2): a near-converged
    block has gram ~ I with fully degenerate eigenvalues, and eigh is then
    free to return an ARBITRARY rotation V — LAPACK happens to return
    ~identity, but TPU's iterative eigh scrambles the Ritz columns every
    iteration, destroying LOBPCG's X/W/P separation (measured: stagnation
    at res~0.4 then overflow on the 1M-bench pencil).  The symmetric root
    is rotation-free (~I + small for gram ~ I).

    ``proj`` is the alive-subspace projector V diag(alive) V^T (hi dtype)
    — callers steer dead directions with big * (I - proj)."""
    m = s.shape[-1]
    gram = jnp.einsum("dnm,dnk->dmk", s, bs,
                      preferred_element_type=s.dtype,
                      precision="highest")
    w, proj = _whiten_w(gram, m, s.dtype)
    return (jnp.einsum("dnm,dmk->dnk", s, w,
                       preferred_element_type=s.dtype,
                       precision="highest"),
            jnp.einsum("dnm,dmk->dnk", bs, w,
                       preferred_element_type=s.dtype,
                       precision="highest"),
            proj)


def _whiten_w(gram, m, dtype):
    """Whitening factor from the gram alone: (W, proj) with W the
    symmetric pseudo inverse square root (see _whiten)."""
    gram = 0.5 * (gram + jnp.swapaxes(gram, -1, -2))
    hi = _hi(dtype)
    # tiny_eigh: fixed-sweep batched Jacobi on accelerators — XLA's
    # iterative eigh costs ~0.1 s per [d, m, m] call on TPU and the
    # LOBPCG loop pays two such calls per iteration (ops/jacobi.py);
    # near-diagonal grams rotate by o(offdiag), preserving the
    # rotation-free behavior the symmetric root relies on
    e, v = tiny_eigh(gram.astype(hi))
    tol = m * jnp.finfo(dtype).eps * jnp.max(jnp.abs(e), axis=-1,
                                             keepdims=True)
    alive = e > tol
    inv_sqrt = jnp.where(alive, 1.0 / jnp.sqrt(jnp.where(alive, e, 1.0)),
                         0.0)
    w = jnp.einsum("dmi,dki->dmk", v * inv_sqrt[..., None, :], v)
    proj = jnp.einsum("dmi,dki->dmk", v * alive[..., None, :], v)
    return w.astype(dtype), proj


def _whiten_lead(s, bs):
    """_whiten in the LEAD layout: s, bs [d, m, n] -> (S W, BS W, proj).

    The lead layout keeps the LARGE n axis minor: on TPU the minor axis
    maps to the 128 vector lanes, so [d, n, m] tensors with m = block
    size (2-12) run every elementwise/matmul pass at m/128 lane
    utilization — measured as the dominant LOBPCG-step cost at the 10M
    bench (tst/probe_eigstep.py).  Grams contract over n (the minor
    axis, MXU-friendly) and column updates produce n-minor outputs."""
    m = s.shape[1]
    gram = jnp.einsum("dmn,dkn->dmk", s, bs,
                      preferred_element_type=s.dtype,
                      precision="highest")
    w, proj = _whiten_w(gram, m, s.dtype)
    return (jnp.einsum("dmk,dmn->dkn", w, s,
                       preferred_element_type=s.dtype,
                       precision="highest"),
            jnp.einsum("dmk,dmn->dkn", w, bs,
                       preferred_element_type=s.dtype,
                       precision="highest"),
            proj)


def matfree_lobpcg(a_op, b_op, t_op, x0: jax.Array, max_it: int = 40,
                   tol: float = 0.0, k_monitor: int | None = None,
                   ops_layout: str = "nm"):
    """Matrix-free batched LOBPCG: smallest eigenpairs of the pencil
    (A, B) given only batched block matvec callables.

    a_op/b_op/t_op: [d, n, m] -> [d, n, m] (operator, metric, and
    preconditioner ~ shifted inverse — the ARPACK STSINVERT analogue).
    x0: [d, n, k] initial block (columns must avoid exact invariant
    subspaces; pass a masked preconditioned Gaussian block).

    Same algorithm and robustness choices as ``batched_lobpcg`` (eigh
    whitening with dead-direction truncation + Ritz steering), but the
    operators never materialize — this is the scale path used by the
    structured/FDM backend where n_loc is 10^5+ and a dense [d, n, n]
    pencil is impossible.  Returns (w [d, k] ascending, v [d, n, k],
    res [d, k] relative residuals).  Callers jit.

    tol > 0 switches the fixed-length scan to a while_loop that exits as
    soon as every (domain, column) relative residual is below tol — the
    SLEPc EPS tolerance semantics (the reference runs ARPACK at tol 1e-3,
    "good enough" vectors, geneo.cpp:658); with the exact FDM shifted
    inverse as preconditioner convergence is typically far faster than
    the max_it cap, so the exit saves most of the eigensolve wall.

    k_monitor (default: all k columns): the tol exit and reported
    per-step residual watch only the FIRST k_monitor columns.  Callers
    that add GUARD columns (extra Ritz pairs solved purely to open the
    spectral gap of the kept window — the ARPACK ncv > 2k discipline)
    pass the kept-prefix size here so slow guard convergence cannot
    hold the loop at max_it.

    Internally every block lives in the LEAD layout [d, m, n] (see
    _whiten_lead: the minor axis must stay the LARGE one for TPU lane
    utilization).  ops_layout says which convention the CALLER's
    operators use: "mn" operators take/return [d, m, n] directly (the
    structured path's native fast form); "nm" operators take/return
    [d, n, m] and are wrapped with transposes (one relayout pass each
    way — still far cheaper than running every block pass lane-starved).
    The x0 / returned-v contract stays [d, n, k] for all callers.
    """
    k = x0.shape[-1]
    k_mon = k if k_monitor is None else min(int(k_monitor), k)
    dtype = x0.dtype

    if ops_layout == "nm":
        a_nm, b_nm, t_nm = a_op, b_op, t_op

        def _wrap(op):
            return lambda v: jnp.swapaxes(op(jnp.swapaxes(v, 1, 2)), 1, 2)

        a_op, b_op, t_op = _wrap(a_nm), _wrap(b_nm), _wrap(t_nm)

    hi = _hi(dtype)

    def rayleigh_ritz(s, bs):
        s, bs, proj = _whiten_lead(s, bs)
        as_ = a_op(s)
        h = jnp.einsum("dmn,dkn->dmk", s, as_, preferred_element_type=dtype,
                       precision="highest")
        h = 0.5 * (h + jnp.swapaxes(h, -1, -2))
        # steer the dead (truncated) subspace to the top of the spectrum:
        # + big * (I - proj).  big must be DATA-SCALED, not an absolute
        # constant: eigh's backward error is ~eps * ||h||, so an absolute
        # 1e12 in the f32 TPU path wipes out every live Ritz value below
        # eps*1e12 ~ 1e5 — measured as a hard res~0.4 stall on the
        # elasticity pencil, whose seeded rigid block guarantees dead
        # directions (P = 0 columns) from the first iteration.  A few x
        # max|h| still sorts dead above every live value while keeping
        # eigh's error at eps * O(||h||).
        m = h.shape[-1]
        h = h.astype(hi)
        big = 8.0 * jnp.max(jnp.abs(h), axis=(-2, -1), keepdims=True) + 1.0
        h = h + big * (jnp.eye(m, dtype=hi) - proj)
        theta, c = tiny_eigh(h)
        return s, theta.astype(dtype), c.astype(dtype)

    def step(x, p):
        bx = b_op(x)
        x, bx, _ = _whiten_lead(x, bx)
        ax = a_op(x)
        lam = jnp.einsum("dmn,dmn->dm", x, ax,
                         preferred_element_type=dtype,
                         precision="highest")
        r = ax - bx * lam[..., None]
        # relative residual of the CURRENT block (free: r is needed
        # anyway), over the MONITORED prefix only (guard columns are
        # disposable and may converge arbitrarily slowly).  The ||Bx||
        # term keeps the scale meaningful for exact null pairs
        # (lambda ~ 0, Ax ~ 0): without it res degenerates to
        # ||Ax||/||Ax|| = 1 and the tol exit can never fire on pencils
        # with rigid-body kernels (elasticity)
        axm, bxm, rm = ax[:, :k_mon], bx[:, :k_mon], r[:, :k_mon]
        lamm = lam[:, :k_mon]
        scale = jnp.linalg.norm(axm, axis=-1) + (jnp.abs(lamm) + 1.0) * \
            jnp.linalg.norm(bxm, axis=-1) + jnp.finfo(dtype).tiny
        res = jnp.max(jnp.linalg.norm(rm, axis=-1) / scale)
        w = t_op(r)
        s = jnp.concatenate([x, w, p], axis=1)
        bs = b_op(s)
        s_t, theta, c = rayleigh_ritz(s, bs)
        cx = c[..., :k]
        x_new = jnp.einsum("dmk,dmn->dkn", cx, s_t,
                           preferred_element_type=dtype,
                           precision="highest")
        c_wp = cx.at[:, :k, :].set(0.0)
        p_new = jnp.einsum("dmk,dmn->dkn", c_wp, s_t,
                           preferred_element_type=dtype,
                           precision="highest")
        return x_new, p_new, res

    x0 = jnp.swapaxes(x0, 1, 2)             # public [d, n, k] -> lead
    if tol > 0.0:
        def cond(carry):
            _x, _p, it, res = carry
            return (it < max_it) & (res > tol)

        def body_w(carry):
            x, p, it, _res = carry
            x_new, p_new, res = step(x, p)
            return (x_new, p_new, it + 1, res)

        (x, _p, _it, _res) = jax.lax.while_loop(
            cond, body_w,
            (x0, jnp.zeros_like(x0), jnp.int32(0),
             jnp.asarray(jnp.inf, dtype)))
    else:
        def body(carry, _):
            x, p = carry
            x_new, p_new, _res = step(x, p)
            return (x_new, p_new), None

        (x, _p), _ = jax.lax.scan(body, (x0, jnp.zeros_like(x0)), None,
                                  length=max_it)

    bx = b_op(x)
    x, bx, _ = _whiten_lead(x, bx)
    ax = a_op(x)
    h = jnp.einsum("dmn,dkn->dmk", x, ax, preferred_element_type=dtype,
                   precision="highest")
    h = 0.5 * (h + jnp.swapaxes(h, -1, -2))
    theta, c = tiny_eigh(h.astype(hi))
    theta = theta.astype(dtype)
    c = c.astype(dtype)
    v = jnp.einsum("dmk,dmn->dkn", c, x, preferred_element_type=dtype,
                   precision="highest")
    av = a_op(v)
    bv = b_op(v)
    r = av - bv * theta[..., None]
    rn = jnp.linalg.norm(r, axis=-1)
    scale = jnp.linalg.norm(av, axis=-1) + (jnp.abs(theta) + 1.0) * \
        jnp.linalg.norm(bv, axis=-1) + jnp.finfo(dtype).tiny
    return theta, jnp.swapaxes(v, 1, 2), rn / scale


@partial(jax.jit, static_argnames=("k", "max_it"))
def batched_lobpcg(a: jax.Array, b: jax.Array, k: int,
                   max_it: int = 40, shift: float = 0.1,
                   tol: float = 1e-3):
    """Smallest-k eigenpairs of the batched pencil (A, B), both [d, n, n].

    Returns (w [d, k] ascending, v [d, n, k], res [d, k] relative residual
    norms).  `shift`: sigma of the preconditioner (A + sigma*B)^-1 — use
    the GenEO tau (the reference's shift-invert target region).
    `tol` mirrors the reference's 'good enough eigenvectors' EPS tolerance
    (1e-3, geneo.cpp:658); convergence is soft (fixed max_it iterations,
    residuals reported so callers can filter).
    """
    d, n, _ = a.shape
    dtype = a.dtype
    a = 0.5 * (a + jnp.swapaxes(a, -1, -2))
    b = 0.5 * (b + jnp.swapaxes(b, -1, -2))

    # shifted preconditioner factor (SPD: A PSD + sigma * B SPD)
    t_fac = bl.cholesky_factor(a + shift * b)

    def precond(r):  # [d, n, k]
        import jax.scipy.linalg as jsl
        y = jsl.solve_triangular(t_fac, r, lower=True)
        return jsl.solve_triangular(jnp.swapaxes(t_fac, -1, -2), y,
                                    lower=False)

    # deterministic initial block: the preconditioner applied to a
    # fixed-seed Gaussian block.  Canonical basis columns are NOT safe
    # here — they can span an exact invariant subspace of the pencil
    # (block-decoupled local patterns), and LOBPCG then stagnates at
    # interior eigenpairs with zero residual.  A generic Gaussian block
    # overlaps every eigendirection almost surely and keeps runs
    # bit-reproducible via the fixed key.
    x0 = jax.random.normal(jax.random.PRNGKey(0), (d, n, k), dtype)
    x0 = precond(x0)

    hi = _hi(dtype)

    def rayleigh_ritz(s, bs):
        s, bs, proj = _whiten(s, bs)
        as_ = jnp.einsum("dij,djm->dim", a, s,
                         preferred_element_type=dtype,
                         precision="highest")
        h = jnp.einsum("dnm,dnk->dmk", s, as_,
                       preferred_element_type=dtype,
                       precision="highest")
        h = 0.5 * (h + jnp.swapaxes(h, -1, -2))
        # steer the dead (truncated) subspace to the top of the spectrum
        # with a DATA-SCALED offset (see matfree rayleigh_ritz: an
        # absolute 1e12 destroys f32 eigh accuracy via eps * ||h||)
        m = h.shape[-1]
        h = h.astype(hi)
        big = 8.0 * jnp.max(jnp.abs(h), axis=(-2, -1), keepdims=True) + 1.0
        h = h + big * (jnp.eye(m, dtype=hi) - proj)
        theta, c = tiny_eigh(h)
        return s, theta.astype(dtype), c.astype(dtype)

    def body(carry, _):
        x, p = carry
        bx = jnp.einsum("dij,djm->dim", b, x,
                        preferred_element_type=dtype)
        x, bx, _ = _whiten(x, bx)
        ax = jnp.einsum("dij,djm->dim", a, x,
                        preferred_element_type=dtype)
        lam = jnp.einsum("dnm,dnm->dm", x, ax)
        r = ax - bx * lam[:, None, :]
        w = precond(r)
        s = jnp.concatenate([x, w, p], axis=-1)
        bs = jnp.einsum("dij,djm->dim", b, s,
                        preferred_element_type=dtype)
        s_t, theta, c = rayleigh_ritz(s, bs)
        cx = c[..., :k]
        x_new = jnp.einsum("dnm,dmk->dnk", s_t, cx,
                           preferred_element_type=dtype)
        # implicit P: the W+P contribution to the new X
        c_wp = cx.at[:, :k, :].set(0.0)
        p_new = jnp.einsum("dnm,dmk->dnk", s_t, c_wp,
                           preferred_element_type=dtype)
        return (x_new, p_new), None

    p0 = jnp.zeros_like(x0)
    (x, _p), _ = jax.lax.scan(body, (x0, p0), None, length=max_it)

    # final Rayleigh-Ritz on X alone + residuals
    bx = jnp.einsum("dij,djm->dim", b, x, preferred_element_type=dtype)
    x, bx, _ = _whiten(x, bx)
    ax = jnp.einsum("dij,djm->dim", a, x, preferred_element_type=dtype)
    h = jnp.einsum("dnm,dnk->dmk", x, ax, preferred_element_type=dtype,
                   precision="highest")
    h = 0.5 * (h + jnp.swapaxes(h, -1, -2))
    theta, c = tiny_eigh(h.astype(hi))
    theta = theta.astype(dtype)
    c = c.astype(dtype)
    v = jnp.einsum("dnm,dmk->dnk", x, c, preferred_element_type=dtype,
                   precision="highest")
    av = jnp.einsum("dij,djm->dim", a, v, preferred_element_type=dtype)
    bv = jnp.einsum("dij,djm->dim", b, v, preferred_element_type=dtype)
    r = av - bv * theta[:, None, :]
    rn = jnp.linalg.norm(r, axis=1)
    scale = jnp.linalg.norm(av, axis=1) + (jnp.abs(theta) + 1.0) * \
        jnp.linalg.norm(bv, axis=1) + jnp.finfo(dtype).tiny
    del tol
    return theta, v, rn / scale
