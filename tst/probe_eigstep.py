"""Decompose the matfree LOBPCG step cost on the live pencil shapes.

The r05 bench measured lobpcg_step at 171 ms (k=2, 10M shapes) = 36 GB/s
— an order of magnitude off the analytic pass count.  This probe builds
ONLY the tau pencil (no solve buffers resident) and times each stage:
a_op / b_op / t_op applies at widths k and 3k, the whitening, the tiny
eigh, and the full step.

Usage: python tst/probe_eigstep.py [size] [domg] [overlap] [k]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timed(fn, *args, reps=6):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def per_step(step, ops, x, lo=1, hi=9, reps=5):
    @partial(jax.jit, static_argnames=("m",))
    def chain(o, v, m):
        def body(_, c):
            out = step(o, c)
            return jax.tree_util.tree_map(lambda a: a * 0.5, out) \
                if not isinstance(out, jax.Array) else out * 0.5
        return jax.lax.fori_loop(0, m, body, v)

    t_lo = timed(partial(chain, m=lo), ops, x, reps=reps)
    t_hi = timed(partial(chain, m=hi), ops, x, reps=reps)
    while t_hi - t_lo < 8e-3 and hi < 512:
        hi *= 4
        t_hi = timed(partial(chain, m=hi), ops, x, reps=reps)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    domg = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ov = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from geneo4petsc_tpu.ops import lobpcg as lb
    from geneo4petsc_tpu.ops.jacobi import jacobi_eigh
    from geneo4petsc_tpu.structured import fdm
    from geneo4petsc_tpu.structured import local_ops as lo_m
    from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
    from geneo4petsc_tpu.structured.geneo import _flat_ops
    from geneo4petsc_tpu.structured.grid import laplacian_grid
    from geneo4petsc_tpu.structured.solvers import diag_congruence

    print(f"device: {jax.devices()[0]}  k={k}", flush=True)
    grid = laplacian_grid(size, dim=3, kappa_max=10000.0, interp="minmax")
    sd = StructuredDecomposition(grid, (domg,) * 3, ov)
    pad1 = tuple(p + 1 if g > 1 else 0
                 for p, g in zip(sd.pad, sd.dom_grid))
    f = lo_m.slice_inner(lo_m.gather_fields(sd, dtype=jnp.float32,
                                            pad=pad1), sd)
    maskf = f.mask.astype(jnp.float32)
    pou_b = jnp.where(f.mask, 1.0 / jnp.maximum(f.mult, 1.0),
                      0.0).astype(jnp.float32)
    neu = lo_m.neumann_stencil(f)
    b_dad = diag_congruence(lo_m.dirichlet_stencil(f), pou_b)
    t_fac = fdm.fdm_factor(fdm.neumann_axes(sd), shift=0.1,
                           dtype=jnp.float32)
    d = maskf.shape[0]
    n_loc = int(np.prod(sd.local_shape))
    print(f"d={d} n_loc={n_loc}", flush=True)

    ops = (neu, b_dad, maskf, t_fac)

    def mk(m):
        key = jax.random.PRNGKey(0)
        return jax.random.normal(key, (d, n_loc, m), jnp.float32)

    xk, x3k = mk(k), mk(3 * k)
    jax.block_until_ready((xk, x3k))

    def a_k(o, v):
        a_o, _, _ = _flat_ops(o[0], o[1], o[2], o[3])
        return a_o(v)

    def b_k(o, v):
        _, b_o, _ = _flat_ops(o[0], o[1], o[2], o[3])
        return b_o(v)

    def t_k(o, v):
        _, _, t_o = _flat_ops(o[0], o[1], o[2], o[3])
        return t_o(v)

    def whiten3k(o, v):
        _, b_o, _ = _flat_ops(o[0], o[1], o[2], o[3])
        s, bs, _p = lb._whiten(v, b_o(v))
        return s

    def gram_only(o, v):
        del o
        g = jnp.einsum("dnm,dnk->dmk", v, v,
                       preferred_element_type=v.dtype,
                       precision="highest")
        return v * (1.0 + 0.0 * g[:, :1, :1])

    def eigh_only(o, g):
        del o
        w, vv = jacobi_eigh(g)
        return g + vv * w[..., None, :] * 1e-9

    def full_step(o, carry):
        a_o, b_o, t_o = _flat_ops(o[0], o[1], o[2], o[3])
        x, p = carry

        def rayleigh_ritz(s, bs):
            s, bs, proj = lb._whiten(s, bs)
            as_ = a_o(s)
            h = jnp.einsum("dnm,dnk->dmk", s, as_,
                           preferred_element_type=s.dtype,
                           precision="highest")
            h = 0.5 * (h + jnp.swapaxes(h, -1, -2))
            m = h.shape[-1]
            big = 8.0 * jnp.max(jnp.abs(h), axis=(-2, -1),
                                keepdims=True) + 1.0
            h = h + big * (jnp.eye(m, dtype=h.dtype) - proj)
            from geneo4petsc_tpu.ops.jacobi import tiny_eigh
            theta, c = tiny_eigh(h)
            return s, theta, c

        bx = b_o(x)
        x, bx, _ = lb._whiten(x, bx)
        ax = a_o(x)
        lam = jnp.einsum("dnm,dnm->dm", x, ax)
        r = ax - bx * lam[:, None, :]
        w = t_o(r)
        s = jnp.concatenate([x, w, p], axis=-1)
        bs = b_o(s)
        s_t, theta, c = rayleigh_ritz(s, bs)
        cx = c[..., :k]
        x_new = jnp.einsum("dnm,dmk->dnk", s_t, cx,
                           preferred_element_type=x.dtype)
        c_wp = cx.at[:, :k, :].set(0.0)
        p_new = jnp.einsum("dnm,dmk->dnk", s_t, c_wp,
                           preferred_element_type=x.dtype)
        return (x_new, p_new)

    g66 = jnp.eye(3 * k, dtype=jnp.float32)[None].repeat(d, 0) \
        + 1e-3 * jax.random.normal(jax.random.PRNGKey(1),
                                   (d, 3 * k, 3 * k), jnp.float32)
    g66 = 0.5 * (g66 + jnp.swapaxes(g66, -1, -2))

    rows = [
        (f"a_op width k={k}", a_k, ops, xk),
        (f"a_op width 3k={3 * k}", a_k, ops, x3k),
        (f"b_op width k={k}", b_k, ops, xk),
        (f"b_op width 3k={3 * k}", b_k, ops, x3k),
        (f"t_op (FDM) width k={k}", t_k, ops, xk),
        (f"whiten (3k)", whiten3k, ops, x3k),
        (f"gram only (3k)", gram_only, ops, x3k),
        (f"jacobi eigh [d,{3 * k},{3 * k}]", eigh_only, ops, g66),
    ]
    for name, step, o, v in rows:
        t = per_step(step, o, v)
        print(f"{name:26s} {t * 1e3:9.3f} ms", flush=True)

    t = per_step(full_step, ops, (xk, jnp.zeros_like(xk)))
    print(f"{'FULL STEP':26s} {t * 1e3:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
