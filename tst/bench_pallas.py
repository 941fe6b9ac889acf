"""Pallas prove-or-cut microbench on the real TPU (VERDICT r1 item 9).

Times the fused level-1 local solve (ops/pallas_kernels.fused_local_solve)
against the XLA einsum route at the generic-path bench shapes, plus the
batched block matvec.  Run on the real chip:

    python tst/bench_pallas.py [n_dom] [n_max]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def timeit(fn, *args, n=50):
    """Chain the output into the last input: the serial dependency forces
    real per-call execution (independent identical calls measured an
    impossible 16 TB/s on the tunneled platform)."""
    head, x = args[:-1], args[-1]
    x = fn(*head, x)
    float(jnp.sum(x))          # full sync: a VALUE pull, not just an ack
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(*head, x)
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    n_dom = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    from geneo4petsc_tpu.ops.pallas_kernels import (block_matvec,
                                                    fused_local_solve)

    key = jax.random.PRNGKey(0)
    inv = jax.random.normal(key, (n_dom, n, n), jnp.float32)
    d = jnp.abs(jax.random.normal(key, (n_dom, n), jnp.float32)) + 0.5
    mask = jnp.ones((n_dom, n), bool)
    xl = jax.random.normal(key, (n_dom, n), jnp.float32)

    @jax.jit
    def einsum_route(inv_, d_, mask_, xl_):
        y = jnp.einsum("dij,dj->di", inv_, xl_ * d_,
                       preferred_element_type=jnp.float32)
        return jnp.where(mask_, y * d_, 0.0)

    @jax.jit
    def einsum_mv(a_, xl_):
        return jnp.einsum("dij,dj->di", a_, xl_,
                          preferred_element_type=jnp.float32)

    pallas_fused = jax.jit(lambda i_, d_, m_, x_: fused_local_solve(
        i_, d_, m_, x_, pre=True, post=True))
    pallas_mv = jax.jit(lambda a_, x_: block_matvec(a_, x_))

    t_e = timeit(einsum_route, inv, d, mask, xl)
    t_p = timeit(pallas_fused, inv, d, mask, xl)
    t_em = timeit(einsum_mv, inv, xl)
    t_pm = timeit(pallas_mv, inv, xl)
    gb = inv.size * 4 / 1e9
    print(f"[{n_dom} domains x {n}x{n} f32 blocks, {gb:.2f} GB streamed]")
    print(f"fused local solve: einsum {t_e:8.3f} ms ({gb/t_e*1e3:6.1f} GB/s)"
          f"  pallas {t_p:8.3f} ms ({gb/t_p*1e3:6.1f} GB/s)")
    print(f"block matvec:      einsum {t_em:8.3f} ms"
          f"  pallas {t_pm:8.3f} ms")
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
