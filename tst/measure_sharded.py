"""Per-apply cost of the two multi-device models on the virtual CPU mesh.

VERDICT r1 item 10: measure replicated-vector psum (generic path) vs the
sharded-vector CollectivePermute halo (structured path) at 1 and 8 shards
and record ms/apply — the scaling-story pick for real multi-chip.

CPU-mesh numbers measure COMMUNICATION STRUCTURE (collective counts and
data volumes lower to memcpys), not ICI bandwidth; the structured path's
advantage is that its per-shard touched bytes SHRINK with the shard
count while the replicated path's stay constant.

Usage: python tst/measure_sharded.py [size] (default 32)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from geneo4petsc_tpu.config import GenEOOptions


def timeit(fn, x, n=20):
    r = fn(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(x)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def measure_generic(size, n_dom, shards):
    from geneo4petsc_tpu.assembly.assemble import assemble
    from geneo4petsc_tpu.models import laplacian
    from geneo4petsc_tpu.parallel.sharded import make_mesh, shard_geneo
    from geneo4petsc_tpu.partition.decompose import partition_and_decompose
    from geneo4petsc_tpu.precond.geneo import setup_geneo

    mesh_m = laplacian.get_input(f"--size {size} --dim 2 --kappa 100. minmax")
    decomp = partition_and_decompose(mesh_m, n_dom, add_overlap=1)
    ap = assemble(mesh_m, decomp, dtype=jnp.float32)
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "RAS", "1"
    pc, _ = setup_geneo(ap.batch, opts, decomp=decomp)
    b = jnp.asarray(np.asarray(ap.a_csr @ np.arange(1.0, mesh_m.n_nodes + 1)),
                    jnp.float32)
    rows = []
    for n_dev in shards:
        mesh = make_mesh(n_dev)
        mv, pa, _ = shard_geneo(pc, mesh)
        rows.append((n_dev, timeit(mv, b), timeit(pa, b)))
    return mesh_m.n_nodes, rows


def measure_dist(size, n_dom, shards):
    """Distributed generic path (parallel/dist.py): owner-block sharded
    vectors + packed all_to_all halo exchange — per-shard touched bytes
    and wire volume shrink with the shard count, unlike the replicated
    psum model above."""
    from geneo4petsc_tpu.assembly.assemble import assemble
    from geneo4petsc_tpu.models import laplacian
    from geneo4petsc_tpu.parallel.dist import _build_plan, dist_geneo
    from geneo4petsc_tpu.parallel.sharded import _pad_domains, make_mesh
    from geneo4petsc_tpu.partition.decompose import partition_and_decompose
    from geneo4petsc_tpu.precond.geneo import setup_geneo

    mesh_m = laplacian.get_input(f"--size {size} --dim 2 --kappa 100. minmax")
    decomp = partition_and_decompose(mesh_m, n_dom, add_overlap=1)
    ap = assemble(mesh_m, decomp, dtype=jnp.float32)
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "RAS", "1"
    pc, _ = setup_geneo(ap.batch, opts, decomp=decomp)
    b = np.asarray(ap.a_csr @ np.arange(1.0, mesh_m.n_nodes + 1))
    rows = []
    wire = None
    for n_dev in shards:
        mesh = make_mesh(n_dev)
        mv, pa, _pcd, sv, _usv = dist_geneo(pc, mesh,
                                            node_part=decomp.node_part)
        bs = sv(b.astype(np.float32))
        rows.append((n_dev, timeit(mv, bs), timeit(pa, bs)))
        if n_dev == shards[-1]:
            batch = _pad_domains(pc.batch, ((pc.batch.n_dom + n_dev - 1)
                                            // n_dev) * n_dev)
            plan = _build_plan(np.asarray(batch.gids),
                               np.asarray(batch.mask),
                               mesh_m.n_nodes, n_dev, decomp.node_part)
            wire = (plan.wire_floats_per_exchange, plan.n_tot)
    return mesh_m.n_nodes, rows, wire


def measure_structured(size, gz, shards):
    from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
    from geneo4petsc_tpu.structured.geneo import setup_structured
    from geneo4petsc_tpu.structured.grid import laplacian_grid
    from geneo4petsc_tpu.structured.sharded import (make_mesh,
                                                    shard_structured)

    grid = laplacian_grid(size, dim=3, kappa_max=100.0, interp="minmax")
    sd = StructuredDecomposition(grid, (2, 2, gz), 1)
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "RAS", "1"
    pc, _ = setup_structured(sd, opts, dtype=jnp.float32)
    _xt, b = grid.manufactured_rhs()
    b32 = np.asarray(b, np.float32)
    rows = []
    for n_dev in shards:
        mesh = make_mesh(n_dev)
        mv, ap, _pc_sh, shard_vec = shard_structured(pc, mesh)
        bs = shard_vec(b32)
        rows.append((n_dev, timeit(mv, bs), timeit(ap, bs)))
    return grid.n_nodes, rows


def measure_bench_shape(size, shards):
    """The HEADLINE bench decomposition shape (4x4x4 domain grid — gz
    does NOT divide 8 devices): the generalized sharding rule
    (nz % n_dev, n_dom % n_dev) that round 2's z-slab constraint
    rejected."""
    from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
    from geneo4petsc_tpu.structured.geneo import setup_structured
    from geneo4petsc_tpu.structured.grid import laplacian_grid
    from geneo4petsc_tpu.structured.sharded import (make_mesh,
                                                    shard_structured)

    grid = laplacian_grid(size, dim=3, kappa_max=100.0, interp="minmax")
    sd = StructuredDecomposition(grid, (4, 4, 4), 2)
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "ASM", "1"
    pc, _ = setup_structured(sd, opts, dtype=jnp.float32)
    _xt, b = grid.manufactured_rhs()
    b32 = np.asarray(b, np.float32)
    rows = []
    for n_dev in shards:
        mesh = make_mesh(n_dev)
        mv, ap, _pc_sh, shard_vec = shard_structured(pc, mesh)
        bs = shard_vec(b32)
        rows.append((n_dev, timeit(mv, bs), timeit(ap, bs)))
    return grid.n_nodes, rows


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n1, gen = measure_generic(size * 4, 64, [1, 8])
    n1d, dist, wire = measure_dist(size * 4, 64, [1, 8])
    n2, st = measure_structured(size, 8, [1, 8])
    n3, bh = measure_bench_shape(size, [1, 8])
    print(f"generic (2D {n1} DOF, 64 domains, replicated + psum):")
    for n_dev, mv, ap in gen:
        print(f"  shards={n_dev}: matvec {mv:7.2f} ms  pc-apply {ap:7.2f} ms")
    print(f"dist generic (2D {n1d} DOF, 64 domains, owner-block + "
          "all_to_all halo):")
    for n_dev, mv, ap in dist:
        print(f"  shards={n_dev}: matvec {mv:7.2f} ms  pc-apply {ap:7.2f} ms")
    print(f"  wire floats/exchange at 8 shards: {wire[0]} "
          f"(replicated psum would move {wire[1]} per device)")
    print(f"structured (3D {n2} DOF, 32 domains, z-slab + collective-permute):")
    for n_dev, mv, ap in st:
        print(f"  shards={n_dev}: matvec {mv:7.2f} ms  pc-apply {ap:7.2f} ms")
    print(f"bench shape (3D {n3} DOF, 4x4x4 domains, generalized "
          "misaligned sharding):")
    for n_dev, mv, ap in bh:
        print(f"  shards={n_dev}: matvec {mv:7.2f} ms  pc-apply {ap:7.2f} ms")


if __name__ == "__main__":
    main()
