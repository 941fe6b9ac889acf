"""Multi-process execution: the mesh spans OS processes (the DCN axis).

The reference's primary interface is ``mpirun -n N geneo4PETSc ...`` —
MPI ranks are processes, and "distributed" is tested with local ranks
(src/geneo4PETSc.cpp:1569-1633: boost::mpi::environment constructed at
:1580 before PetscInitialize; tst/dummy/dummy.sh pins 2 local ranks).
The TPU-native equivalent is ``jax.distributed.initialize``: each
process owns its local accelerator(s), the global device list spans all
processes, and a ``jax.sharding.Mesh`` over the global devices routes
collectives over ICI within a host and DCN across hosts — the "outer
mesh axis" of SURVEY.md §5.8.

Process model (mirrors mpirun):

    GENEO_COORDINATOR=host:port GENEO_NUM_PROCS=N GENEO_PROC_ID=i \
        python -m geneo4petsc_tpu ... --nbDevices auto

Every process runs the SAME program (SPMD).  Host-side setup (grids,
partitioning, eigh of axis operators) is replicated deterministically;
device arrays are placed with global shardings, and XLA's SPMD
partitioner inserts the cross-process collectives exactly as it does
the cross-device ones.  ``global_put`` is the one multi-process-aware
primitive: committed single-device arrays must round-trip through the
host before a cross-process placement (device_put from a process-local
device buffer to a non-addressable sharding is rejected by jax).

Tested with 2 local CPU processes x 2 virtual devices in
tests/test_multiprocess.py — the reference's own discipline for testing
MPI without a cluster (SURVEY.md §4).
"""

from __future__ import annotations

import os

import numpy as np

import jax


def init_from_env() -> bool:
    """Initialize jax.distributed from GENEO_* env vars (the mpirun -n
    analogue).  Returns True when a multi-process run was configured,
    False for the (default) single-process case.  Must run before the
    first jax backend use."""
    coord = os.environ.get("GENEO_COORDINATOR", "")
    if not coord:
        return False
    global _initialized
    if _initialized:
        return True
    nprocs = int(os.environ.get("GENEO_NUM_PROCS", "1"))
    pid = int(os.environ.get("GENEO_PROC_ID", "0"))
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=pid)
    _initialized = True
    return True


_initialized = False


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_put(x, sharding):
    """Place ``x`` with a (possibly cross-process) sharding.

    Single-process: plain device_put.  Multi-process: jax rejects
    device_put of committed process-local device buffers onto
    non-addressable shardings, so pull to host first — every process
    holds the same replicated value by SPMD construction (setup is
    deterministic host work), which is exactly the contract
    jax.device_put requires for global placement of host data."""
    if x is None:
        return None
    if (is_multiprocess() and isinstance(x, jax.Array)
            and x.is_fully_addressable):
        # process-local committed buffer -> host round trip (tiny, setup
        # only); arrays that already span the global mesh reshard
        # device-to-device below without touching the host
        x = np.asarray(x)
    return jax.device_put(x, sharding)


def process_summary() -> str:
    return (f"process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / "
            f"{jax.device_count()} global devices")
