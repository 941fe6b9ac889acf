"""Native C++ component tests: the k-way partitioner and the flat-C workload
plugin must be bit-identical to their Python counterparts."""

import os
import subprocess

import numpy as np
import pytest

from geneo4petsc_tpu.io.plugin import get_lib_input
from geneo4petsc_tpu.models import graph, laplacian
from geneo4petsc_tpu.partition import native
from geneo4petsc_tpu.partition.kway import partition_mesh_py

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                   check=True, capture_output=True)
    # force re-probe after build
    native._TRIED = False
    native._LIB = None
    assert native.available()


@pytest.mark.parametrize("args,dual", [
    ("--size 8 --dim 2", True),
    ("--size 8 --dim 2", False),
    ("--size 4 --dim 3", True),
    ("--size 16 --dim 1", False),
])
def test_partitioner_parity_laplacian(args, dual):
    m = laplacian.get_input(args)
    for k in (2, 4, 5):
        ep_py, np_py = partition_mesh_py(m, k, dual)
        ep_c, np_c = native.partition_mesh(m, k, dual)
        assert (ep_py == ep_c).all()
        assert (np_py == np_c).all()


def test_partitioner_parity_irregular_graph():
    m = graph.get_input("--size 4 --level 1")
    for dual in (True, False):
        ep_py, np_py = partition_mesh_py(m, 3, dual)
        ep_c, np_c = native.partition_mesh(m, 3, dual)
        assert (ep_py == ep_c).all()
        assert (np_py == np_c).all()


def _assert_mesh_parity(m_py, m_c):
    assert m_py.n_nodes == m_c.n_nodes
    assert m_py.n_elems == m_c.n_elems
    assert (m_py.elem_ptr == m_c.elem_ptr).all()
    assert (m_py.elem_idx == m_c.elem_idx).all()
    for a, b in zip(m_py.elem_mats, m_c.elem_mats):
        assert np.allclose(a, b, rtol=0, atol=0)  # bit-identical


@pytest.mark.parametrize("args", [
    "--size 6 --dim 2 --kappa 100. minmax",
    "--size 4 --dim 3",
    "--size 10 --dim 1 --inpEps 0.01",
    "--size 9 --dim 2 --weakScaling 4 --kappa 50. quad",
])
def test_native_workload_plugin_parity(args):
    m_py = laplacian.get_input(args)
    so = os.path.join(REPO, "native", "libgenworkloads.so")
    m_c = get_lib_input(so, args.replace(" ", "#"))
    _assert_mesh_parity(m_py, m_c)


@pytest.mark.parametrize("args", [
    "--size 6 --dim 2 --kappa 100. minmax --lbd 2. --dt 0.05",
    "--size 4 --dim 3",
    "--size 10 --dim 1 --inpEps 0.01 --dt 0.2",
])
def test_native_heat_plugin_parity(args):
    """Native heat generator (reference tst/heat/heat.cpp:24-262 role):
    element matrix = lbd*Laplacian + Mass/dt, bit-identical to the
    Python model."""
    from geneo4petsc_tpu.models import heat
    m_py = heat.get_input(args)
    so = os.path.join(REPO, "native", "libgenworkloads.so")
    m_c = get_lib_input(so, ("--workload heat " + args).replace(" ", "#"))
    _assert_mesh_parity(m_py, m_c)


@pytest.mark.parametrize("args", [
    "--size 4 --level 1",
    "--size 9 --level 2 --inpEps 0.01",
    "--size 4 --level 3 --noGround",
    "--size 16 --level 1 --weakScaling 4",
])
def test_native_graph_plugin_parity(args):
    """Native circuit-graph generator (reference tst/graph/graph.cpp:23-208
    role): central block + cross-connected levels, bit-identical to the
    Python model."""
    m_py = graph.get_input(args)
    so = os.path.join(REPO, "native", "libgenworkloads.so")
    m_c = get_lib_input(so, ("--workload graph " + args).replace(" ", "#"))
    _assert_mesh_parity(m_py, m_c)
