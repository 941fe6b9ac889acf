"""Workload-generator tests vs reference semantics
(tst/laplacian/laplacian.cpp, tst/heat/heat.cpp, tst/graph/graph.cpp)."""

import numpy as np

from geneo4petsc_tpu.assembly.assemble import assemble_global_csr
from geneo4petsc_tpu.io.plugin import get_lib_input
from geneo4petsc_tpu.models import graph, heat, laplacian


def _dense(mesh):
    return assemble_global_csr(mesh).toarray()


def test_laplacian_1d():
    m = laplacian.get_input("--size 5 --dim 1 --inpEps 0.")
    assert m.n_nodes == 5
    assert m.n_elems == 5  # 4 interior + 1 BC ghost
    a = _dense(m)
    # 1D FEM Laplacian with one Dirichlet face: tridiag(-1, 2, -1) except
    # last diagonal 1 (free end)
    expect = (np.diag([2.0, 2, 2, 2, 1]) + np.diag([-1.0] * 4, 1)
              + np.diag([-1.0] * 4, -1))
    assert np.allclose(a, expect)


def test_laplacian_2d_counts():
    m = laplacian.get_input("--size 4 --dim 2")
    assert m.n_nodes == 16
    # 2 * 4 * 3 interior edges + 4 BC ghosts
    assert m.n_elems == 28


def test_laplacian_3d_counts():
    m = laplacian.get_input("--size 4 --dim 3")
    assert m.n_nodes == 64
    assert m.n_elems == 3 * 16 * 3 + 16


def test_laplacian_weak_scaling():
    m1 = laplacian.get_input("--size 4 --dim 3 --weakScaling 1")
    m8 = laplacian.get_input("--size 4 --dim 3 --weakScaling 8")
    assert m8.n_nodes == 8 * m1.n_nodes  # total DOFs scale with ws


def test_laplacian_kappa_heterogeneous():
    m = laplacian.get_input("--size 8 --dim 1 --kappa 100. minmax")
    a = _dense(m)
    d = np.diag(a)
    assert d.max() > 50  # the high-kappa layer is present
    w = np.linalg.eigvalsh(a)
    assert w.min() > 0  # SPD


def test_heat_is_laplacian_plus_mass():
    lap = laplacian.get_input("--size 5 --dim 2 --inpEps 0.001")
    ht = heat.get_input("--size 5 --dim 2 --inpEps 0.001 --lbd 2. --dt 0.5")
    assert ht.n_elems == lap.n_elems
    for e in range(ht.n_elems):
        k = len(ht.elem_nodes(e))
        if k == 2:
            mass = np.array([[1 / 3, 1 / 6], [1 / 6, 1 / 3]])
        else:
            mass = np.array([[1 / 3]])
        assert np.allclose(ht.elem_mats[e],
                           2.0 * lap.elem_mats[e] + mass / 0.5)


def test_graph_structure():
    m = graph.get_input("--size 4 --level 1")
    a = _dense(m)
    w = np.linalg.eigvalsh(a)
    assert w.min() > 0  # grounded -> SPD
    # ground node 0 touches all 4*blockSize border nodes of every block
    assert (a[0] != 0).sum() > 8


def test_graph_noground():
    m = graph.get_input("--size 4 --level 0 --noGround --inpEps 0.01")
    a = _dense(m)
    w = np.linalg.eigvalsh(a)
    assert w.min() > 0  # inpEps regularizes the floating network


def test_plugin_registry_and_hash_args():
    m = get_lib_input("laplacian", "--size#3#--dim#1")
    assert m.n_nodes == 3
