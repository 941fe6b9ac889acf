"""Partitioner + decomposition tests (reference semantics:
src/geneo4PETSc.cpp:196-445)."""

import numpy as np
import pytest

from geneo4petsc_tpu.io.element_input import read_input_file
from geneo4petsc_tpu.models import graph, laplacian
from geneo4petsc_tpu.partition.decompose import (decompose,
                                                 partition_and_decompose)
from geneo4petsc_tpu.partition.kway import (dual_graph, kway_partition,
                                            nodal_graph, partition_mesh,
                                            partition_structured_grid)


@pytest.fixture
def lap2d():
    return laplacian.get_input("--size 8 --dim 2")


def test_single_partition_skips(lap2d):
    ep, np_ = partition_mesh(lap2d, 1)
    assert (ep == 0).all() and (np_ == 0).all()


def test_kway_balance_and_coverage(lap2d):
    for k in (2, 4, 7):
        ep, _ = partition_mesh(lap2d, k, dual=True)
        sizes = np.bincount(ep, minlength=k)
        assert sizes.sum() == lap2d.n_elems
        assert sizes.min() > 0
        assert sizes.max() <= np.ceil(lap2d.n_elems / k * 1.1) + 1


def test_kway_deterministic(lap2d):
    e1, n1 = partition_mesh(lap2d, 4, dual=True)
    e2, n2 = partition_mesh(lap2d, 4, dual=True)
    assert (e1 == e2).all() and (n1 == n2).all()


def test_kway_connectivity_quality(lap2d):
    """Partition cut should be far below total edges (sanity, not optimality)."""
    ptr, idx = dual_graph(lap2d)
    part = kway_partition(ptr, idx, lap2d.n_elems, 4)
    cut = sum((part[idx[ptr[v]:ptr[v + 1]]] != part[v]).sum()
              for v in range(lap2d.n_elems)) // 2
    total = len(idx) // 2
    assert cut < 0.45 * total


def test_nodal_mode_elements_multi_partition(lap2d):
    d = partition_and_decompose(lap2d, 4, metis_dual=False)
    # nodal: border elements belong to several domains
    assert d.elem_mult.max() > 1
    # every element covered
    assert d.elem_mult.min() >= 1


def test_dual_mode_elements_unique(lap2d):
    d = partition_and_decompose(lap2d, 4, metis_dual=True, add_overlap=0)
    assert (d.elem_mult == 1).all()


def test_overlap_growth(lap2d):
    d0 = partition_and_decompose(lap2d, 4, add_overlap=0)
    d1 = partition_and_decompose(lap2d, 4, add_overlap=1)
    d2 = partition_and_decompose(lap2d, 4, add_overlap=2)
    assert d1.dom_sizes.sum() > d0.dom_sizes.sum()
    assert d2.dom_sizes.sum() > d1.dom_sizes.sum()
    assert d1.elem_mult.max() > 1  # overlap duplicates elements


def test_node_mult_is_domain_count(lap2d):
    d = partition_and_decompose(lap2d, 4, add_overlap=1)
    for n in range(lap2d.n_nodes):
        count = sum(1 for p in range(4) if n in set(d.dom_nodes[p]))
        assert count == d.node_mult[n]


def test_intersections_are_symmetric_local_indices(lap2d):
    d = partition_and_decompose(lap2d, 4, add_overlap=1)
    for p in range(4):
        for q in range(4):
            if p == q:
                continue
            gp = d.dom_nodes[p][d.intersections[p][q]]
            gq = d.dom_nodes[q][d.intersections[q][p]]
            assert (np.sort(gp) == np.sort(gq)).all()


def test_domain_nodes_sorted(lap2d):
    d = partition_and_decompose(lap2d, 4)
    for p in range(4):
        assert (np.diff(d.dom_nodes[p]) > 0).all()


def test_irregular_graph_partition():
    g = graph.get_input("--size 4 --level 1")
    d = partition_and_decompose(g, 3)
    assert d.dom_sizes.min() > 0
    assert d.node_mult.max() >= 2  # hub node (ground) shared


def test_more_parts_than_data():
    m = read_input_file("/root/reference/tst/dummy/identity.inp")
    # 8 elements over 6 partitions: empty domains allowed (reference warns
    # and shrinks the communicator; we mask-and-pad)
    d = partition_and_decompose(m, 6)
    assert d.n_dom == 6
    assert d.dom_sizes.sum() >= m.n_nodes


def test_structured_grid_partition():
    part = partition_structured_grid((8, 8), (2, 2))
    assert part.shape == (64,)
    sizes = np.bincount(part)
    assert (sizes == 16).all()
    # node id = i + 8j: the first row (j=0, ids 0..7) spans exactly 2 bricks
    assert len(np.unique(part[:8])) == 2


def test_ranges_zero_sizes():
    # regression: zero-size segments must not corrupt later offsets
    from geneo4petsc_tpu.partition.decompose import _ranges
    assert _ranges(np.array([2, 0, 3])).tolist() == [0, 1, 0, 1, 2]
    assert _ranges(np.array([0, 2])).tolist() == [0, 1]
    assert _ranges(np.array([0, 0])).tolist() == []
    assert _ranges(np.array([3])).tolist() == [0, 1, 2]


def test_local_index_out_of_range(lap2d):
    d = partition_and_decompose(lap2d, 4)
    # a gid greater than every domain node must raise ValueError (not
    # IndexError) — regression for the searchsorted out-of-bounds access
    import pytest as _pytest
    with _pytest.raises(ValueError):
        d.local_index(0, np.array([10 ** 9]))
    loc = d.local_index(0, d.dom_nodes[0][:3])
    assert loc.tolist() == [0, 1, 2]
