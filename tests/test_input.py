"""Input-layer tests: element-list format parser, default matrices, RHS.

Reference behaviors: readInputFile/readLineFile (src/geneo4PETSc.cpp:98-194),
createB (:807-894).
"""

import numpy as np
import pytest

from geneo4petsc_tpu.io import element_input as ei


def test_default_elem_mat():
    m = ei.default_elem_mat(4, 0.5)
    assert np.allclose(np.diag(m), 1.5)
    off = m[~np.eye(4, dtype=bool)]
    assert np.allclose(off, -1.0 / 3.0)


def test_parse_tridiag_reference_file():
    m = ei.read_input_file("/root/reference/tst/dummy/tridiag.inp",
                           inp_eps=1.0)
    assert m.n_nodes == 8
    assert m.n_elems == 7
    # first/last elements carry explicit matrices, middle ones defaults
    assert np.allclose(m.elem_mats[0], [[4, -1], [-1, 2]])
    assert np.allclose(m.elem_mats[6], [[2, -1], [-1, 4]])
    assert np.allclose(m.elem_mats[3], [[2, -1], [-1, 2]])


def test_parse_identity_reference_file():
    m = ei.read_input_file("/root/reference/tst/dummy/identity.inp")
    assert m.n_nodes == 8
    from geneo4petsc_tpu.assembly.assemble import assemble_global_csr
    a = assemble_global_csr(m).toarray()
    assert np.allclose(a, np.eye(8))


def test_rhs_file():
    b = ei.read_rhs_file("/root/reference/tst/dummy/B.inp", 8)
    assert np.allclose(b, np.arange(1, 9))


def test_roundtrip(tmp_path):
    m = ei.from_lists([[0, 1], [1, 2], [2]], None, inp_eps=0.25)
    path = tmp_path / "t.inp"
    ei.write_input_file(m, str(path))
    m2 = ei.read_input_file(str(path))
    assert m2.n_nodes == m.n_nodes
    for a, b in zip(m.elem_mats, m2.elem_mats):
        assert np.allclose(a, b)


def test_bad_node_set_rejected():
    with pytest.raises(ValueError):
        ei.from_lists([[0, 2]], None)  # node 1 missing


def test_manufactured_solution():
    assert np.allclose(ei.manufactured_solution(4), [1, 2, 3, 4])
