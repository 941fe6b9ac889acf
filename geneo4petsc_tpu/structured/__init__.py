"""Structured-grid GenEO backend — the large-scale (10M+ DOF) path.

The generic path (assembly/, precond/geneo.py) stores each subdomain as a
dense [n_max, n_max] block: exact MatIS semantics, but O(n_loc^2) memory
caps it at ~1M DOF.  The reference escapes that wall with MUMPS sparse
factorizations (src/geneo.cpp:94-124) and sparse SLEPc operators
(:626-780).  This package is the TPU-native equivalent for structured
grids: subdomains are boxes, local operators are 7-point stencils, and the
per-domain direct solves are block-tridiagonal Schur-complement
factorizations over grid planes — batched matmul scans on the MXU with
O(n_loc * s2) memory (s2 = plane size), the banded-Cholesky analogue of
MUMPS on a tensor grid.
"""

from .grid import (StructuredGrid, heat_grid, inclusion_grid,
                   laplacian_grid)

__all__ = ["StructuredGrid", "heat_grid", "inclusion_grid",
           "laplacian_grid"]
