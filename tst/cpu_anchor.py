"""Measured CPU baseline denominator for bench.py's vs_baseline.

The reference's headline claim is a 64-rank MPI CPU run (BASELINE.md #5:
"setup+solve wall-clock beating a 64-rank MPI CPU run").  PETSc/MUMPS
cannot be built in this image, so this script measures the SAME
algorithm with the closest available CPU stack — a faithful
single-core GenEO-ASM,E1 solve built on scipy:

  * per-domain sparse LU via ``splu`` (SuperLU — the MUMPS role,
    directLocalSolve, src/geneo.cpp:94-124);
  * local generalized eigenproblems via ``eigsh`` shift-invert (ARPACK —
    the very library SLEPc drives in the reference, src/geneo.cpp:626-780);
  * D-weighted coarse basis Z, dense E = Z^T A Z Cholesky
    (src/geneo.cpp:355-450, 1028-1095);
  * E1 efficient-hybrid initial guess + ASM level-1 PCG with PETSc
    stopping semantics (src/geneo.cpp:1590-1608, 1962-2038).

Problem: the bench's own configuration at 1M DOF — 3D high-contrast
(1e4) minmax Laplacian, 4^3 box domains, overlap 2, cut=2 modes/domain,
manufactured RHS, converged to TRUE ||Ax-b||/||b|| <= 1e-8.

The 64-rank target is derived as anchor_s_per_mdof / 64 at an assumed
parallel efficiency of 1.0 — IDEAL linear scaling, deliberately the
hardest-to-beat (most conservative) target: real 64-rank GenEO runs lose
efficiency to the coarse solve, setup communication, and the rank-0
input bottleneck (SURVEY.md §2.2), all of which would only make the
real CPU wall LARGER than this target.

Usage:  python tst/cpu_anchor.py [--size 108] [--update]
  --update pins tst/golden/cpu_anchor.json (read by bench.py).
Run on an otherwise-idle host: contention inflates the anchor and would
flatter vs_baseline.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import scipy.linalg as sla
import scipy.sparse as sp
import scipy.sparse.linalg as spla

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden", "cpu_anchor.json")


def build_csr(grid) -> sp.csr_matrix:
    """Assembled global 7-point operator as CSR from the grid's host
    stencil fields (same matrix the TPU bench solves)."""
    nz, ny, nx = grid.shape[::-1]
    n = nx * ny * nz
    idx = np.arange(n).reshape(nz, ny, nx)
    rows = [idx.ravel()]
    cols = [idx.ravel()]
    vals = [grid.diag().ravel()]
    for axis in range(3):
        if grid.shape[axis] == 1:
            continue
        ax = 2 - axis
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(None, -1)
        hi[ax] = slice(1, None)
        lo, hi = tuple(lo), tuple(hi)
        c = grid.edge_off(axis)[lo].ravel()
        vlo, vhi = idx[lo].ravel(), idx[hi].ravel()
        rows += [vlo, vhi]
        cols += [vhi, vlo]
        vals += [c, c]
    a = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    return a.tocsr()


def box_domains(shape, dom_grid, overlap):
    """Per-domain (z, y, x) slice bounds: equal box split grown by
    ``overlap`` layers each side (the structured decomposition)."""
    nx, ny, nz = shape
    gx, gy, gz = dom_grid
    doms = []
    for dz in range(gz):
        for dy in range(gy):
            for dx in range(gx):
                b = []
                for g, d, m in ((gz, dz, nz), (gy, dy, ny), (gx, dx, nx)):
                    lo = d * m // g
                    hi = (d + 1) * m // g
                    b.append((max(lo - overlap, 0), min(hi + overlap, m)))
                doms.append(tuple(b))
    return doms


def domain_nodes(bounds, shape):
    nx, ny, nz = shape
    (z0, z1), (y0, y1), (x0, x1) = bounds
    idx = np.arange(nx * ny * nz).reshape(nz, ny, nx)
    return idx[z0:z1, y0:y1, x0:x1].ravel()


def run_anchor(size, dom=4, overlap=2, cut=2, verbose=True, tau=None,
               eig_tol=1e-3):
    """Run the full scipy GenEO-ASM,E1 solve; returns the record dict.

    This is an INDEPENDENT implementation of the algorithm (scipy
    splu/eigsh/numpy CG — no code shared with geneo4petsc_tpu's solver
    stack beyond the coefficient-field generator), so its iteration
    count is a cross-implementation anchor in the PETSc+SLEPc role:
    tests/test_cross_impl.py asserts the TPU path reproduces it.

    ``tau``: keep only eigenpairs with lambda <= tau (at least one per
    domain — the reference's [0,tau] filter + non-empty rule,
    src/geneo.cpp:713-714, :1303-1314).  None (the perf-anchor default)
    keeps all ``cut`` modes, matching the pinned cpu_anchor.json."""
    from geneo4petsc_tpu.structured.grid import laplacian_grid

    grid = laplacian_grid(size, dim=3, kappa_max=10000.0,
                          interp="minmax")
    n = grid.n_nodes
    shape = grid.shape
    x_true, b = grid.manufactured_rhs()

    if verbose:
        print(f"anchor: n={n} ({size}^3), {dom}^3 domains, overlap "
              f"{overlap}, cut={cut}", flush=True)

    # ---------------- setup phase (timed) ----------------
    t_setup0 = time.perf_counter()
    A = build_csr(grid)

    doms = box_domains(shape, (dom,) * 3, overlap)
    nodes = [domain_nodes(bd, shape) for bd in doms]

    # node multiplicity (partition-of-unity input, geneo4PETSc.cpp:341)
    mult = np.zeros(n)
    for nd in nodes:
        mult[nd] += 1.0

    # per-edge element multiplicity: #domains containing BOTH endpoints
    # (element PoU weights, geneo4PETSc.cpp:473-476).  For box domains a
    # node's membership is an interval product, so edge mult = number of
    # domains containing both endpoints.
    in_dom = np.zeros((len(doms), n), dtype=bool)
    for d, nd in enumerate(nodes):
        in_dom[d, nd] = True

    idx3 = np.arange(n).reshape(shape[::-1])
    edge_pairs = []           # (v_lo, v_hi, off_val, diag_val, emult)
    for axis in range(3):
        if shape[axis] == 1:
            continue
        ax = 2 - axis
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(None, -1)
        hi[ax] = slice(1, None)
        lo, hi = tuple(lo), tuple(hi)
        vlo, vhi = idx3[lo].ravel(), idx3[hi].ravel()
        off = grid.edge_off(axis)[lo].ravel()
        dia = grid.edge_diag(axis)[lo].ravel()
        emult = (in_dom[:, vlo] & in_dom[:, vhi]).sum(0).astype(float)
        edge_pairs.append((vlo, vhi, off, dia, np.maximum(emult, 1.0)))
    bc = grid.bc_val().ravel()

    lus, zs = [], []
    glob2loc = np.full(n, -1, dtype=np.int64)
    setup_eig_s = 0.0
    for d, nd in enumerate(nodes):
        nl = len(nd)
        glob2loc[:] = -1
        glob2loc[nd] = np.arange(nl)
        a_dir = A[nd][:, nd].tocsc()

        # Neumann: member edges weighted 1/elemMult + BC ghosts / nodeMult
        rows, cols, vals = [], [], []
        dloc = np.zeros(nl)
        for vlo, vhi, off, dia, em in edge_pairs:
            m = in_dom[d, vlo] & in_dom[d, vhi]
            il, ih = glob2loc[vlo[m]], glob2loc[vhi[m]]
            w = 1.0 / em[m]
            rows += [il, ih]
            cols += [ih, il]
            vals += [off[m] * w, off[m] * w]
            np.add.at(dloc, il, dia[m] * w)
            np.add.at(dloc, ih, dia[m] * w)
        dloc += bc[nd] / mult[nd]
        iden = np.arange(nl)
        a_neu = sp.coo_matrix(
            (np.concatenate(vals + [dloc]),
             (np.concatenate(rows + [iden]),
              np.concatenate(cols + [iden]))), shape=(nl, nl)).tocsr()

        # level-1 direct solver (MUMPS role)
        lus.append(spla.splu(a_dir))

        # GenEO-1 pencil: A_Neu v = lambda (D A_Dir D) v, smallest modes
        # (Def 7.14 of R1; shift-invert ARPACK exactly as the reference,
        # geneo.cpp:635-650).  sigma slightly negative: A_Neu is singular
        # on floating domains (the MUMPS null-pivot situation).
        dv = 1.0 / mult[nd]
        b_dad = sp.diags(dv) @ a_dir @ sp.diags(dv)
        t0 = time.perf_counter()
        # deterministic ARPACK start vector: v0=None draws from numpy's
        # GLOBAL RNG, so the anchor's kept eigenvectors (and hence its
        # CG count, by +-1 near the stopping boundary) would depend on
        # whatever ran before in the process (observed as test-order
        # flakiness in tests/test_cross_impl.py)
        v0 = np.random.default_rng(1234 + nd).standard_normal(
            a_neu.shape[0])
        _w, v = spla.eigsh(a_neu.tocsc(), k=cut, M=b_dad.tocsc(),
                           sigma=-1e-6 * float(dloc.mean()), which="LM",
                           tol=eig_tol, maxiter=2000, v0=v0)
        setup_eig_s += time.perf_counter() - t0
        if tau is not None:
            order = np.argsort(_w)
            keep = order[_w[order] <= tau]
            if keep.size == 0:          # non-empty rule
                keep = order[:1]
            v = v[:, keep]
        zs.append(dv[:, None] * v)      # D-weighted basis ((7.49) R1)

    # global Z, E = Z^T A Z (MatPtAP role), dense Cholesky
    k_tot = sum(z.shape[1] for z in zs)
    Z = sp.lil_matrix((n, k_tot))
    col = 0
    for nd, z in zip(nodes, zs):
        Z[nd, col:col + z.shape[1]] = z
        col += z.shape[1]
    Z = Z.tocsr()
    E = np.asarray((Z.T @ (A @ Z)).todense())
    e_cho = sla.cho_factor(E)
    t_setup = time.perf_counter() - t_setup0

    # ---------------- solve phase (timed) ----------------
    t_solve0 = time.perf_counter()

    def m_inv(r):
        y = np.zeros(n)
        for nd, lu in zip(nodes, lus):
            y[nd] += lu.solve(r[nd])       # ASM: no D weighting
        return y

    # E1 initial guess x0 = Z E^-1 Z^T b (geneo.cpp:1601-1604)
    x = Z @ sla.cho_solve(e_cho, Z.T @ b)
    r = b - A @ x
    nb = np.linalg.norm(b)
    z = m_inv(r)
    p = z.copy()
    rz = r @ z
    its = 0
    for its in range(1, 1001):
        Ap = A @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        if np.linalg.norm(r) <= 1e-8 * nb:
            break
        z = m_inv(r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    t_solve = time.perf_counter() - t_solve0

    true_res = float(np.linalg.norm(b - A @ x) / nb)
    err = float(np.abs(x - x_true).max()) / n
    mdof = n / 1e6
    anchor = (t_setup + t_solve) / mdof
    efficiency = 1.0        # ideal linear 64-rank scaling (conservative)
    target = anchor / (64 * efficiency)
    rec = {
        "config": f"{size}^3 3D minmax kappa_max=1e4 Laplacian, "
                  f"{dom}^3 domains, overlap {overlap}, "
                  f"GenEO-ASM,E1 cut={cut}, scipy splu/eigsh(ARPACK), "
                  "single core, true 1e-8",
        "n_dof": n,
        "anchor_s_per_mdof": round(anchor, 2),
        "setup_s": round(t_setup, 2),
        "setup_eig_s": round(setup_eig_s, 2),
        "solve_s": round(t_solve, 2),
        "iterations": its,
        "dim_e": k_tot,
        "true_res": true_res,
        "rel_err_max": err,
        "parallel_efficiency": efficiency,
        "efficiency_note": "ideal 64-rank linear scaling — conservative "
                           "(hardest-to-beat) target; real MPI runs lose "
                           "efficiency to coarse solve + setup comm",
        "target_s_per_mdof": round(target, 3),
        "reproduce": f"python tst/cpu_anchor.py --size {size}",
    }
    if verbose:
        print(json.dumps(rec, indent=1), flush=True)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=108,
                    help="grid edge (108^3 = 1.26M DOF, the 1M config)")
    ap.add_argument("--dom", type=int, default=4)
    ap.add_argument("--overlap", type=int, default=2)
    ap.add_argument("--cut", type=int, default=2)
    ap.add_argument("--update", action="store_true")
    a = ap.parse_args()
    rec = run_anchor(a.size, a.dom, a.overlap, a.cut)
    if rec["true_res"] > 1e-8:
        print("ERROR: did not reach true 1e-8", file=sys.stderr)
        return 1
    if a.update:
        with open(GOLDEN, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")
        print(f"pinned {GOLDEN}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
