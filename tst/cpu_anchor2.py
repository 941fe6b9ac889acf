"""Independent iteration anchors beyond GenEO-ASM,E1 (VERDICT r04 #5).

tst/cpu_anchor.py pins ONE cross-implementation anchor (ASM,E1 on the
Laplacian).  This module widens the matrix: an independent scipy/numpy
implementation of

  * one-level Schwarz            (lvl2 = 0: ASM / SORAS level-1 only)
  * GenEO-1 efficient hybrid     (lvl2 = E1, tau window)
  * GenEO-2 additive two-level   (lvl2 = 2: both pencils, adaptive
                                  tauLoc/gammaLoc, Nicolaides, SORAS)

over BOTH structured workloads (high-contrast Laplacian and the heat
implicit-Euler step), playing the PETSc+SLEPc role of BASELINE.md's
"identical iteration counts" north star.

Independence discipline (same as cpu_anchor.py): scipy ``splu`` in the
MUMPS role (src/geneo.cpp:94-124), scipy ``eigsh`` shift-invert in the
SLEPc/ARPACK role (src/geneo.cpp:626-780), LAPACK ``eigh`` for the
connectivity eigenvalue (src/geneo.cpp:1182-1202), a hand-written numpy
PCG with PETSc stopping semantics.  The ONLY package imports are the
coefficient-field generators (structured.grid) — the solver stack is
re-derived from the reference's equations:

  * tau pencil     A_Neu v = lambda B v, keep lambda <= tau(Loc)
                   (Def 7.14 of R1 for GenEO-1 with B = D A_Dir D;
                   (19) of R4 for GenEO-2 with B = A_Rob)
  * gamma pencil   D A_Dir D v = lambda A_Rob v, keep lambda >= gammaLoc
                   ((21) of R4)
  * tauLoc  = min(k * tau, 0.9), k = max DOF multiplicity
                   (getLocalGenEOTau, src/geneo.cpp:1097-1118)
  * gammaLoc = gamma / lambda_max(C f f^T) * f_p^2 clamped to 1.1,
                   C = non-intersection matrix + I, f = 1/rowsum(C)
                   (getLocalGenEOGamma, src/geneo.cpp:1120-1232 — the
                   CODE's inverted intersection test, as the repo
                   documents)
  * Robin    A_Dir + optim * (border-restricted A_Neu), border =
                   mult > 1 (createRobinMatrix, src/geneo.cpp:1613-1670)
  * Nicolaides     constant-vector near-kernel test + forbidden-empty-
                   set rule (src/geneo.cpp:897-955, :1303-1314)
  * coarse   Z = D-weighted eigvecs ((7.49) R1), E = Z^T A Z, pivoted-
                   Cholesky rank prune, SPD factor

Used by tests/test_cross_impl.py to assert the TPU structured path
reproduces these counts exactly at 12^3-class sizes and within the
conditioning band at 24^3-class (see that module's docstring for the
band rationale).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import scipy.linalg as sla
import scipy.sparse as sp
import scipy.sparse.linalg as spla

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cpu_anchor import box_domains, build_csr, domain_nodes  # noqa: E402


def _neumann_local(grid, shape, in_dom_d, nd, glob2loc, mult):
    """Weighted local Neumann matrix of one domain (the MatIS local
    block: member edges / elem_mult + BC ghosts / node_mult,
    geneo4PETSc.cpp:473-476)."""
    nl = len(nd)
    idx3 = np.arange(np.prod(shape)).reshape(shape[::-1])
    rows, cols, vals = [], [], []
    dloc = np.zeros(nl)
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
        m = in_dom_d["member"][axis]
        em = in_dom_d["emult"][axis]
        il, ih = glob2loc[vlo[m]], glob2loc[vhi[m]]
        w = 1.0 / em[m]
        rows += [il, ih]
        cols += [ih, il]
        vals += [off[m] * w, off[m] * w]
        np.add.at(dloc, il, dia[m] * w)
        np.add.at(dloc, ih, dia[m] * w)
    dloc += grid.bc_val().ravel()[nd] / mult[nd]
    iden = np.arange(nl)
    return sp.coo_matrix(
        (np.concatenate(vals + [dloc]),
         (np.concatenate(rows + [iden]), np.concatenate(cols + [iden]))),
        shape=(nl, nl)).tocsr()


def _edge_membership(grid, shape, in_dom):
    """Per-axis (member mask per domain, edge multiplicity) tables."""
    idx3 = np.arange(np.prod(shape)).reshape(shape[::-1])
    out = []
    for d in range(in_dom.shape[0]):
        memb, emult = {}, {}
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
            both = in_dom[:, vlo] & in_dom[:, vhi]
            memb[axis] = in_dom[d, vlo] & in_dom[d, vhi]
            emult[axis] = np.maximum(both.sum(0).astype(float), 1.0)
        out.append({"member": memb, "emult": emult})
    return out


def _gamma_loc_independent(dom_grid, inner, pad, gamma):
    """getLocalGenEOGamma re-derived from the reference code path: the
    connectivity matrix uses the INVERTED intersection test the code
    actually performs (C[p][q] = 1 iff p, q do NOT intersect; unit diag),
    F = 1/rowsum(C), M = C * F F^T, gammaLoc = gamma/lambda_max * F^2
    clamped to 1.1."""
    gx, gy, gz = dom_grid
    n_dom = gx * gy * gz
    d = np.arange(n_dom)
    pos = np.stack([d % gx, (d // gx) % gy, d // (gx * gy)])
    rad = [(inner[a] + 2 * pad[a] - 1) // inner[a]
           if (gx, gy, gz)[a] > 1 else 0 for a in range(3)]
    inter = np.ones((n_dom, n_dom), dtype=bool)
    for a in range(3):
        delta = np.abs(pos[a][:, None] - pos[a][None, :])
        inter &= delta <= rad[a]
    c = (~inter).astype(float)
    np.fill_diagonal(c, 1.0)
    f = 1.0 / c.sum(axis=1)
    m = c * f[:, None] * f[None, :]
    lam = float(np.max(np.abs(sla.eigvalsh(m))))
    g = gamma / lam * f * f
    return np.where(g <= 1.0, 1.1, g)


def run_pc_anchor(grid, dom=2, overlap=2, lvl1="ASM", lvl2="E1",
                  tau=0.1, gamma=10.0, optim=0.0, eig_k=8,
                  eig_tol=1e-10, tol=1e-8, max_it=2000, cut=-1):
    """Full independent GenEO solve on a StructuredGrid.

    ``cut``: cap on kept modes per domain (halved between the two
    GenEO-2 pencils, src/geneo.cpp:1275); -1 = window-only selection.
    Returns dict(iterations, dim_e, true_res, counts per domain)."""
    n = grid.n_nodes
    shape = grid.shape
    x_true, b = grid.manufactured_rhs()
    b = np.asarray(b, np.float64)

    A = build_csr(grid)
    doms = box_domains(shape, (dom,) * 3, overlap)
    nodes = [domain_nodes(bd, shape) for bd in doms]
    n_dom = len(doms)

    mult = np.zeros(n)
    in_dom = np.zeros((n_dom, n), dtype=bool)
    for d, nd in enumerate(nodes):
        mult[nd] += 1.0
        in_dom[d, nd] = True
    edge_tabs = _edge_membership(grid, shape, in_dom)

    # adaptive thresholds (GenEO-2)
    inner = [shape[a] // dom for a in range(3)]
    pads = [overlap if dom > 1 else 0] * 3
    tau_loc = np.minimum(
        np.array([mult[nd].max() for nd in nodes]) * tau, 0.9)
    gamma_loc = _gamma_loc_independent((dom,) * 3, inner, pads, gamma)

    lvl2_num = {"0": 0, "E1": 1, "1": 1, "2": 2}[lvl2]
    soras = lvl1 == "SORAS"
    cut_p = cut
    if lvl2_num == 2 and cut_p >= 2:
        cut_p = cut_p // 2                 # halved (geneo.cpp:1275)
    if cut_p > 0:
        eig_k = max(eig_k, cut_p + 2)

    glob2loc = np.full(n, -1, dtype=np.int64)
    lus, zs, counts = [], [], []
    for d, nd in enumerate(nodes):
        nl = len(nd)
        glob2loc[:] = -1
        glob2loc[nd] = np.arange(nl)
        a_dir = A[nd][:, nd].tocsc()
        a_neu = _neumann_local(grid, shape, edge_tabs[d], nd, glob2loc,
                               mult)
        dv = 1.0 / mult[nd]

        if soras:
            # Robin = Dirichlet + optim * border-restricted Neumann
            border = mult[nd] > 1.0
            bsel = sp.diags(border.astype(float))
            a_rob = (a_dir
                     + optim * (bsel @ a_neu @ bsel)).tocsc()
            l1_mat = a_rob
        else:
            a_rob = None
            l1_mat = a_dir
        lus.append(spla.splu(l1_mat))

        if lvl2_num == 0:
            zs.append(np.zeros((nl, 0)))
            counts.append(0)
            continue

        b_dad = (sp.diags(dv) @ a_dir @ sp.diags(dv)).tocsc()
        def _count(raw, k_got, label):
            """Window count with the production cut cap: min(raw, cut);
            window-only selection must see past the window edge."""
            if cut_p > 0:
                return min(raw, cut_p)
            assert raw < k_got, f"eig_k too small for {label}"
            return raw

        cols = []
        sig = -1e-6 * float(np.abs(a_neu.diagonal()).mean())
        thr1 = tau if lvl2_num == 1 else tau_loc[d]
        b_tau = b_dad if lvl2_num == 1 else a_rob
        # tau pencil: (A_Neu, D A_Dir D) for GenEO-1 (Def 7.14 R1),
        # (A_Neu, A_Rob) for GenEO-2 ((19) R4); keep lambda <= thr
        k_req = min(eig_k, nl - 1)
        ncv = min(nl, max(4 * k_req, 40))   # ARPACK breathing room: the
        # default 2k+1 subspace stalls on the heat pencil's clustered
        # low end (observed: 6/8 pairs at 5000 its)
        # deterministic ARPACK start: v0=None uses numpy's GLOBAL RNG
        # and makes the anchor's count test-order-dependent (+-1 near
        # the stopping boundary on the ill-conditioned heat pencil)
        v0 = np.random.default_rng(1234 + d).standard_normal(nl)
        w, v = spla.eigsh(a_neu.tocsc(), k=k_req, M=b_tau, sigma=sig,
                          which="LM", tol=eig_tol, maxiter=20000,
                          ncv=ncv, v0=v0)
        order = np.argsort(w)
        w, v = w[order], v[:, order]
        base1 = _count(int((w <= thr1).sum()), k_req, "tau window")
        cols.append(v[:, :base1])
        kept_min = w[:base1].min() if base1 else np.inf

        base2 = 0
        if lvl2_num == 2:
            # gamma pencil (D A_Dir D, A_Rob), keep lambda >= gammaLoc
            wg, vg = spla.eigsh(b_dad, k=k_req, M=a_rob,
                                which="LA", tol=eig_tol, maxiter=20000,
                                ncv=ncv, v0=v0)
            order = np.argsort(wg)[::-1]            # descending
            wg, vg = wg[order], vg[:, order]
            base2 = _count(int((wg >= gamma_loc[d]).sum()), k_req,
                           "gamma window")

        # Nicolaides near-kernel test on the tau pencil
        ones = np.ones(nl)
        nic = False
        if not (base1 > 0 and kept_min < np.finfo(np.float64).eps):
            num = ones @ (a_neu @ ones)
            den = ones @ (b_tau @ ones)
            ratio = abs(num / den) if den != 0 else np.inf
            if ratio <= np.finfo(np.float32).eps or base1 + base2 == 0:
                nic = True
        if nic:
            cols.append(ones[:, None])
        if base2:
            cols.append(vg[:, :base2])

        z = np.concatenate(cols, axis=1) if cols else np.zeros((nl, 0))
        zs.append(dv[:, None] * z)                  # (7.49) of R1
        counts.append(z.shape[1])

    dim_e = int(sum(counts))
    its = 0
    e_solve = None
    if lvl2_num > 0:
        Z = sp.lil_matrix((n, dim_e))
        col = 0
        for nd, z in zip(nodes, zs):
            Z[nd, col:col + z.shape[1]] = z
            col += z.shape[1]
        Z = Z.tocsr()
        E = np.asarray((Z.T @ (A @ Z)).todense())
        E = 0.5 * (E + E.T)
        # pivoted-Cholesky rank prune (dependent coarse columns)
        if dim_e:
            from scipy.linalg.lapack import dpstrf
            dmax = float(np.diagonal(E).max(initial=0.0))
            ptol = dim_e * np.finfo(np.float64).eps * dmax
            _c, piv, rank, _info = dpstrf(E, lower=1, tol=ptol)
            if int(rank) < dim_e:
                keep = np.sort(piv[:int(rank)] - 1)
                Z = Z[:, keep]
                E = E[np.ix_(keep, keep)]
                dim_e = int(rank)
        e_cho = sla.cho_factor(E)
        e_solve = lambda w: sla.cho_solve(e_cho, w)  # noqa: E731

    def q_apply(r):
        return Z @ e_solve(Z.T @ r)

    def l1_apply(r):
        y = np.zeros(n)
        for d, (nd, lu) in enumerate(zip(nodes, lus)):
            rl = r[nd]
            if soras:
                dv = 1.0 / mult[nd]
                y[nd] += dv * lu.solve(dv * rl)     # D both sides
            else:
                y[nd] += lu.solve(rl)               # ASM
        return y

    if lvl2_num > 0 and lvl2 == "E1":
        x = q_apply(b)                 # efficient-hybrid initial guess

        def m_inv(r):
            return l1_apply(r)
    elif lvl2_num > 0:
        x = np.zeros(n)                # additive two-level

        def m_inv(r):
            return q_apply(r) + l1_apply(r)
    else:
        x = np.zeros(n)
        m_inv = l1_apply

    r = b - A @ x
    nb = np.linalg.norm(b)
    z = m_inv(r)
    p = z.copy()
    rz = r @ z
    for its in range(1, max_it + 1):
        Ap = A @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        if np.linalg.norm(r) <= tol * nb:
            break
        z = m_inv(r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new

    true_res = float(np.linalg.norm(b - A @ x) / nb)
    return {
        "iterations": its,
        "dim_e": dim_e,
        "counts": counts,
        "true_res": true_res,
        "rel_err_max": float(np.abs(x - np.asarray(x_true)).max()) / n,
        "converged": true_res <= tol * 1.01,
    }


def main():
    """Smoke run: print the anchor table for the small configs."""
    from geneo4petsc_tpu.structured.grid import heat_grid, laplacian_grid

    for name, gf in (("laplacian",
                      lambda s: laplacian_grid(s, dim=3, kappa_max=1e4,
                                               interp="minmax")),
                     ("heat",
                      lambda s: heat_grid(s, dim=3, kappa_max=1e4,
                                          interp="minmax", lbd=1.0,
                                          dt=0.1))):
        for lvl1, lvl2, optim, cut in (("ASM", "0", 0.0, -1),
                                       ("ASM", "E1", 0.0, -1),
                                       ("SORAS", "2", 1.0, 4)):
            rec = run_pc_anchor(gf(12), dom=2, overlap=2, lvl1=lvl1,
                                lvl2=lvl2, optim=optim, cut=cut)
            print(f"{name:10s} {lvl1:6s},{lvl2:3s} -> its="
                  f"{rec['iterations']:4d} dim_e={rec['dim_e']:3d} "
                  f"true_res={rec['true_res']:.2e} "
                  f"conv={rec['converged']}", flush=True)


if __name__ == "__main__":
    main()
