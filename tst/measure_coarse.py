"""Replicated coarse-solve scaling measurement (VERDICT r04 #7).

The reference factorizes E = Z^T A Z with DISTRIBUTED MUMPS on
PETSC_COMM_WORLD (src/geneo.cpp:1028-1095) because dim(E) grows with
the subdomain count.  The TPU framework replicates E instead (the
idiomatic inversion of rank-0 offload: E is tiny at the headline's
dim_e=126, every device factors and applies it locally, zero
communication per iteration).  Replication has a wall: the host
factorization is O(dim_e^3) and the device factor is a dense
[dim_e, dim_e] matrix (4 bytes/entry streamed twice per apply).

This script MEASURES that wall with the production ``factor_e`` on
synthetic coarse operators carrying the real sparsity (27-neighbor
domain-grid block structure, SPD by construction):

  * host factorization wall (dpotrf+dtrtri fast path — the setup cost);
  * device apply cost model: 2 dense [K,K] streams / apply (the
    per-iteration cost when lvl2 applies every iteration; per-OUTER
    (<= 14) for the E1/E2 efficient-hybrid family);
  * factor memory as a fraction of a 16 GB v5e HBM.

Usage: python tst/measure_coarse.py [--update] [--dims 1024,4096,...]
--update pins tst/golden/coarse_scaling.json, which setup consults to
emit a WRNG when a run's dim_e crosses the measured wall
(structured/geneo.py, precond/geneo.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden", "coarse_scaling.json")

HBM_BYTES = 16e9          # v5e
HBM_GBPS = 819.0          # v5e spec


def synthetic_e(dim_e: int, k: int = 8, seed: int = 0) -> np.ndarray:
    """SPD coarse operator with the real domain-grid block sparsity:
    n_dom = dim_e/k domains on a cubic grid, k columns each, coupled to
    the 27-neighbor stencil (the structure _coarse_e assembles)."""
    rng = np.random.default_rng(seed)
    n_dom = dim_e // k
    g = max(int(round(n_dom ** (1 / 3))), 1)
    while g ** 3 < n_dom:
        g += 1
    e = np.zeros((dim_e, dim_e))
    pos = np.arange(n_dom)
    px, py, pz = pos % g, (pos // g) % g, pos // (g * g)
    for d in range(n_dom):
        for od in range(n_dom):
            if (abs(px[d] - px[od]) <= 1 and abs(py[d] - py[od]) <= 1
                    and abs(pz[d] - pz[od]) <= 1):
                blk = rng.standard_normal((k, k)) / np.sqrt(dim_e)
                e[d * k:(d + 1) * k, od * k:(od + 1) * k] = blk
    e = e @ e.T                          # PSD with the squared sparsity
    e += np.eye(dim_e) * (np.trace(e) / dim_e * 0.05 + 1e-6)
    return e


def measure(dim_e: int, k: int = 8) -> dict:
    from geneo4petsc_tpu.precond.geneo import factor_e

    e = synthetic_e(dim_e, k)
    t0 = time.perf_counter()
    w, ew, e_null = factor_e(e, np.float32, e_dtype=np.float64)
    t_factor = time.perf_counter() - t0
    assert e_null == 0, "synthetic E must be SPD"
    factor_bytes = int(w.size) * 4          # f32 on device
    apply_gb = 2 * factor_bytes / 1e9       # W and W^T streamed per apply
    return {
        "dim_e": dim_e,
        "host_factor_s": round(t_factor, 3),
        "factor_mb_f32": round(factor_bytes / 1e6, 1),
        "factor_frac_hbm": round(factor_bytes / HBM_BYTES, 4),
        "apply_gb_per_it": round(apply_gb, 4),
        "apply_ms_at_hbm_peak": round(apply_gb / HBM_GBPS * 1e3, 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="1024,4096,8192,16384")
    ap.add_argument("--update", action="store_true")
    a = ap.parse_args()
    dims = [int(d) for d in a.dims.split(",")]
    rows = []
    for d in dims:
        r = measure(d)
        rows.append(r)
        print(json.dumps(r), flush=True)

    # crossover policy: replication is sane while (a) the host factor
    # stays under ~10% of the 10M-headline setup wall (~60 s) and
    # (b) the device factor stays under ~25% of HBM.  Above either,
    # setup emits a WRNG pointing at the reference's distributed-MUMPS
    # design and the offload/eff-hybrid mitigations.
    wall = None
    for r in rows:
        if r["host_factor_s"] > 60.0 or r["factor_frac_hbm"] > 0.25:
            wall = r["dim_e"]
            break
    rec = {
        "rows": rows,
        "replication_wall_dim_e": wall or dims[-1] * 2,
        "wall_rule": "host_factor_s > 60 s or factor_frac_hbm > 0.25",
        "headline_dim_e": 126,
        "note": "measured on the build host (factor is host LAPACK); "
                "apply_ms is the HBM-peak lower bound for the 2 dense "
                "[K,K] streams per apply",
        "reproduce": "python tst/measure_coarse.py --update",
    }
    print(json.dumps({"replication_wall_dim_e":
                      rec["replication_wall_dim_e"]}))
    if a.update:
        with open(GOLDEN, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")
        print(f"pinned {GOLDEN}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
