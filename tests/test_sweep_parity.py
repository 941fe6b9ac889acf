"""Sweep-matrix CONTENT parity vs the reference's pinned plot goldens.

The full-sweep goldens (tst/golden/*PlotFull.ref, produced by
`tst/check.py <wl> --full`) mirror the reference's headline plot
invocation (laplacianPlot.sh #1: -fi "metis=dual" "ksp=gmres").  This test
asserts the pinned surface-name SET equals the reference's 58-surface set
per scaling, modulo the honest solver-token substitutions:

    L1=mumps        -> L1=cholesky      (batched dense factorization)
    arpack+mumps    -> eigh+cholesky    (batched eigensolve + coarse factor)
    geneo-0 surfaces: the reference appends -distribE even without a
    coarse space; the repo's names only carry distrib/offload when L2
    exists — stripped on the reference side.

This pins the CONFIG MATRIX itself (tau/gamma structure incl. the
reference's gamma-strip bash quirk for overlap-1 GenEO-2 entries, the mg
entry with its W-cycle options, geneo-0 single-variant rule) — count
parity alone passes by construction and proved too weak (round-2
verdict)."""

import os
import re

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(os.path.dirname(HERE), "tst", "golden")
REF = "/root/reference/tst"

_SURF = re.compile(r"Info:\s+=> plotting surface (\S+) \((strong|weak) "
                   r"scaling\)")


def _first_blocks(path):
    """{scaling: set(surfaces)} from the FIRST plot invocation only (the
    reference refs concatenate 5 invocations; #2-#5 are filtered
    subsets)."""
    out = {"strong": set(), "weak": set()}
    seen_header = 0
    for line in open(path):
        if "surfaces to plot" in line:
            seen_header += 1
            if seen_header > 2:
                break
        m = _SURF.match(line.strip())
        if m and seen_header <= 2:
            out[m.group(2)].add(m.group(1))
    return out


def _normalize_ref(name: str) -> str:
    name = name.replace("-L1=mumps", "-L1=cholesky")
    name = name.replace("arpack+mumps", "eigh+cholesky")
    if "pc=geneo0" in name:
        name = name.replace("-distribE", "")
    return name


@pytest.mark.parametrize("wl", ["laplacian", "graph"])
def test_full_sweep_surface_set_matches_reference(wl):
    ref_path = os.path.join(REF, wl, f"{wl}Plot.ref")
    got_path = os.path.join(GOLDEN, f"{wl}PlotFull.ref")
    if not os.path.exists(ref_path):
        pytest.skip("reference checkout not mounted")
    if not os.path.exists(got_path):
        pytest.skip("full-sweep golden not pinned yet")
    ref = _first_blocks(ref_path)
    got = _first_blocks(got_path)
    for scaling in ("strong", "weak"):
        want = {_normalize_ref(s) for s in ref[scaling]}
        have = got[scaling]
        assert len(want) == 58, f"reference parse drift: {len(want)}"
        missing = sorted(want - have)
        extra = sorted(have - want)
        assert not missing and not extra, (
            f"{wl} {scaling}: missing={missing[:6]} extra={extra[:6]} "
            f"({len(missing)} missing / {len(extra)} extra of 58)")
