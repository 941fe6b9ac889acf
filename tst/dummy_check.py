"""Golden-output harness: replicate tst/dummy/dummy.sh's 84-config matrix and
diff against the REFERENCE's .ref files, normalizing only the solver-name
tokens (mumps->cholesky, arpack->eigh) which honestly differ.

Usage: python tst/dummy_check.py [--update]  (update writes tst/golden/)
"""
import io, os, re, subprocess, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from geneo4petsc_tpu import cli

REF = "/root/reference/tst/dummy"
PCS = [
    ("-pc_type bjacobi", "bjacobi", ""),
    ("-pc_type geneo -geneo_lvl ASM,0", "geneoASM0", ""),
    ("-pc_type geneo -geneo_lvl ASM,1", "geneoASM1", ""),
    ("-pc_type geneo -geneo_lvl ASM,1 --addOverlap 1", "geneoASM1", "overlap1"),
    ("-pc_type geneo -geneo_lvl ASM,1 -geneo_offload", "geneoASM1", "offload"),
    ("-pc_type geneo -geneo_lvl ASM,H1", "geneoASMH1", ""),
    ("-pc_type geneo -geneo_lvl ASM,H1 --addOverlap 1", "geneoASMH1", "overlap1"),
    ("-pc_type geneo -geneo_lvl ASM,H1 -geneo_offload", "geneoASMH1", "offload"),
    ("-pc_type geneo -geneo_lvl ASM,E1", "geneoASME1", ""),
    ("-pc_type geneo -geneo_lvl ASM,E1 --addOverlap 1", "geneoASME1", "overlap1"),
    ("-pc_type geneo -geneo_lvl ASM,E1 -geneo_offload", "geneoASME1", "offload"),
    ("-pc_type geneo -geneo_lvl SORAS,0", "geneoSORAS0", ""),
    ("-pc_type geneo -geneo_lvl SORAS,2", "geneoSORAS2", ""),
    ("-pc_type geneo -geneo_lvl SORAS,2 --addOverlap 1", "geneoSORAS2", "overlap1"),
    ("-pc_type geneo -geneo_lvl SORAS,2 -geneo_offload", "geneoSORAS2", "offload"),
    ("-pc_type geneo -geneo_lvl SORAS,H2", "geneoSORASH2", ""),
    ("-pc_type geneo -geneo_lvl SORAS,H2 --addOverlap 1", "geneoSORASH2", "overlap1"),
    ("-pc_type geneo -geneo_lvl SORAS,H2 -geneo_offload", "geneoSORASH2", "offload"),
    ("-pc_type geneo -geneo_lvl SORAS,E2", "geneoSORASE2", ""),
    ("-pc_type geneo -geneo_lvl SORAS,E2 --addOverlap 1", "geneoSORASE2", "overlap1"),
    ("-pc_type geneo -geneo_lvl SORAS,E2 -geneo_offload", "geneoSORASE2", "offload"),
]

NORM = [(re.compile(r"L1 mumps"), "L1 cholesky"),
        (re.compile(r"L2 arpack mumps"), "L2 eigh cholesky")]

def normalize(text):
    for pat, rep in NORM:
        text = pat.sub(rep, text)
    return text

def main():
    n_same = n_diff = n_missing = 0
    diffs = []
    for f in ("identity", "tridiag"):
        for pc_cmd, pc_log, opt_log in PCS:
            for metis, m_log in (("--metisDual", "dual"), ("--metisNodal", "nodal")):
                name = f"{f}-pc={pc_log}-metis={m_log}"
                if opt_log:
                    name += f"-opt={opt_log}"
                args = ["--inpFileA", f"{REF}/{f}.inp"]
                if f == "identity":
                    args += ["--inpFileB", f"{REF}/B.inp"]
                else:
                    args += ["--inpEps", "1.", "-geneo_cut", "10"]
                args += pc_cmd.split()
                args += ["--verbose", "2", "--shortRes",
                         "-ksp_atol", "1.e-12", "-ksp_rtol", "1.e-12",
                         "--nbPart", "2", metis]
                buf = io.StringIO()
                rc = cli.run(args, out=buf)
                ours = buf.getvalue()
                ref_path = f"{REF}/{name}.ref"
                if not os.path.exists(ref_path):
                    n_missing += 1
                    continue
                ref = normalize(open(ref_path).read())
                if ref == ours:
                    n_same += 1
                else:
                    n_diff += 1
                    diffs.append((name, ref, ours))
    print(f"identical: {n_same}, different: {n_diff}, missing-ref: {n_missing}")
    for name, ref, ours in diffs[:3]:
        print("=" * 30, name)
        import difflib
        sys.stdout.writelines(difflib.unified_diff(
            ref.splitlines(True), ours.splitlines(True), "ref", "ours"))
    return 1 if n_diff else 0

if __name__ == "__main__":
    sys.exit(main())
