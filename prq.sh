#!/bin/bash -eu
# Prerequisite check/build (the reference's prq.sh role: it builds
# OpenMPI/Boost/PETSc/SLEPc from source; the TPU stack's prerequisites are
# Python packages plus the native libraries built here).

echo "== python prerequisites =="
python - <<'PY'
import importlib, sys
missing = [m for m in ("jax", "numpy", "scipy", "pytest")
           if importlib.util.find_spec(m) is None]
if missing:
    sys.exit(f"missing python packages: {missing} (pip install them)")
print("python deps OK:", end=" ")
import jax, numpy, scipy
print(f"jax {jax.__version__}, numpy {numpy.__version__}, "
      f"scipy {scipy.__version__}")
PY

echo "== native libraries =="
make -C "$(dirname "$0")/native"
echo "OK"
