#!/bin/bash -eu
# Static-analysis + test gate (the reference's dev.sh role: cppcheck /
# shellcheck / pylint, dev.sh:1-29).  This environment ships no external
# linters, so the gate is: byte-compile every Python module (syntax +
# import sanity), build the native libraries with -Wall -Wextra -Werror,
# and run the test suite.

cd "$(dirname "$0")"

echo "== python byte-compile =="
python -m compileall -q geneo4petsc_tpu tst tests bench.py __graft_entry__.py

echo "== native build (warnings are errors) =="
make -C native clean >/dev/null
CXXFLAGS="-O2 -std=c++17 -fPIC -Wall -Wextra -Werror" make -C native

echo "== tests =="
JAX_PLATFORM_NAME=cpu python -m pytest tests/ -x -q

echo "OK"
