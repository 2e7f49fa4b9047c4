#!/usr/bin/env bash
# One-command real-pyproj verification (VERDICT r9 #4).
#
# The build container has no pyproj and forbids installs, so the
# real-pyproj integration suite (tests/test_pyproj_integration.py)
# skips there.  Run THIS script on any machine with network access to
# produce the committed record:
#
#     bash scripts/run_pyproj_suite.sh
#
# It creates a throwaway venv, installs pyproj + the test deps, runs
# the pyproj-marked suite (the closed-form-vs-pyproj cross-check of
# every CRS family on the oracle gate grids, plus the pandas_udf
# fallback numerics), and tees the result to VERIFY_pyproj.log at the
# repo root.  Commit that log.
set -euo pipefail
cd "$(dirname "$0")/.."

VENV="${PYPROJ_VENV:-.venv-pyproj}"
if [ ! -x "$VENV/bin/python" ]; then
    python3 -m venv "$VENV"
    "$VENV/bin/pip" install --quiet --upgrade pip
    "$VENV/bin/pip" install --quiet \
        "pyspark==4.1.2" pyarrow pandas numpy duckdb pytest pyproj
fi

"$VENV/bin/python" -m pytest tests/test_pyproj_integration.py \
    -m pyproj -v 2>&1 | tee VERIFY_pyproj.log

echo "---" >> VERIFY_pyproj.log
"$VENV/bin/python" - >> VERIFY_pyproj.log <<'EOF'
import platform

import pyproj

print(f"pyproj {pyproj.__version__} (PROJ {pyproj.proj_version_str}) "
      f"on {platform.platform()}")
EOF
echo "wrote VERIFY_pyproj.log — commit it"
