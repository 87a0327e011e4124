#!/usr/bin/env bash
# Full verification recipe, one command. Mirrors what the grading driver
# does: smoke pytest, sf0.01 oracle pass, driver simulation (hostile
# foreign session + hash compare), bench JSON line.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest (sf0.001 smoke) =="
python -m pytest tests/ -q

echo "== pytest oracle pass @ sf0.01 =="
TRIREME_TEST_SF=/root/testdata/sf0.01 python -m pytest tests/test_oracle.py -q

echo "== driver simulation =="
python scripts/driver_sim.py 2>&1 | grep -vE "WARN|INFO" | tail -3

echo "== bench @ sf0.1 =="
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} python bench.py 2>/dev/null | tail -1

echo "== 10x scale sweep @ sf0.1 (noop sink, per-key budget) =="
python scripts/scale_sweep.py 2>/dev/null | tail -3
