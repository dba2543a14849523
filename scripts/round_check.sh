#!/bin/sh
# Per-round gate: unit/integration tests, the FULL oracle sweep at
# sf0.1 (10x the driver's sf0.01 correctness gate — scale-dependent
# bugs hide at sf0.01 where many operators see a single block), and
# the benchmark. Exits non-zero on any failure or oracle drift.
set -e
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -x -q

echo "== oracle sweep (sf0.1) =="
python scripts/oracle_sweep.py "${SWEEP_SF_DIR:-/root/testdata/sf0.1}"

echo "== bench =="
python bench.py

echo "== sf1 regression gate (vs SF1_BASELINE.json, +/-20%) =="
python scripts/sf1_regression.py
