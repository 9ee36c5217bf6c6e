#!/usr/bin/env bash
# One-command pre-round-end gate: every check the judge reproduces, in
# dependency order, failing fast. Run from the repo root; artifacts
# (CORRECTNESS_local_r{N}.json via --json, BENCH_full.json via bench.py)
# land at HEAD so the evidence chain is committable.
#
# Usage: tools/round_gate.sh [sf_dir]    (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
ROUND="${ROUND:-8}"

echo "== 1/6 pytest =="
python -m pytest tests/ -q

echo "== 2/6 oracle gate ($SF) =="
python tools/check_oracle.py "$SF" --json "CORRECTNESS_local_r${ROUND}.json"

echo "== 3/6 plan audit =="
python tools/explain_audit.py /root/testdata/sf0.001

echo "== 3b/6 source collect audit =="
python tools/collect_audit.py

echo "== 3c/6 collect bound-class growth audit (sf0.001, driver gate) =="
python tools/collect_audit.py --fail-on-growth /root/testdata/sf0.001

echo "== 4/6 partitioning determinism =="
python tools/determinism_check.py "$SF"

echo "== 5/6 bench (sf0.1 -> BENCH_full.json) =="
python bench.py

echo "ROUND GATE: all green"
