#!/usr/bin/env bash
# End-of-round preflight — run BEFORE committing a round snapshot.
# Round 3 shipped with a red suite because the snapshot was committed
# without a full-suite run; this gate makes that impossible to repeat.
#
#   1. full pytest suite (hard gate: 0 failures)
#   2. driver-contract simulation at sf0.01 (smoke + all oracles match)
#   3. bench.py emits its one-line JSON
#
# Usage: bash tools/preflight.sh   (~15 min total)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/3] pytest =="
python -m pytest tests/ -q --tb=short

echo "== [2/3] driver contract (sf0.01) =="
python tools/driver_sim.py /root/testdata/sf0.01

echo "== [3/3] bench =="
python bench.py

echo "PREFLIGHT OK — safe to snapshot"
