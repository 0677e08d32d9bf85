#!/bin/bash
# Full validation cadence: default suite, slow tests (golden e2e via cache +
# OpenCV LSD parity), synthetic drive, and the golden testdata run.
# Usage: tools/ci_full.sh [--cpu]
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:$PWD
echo "=== unit + property tests ==="
python -m pytest tests/ -q
echo "=== slow tests (golden e2e, LSD parity) ==="
python -m pytest tests/ -q -m slow
echo "=== synthetic ground-truth drive ==="
python tools/drive_synthetic.py "$@"
echo "=== golden testdata reconstruction ==="
python tools/run_testdata.py "$@"
