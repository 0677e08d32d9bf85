#!/bin/bash
# Full validation cadence: default suite, slow tests (golden e2e via cache +
# OpenCV LSD parity), TPU lowering smoke, synthetic drive, the golden
# testdata run, and (relay up) the device bench.
# Usage: tools/ci_full.sh [--cpu]
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:$PWD
echo "=== unit + property tests ==="
python -m pytest tests/ -q
echo "=== TPU (Mosaic) lowering smoke — relay-free ==="
# every Pallas kernel must lower for platform tpu from this CPU box;
# catches unsupported-precision/op regressions that CPU tests and
# interpret-mode dryruns cannot (round-4 BENCH rc=1 class)
python -m pytest tests/test_tpu_lowering.py -q
echo "=== slow tests (golden e2e, LSD parity) ==="
python -m pytest tests/ -q -m slow
echo "=== synthetic ground-truth drive ==="
python tools/drive_synthetic.py "$@"
echo "=== golden testdata reconstruction ==="
python tools/run_testdata.py "$@"
echo "=== graft entry (driver contract: compile check + multichip dryrun) ==="
python __graft_entry__.py
if [[ "$*" != *--cpu* ]]; then
  echo "=== device bench (driver contract) ==="
  # must print one JSON line and exit 0; any TPU-path regression fails here
  python bench.py
fi
