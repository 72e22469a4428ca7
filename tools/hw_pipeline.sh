#!/bin/sh
# Hardware measurement backlog: run on a live TPU tunnel, ONE job at a
# time (the axon claim is single-client). Each stage appends to
# /tmp/hw_pipeline_out.log; safe to re-run — soak pools are seeded, the
# bench corpus and XLA compile caches persist under ~/.cache.
#
# Usage: sh tools/hw_pipeline.sh [logfile]
# Exit status: 0 only if EVERY stage succeeded; first failing stage's
# code otherwise (timeout reports 124), so callers/CI can detect a
# failed run without reading the log.
set -x
LOG=$(realpath -m "${1:-/tmp/hw_pipeline_out.log}")
cd "$(dirname "$0")/.."
RC=0
run() {
  "$@" || { s=$?; [ "$RC" -eq 0 ] && RC=$s; echo "STAGE FAILED (rc=$s): $*"; }
}
{
  echo "=== hw_pipeline $(date -u +%FT%TZ) ==="
  run timeout 1200 python tools/entropy_profile.py
  run timeout 1200 python tools/encode_device_profile.py
  run timeout 1800 python tools/encode_device_soak.py 740000 30
  run timeout 1800 python -c "
from wvpk.testgen.fuzzspec import run_hw_sweep
f, b = run_hw_sweep(40, n_dsd=8, seed_base=210000)
print(f'hw sweep 210000: {b} blocks, {f} mismatches')
assert f == 0
"
  run timeout 1800 python tools/stream_encode_soak.py 9400 20
  run timeout 1800 python tools/r5_hw_soak.py 24
  echo "=== hw_pipeline done $(date -u +%FT%TZ) rc=$RC ==="
} >> "$LOG" 2>&1
exit "$RC"
