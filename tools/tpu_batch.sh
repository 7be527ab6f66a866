#!/bin/bash
# One-shot TPU measurement batch (round 4, verdict #1).
#
# The axon tunnel has been intermittent (down at the round-3 capture,
# BENCH_r03.json rc=1; down again through most of round 4).  This script
# captures EVERY pending hardware measurement in priority order the
# moment the tunnel is up, so a transient window is fully exploited:
#
#   1. tpu_selfcheck   correctness gate (compiled vs f64 oracle)
#   2. bench.py        the headline number (verdict #1 evidence)
#   3. bench_suite     all five BASELINE.json configs (+ extents diag)
#   4. measure extents opacity-aware extents frame-time A/B
#   5. measure bandsort flat vs band-segmented sort A/B (keep/delete)
#   6. measure raster  QUAD_BF16 / scan-limb variants (verdict #7)
#   7. bench --bands 16 banded headline (only meaningful if #5 wins)
#
# Steps are IDEMPOTENT across invocations: a step that exits 0 drops a
# $OUT/<name>.ok marker and is skipped on re-run, so if the tunnel dies
# mid-batch the poller can re-fire the remainder in the next window.
# Logs land in artifacts/r4_tpu/ (committed).  Each step is bounded; a
# hung tunnel fails the step, not the batch.  Usage:  bash tools/tpu_batch.sh
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/r4_tpu
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -e "$OUT/$name.ok" ]; then
    echo "$name already ok, skipping" | tee -a "$OUT/batch.log"
    return 0
  fi
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/batch.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc" >> "$OUT/$name.log"
  echo "$name rc=$rc" | tee -a "$OUT/batch.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/batch.log"
  if [ "$rc" -eq 0 ]; then touch "$OUT/$name.ok"; else ALL_OK=0; fi
}

ALL_OK=1
run selfcheck   1800 python tools/tpu_selfcheck.py
run bench       2400 python bench.py
run suite       4800 python tools/bench_suite.py
run m_extents   2400 python tools/measure.py extents
run m_bandsort  3600 python tools/measure.py bandsort
run m_raster    2400 python tools/measure.py raster
run bench_b16   2400 python bench.py --bands 16
if [ "$ALL_OK" -eq 1 ]; then
  touch "$OUT/batch.done"
  echo "batch COMPLETE $(date -u)" | tee -a "$OUT/batch.log"
else
  echo "batch partial $(date -u) — poller will retry failed steps" \
    | tee -a "$OUT/batch.log"
fi
