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
# Logs land in artifacts/r4_tpu/ (committed).  Each step is bounded; a
# hung tunnel fails the step, not the batch.  Usage:  bash tools/tpu_batch.sh
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/r4_tpu
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/batch.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc" >> "$OUT/$name.log"
  echo "$name rc=$rc" | tee -a "$OUT/batch.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/batch.log"
}

run selfcheck   1800 python tools/tpu_selfcheck.py
run bench       2400 python bench.py
run suite       4800 python tools/bench_suite.py
run m_extents   2400 python tools/measure.py extents
run m_bandsort  3600 python tools/measure.py bandsort
run m_raster    2400 python tools/measure.py raster
run bench_b16   2400 python bench.py --bands 16
echo "batch complete $(date -u)" | tee -a "$OUT/batch.log"
