#!/bin/bash
# Poll the axon TPU tunnel; run the measurement batch on every healthy
# probe until all batch steps have succeeded.
#
# The tunnel has been intermittent since the round-3 capture (BENCH_r03
# rc=1; down for the first hours of round 4 too).  tpu_batch.sh steps
# are idempotent (.ok markers), so firing the batch on EVERY healthy
# probe retries only what a previous window didn't finish.  Probes are
# cheap (device init only) and bounded; the loop exits when
# artifacts/r4_tpu/batch.done appears.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/r4_tpu
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

for i in $(seq 1 400); do
  if [ -e "$OUT/batch.done" ]; then
    echo "batch done; poller exiting $(date -u)" >> "$OUT/poll.log"
    exit 0
  fi
  echo "probe $i $(date -u +%H:%M:%S)" >> "$OUT/poll.log"
  if timeout 420 python -c "import jax; d = jax.devices(); assert d, d; print(d)" \
      >> "$OUT/poll.log" 2>&1; then
    echo "tunnel UP at probe $i $(date -u)" >> "$OUT/poll.log"
    bash tools/tpu_batch.sh
    sleep 60
  else
    sleep 120
  fi
done
echo "poller exhausted $(date -u)" >> "$OUT/poll.log"
exit 1
