#!/bin/bash
# Poll the axon TPU tunnel; run the full measurement batch on first success.
#
# The tunnel has been intermittent all round (BENCH_r03 rc=1; down for
# the first hours of round 4).  tpu_batch.sh captures every pending
# measurement but each step pays its full timeout when the tunnel is
# down, so this wrapper probes cheaply (device init only) and launches
# the batch exactly once, on the first healthy probe.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/r4_tpu
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

for i in $(seq 1 200); do
  echo "probe $i $(date -u +%H:%M:%S)" >> "$OUT/poll.log"
  if timeout 420 python -c "import jax; d = jax.devices(); assert d, d; print(d)" \
      >> "$OUT/poll.log" 2>&1; then
    echo "tunnel UP at probe $i $(date -u)" >> "$OUT/poll.log"
    bash tools/tpu_batch.sh
    exit 0
  fi
  sleep 120
done
echo "tunnel never came up" >> "$OUT/poll.log"
exit 1
