#!/usr/bin/env bash
# One-shot runner for the TPU measurements queued behind the tunnel outage
# (STATUS.md round-2 notes). Run when `python -c "import jax; jax.devices()"`
# responds. Sequential on purpose: never two TPU processes at once (single
# tunneled chip). Each step bounded; output tee'd to the log.
set -u
LOG=${1:-/tmp/tpu_queue.log}
cd "$(dirname "$0")/.."

step() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout 1800 "$@" 2>&1 | tee -a "$LOG"
  # PIPESTATUS[0] = the measured command's rc (plain $? would be tee's)
  echo "--- rc=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

# 1. Headline (re-measure: deferred box decode landed since the last number)
step python bench.py
# 2. int8 serving tiers at the headline batch
step python tools/bench_matrix.py --models retinanet_r50_fpn --batches 16
step python tools/bench_matrix.py --models retinanet_r50_fpn --batches 16 --quantize weights
step python tools/bench_matrix.py --models retinanet_r50_fpn --batches 16 --quantize full
# 3. Train throughput + the queued bf16-augment measurement
step python bench_train.py
step python bench_train.py --augment-dtype bfloat16
echo "queue done: $(date -u)" | tee -a "$LOG"
