#!/usr/bin/env bash
# Post-capstone measurement battery (round-3 verdict item 1): every serving
# tier / TTA / EMA accuracy claim re-measured against ONE converged
# checkpoint — the config #3 SSD-512 capstone run's best-mAP checkpoint.
# Sequential on purpose (single tunneled chip). Results tee'd to the log;
# BASELINE.md records the numbers.
#
#   bash tools/run_capstone_evals.sh [CKPT_ROOT] [LOG]
set -u
ROOT=${1:-/tmp/capstone_ssd512}
LOG=${2:-/tmp/capstone_evals.log}
cd "$(dirname "$0")/.."

CFG="$ROOT/resolved_config.json"
BEST="$ROOT/best"
VAL='synthetic://capstone-val?n=800&max_objects=8&aspect_std=0.6&color_jitter=0.1'
TRAIN='synthetic://capstone-train?n=4000&max_objects=8&aspect_std=0.6&color_jitter=0.1'
EVAL_NOCKPT="python -m shape_based_object_detection_tpu.cli.eval_cli --config $CFG --data-root $VAL --protocol coco"
EVAL="$EVAL_NOCKPT --checkpoint-dir $BEST"

step() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout 1800 "$@" 2>&1 | grep -v WARNING | tee -a "$LOG"
  echo "--- rc=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

# 1. the headline: 12-metric COCO eval of the best checkpoint (raw params)
step $EVAL
# 2. EMA weights (same checkpoint)
step $EVAL --ema
# 3. hflip test-time augmentation
step $EVAL --tta-hflip
# 4. int8 tiers: weight-only, dynamic-full, static-calibrated full.
#    Calibration uses TRAIN-split images (no val leakage).
step $EVAL --quantize weights
step $EVAL --quantize full
step python tools/calibrate_scales.py --config "$CFG" \
  --checkpoint-dir "$BEST" --data-root "$TRAIN" --batches 8 \
  --out "$ROOT/act_scales.json"
step $EVAL --quantize full --act-scales "$ROOT/act_scales.json"
# 5. export/artifact parity: the bf16 program + converged weights baked into
#    a .sbdx must score the same mAP through eval_cli --artifact (frozen
#    StableHLO, scan NMS) as the live checkpoint path in step 1.
step python tools/export_model.py --config "$CFG" \
  --checkpoint-dir "$BEST" --batch-size 16 --out "$ROOT/capstone.sbdx"
# frozen program: weights are baked in, so no --checkpoint-dir here
# (eval_cli rejects the combination on purpose)
step $EVAL_NOCKPT --artifact "$ROOT/capstone.sbdx"
# 6. TTA arms (scale-agnostic families only: set TTA_SCALES for RetinaNet
#    capstones, leave empty for SSD). Includes the COMPOSED tier — the
#    static-int8 throughput champion under multi-scale TTA (VERDICT r3
#    item 5): one quantized tree serves every scale.
if [ -n "${TTA_SCALES:-}" ]; then
  step $EVAL --tta-scales "$TTA_SCALES"
  step $EVAL --tta-scales "$TTA_SCALES" --quantize full \
    --act-scales "$ROOT/act_scales.json"
fi
# 7. checkpoint averaging (SWA/model-soup) over the retention window
#    (round-4 verdict item 3: the tool shipped without an at-scale accuracy
#    number). Soups the last-K retained checkpoints and scores the soup
#    through the same eval as tier 1, so raw vs EMA vs soup sit in one table.
if [ -n "${SOUP_LAST:-}" ]; then
  step python tools/average_checkpoints.py --config "$CFG" \
    --checkpoint-dir "$ROOT" --last "$SOUP_LAST" --out "$ROOT/soup"
  step $EVAL_NOCKPT --checkpoint-dir "$ROOT/soup"
fi
echo "capstone eval battery done: $(date -u)" | tee -a "$LOG"
