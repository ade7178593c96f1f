#!/usr/bin/env bash
# Round-5 post-campaign studies (VERDICT r4 items 2, 3, 5) — run ONLY with
# the TPU free (training stopped; check `ps -ef | grep quality_run`).
# All studies run on the campaign's best checkpoint (the AP-eval callback's
# best-box_ap50 sidecar) and the held-out textured eval split.
#
# Usage: bash tools/r5_studies.sh [weights_dir] 2>&1 | tee r5_studies.log
set -euo pipefail
cd "$(dirname "$0")/.."

WEIGHTS=${1:-quality_run_coco_r4t/best_weights}
DATA=quality_run_coco_r4t/coco_eval
test -d "$WEIGHTS" || { echo "no weights at $WEIGHTS"; exit 1; }
mkdir -p asset

echo "=== [1/5] MASK_TOP_K 0/32/48 A/B (VERDICT r4 #2) ==="
python tools/eval_int8.py --weights "$WEIGHTS" --data "$DATA" \
  --variants none --mask-top-k 0 32 48 \
  --out asset/coco80_masktopk_r5.json

echo "=== [2/5] int8 mask-residual 7-variant sweep (VERDICT r4 #3) ==="
python tools/eval_int8.py --weights "$WEIGHTS" --data "$DATA" \
  --variants f32 pc pc_qat pc_qat_mw pc_f32deconv pc_f32tail pc_qat_mw_f32deconv \
  --out asset/coco80_int8_r5.json

echo "=== [3/5] infer_yolo compaction exactness on real data (VERDICT r4 #5) ==="
python tools/ab_infer_yolo_exactness.py --weights "$WEIGHTS" --data "$DATA" \
  --k 32 48 64 --top-n 256 --out asset/infer_yolo_exactness_r5.json

echo "=== [4/5] infer_yolo 416^2 stage profile (VERDICT r4 #5) ==="
python tools/profile_infer_yolo.py --batch 128 \
  | tee asset/infer_yolo_profile_r5.txt

echo "=== [5/5] overlay PNGs from the best textured checkpoint ==="
python tools/predict.py --weights "$WEIGHTS" \
  --images "$DATA"/images/*.png --config coco \
  --out asset/predictions_textured_r5.json \
  --batch-size 8 --score-threshold 0.35 \
  --overlays 3 --overlay-dir asset

echo "=== r5 studies complete; update docs/PERFORMANCE.md with the results ==="
