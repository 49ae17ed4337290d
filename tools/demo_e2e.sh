#!/usr/bin/env bash
# End-to-end demo on a synthetic dataset (no external data needed):
#
#   1. generate a 5-class toy COCO-json dataset
#   2. joint training (scenario "5") -> the forgetting upper bound
#   3. incremental "3+2" with distillation + herding replay +
#      pseudo-labels -> per-class decline CSV vs the upper bound
#   4. single-image detect CLI on the test images
#
# Runs on whatever device jax picks (the real TPU when present; pass
# small shapes so compiles stay in the minutes). Everything lands under
# the first argument (default /tmp/cl_demo).
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${1:-/tmp/cl_demo}
COMMON_SHAPE=(--image_height 256 --image_width 320 --min_side 240 --max_side 320)
rm -rf "$ROOT"; mkdir -p "$ROOT"

echo "=== 1/4 toy dataset"
python tools/make_toy_dataset.py --out "$ROOT/data" --train 24 --test 12

echo "=== 2/4 joint training (upper bound)"
python -m cl_object_detection_tpu.cli.train \
    --root_dir "$ROOT/run" --dataset "$ROOT/data" \
    --scenario 5 --end_epoch 25 --depth 50 --pretrained false \
    --batch_size 4 --lr 3e-4 --every_iter 1 --record false --save_every 5 \
    "${COMMON_SHAPE[@]}"
python -m cl_object_detection_tpu.cli.validate \
    --root_dir "$ROOT/run" --dataset "$ROOT/data" \
    --scenario 5 --state 0 --epoch 25 --save_upper_bound true \
    "${COMMON_SHAPE[@]}"

echo "=== 3/4 incremental 3+2 (distill + replay + pseudo-labels)"
python -m cl_object_detection_tpu.cli.train \
    --root_dir "$ROOT/run" --dataset "$ROOT/data" \
    --scenario 3 2 --start_state 0 --end_state 1 \
    --end_epoch 10 --new_state_epoch 10 --depth 50 --pretrained false \
    --batch_size 4 --lr 2e-4 --every_iter 1 --record false --save_every 5 \
    --distill true --sample_num 2 --sample_method herd \
    --persuado_label true \
    "${COMMON_SHAPE[@]}"
python -m cl_object_detection_tpu.cli.validate \
    --root_dir "$ROOT/run" --dataset "$ROOT/data" \
    --scenario 3 2 --state 1 --epoch 10 \
    "${COMMON_SHAPE[@]}"

echo "=== 4/4 detect CLI"
python -m cl_object_detection_tpu.cli.detect \
    --root_dir "$ROOT/run" --scenario 3 2 --state 1 \
    --train_json "$ROOT/data/train.json" \
    --image_dir "$ROOT/data/images" --out_dir "$ROOT/detections" \
    --score_thresh 0.3

echo
echo "demo artifacts:"
echo "  upper bound:  $ROOT/run/val_result/upper_bound.json"
ls "$ROOT"/run/val_result/3_2/state1/*/val_result_*.csv 2>/dev/null | sed 's/^/  decline CSV:  /'
echo "  detections:   $ROOT/detections/"
