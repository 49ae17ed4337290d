#!/usr/bin/env bash
# 20-class end-to-end evidence run (VOC-sized class count, synthetic data):
#
#   1. generate a 20-class toy COCO-json dataset
#   2. joint training (scenario "20") -> the forgetting upper bound
#      (BASELINE config 3 shape at the real VOC class count)
#   3. incremental "10+10" with the FULL method battery: distillation +
#      herding replay + pseudo-labels + MAS + A-GEM + BiC + similarity
#      warm-start (BASELINE config 5 shape) -> BiC-corrected eval +
#      per-class decline CSV vs the upper bound
#
# Stresses classifier expansion 10 -> 20 and every IL tool at real class
# counts. Runs on whatever device jax picks (real TPU when present).
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${1:-/tmp/cl_demo20}
EPOCHS=${2:-20}
COMMON_SHAPE=(--image_height 256 --image_width 320 --min_side 240 --max_side 320)
CLASSES=(); for i in $(seq -w 0 19); do CLASSES+=("cls$i"); done
rm -rf "$ROOT"; mkdir -p "$ROOT"

echo "=== 1/3 toy dataset (20 classes)"
python tools/make_toy_dataset.py --out "$ROOT/data" --train 160 --test 60 \
    --classes "${CLASSES[@]}"

echo "=== 2/3 joint scenario 20 (upper bound)"
python -m cl_object_detection_tpu.cli.train \
    --root_dir "$ROOT/run" --dataset "$ROOT/data" \
    --scenario 20 --end_epoch "$EPOCHS" --depth 50 --pretrained false \
    --batch_size 8 --lr 3e-4 --every_iter 1 --record false --save_every 10 \
    "${COMMON_SHAPE[@]}"
python -m cl_object_detection_tpu.cli.validate \
    --root_dir "$ROOT/run" --dataset "$ROOT/data" \
    --scenario 20 --state 0 --epoch "$EPOCHS" --save_upper_bound true \
    "${COMMON_SHAPE[@]}"

echo "=== 3/3 incremental 10+10, full method battery"
python -m cl_object_detection_tpu.cli.train \
    --root_dir "$ROOT/run" --dataset "$ROOT/data" \
    --scenario 10 10 --start_state 0 --end_state 1 \
    --end_epoch "$EPOCHS" --new_state_epoch "$EPOCHS" \
    --depth 50 --pretrained false \
    --batch_size 8 --lr 2e-4 --every_iter 1 --record false --save_every 10 \
    --distill true --sample_num 2 --sample_method herd \
    --persuado_label true --mas true --agem true --agem_refresh_every 4 \
    --bic true --bic_ratio 0.4 --init_method mean \
    "${COMMON_SHAPE[@]}"
python -m cl_object_detection_tpu.cli.validate \
    --root_dir "$ROOT/run" --dataset "$ROOT/data" \
    --scenario 10 10 --state 1 --epoch "$EPOCHS" --bic true \
    "${COMMON_SHAPE[@]}"

echo "=== decline report"
ls "$ROOT"/run/val_result/10_10/state1/*/ 2>/dev/null || true
