#!/usr/bin/env bash
# Forgetting ablation at VOC class count (20-class synthetic set, R50):
#
#   A. joint scenario "20"            -> the upper bound (no forgetting)
#   B. incremental 10+10, NAIVE       -> fine-tune on the new 10 classes
#      with no IL method at all: catastrophic forgetting baseline
#   C. incremental 10+10, FULL battery (distill + herding replay +
#      pseudo-labels + MAS + A-GEM + BiC + similarity warm-start)
#
# B and C share the SAME state-0 checkpoint, so the state-1 decline CSVs
# isolate exactly what the CL methods buy. This is the reference's core
# scientific claim (/root/reference/README; BASELINE configs 3/5) run as
# one reproducible script.
#
# STYLE=separable (default) uses the hue-x-pattern toy classes so the
# operating point is a checkpoint that actually detects (mAP50 >= 0.5);
# STYLE=legacy reproduces the earlier confusable-class table.
# VARIANTS=1 additionally runs two single-knob A/Bs off the same state-0:
# full+SCAIL (--scail true) and full with the classmean herd ranking
# (--prototype_herd_mode classmean) — the VERDICT r2 #3/#6 measurements.
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${1:-/tmp/cl_ablate}
E0=${2:-40}      # state-0 epochs (shared)
E1=${3:-40}      # state-1 epochs
EJ=${4:-60}      # joint epochs
STYLE=${STYLE:-separable}
VARIANTS=${VARIANTS:-0}
SEED=${SEED:-0}   # training seed (init + data order); the toy DATASET
                  # stays seed-0 so multi-seed runs measure method
                  # variance, not dataset variance
COMMON_SHAPE=(--image_height 256 --image_width 320 --min_side 240 --max_side 320)
CLASSES=(); for i in $(seq -w 0 19); do CLASSES+=("cls$i"); done
# RESUME=1 keeps $ROOT and skips any phase whose terminal artifact exists
# (a wedged remote compile mid-battery must not force a full ~2h restart)
if [ "${RESUME:-0}" != "1" ]; then rm -rf "$ROOT"; fi
mkdir -p "$ROOT"

echo "=== 0/5 toy dataset (20 classes, style=$STYLE)"
[ -f "$ROOT/data/train.json" ] || \
python tools/make_toy_dataset.py --out "$ROOT/data" --train 160 --test 60 \
    --style "$STYLE" --classes "${CLASSES[@]}"

echo "=== 1/5 joint scenario 20 (upper bound, $EJ epochs)"
[ -d "$ROOT/joint/checkpoint/20/state0/epoch${EJ}" ] || \
python -m cl_object_detection_tpu.cli.train \
    --root_dir "$ROOT/joint" --dataset "$ROOT/data" \
    --scenario 20 --end_epoch "$EJ" --depth 50 --pretrained false \
    --batch_size 8 --lr 3e-4 --every_iter 1 --record false --save_every 20 \
    --seed "$SEED" "${COMMON_SHAPE[@]}"
[ -f "$ROOT/joint/val_result/upper_bound.json" ] || \
python -m cl_object_detection_tpu.cli.validate \
    --root_dir "$ROOT/joint" --dataset "$ROOT/data" \
    --scenario 20 --state 0 --epoch "$EJ" --save_upper_bound true \
    "${COMMON_SHAPE[@]}"

echo "=== 2/5 shared state 0 (first 10 classes, $E0 epochs)"
[ -d "$ROOT/base/checkpoint/10_10/state0/epoch${E0}" ] || \
python -m cl_object_detection_tpu.cli.train \
    --root_dir "$ROOT/base" --dataset "$ROOT/data" \
    --scenario 10 10 --start_state 0 --end_state 0 \
    --end_epoch "$E0" --depth 50 --pretrained false \
    --batch_size 8 --lr 3e-4 --every_iter 1 --record false --save_every 20 \
    --seed "$SEED" "${COMMON_SHAPE[@]}"

ALL_VARIANTS=(naive full)
if [ "$VARIANTS" = "1" ]; then ALL_VARIANTS+=(scail classmean); fi
if [ "$VARIANTS" = "2" ]; then ALL_VARIANTS+=(scail); fi  # scail-only
                  # (multi-seed reruns: classmean already measured neutral)
for variant in "${ALL_VARIANTS[@]}"; do
    [ -d "$ROOT/$variant/checkpoint/10_10/state0" ] && continue
    mkdir -p "$ROOT/$variant/checkpoint/10_10" "$ROOT/$variant/val_result"
    cp -r "$ROOT/base/checkpoint/10_10/state0" "$ROOT/$variant/checkpoint/10_10/"
    cp "$ROOT/joint/val_result/upper_bound.json" "$ROOT/$variant/val_result/"
done

echo "=== 3/5 state 1 NAIVE (no IL method)"
[ -d "$ROOT/naive/checkpoint/10_10/state1/epoch${E1}" ] || \
python -m cl_object_detection_tpu.cli.train \
    --root_dir "$ROOT/naive" --dataset "$ROOT/data" \
    --scenario 10 10 --start_state 1 --end_state 1 \
    --new_state_epoch "$E1" --depth 50 --pretrained false \
    --batch_size 8 --lr 2e-4 --every_iter 1 --record false --save_every 20 \
    --distill false --mas false --agem false --bic false \
    --persuado_label false --sample_num 0 \
    --seed "$SEED" "${COMMON_SHAPE[@]}"
[ -f "$ROOT/naive/val_result/10_10/state1/val_result_${E1}.csv" ] || \
python -m cl_object_detection_tpu.cli.validate \
    --root_dir "$ROOT/naive" --dataset "$ROOT/data" \
    --scenario 10 10 --state 1 --epoch "$E1" \
    "${COMMON_SHAPE[@]}"

echo "=== 4/5 state 1 FULL battery"
FULL_FLAGS=(--distill true --sample_num 2 --sample_method herd
            --persuado_label true --mas true --agem true --agem_refresh_every 4
            --bic true --bic_ratio 0.4 --init_method mean)
run_state1() {  # run_state1 <dir> <extra flags...>
    local dir="$1"; shift
    [ -d "$ROOT/$dir/checkpoint/10_10/state1/epoch${E1}" ] || \
    python -m cl_object_detection_tpu.cli.train \
        --root_dir "$ROOT/$dir" --dataset "$ROOT/data" \
        --scenario 10 10 --start_state 1 --end_state 1 \
        --new_state_epoch "$E1" --depth 50 --pretrained false \
        --batch_size 8 --lr 2e-4 --every_iter 1 --record false --save_every 20 \
        --seed "$SEED" "${FULL_FLAGS[@]}" "$@" "${COMMON_SHAPE[@]}"
    [ -f "$ROOT/$dir/val_result/10_10/state1/val_result_${E1}_bic.csv" ] || \
    python -m cl_object_detection_tpu.cli.validate \
        --root_dir "$ROOT/$dir" --dataset "$ROOT/data" \
        --scenario 10 10 --state 1 --epoch "$E1" --bic true \
        "${COMMON_SHAPE[@]}"
}
run_state1 full

if [ "$VARIANTS" = "1" ] || [ "$VARIANTS" = "2" ]; then
    echo "=== 4b. full battery + SCAIL standardization"
    run_state1 scail --scail true
fi
if [ "$VARIANTS" = "1" ]; then
    echo "=== 4c. full battery, classmean herd ranking"
    run_state1 classmean --prototype_herd_mode classmean
fi

echo "=== 5/5 summary (old = cls00-09, new = cls10-19)"
python - "$ROOT" "$E1" "$EJ" <<'EOF'
import csv, glob, os, sys
root, e1, ej = sys.argv[1], sys.argv[2], sys.argv[3]

def summary(path):
    rows = list(csv.reader(open(path)))
    aps = {r[0]: float(r[1]) for r in rows[2:22]}
    old = [v for k, v in aps.items() if int(k[3:]) < 10]
    new = [v for k, v in aps.items() if int(k[3:]) >= 10]
    return (sum(old) / len(old), sum(new) / len(new),
            sum(aps.values()) / len(aps))

print(f"{'run':<22}{'old mAP50':>10}{'new mAP50':>10}{'all':>8}")
jp = f"{root}/joint/val_result/20/state0/val_result_{ej}.csv"
o, n, a = summary(jp); print(f"{'joint-20 (upper)':<22}{o:>10.3f}{n:>10.3f}{a:>8.3f}")
for tag, pat in [("10+10 naive", f"{root}/naive/val_result/10_10/state1/val_result_{e1}.csv"),
                 ("10+10 full battery", f"{root}/full/val_result/10_10/state1/val_result_{e1}_bic.csv"),
                 ("10+10 full+scail", f"{root}/scail/val_result/10_10/state1/val_result_{e1}_bic.csv"),
                 ("10+10 full classmean", f"{root}/classmean/val_result/10_10/state1/val_result_{e1}_bic.csv")]:
    m = glob.glob(pat)
    if m:
        o, n, a = summary(m[0]); print(f"{tag:<22}{o:>10.3f}{n:>10.3f}{a:>8.3f}")
EOF
