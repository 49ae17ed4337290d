#!/usr/bin/env bash
# Round-5 measurement campaign (real TPU, sequential — ONE device process
# at a time). Resumable: reruns skip phases whose terminal artifact
# exists. Logs + artifacts land in $OUT.
#
#   tools/campaign_r5.sh [/tmp/campaign_r5]
#
# Goal (VERDICT r4 #4): multi-seed the accuracy claims. The r4 numbers
# (naive 0.000 / full 0.629 / +SCAIL 0.765 old-mAP50; six A/B battery
# rows) are single-seed point estimates; this reruns the forgetting
# ablation at seeds 1 and 2 (same seed-0 DATASET, different train seed:
# init + data order) and the A/B battery on a seed-1 50-epoch R50, then
# emits mean +/- spread tables.
#
# Phases:
#   1 health     patient matmul probe (device-claim wedge check)
#   2 ablation1  forgetting ablation SEED=1 VARIANTS=2 (naive/full/scail)
#   3 ablation2  forgetting ablation SEED=2 VARIANTS=2
#   4 sep1       50-epoch separable R50 train at seed 1 + 6-row battery
#   5 summary    aggregate seeds 0(r4)/1/2 -> multiseed_summary.txt
#   6 headline   python bench.py -> headline.json
set -uo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-/tmp/campaign_r5}
mkdir -p "$OUT"
CLASSES=(); for i in $(seq -w 0 19); do CLASSES+=("cls$i"); done

phase() {  # phase <name> <artifact> <timeout_s> <cmd...>
    local name=$1 artifact=$2 to=$3; shift 3
    if [ -s "$artifact" ]; then echo "== $name: done ($artifact)"; return 0; fi
    echo "== $name: start $(date +%H:%M:%S)"
    if timeout "$to" "$@" >"$OUT/$name.log" 2>&1; then
        echo "== $name: ok $(date +%H:%M:%S)"
    else
        echo "== $name: FAILED rc=$? (see $OUT/$name.log) — continuing"
    fi
}

# 1. health: ONE patient probe holding the claim wait (see campaign_r4.sh
#    for the kill-retry rationale)
HEALTH_BUDGET_S=${HEALTH_BUDGET_S:-7200}
if [ ! -f "$OUT/health.ok" ]; then
    if timeout "$HEALTH_BUDGET_S" python - >"$OUT/health.log" 2>&1 <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print("health ok", float((x @ x).sum()), jax.devices(), flush=True)
EOF
    then touch "$OUT/health.ok"; cat "$OUT/health.log"
    else
        echo "== device unreachable after ${HEALTH_BUDGET_S}s — aborting"
        exit 3
    fi
fi

# 2+3. forgetting ablation at two more seeds (shares nothing with r4's
#      seed-0 run except the seed-0 dataset definition, regenerated here)
for seed in 1 2; do
    if [ ! -s "$OUT/ablation_s$seed.done" ]; then
        echo "== ablation seed $seed: start $(date +%H:%M:%S)"
        RESUME=1 STYLE=separable VARIANTS=2 SEED=$seed timeout 14400 \
            tools/ablation_forgetting.sh "$OUT/ablate_s$seed" \
            >"$OUT/ablation_s$seed.log" 2>&1 \
            || echo "== ablation seed $seed FAILED rc=$? — continuing"
        grep -q "5/5 summary" "$OUT/ablation_s$seed.log" \
            && cp "$OUT/ablation_s$seed.log" "$OUT/ablation_s$seed.done"
    else
        echo "== ablation seed $seed: done"
    fi
done

# 4. A/B battery on a seed-1 50-epoch separable R50 (mirrors r4's
#    campaign phase 5 at seed 1)
SEPDATA=$OUT/sep_data; SEPRUN=$OUT/sep_run_s1
if [ ! -f "$SEPDATA/train.json" ]; then
    python tools/make_toy_dataset.py --out "$SEPDATA" --train 320 --test 80 \
        --style separable --classes "${CLASSES[@]}" >"$OUT/sepdata.log" 2>&1
fi
phase sep_train_s1 "$SEPRUN/checkpoint/20/state0/epoch50" 10800 \
    python -m cl_object_detection_tpu.cli.train \
        --root_dir "$SEPRUN" --dataset "$SEPDATA" --scenario 20 \
        --end_epoch 50 --depth 50 --pretrained false --batch_size 8 \
        --lr 3e-4 --every_iter 1 --record false --save_every 25 --seed 1
phase battery_s1 "$OUT/battery_s1.log.done" 9000 \
    tools/ab_battery.sh "$SEPRUN" "$SEPDATA" 20 -- 0 50
[ -s "$OUT/battery_s1.log" ] && grep -q "int8" "$OUT/battery_s1.log" \
    && cp "$OUT/battery_s1.log" "$OUT/battery_s1.log.done"

# 5. aggregate: seeds 0 (r4 artifacts) + 1 + 2
python tools/multiseed_summary.py \
    --r4_summary measurements/r4/forgetting_summary.txt \
    --r4_battery measurements/r4/battery.log \
    --ablate "$OUT/ablate_s1" "$OUT/ablate_s2" \
    --battery "$OUT/battery_s1.log" \
    > "$OUT/multiseed_summary.txt" 2>&1 \
    && cat "$OUT/multiseed_summary.txt" \
    || echo "== summary FAILED"

# 6. fresh headline
phase headline "$OUT/headline.json" 3600 bash -c \
    "set -o pipefail; \
     python bench.py | tail -1 > '$OUT/headline.json.partial' \
     && mv '$OUT/headline.json.partial' '$OUT/headline.json'"

echo "== campaign complete $(date +%H:%M:%S)"
ls -la "$OUT"
