#!/usr/bin/env bash
# Round-4 measurement campaign (real TPU, sequential — ONE device process
# at a time). Every phase is resumable: reruns skip phases whose terminal
# artifact already exists, so a wedged remote compile mid-campaign costs
# one phase, not the session. Logs + artifacts land in $OUT.
#
#   tools/campaign_r4.sh [/tmp/campaign_r4]
#
# Phases (cheap artifacts first, long trains later):
#   1 health     trivial matmul probe (retry x3) — Pallas remote-compile wedge check
#   2 bwd        tools/bench_bwd_breakdown.py  -> bwd_breakdown.json   (VERDICT #3)
#   3 nms        tools/bench_nms.py            -> nms.json             (VERDICT #7)
#   4 mfu        tools/bench_sweep.py --mfu x5 -> sweep_mfu.jsonl      (VERDICT #4b)
#   5 battery    separable 50-epoch R50 + tools/ab_battery.sh -> battery.log (VERDICT #1ab)
#   6 ablation   tools/ablation_forgetting.sh STYLE=separable VARIANTS=1     (VERDICT #1cd)
#   7 headline   python bench.py               -> headline.json
set -uo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-/tmp/campaign_r4}
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

# 1. health: ONE long-lived matmul probe that sits waiting for the device
#    claim. Kill-retry loops are counterproductive here: killing a
#    device-waiting process can re-wedge the claim (CLAUDE.md), which is
#    exactly the r3 rc=124 death spiral. A single patient process attaches
#    the moment the claim frees. Budget: $HEALTH_BUDGET_S (default 2h) —
#    if the device never comes back, later phases are skipped, not
#    ground through their own timeouts.
HEALTH_BUDGET_S=${HEALTH_BUDGET_S:-7200}
if [ ! -f "$OUT/health.ok" ]; then
    if timeout "$HEALTH_BUDGET_S" python - >"$OUT/health.log" 2>&1 <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print("health ok", float((x @ x).sum()), jax.devices(), flush=True)
EOF
    then touch "$OUT/health.ok"; cat "$OUT/health.log"
    else
        echo "== device unreachable after ${HEALTH_BUDGET_S}s — aborting campaign"
        exit 3
    fi
fi

# 2. backward-gap attribution at the benched operating point
phase bwd "$OUT/bwd_breakdown.json" 2400 bash -c \
    "set -o pipefail; \
     python tools/bench_bwd_breakdown.py --batch 8 --height 608 --width 832 \
        > '$OUT/bwd_breakdown.json.partial' \
     && mv '$OUT/bwd_breakdown.json.partial' '$OUT/bwd_breakdown.json'"

# 3. NMS kernel shootout incl. the batched Pallas fixed-point candidate
phase nms "$OUT/nms.json" 1800 bash -c \
    "set -o pipefail; \
     python tools/bench_nms.py --k 1024 --batch 16 > '$OUT/nms.json.partial' \
     && mv '$OUT/nms.json.partial' '$OUT/nms.json'"

# 4. inference MFU across the model family (headline operating point)
if [ ! -s "$OUT/sweep_mfu.jsonl" ]; then
    : > "$OUT/sweep_mfu.partial"
    for d in 18 34 50 101 152; do
        echo "== mfu depth $d $(date +%H:%M:%S)"
        timeout 1800 python tools/bench_sweep.py --depth "$d" --mfu 32 \
            >>"$OUT/sweep_mfu.partial" 2>"$OUT/mfu_d$d.log" \
            || echo "== mfu depth $d FAILED — continuing"
    done
    grep -c '"img_per_s"' "$OUT/sweep_mfu.partial" >/dev/null 2>&1 \
        && mv "$OUT/sweep_mfu.partial" "$OUT/sweep_mfu.jsonl"
fi

# 5. A/B battery at a separable operating point: 320/80-image 20-class
#    separable toy set, R50 trained 50 epochs at the default 640x1024
#    frames (so both battery frame rows are in-distribution), then the
#    6-row validate battery.
SEPDATA=$OUT/sep_data; SEPRUN=$OUT/sep_run
if [ ! -f "$SEPDATA/train.json" ]; then
    python tools/make_toy_dataset.py --out "$SEPDATA" --train 320 --test 80 \
        --style separable --classes "${CLASSES[@]}" >"$OUT/sepdata.log" 2>&1
fi
phase sep_train "$SEPRUN/checkpoint/20/state0/epoch50" 10800 \
    python -m cl_object_detection_tpu.cli.train \
        --root_dir "$SEPRUN" --dataset "$SEPDATA" --scenario 20 \
        --end_epoch 50 --depth 50 --pretrained false --batch_size 8 \
        --lr 3e-4 --every_iter 1 --record false --save_every 25
phase battery "$OUT/battery.log.done" 9000 \
    tools/ab_battery.sh "$SEPRUN" "$SEPDATA" 20 -- 0 50
[ -s "$OUT/battery.log" ] && grep -q "int8" "$OUT/battery.log" \
    && cp "$OUT/battery.log" "$OUT/battery.log.done"

# 6. forgetting ablation, separable style, with SCAIL/classmean variants
if [ ! -s "$OUT/ablation.log.done" ]; then
    RESUME=1 STYLE=separable VARIANTS=1 timeout 14400 \
        tools/ablation_forgetting.sh "$OUT/ablate" >"$OUT/ablation.log" 2>&1 \
        || echo "== ablation FAILED rc=$? — artifacts under $OUT/ablate"
    grep -q "5/5 summary" "$OUT/ablation.log" \
        && cp "$OUT/ablation.log" "$OUT/ablation.log.done"
fi

# 7. fresh headline number
phase headline "$OUT/headline.json" 3600 bash -c \
    "set -o pipefail; \
     python bench.py | tail -1 > '$OUT/headline.json.partial' \
     && mv '$OUT/headline.json.partial' '$OUT/headline.json'"

echo "== campaign complete $(date +%H:%M:%S)"
ls -la "$OUT"
