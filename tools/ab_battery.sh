#!/usr/bin/env bash
# Accuracy A/B battery behind the benched defaults (README "Accuracy A/B").
#
# Runs cli.validate over the 6 measured configs against ONE trained
# checkpoint: frame (608x832 bucket vs 640x1024), top-k method (exact vs
# approx), fused Pallas stem, and int8 PTQ. Each row re-evaluates the
# same epoch; the summary prints mAP50/AR per config so the deltas behind
# every default are re-measurable in one command.
#
#   tools/ab_battery.sh <root_dir> <dataset> <scenario...> -- <state> <epoch>
#   e.g. tools/ab_battery.sh /tmp/sep_run /tmp/sep_data 20 -- 0 50
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=$1; DATA=$2; shift 2
SCENARIO=()
while [ "$1" != "--" ]; do SCENARIO+=("$1"); shift; done
shift; STATE=$1; EPOCH=$2

run() {  # run <tag> <flags...> — a failed/wedged row (Pallas remote-
    # compile occasionally hangs) must not kill the remaining rows
    local tag=$1; shift
    echo "=== $tag"
    local out
    if out=$(timeout 1200 python -m cl_object_detection_tpu.cli.validate \
            --root_dir "$ROOT" --dataset "$DATA" --scenario "${SCENARIO[@]}" \
            --state "$STATE" --epoch "$EPOCH" "$@" 2>&1); then
        echo "$out" | grep -E "mAP50|epoch" | tail -2 | sed "s/^/[$tag] /" \
            || echo "[$tag] NO mAP LINE IN OUTPUT"
    else
        echo "[$tag] FAILED (rc=$?)"; echo "$out" | tail -5 | sed "s/^/[$tag] /"
    fi
}

run "608x832 exact rgb"    --shape_buckets 608x832 --topk_method exact
run "608x832 approx rgb"   --shape_buckets 608x832 --topk_method approx
run "608x832 approx fused" --shape_buckets 608x832 --topk_method approx --fused_stem true
run "640x1024 exact rgb"   --topk_method exact
run "640x1024 approx rgb"  --topk_method approx
run "608x832 approx int8"  --shape_buckets 608x832 --topk_method approx --quantize true
