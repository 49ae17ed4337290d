#!/usr/bin/env python
"""Aggregate the multi-seed accuracy campaign into mean +/- spread tables.

Inputs: the r4 seed-0 artifacts (forgetting_summary.txt + battery.log)
plus the seed-1/2 ablation roots and the seed-1 battery log from
campaign_r5.sh. Emits the README "multi-seed" tables.

    python tools/multiseed_summary.py --ablate /tmp/campaign_r5/ablate_s1 ...
"""
from __future__ import annotations

import argparse
import csv
import glob
import os
import re
import sys


def csv_summary(path, n_old=10, n_total=20):
    rows = list(csv.reader(open(path)))
    aps = {r[0]: float(r[1]) for r in rows[2:2 + n_total]}
    old = [v for k, v in aps.items() if int(k[3:]) < n_old]
    new = [v for k, v in aps.items() if int(k[3:]) >= n_old]
    return (sum(old) / len(old), sum(new) / len(new),
            sum(aps.values()) / len(aps))


def ablate_root_rows(root, e1="40", ej="60"):
    """(tag -> (old, new, all)) for one ablation root."""
    out = {}
    pats = {
        "joint": f"{root}/joint/val_result/20/state0/val_result_{ej}.csv",
        "naive": f"{root}/naive/val_result/10_10/state1/val_result_{e1}.csv",
        "full": f"{root}/full/val_result/10_10/state1/val_result_{e1}_bic.csv",
        "scail": f"{root}/scail/val_result/10_10/state1/val_result_{e1}_bic.csv",
    }
    for tag, pat in pats.items():
        m = glob.glob(pat)
        if m:
            out[tag] = csv_summary(m[0])
    return out


def parse_r4_summary(path):
    """measurements/r4/forgetting_summary.txt rows -> same dict shape."""
    out = {}
    mapping = {"joint-20 (upper)": "joint", "10+10 naive": "naive",
               "10+10 full battery": "full", "10+10 full+scail": "scail"}
    if not os.path.exists(path):
        return out
    for line in open(path):
        for label, tag in mapping.items():
            if line.startswith(label):
                nums = re.findall(r"\d+\.\d+", line)
                if len(nums) >= 3:
                    out[tag] = tuple(float(x) for x in nums[:3])
    return out


def parse_battery_log(path):
    """ab_battery.sh log -> {tag: (map50, ar)} from '[tag] epoch N:
    mAP50=... AR=...' lines."""
    out = {}
    if not path or not os.path.exists(path):
        return out
    for line in open(path):
        m = re.match(r"\[([^\]]+)\].*mAP50=([0-9.]+)\s+AR=([0-9.]+)", line)
        if m:
            out[m.group(1)] = (float(m.group(2)), float(m.group(3)))
    return out


def spread(vals):
    vals = [v for v in vals if v is not None]
    if not vals:
        return "    -    "
    mean = sum(vals) / len(vals)
    if len(vals) == 1:
        return f"{mean:.3f} (n=1)"
    lo, hi = min(vals), max(vals)
    return f"{mean:.3f} ±{(hi - lo) / 2:.3f}"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--r4_summary", default="measurements/r4/forgetting_summary.txt")
    p.add_argument("--r4_battery", default="measurements/r4/battery.log")
    p.add_argument("--ablate", nargs="*", default=[])
    p.add_argument("--battery", nargs="*", default=[])
    a = p.parse_args()

    # ---- forgetting ablation across seeds
    per_seed = []
    s0 = parse_r4_summary(a.r4_summary)
    if s0:
        per_seed.append(("seed0(r4)", s0))
    for root in a.ablate:
        rows = ablate_root_rows(root)
        if rows:
            per_seed.append((os.path.basename(root), rows))
    if per_seed:
        print("== forgetting ablation, old-class mAP50 per seed "
              "(10+10 separable, joint = upper bound)")
        tags = ["joint", "naive", "full", "scail"]
        hdr = f"{'run':<10}" + "".join(f"{name:>14}" for name, _ in per_seed)
        print(hdr + f"{'mean±spread':>16}")
        for tag in tags:
            vals = [rows.get(tag, (None,))[0] for _, rows in per_seed]
            cells = "".join(
                f"{v:>14.3f}" if v is not None else f"{'-':>14}"
                for v in vals)
            print(f"{tag:<10}{cells}{spread(vals):>16}")
        print()
        print("SCAIL delta over full (old-mAP50) per seed: " + ", ".join(
            f"{name}: {rows['scail'][0] - rows['full'][0]:+.3f}"
            for name, rows in per_seed
            if "scail" in rows and "full" in rows))
        print()

    # ---- A/B battery across seeds
    logs = [("seed0(r4)", parse_battery_log(a.r4_battery))]
    for path in a.battery:
        logs.append((os.path.basename(path), parse_battery_log(path)))
    logs = [(n, d) for n, d in logs if d]
    if logs:
        print("== A/B battery mAP50 per seed (50-epoch separable R50)")
        tags = sorted({t for _, d in logs for t in d})
        print(f"{'config':<22}" + "".join(f"{n:>16}" for n, _ in logs)
              + f"{'mean±spread':>16}")
        for t in tags:
            vals = [d.get(t, (None,))[0] for _, d in logs]
            cells = "".join(
                f"{v:>16.4f}" if v is not None else f"{'-':>16}"
                for v in vals)
            print(f"{t:<22}{cells}{spread(vals):>16}")


if __name__ == "__main__":
    sys.exit(main())
