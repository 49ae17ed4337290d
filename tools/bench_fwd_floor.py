#!/usr/bin/env python
"""Forward-pass floor statement for the R50 backbone (VERDICT r4 #2).

Measures cumulative stem/s1/s2/s3/s4 forward times at the bench operating
point (608x832 bf16), differences them into per-stage deltas, and puts
each stage against an analytic ROOFLINE:

  * compute bound: conv FLOPs / (197 TFLOP/s * lane_utilization), where
    lane_utilization = min(Cout, 128)/128 — the MXU is a 128x128 systolic
    array, so a conv writing Cout < 128 output channels cannot fill the
    lane dimension regardless of the emitter (layer1's 3x3 convs have
    Cout = 64 -> ceiling 0.5);
  * bandwidth bound: activation+weight HBM traffic / ~700 GB/s effective.

A stage whose achieved time is within ~1.3x of max(compute, bandwidth)
bound is at the XLA floor — a kernel can only chase the remaining
fraction. Pairs with tools/bench_int8_matmul.py (the int8 gate: XLA int8
matmul = 1.18x bf16 on this runtime, Pallas int8 loses to XLA bf16, so
the "2x int8 MXU rate" lever does not exist here).

    python tools/bench_fwd_floor.py [--batch 32] [--height 608 --width 832]
"""
import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench_backbone import LAYERS, PLANES, run  # noqa: E402

PEAK = 197e12
HBM_BW = 700e9  # ~85% of v5e's 819 GB/s, the practical streaming ceiling


def stage_convs(stage, h, w):
    """[(Ho, Wo, KH*KW, Cin, Cout)] for every conv in s{stage+1} at input
    frame (h, w) — mirrors bench_backbone.apply_stages/models/resnet.py."""
    # feature map entering stage k (stem: /4; stage k>0 halves again)
    fh, fw = h // 4, w // 4
    for s in range(stage):
        fh, fw = (fh + 1) // 2, (fw + 1) // 2
    planes, n = PLANES[stage], LAYERS[stage]
    cin = 64 if stage == 0 else PLANES[stage - 1] * 4
    convs = []
    stride = 1 if stage == 0 else 2
    oh, ow = (fh + stride - 1) // stride, (fw + stride - 1) // stride
    for i in range(n):
        st = stride if i == 0 else 1
        o_h, o_w = (oh, ow)
        convs.append((fh, fw, 1, cin, planes))            # conv1 1x1
        convs.append((o_h, o_w, 9, planes, planes))       # conv2 3x3 /st
        convs.append((o_h, o_w, 1, planes, planes * 4))   # conv3 1x1
        if cin != planes * 4 or st != 1:
            convs.append((o_h, o_w, 1, cin, planes * 4))  # downsample
        cin = planes * 4
        fh, fw = o_h, o_w
    return convs


def stage_roofline(stage, h, w, batch):
    convs = stage_convs(stage, h, w)
    t_compute = 0.0
    t_bw = 0.0
    flops = 0.0
    for (fh, fw, k2, cin, cout) in convs:
        f = 2.0 * batch * fh * fw * k2 * cin * cout
        flops += f
        lane_u = min(cout, 128) / 128.0
        t_compute += f / (PEAK * lane_u)
        # bf16 activations in+out + weights once
        t_bw += (batch * fh * fw * (cin + cout) * 2 + k2 * cin * cout * 2) / HBM_BW
    return flops, max(t_compute, t_bw), t_compute, t_bw


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--height", type=int, default=608)
    p.add_argument("--width", type=int, default=832)
    a = p.parse_args()

    cum = {}
    for mode in ("stem", "s1", "s2", "s3", "s4"):
        r = run(mode, batch=a.batch, height=a.height, width=a.width)
        cum[mode] = r["ms_per_batch"]
        print(f"# cumulative {mode}: {r['ms_per_batch']} ms", flush=True)

    prev = "stem"
    rows = []
    for stage, mode in enumerate(("s1", "s2", "s3", "s4")):
        dt = (cum[mode] - cum[prev]) / 1e3
        flops, bound, t_c, t_b = stage_roofline(stage, a.height, a.width,
                                                a.batch)
        rows.append({
            "stage": mode,
            "ms": round(dt * 1e3, 2),
            "tflops": round(flops / dt / 1e12, 1),
            "mfu": round(flops / dt / PEAK, 3),
            "roofline_ms": round(bound * 1e3, 2),
            "bound": "compute" if t_c >= t_b else "bandwidth",
            "x_of_roofline": round(dt / bound, 2),
        })
        prev = mode
    rows.append({"stage": "stem(fused)", "ms": cum["stem"],
                 "note": "Pallas im2col kernel, measured 2.65 vs 6.71 XLA"})
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
