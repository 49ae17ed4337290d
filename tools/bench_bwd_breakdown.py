#!/usr/bin/env python
"""Stage-wise forward/backward attribution of the train step (real TPU).

VERDICT r2 weak #2 / next-round #4: the measured backward is 2.26x the
forward instead of the ideal 2x, and the 45% train MFU had no per-stage
diagnosis. This tool times each stage of the step — backbone, FPN, heads
(classification / regression trunks), loss — forward-only and
forward+backward (``jax.grad`` w.r.t. params AND stage input, exactly the
cotangents the full chain propagates), each as its own chained fori_loop
with one host sync (the bench.py timing discipline — the axon tunnel
returns early from ``block_until_ready``).

Per stage it also pulls XLA's own cost analysis (``compiled.cost_analysis``)
for the fwd and grad programs, so the table shows achieved TFLOP/s per
stage and direction — the stage whose backward runs at the lowest
fraction of its forward TFLOP/s is where the 0.26x goes.

Caveat: stages timed in isolation lose cross-stage fusion, so the stage
sums slightly exceed the fused full step (printed as `full_grad` for
reference); ratios within a stage are the signal, absolute sums are not.

    python tools/bench_bwd_breakdown.py [--batch 8] [--height 608 --width 832]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

V5E_BF16_PEAK = 197e12


def _flops(fn, *args):
    import jax

    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _time_chained(fn, x0, consts, iters, reps=3):
    """Seconds per call of fn(x, *consts)->scalar, chained via tree-aware
    perturbation (x may be a pytree of arrays)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x, *cs):
        def body(i, acc):
            xi = jax.tree.map(lambda a: a + (acc * 1e-12).astype(a.dtype), x)
            return acc + fn(xi, *cs)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(x0, *consts))                 # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(x0, *consts))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--height", type=int, default=608)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import FocalConfig, ILConfig, ModelConfig
    from cl_object_detection_tpu.il.losses import LossStatics, compute_losses
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape

    B, H, W, C, M = args.batch, args.height, args.width, 20, 32
    model = create_retinanet(ModelConfig(depth=args.depth), C)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    params, bstats = variables["params"], variables["batch_stats"]
    anchors = jnp.asarray(anchors_for_shape(H, W))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1)
    boxes_np = np.full((B, M, 4), -1, np.float32)
    labels_np = np.full((B, M), -1, np.int32)
    for b in range(B):
        for j in range(8):
            boxes_np[b, j] = [32 * (j + 1), 16 * (j + 1),
                              32 * (j + 1) + 96, 16 * (j + 1) + 64]
            labels_np[b, j] = (b + j) % C
    boxes, labels = jnp.asarray(boxes_np), jnp.asarray(labels_np)

    def V(p):
        return {"params": p, "batch_stats": bstats}

    # --- stage forwards ----------------------------------------------------
    def backbone_fwd(x, p):
        return model.apply(V(p), x, method=lambda m, i: m.backbone(i))

    def fpn_fwd(cs, p):
        return model.apply(V(p), *cs, method=lambda m, a, b, c: m.fpn(a, b, c))

    def heads_fwd(feats, p):
        return model.apply(
            V(p), feats, method=lambda m, f: m._heads(f, True))

    def cls_head_fwd(feats, p):
        return model.apply(
            V(p), feats,
            method=lambda m, f: jnp.concatenate(
                [m.classification_head(x, True) for x in f], axis=1))

    def reg_head_fwd(feats, p):
        return model.apply(
            V(p), feats,
            method=lambda m, f: jnp.concatenate(
                [m.regression_head(x) for x in f], axis=1))

    def loss_fwd(cls_reg):
        from cl_object_detection_tpu.ops.focal_loss import focal_loss

        out = focal_loss(cls_reg[0], cls_reg[1], anchors, boxes, labels)
        return (jnp.mean(out.bg_loss) + jnp.mean(out.fg_loss)
                + jnp.mean(out.reg_loss))

    # --- materialize stage inputs once ------------------------------------
    csets = jax.jit(backbone_fwd)(images, params)
    feats = jax.jit(fpn_fwd)(csets, params)
    cls_out, reg_out = jax.jit(heads_fwd)(feats, params)

    def scalarize(fn):
        def s(x, p):
            out = fn(x, p)
            return sum(jnp.sum(o.astype(jnp.float32)) * 1e-6
                       for o in jax.tree.leaves(out))
        return s

    def grad_of(fn_scalar, has_params=True):
        if has_params:
            def g(x, p):
                gx, gp = jax.grad(fn_scalar, argnums=(0, 1))(x, p)
                return sum(jnp.sum(t.astype(jnp.float32)) * 1e-9
                           for t in jax.tree.leaves((gx, gp)))
        else:
            def g(x, p):
                gx = jax.grad(fn_scalar, argnums=0)(x, p)
                return sum(jnp.sum(t.astype(jnp.float32)) * 1e-9
                           for t in jax.tree.leaves(gx))
        return g

    stages = [
        ("backbone", scalarize(backbone_fwd), images, True),
        ("fpn", scalarize(fpn_fwd), csets, True),
        ("cls_head", scalarize(cls_head_fwd), feats, True),
        ("reg_head", scalarize(reg_head_fwd), feats, True),
        ("loss", lambda x, p: loss_fwd(x), (cls_out, reg_out), False),
    ]

    rows = []
    for name, fwd, x0, has_p in stages:
        bwd = grad_of(fwd, has_p)
        t_f = _time_chained(fwd, x0, (params,), args.iters)
        t_g = _time_chained(bwd, x0, (params,), args.iters)
        f_f = _flops(fwd, x0, params)
        f_g = _flops(bwd, x0, params)
        row = {
            "stage": name,
            "fwd_ms": round(t_f * 1e3, 2),
            "fwd+bwd_ms": round(t_g * 1e3, 2),
            "bwd_ms": round((t_g - t_f) * 1e3, 2),
            "bwd/fwd": round((t_g - t_f) / t_f, 2),
            "fwd_tflops": round(f_f / t_f / 1e12, 1) if f_f else None,
            "grad_tflops": round(f_g / t_g / 1e12, 1) if f_g else None,
            "fwd_mfu": round(f_f / t_f / V5E_BF16_PEAK, 3) if f_f else None,
            "grad_mfu": round(f_g / t_g / V5E_BF16_PEAK, 3) if f_g else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # --- fused full grad for cross-checking the stage sums -----------------
    statics = LossStatics(num_classes=C)
    apply_plain = lambda v, x, act: model.apply(v, x, enable_act=act)

    def full_loss(x, p):
        total, _ = compute_losses(
            apply_plain, None, V(p), x, boxes, labels, anchors,
            ILConfig(), FocalConfig(), statics)
        return total

    full_bwd = grad_of(full_loss)
    t_fg = _time_chained(full_bwd, images, (params,), args.iters)
    f_fg = _flops(full_bwd, images, params)
    print(json.dumps({
        "stage": "full_grad(fused)",
        "fwd+bwd_ms": round(t_fg * 1e3, 2),
        "grad_tflops": round(f_fg / t_fg / 1e12, 1) if f_fg else None,
        "grad_mfu": round(f_fg / t_fg / V5E_BF16_PEAK, 3) if f_fg else None,
        "stage_sum_ms": round(sum(r["fwd+bwd_ms"] for r in rows), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
