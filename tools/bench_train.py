#!/usr/bin/env python
"""Training-step throughput benchmark (single chip, real TPU).

Measures the full jitted joint-training step — RetinaNet-R50 forward at
640x1024, focal + smooth-L1 loss over all ~123k anchors, backward, grad
accumulation + Adam — in images/sec/chip.

Honest timing through the axon tunnel: each step's input is the previous
step's TrainState (a real data dependency), so N dispatched steps form one
on-device chain; fetching a scalar from the final state forces completion
of the whole chain (`block_until_ready` alone returns early here — see
bench.py and CLAUDE.md).

    python tools/bench_train.py [--batch 4 8] [--iters 20] [--remat]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _stem_images(images: "np.ndarray", stem: str) -> "np.ndarray":
    """Host-side frame conversion for the stem variants (what the
    BatchLoader does in production: data/loader.py `_make_example`)."""
    from cl_object_detection_tpu.data.transforms import space_to_depth

    if stem == "s2d":
        return space_to_depth(images)
    if stem == "fused":
        return space_to_depth(images, factor=4)
    return images


def run(batch: int, iters: int, remat: bool, depth: int = 50,
        H: int = 640, W: int = 1024, stem: str = "rgb") -> float:
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import (
        FocalConfig,
        ILConfig,
        ModelConfig,
        ScheduleConfig,
    )
    from cl_object_detection_tpu.il.losses import LossStatics
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.train.optim import make_optimizer
    from cl_object_detection_tpu.train.state import TrainState
    from cl_object_detection_tpu.train.step import StepStatics, make_train_step

    C, M = 20, 32
    model = create_retinanet(ModelConfig(depth=depth, remat=remat), C)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    tx = make_optimizer(ScheduleConfig(lr=1e-5, every_iter=2), variables["params"])
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    anchors = jnp.asarray(anchors_for_shape(H, W))
    step = make_train_step(
        model, None, anchors, ILConfig(), FocalConfig(),
        LossStatics(num_classes=C), StepStatics(every_iter=2), donate=True,
    )

    rng = np.random.RandomState(0)
    images = jnp.asarray(_stem_images(
        rng.randn(batch, H, W, 3).astype(np.float32) * 0.1, stem))
    boxes = np.full((batch, M, 4), -1, np.float32)
    labels = np.full((batch, M), -1, np.int32)
    for b in range(batch):  # 8 valid GT boxes per image
        for j in range(8):
            x1 = 32 * (j + 1)
            y1 = 16 * (j + 1)
            boxes[b, j] = [x1, y1, x1 + 96, y1 + 64]
            labels[b, j] = (b + j) % C
    boxes = jnp.asarray(boxes)
    labels = jnp.asarray(labels)

    state, metrics = step(state, images, boxes, labels)     # compile + warm
    _ = float(metrics["total_loss"])

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, images, boxes, labels)
        _ = float(metrics["total_loss"])                     # sync the chain
        best = min(best, time.perf_counter() - t0)
    return batch * iters / best


def run_split(batch: int, iters: int, remat: bool, depth: int = 50,
              height: int = 640, width: int = 1024, stem: str = "rgb"):
    """Phase split of the train step: forward / +loss / +backward / full
    step (optimizer = full − backward), plus an MFU estimate.

    Each phase is its own chained fori_loop with a data dependency and a
    single host sync (same timing discipline as `run`). MFU uses XLA's own
    cost analysis (compiled.cost_analysis()['flops']) against the v5e peak
    (197 TFLOP/s bf16); falls back to an analytic 2*flops(fwd) multiple if
    cost analysis is unavailable on this runtime.
    """
    import jax
    import jax.numpy as jnp

    from cl_object_detection_tpu.config import (
        FocalConfig,
        ILConfig,
        ModelConfig,
        ScheduleConfig,
    )
    from cl_object_detection_tpu.il.losses import LossStatics, compute_losses
    from cl_object_detection_tpu.models import create_retinanet
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape

    H, W, C, M = height, width, 20, 32
    model = create_retinanet(ModelConfig(depth=depth, remat=remat), C)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    anchors = jnp.asarray(anchors_for_shape(H, W))
    il_cfg, focal_cfg = ILConfig(), FocalConfig()
    statics = LossStatics(num_classes=C)
    apply_plain = lambda v, x, act: model.apply(v, x, enable_act=act)

    rng = np.random.RandomState(0)
    images = jnp.asarray(_stem_images(
        rng.randn(batch, H, W, 3).astype(np.float32) * 0.1, stem))
    boxes_np = np.full((batch, M, 4), -1, np.float32)
    labels_np = np.full((batch, M), -1, np.int32)
    for b in range(batch):
        for j in range(8):
            boxes_np[b, j] = [32 * (j + 1), 16 * (j + 1),
                              32 * (j + 1) + 96, 16 * (j + 1) + 64]
            labels_np[b, j] = (b + j) % C
    boxes, labels = jnp.asarray(boxes_np), jnp.asarray(labels_np)

    def loss_of(params, img):
        total, _ = compute_losses(
            apply_plain, None,
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, boxes, labels, anchors, il_cfg, focal_cfg, statics,
        )
        return total

    def fwd_scalar(params, img):
        logits, reg = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, enable_act=False)
        return jnp.sum(logits[..., 0]) * 1e-6 + jnp.sum(reg) * 1e-9

    def grad_scalar(params, img):
        g = jax.grad(loss_of)(params, img)
        return sum(jnp.sum(x) for x in jax.tree.leaves(g)) * 1e-9

    def timed(fn_scalar):
        @jax.jit
        def chained(img):
            def body(i, acc):
                return acc + fn_scalar(variables["params"], img + acc * 1e-12)
            return jax.lax.fori_loop(0, iters, body, 0.0)

        float(chained(images))                  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(images))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    t_fwd = timed(fwd_scalar)
    t_loss = timed(loss_of)
    t_grad = timed(grad_scalar)
    # full-step time from `run` (includes optimizer + accumulator traffic)
    ips_full = run(batch, iters, remat, depth, height, width, stem)
    t_full = batch / ips_full

    # --- MFU from XLA's compiled cost analysis of the grad computation
    flops = None
    try:
        lowered = jax.jit(grad_scalar).lower(variables["params"], images)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    flops_source = "xla_cost_analysis"
    if flops is None and depth == 50:
        # analytic fallback (R50 ONLY — other depths get no MFU rather
        # than a wrong one): fwd conv flops for R50+FPN+heads are ~200
        # GFLOP/img at 640x1024 (2*MACs: backbone ~54G + head trunks
        # ~129G + outputs ~14G + FPN ~5G) and scale ~linearly with the
        # frame area; backward ~ 2x forward
        flops = 3.0 * 200e9 * (height * width) / (640 * 1024) * batch
        flops_source = "analytic_r50_area_scaled"
    peak = 197e12  # v5e bf16
    mfu = flops / t_full / peak if flops else None

    return {
        "batch": batch,
        "forward_ms": round(t_fwd * 1e3, 2),
        "loss_ms": round((t_loss - t_fwd) * 1e3, 2),
        "backward_ms": round((t_grad - t_loss) * 1e3, 2),
        "optimizer_ms": round((t_full - t_grad) * 1e3, 2),
        "full_step_ms": round(t_full * 1e3, 2),
        "images_per_sec": round(ips_full, 2),
        "step_flops": flops,
        "flops_source": flops_source if flops else "unavailable",
        "mfu_vs_v5e_bf16_peak": round(mfu, 4) if mfu else None,
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, nargs="+", default=[4, 8])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--height", type=int, default=640)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--split", action="store_true",
                   help="phase split (fwd/loss/bwd/opt) + MFU estimate")
    p.add_argument("--stem", default="rgb", choices=["rgb", "s2d", "fused"],
                   help="input frame / stem variant (fused = the Pallas "
                        "conv+BN+ReLU+pool kernel on host 4x4 s2d batches, "
                        "--fused_stem in training)")
    args = p.parse_args()
    tag = "" if args.stem == "rgb" else f"_{args.stem}_stem"
    for b in args.batch:
        if args.split:
            out = run_split(b, args.iters, args.remat, args.depth,
                            args.height, args.width, args.stem)
            out["metric"] = (f"retinanet_r{args.depth}_"
                             f"{args.height}x{args.width}_train_split"
                             + ("_remat" if args.remat else "") + tag)
            print(json.dumps(out), flush=True)
            continue
        ips = run(b, args.iters, args.remat, args.depth,
                  args.height, args.width, args.stem)
        print(
            json.dumps(
                {
                    "metric": f"retinanet_r{args.depth}_{args.height}x{args.width}_train_images_per_sec_per_chip{tag}",
                    "batch": b,
                    "value": round(ips, 2),
                    "unit": "images/sec/chip",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
