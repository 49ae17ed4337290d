"""Dissect ResNet-50 backbone time on TPU: per-stage cumulative cost and
a no-BN variant (tests whether FrozenBN fuses into the convs or pays an
extra HBM pass). Same chained-fori_loop timing discipline as bench.py.

Usage: python tools/bench_backbone.py [--batch N] [mode ...]
modes: stem, s1, s2, s3, s4 (cumulative through stage k), full, nobn,
       f32 (full backbone in float32)
"""
import json, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def make_backbone(nobn=False, dtype=None):
    import flax.linen as nn
    import jax.numpy as jnp
    from cl_object_detection_tpu.models import resnet as R

    dtype = dtype or jnp.bfloat16

    class Identity(nn.Module):
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x):
            return x

    if nobn:
        # swap FrozenBN for identity to isolate BN cost
        orig = R.FrozenBN
        R.FrozenBN = Identity
        try:
            bb = R.ResNetBackbone(depth=50, dtype=dtype)
        finally:
            R.FrozenBN = orig
        return bb
    return R.ResNetBackbone(depth=50, dtype=dtype)


def run(mode, batch=16, iters=20):
    import jax, jax.numpy as jnp
    import flax.linen as nn
    from cl_object_detection_tpu.models import resnet as R

    H, W = 640, 1024
    dtype = jnp.float32 if mode == "f32" else jnp.bfloat16
    bb = make_backbone(nobn=(mode == "nobn"), dtype=dtype)
    bvars = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))

    stages = {"stem": 0, "s1": 1, "s2": 2, "s3": 3, "s4": 4,
              "full": 4, "nobn": 4, "f32": 4}[mode]

    def partial_apply(images):
        # re-trace the backbone module graph up to `stages`
        p = bvars["params"]
        x = images.astype(dtype)

        def conv_apply(name, x, feats, ksize, stride, pad):
            k = p[name]["kernel"].astype(dtype)
            return jax.lax.conv_general_dilated(
                x, k, (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def bn_apply(scope, x):
            if mode == "nobn":
                return x
            b = p[scope]["bn"]
            s = bvars["batch_stats"][scope]["bn"]
            scale = (b["scale"] / jnp.sqrt(s["var"] + 1e-5)).astype(dtype)
            bias = (b["bias"] - s["mean"] * b["scale"]
                    / jnp.sqrt(s["var"] + 1e-5)).astype(dtype)
            return x * scale + bias

        x = conv_apply("conv1", x, 64, 7, 2, 3)
        x = nn.relu(bn_apply("bn1", x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if stages == 0:
            return jnp.sum(x[..., 0].astype(jnp.float32)) * 1e-6

        layers = (3, 4, 6, 3)
        planes = (64, 128, 256, 512)
        for stage in range(stages):
            pl, n = planes[stage], layers[stage]
            stride = 1 if stage == 0 else 2
            for i in range(n):
                blk = f"layer{stage + 1}_{i}"
                bp = p[blk]
                st = stride if i == 0 else 1
                residual = x
                out = jax.lax.conv_general_dilated(
                    x, bp["conv1"]["kernel"].astype(dtype), (1, 1),
                    [(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                out = nn.relu(bn_apply2(bvars, blk, "bn1", out, mode, dtype))
                out = jax.lax.conv_general_dilated(
                    out, bp["conv2"]["kernel"].astype(dtype), (st, st),
                    [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                out = nn.relu(bn_apply2(bvars, blk, "bn2", out, mode, dtype))
                out = jax.lax.conv_general_dilated(
                    out, bp["conv3"]["kernel"].astype(dtype), (1, 1),
                    [(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                out = bn_apply2(bvars, blk, "bn3", out, mode, dtype)
                if x.shape[-1] != pl * 4 or st != 1:
                    residual = jax.lax.conv_general_dilated(
                        x, bp["downsample_conv"]["kernel"].astype(dtype),
                        (st, st), [(0, 0), (0, 0)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    residual = bn_apply2(bvars, blk, "downsample_bn",
                                         residual, mode, dtype)
                x = nn.relu(out + residual)
        return jnp.sum(x[..., 0].astype(jnp.float32)) * 1e-6

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(batch, H, W, 3).astype(np.float32))

    @jax.jit
    def chained(images):
        def body(i, acc):
            return acc + partial_apply(images + acc * 1e-12)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(chained(x0))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(chained(x0))
    dt = (time.perf_counter() - t0) / reps
    return {"mode": mode, "batch": batch,
            "ms_per_batch": round(dt / iters * 1e3, 3),
            "img_per_s": round(batch * iters / dt, 2)}


def bn_apply2(bvars, blk, name, x, mode, dtype):
    import jax.numpy as jnp
    if mode == "nobn":
        return x
    b = bvars["params"][blk][name]["bn"]
    s = bvars["batch_stats"][blk][name]["bn"]
    scale = (b["scale"] / jnp.sqrt(s["var"] + 1e-5)).astype(dtype)
    bias = (b["bias"] - s["mean"] * b["scale"]
            / jnp.sqrt(s["var"] + 1e-5)).astype(dtype)
    return x * scale + bias


if __name__ == "__main__":
    argv = sys.argv[1:]
    batch = 16
    if argv and argv[0] == "--batch":
        batch = int(argv[1])
        argv = argv[2:]
    for m in argv or ["stem", "s1", "s2", "s3", "s4", "nobn"]:
        print(json.dumps(run(m, batch=batch)), flush=True)
