"""Dissect ResNet-50 backbone time on TPU: per-stage cumulative cost and
a no-BN variant (tests whether the frozen-BN affine costs an extra HBM
pass or fuses into the convs). Same chained-fori_loop timing discipline
as bench.py.

The model is re-expressed here as raw lax convs with the BN folded to a
single (scale, bias) affine — equivalent math to models/resnet.py
(verified: "s4" reproduces the flax backbone's timing within noise).

Usage: python tools/bench_backbone.py [--batch N] [mode ...]
modes: stem, s1, s2, s3, s4 (cumulative through stage k), nobn
       (BN affine skipped entirely), f32 (everything in float32)
"""
import json, sys, time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

LAYERS = (3, 4, 6, 3)
PLANES = (64, 128, 256, 512)


def run(mode, batch=16, iters=20, height=640, width=1024):
    import jax, jax.numpy as jnp
    import flax.linen as nn
    from cl_object_detection_tpu.models.resnet import ResNetBackbone

    H, W = height, width
    dtype = jnp.float32 if mode == "f32" else jnp.bfloat16
    use_bn = mode != "nobn"
    stages = {"stem": 0, "s1": 1, "s2": 2, "s3": 3, "s4": 4,
              "nobn": 4, "f32": 4}[mode]

    bb = ResNetBackbone(depth=50, dtype=dtype)
    bvars = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    params = bvars["params"]
    stats = bvars["batch_stats"]
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, kernel, stride=1, pad=0):
        return jax.lax.conv_general_dilated(
            x, kernel.astype(dtype), (stride, stride), [(pad, pad)] * 2,
            dimension_numbers=dn)

    def bn(tree_p, tree_s, x):
        # folded frozen-BN affine: one multiply-add per channel
        if not use_bn:
            return x
        b, s = tree_p["bn"], tree_s["bn"]
        inv = 1.0 / jnp.sqrt(s["var"] + 1e-5)
        scale = (b["scale"] * inv).astype(dtype)
        bias = (b["bias"] - s["mean"] * b["scale"] * inv).astype(dtype)
        return x * scale + bias

    def apply_stages(images):
        x = images.astype(dtype)
        x = conv(x, params["conv1"]["kernel"], stride=2, pad=3)
        x = nn.relu(bn(params["bn1"], stats["bn1"], x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if stages == 0:
            return jnp.sum(x[..., 0].astype(jnp.float32)) * 1e-6

        for stage in range(stages):
            planes, n = PLANES[stage], LAYERS[stage]
            stride = 1 if stage == 0 else 2
            for i in range(n):
                blk = f"layer{stage + 1}_{i}"
                bp, bs = params[blk], stats[blk]
                st = stride if i == 0 else 1
                residual = x
                out = conv(x, bp["conv1"]["kernel"])
                out = nn.relu(bn(bp["bn1"], bs["bn1"], out))
                out = conv(out, bp["conv2"]["kernel"], stride=st, pad=1)
                out = nn.relu(bn(bp["bn2"], bs["bn2"], out))
                out = conv(out, bp["conv3"]["kernel"])
                out = bn(bp["bn3"], bs["bn3"], out)
                if x.shape[-1] != planes * 4 or st != 1:
                    residual = conv(x, bp["downsample_conv"]["kernel"],
                                    stride=st)
                    residual = bn(bp["downsample_bn"], bs["downsample_bn"],
                                  residual)
                x = nn.relu(out + residual)
        return jnp.sum(x[..., 0].astype(jnp.float32)) * 1e-6

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(batch, H, W, 3).astype(np.float32))

    @jax.jit
    def chained(images):
        def body(i, acc):
            return acc + apply_stages(images + acc * 1e-12)
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


if __name__ == "__main__":
    argv = sys.argv[1:]
    batch, height, width = 16, 640, 1024
    while argv and argv[0] in ("--batch", "--height", "--width"):
        k, v = argv[0][2:], int(argv[1])
        batch = v if k == "batch" else batch
        height = v if k == "height" else height
        width = v if k == "width" else width
        argv = argv[2:]
    for m in argv or ["stem", "s1", "s2", "s3", "s4", "nobn"]:
        print(json.dumps(run(m, batch=batch, height=height, width=width)),
              flush=True)
