#!/usr/bin/env python
"""Gate experiment for the r5 forward-perf attempt (VERDICT r4 #2).

The predict path's head trunks run 3x3 256->256 convs at 0.41-0.46 bf16
MFU (measurements/r4/bwd_breakdown.json) — near XLA's conv roofline, so
the only remaining lever is the MXU's ~2x int8 rate. quant.py already
measured that the XLA conv emitter does NOT hit the int8 fast path (497
vs 513 img/s e2e). This microbench asks the prior question: can a Pallas
int8 MATMUL on this runtime beat the XLA bf16 matmul at the head-conv
shapes (im2col: M = B*H*W, K = 9*256 = 2304, N = 256)? If int8 Pallas
can't clearly beat bf16 XLA here, a fused int8 conv kernel cannot win
e2e and the attempt is retired with this measurement as the floor
statement.

    python tools/bench_int8_matmul.py [--m 63232] [--iters 30]
"""
import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _pallas_int8_matmul(bm, bn, x, w, scale):
    """Tiled int8 x int8 -> int32 matmul, requantized to bf16 by `scale`.

    K is carried whole per tile (head shapes: K<=2304 int8 -> x tile
    bm x K <= 1.2 MB, w tile K x bn <= 0.6 MB in VMEM)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    _, n = w.shape

    def kernel(x_ref, w_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[...] = (acc.astype(jnp.float32) * scale).astype(jnp.bfloat16)

    try:
        cp = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    except TypeError:
        cp = None
    return pl.pallas_call(
        kernel,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        **({"compiler_params": cp} if cp is not None else {}),
    )(x, w)


def time_fn(fn, args, iters, reps=5):
    """Chained timing (axon tunnel discipline): data-dependent fori_loop,
    one scalar fetch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(i, acc):
            out = fn(*_perturb(a, acc))
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-20

        return jax.lax.fori_loop(0, iters, body, 0.0)

    def _perturb(a, acc):
        x = a[0]
        if x.dtype == jnp.int8:
            # data dep without changing values: xor twice is identity-free;
            # add 0 * cast(acc) keeps the dep chain
            x = x + (acc * 0).astype(jnp.int8)
        else:
            x = x + acc.astype(x.dtype) * 0
        return (x,) + a[1:]

    float(chained(*args))
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(*args))
        lat.append((time.perf_counter() - t0) / iters)
    return float(np.median(lat))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=63232)  # 76*104*8 (P3, B8)
    p.add_argument("--k", type=int, default=2304)   # 9*256 im2col
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--bm", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    m = (args.m // args.bm) * args.bm
    k, n = args.k, args.n
    rng = np.random.RandomState(0)
    x8 = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)
    xb = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    wb = jnp.asarray(rng.randn(k, n), jnp.bfloat16)
    flops = 2.0 * m * k * n

    results = {}

    def report(tag, dt):
        tflops = flops / dt / 1e12
        results[tag] = dt
        print(json.dumps({
            "metric": f"matmul_{tag}_m{m}_k{k}_n{n}",
            "ms": round(dt * 1e3, 3), "tflops": round(tflops, 1),
            "mfu_vs_bf16_peak": round(tflops / 197.0, 3),
        }), flush=True)

    report("xla_bf16", time_fn(
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
        (xb, wb), args.iters))
    report("xla_int8", time_fn(
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32),
        (x8, w8), args.iters))
    for bm in (512, 1024, 2048):
        if m % bm:
            continue
        pk = functools.partial(_pallas_int8_matmul, bm, 256)
        report(f"pallas_int8_bm{bm}", time_fn(
            lambda a, b: pk(a, b, 1e-4), (x8, w8), args.iters))

    # the real op this stands in for: XLA 3x3 conv at the head-trunk
    # shape, bf16 and int8 — the number any kernel must beat
    import math

    b_img = max(1, m // (76 * 104))
    hc, wc = 76, 104
    xc = jnp.asarray(rng.randn(b_img, hc, wc, 256), jnp.bfloat16)
    kc = jnp.asarray(rng.randn(3, 3, 256, 256), jnp.bfloat16)
    conv_flops = 2.0 * b_img * hc * wc * 9 * 256 * 256

    def conv(a, w):
        return jax.lax.conv_general_dilated(
            a, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt = time_fn(conv, (xc, kc), args.iters)
    print(json.dumps({"metric": f"conv3x3_xla_bf16_b{b_img}_76x104_256",
                      "ms": round(dt * 1e3, 3),
                      "tflops": round(conv_flops / dt / 1e12, 1),
                      "mfu_vs_bf16_peak": round(conv_flops / dt / 197e12, 3)}),
          flush=True)
    results["conv_bf16"] = dt * flops / conv_flops  # normalized to matmul flops

    xc8 = jnp.asarray(rng.randint(-127, 128, (b_img, hc, wc, 256)), jnp.int8)
    kc8 = jnp.asarray(rng.randint(-127, 128, (3, 3, 256, 256)), jnp.int8)

    def conv8(a, w):
        return jax.lax.conv_general_dilated(
            a, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    dt8 = time_fn(conv8, (xc8, kc8), args.iters)
    print(json.dumps({"metric": f"conv3x3_xla_int8_b{b_img}_76x104_256",
                      "ms": round(dt8 * 1e3, 3),
                      "tflops": round(conv_flops / dt8 / 1e12, 1),
                      "mfu_vs_bf16_peak": round(conv_flops / dt8 / 197e12, 3)}),
          flush=True)

    best_pallas = min(v for k, v in results.items() if "pallas" in k)
    print(json.dumps({
        "best_pallas_int8_vs_xla_bf16_matmul":
            round(results["xla_bf16"] / best_pallas, 3),
        "conv_speedup_int8_vs_bf16": round(dt / dt8, 3),
    }))


if __name__ == "__main__":
    main()
