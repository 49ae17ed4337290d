"""Shared chained-iteration timing harness for the bench tools.

Through the axon tunnel ``block_until_ready`` returns before device
completion, so naive timing reports async fiction. The discipline (one
copy, used by bench.py / tools/bench_sweep.py / tools/bench_split.py):
N iterations CHAINED inside one jitted fori_loop — each iteration's
input depends on the previous output (a *1e-12 perturbation, numerically
negligible) — and a single host scalar fetch at the end forces
completion of the whole chain, amortizing the ~30 ms tunnel RTT over N.
"""
from __future__ import annotations

import time


def make_predict_sum(model, variables, anchors, pcfg, H: int, W: int):
    """scalar = sum(det.scores) over the full forward + decode + NMS path.

    The weights ride through the chain as RUNTIME buffers (the ``consts``
    attribute, threaded by :func:`chain`), not closure constants — closed-
    over params get embedded in the HLO, and this rig's remote-compile
    endpoint 413s on request bodies above ~R101 size (R152 fp32 params
    alone are ~230 MB of inlined constants)."""
    import jax.numpy as jnp

    from ..ops.nms import detect_batch

    apply_fn = model.apply
    if getattr(pcfg, "quantize", False):
        from ..ops.quant import quantized_apply

        apply_fn = quantized_apply(model)

    def predict_sum(images, variables):
        logits, regression = apply_fn(variables, images, enable_act=False)
        det = detect_batch(
            logits, regression, anchors, height=H, width=W,
            score_thresh=pcfg.score_thresh, iou_thresh=pcfg.nms_iou,
            pre_nms_topk=pcfg.pre_nms_topk,
            max_detections=pcfg.max_detections, nms_impl=pcfg.nms_impl,
            scores_are_logits=True,
            topk_method=getattr(pcfg, "topk_method", "exact"),
        )
        return jnp.sum(det.scores)

    predict_sum.consts = (variables,)
    return predict_sum


def chain(step_fn, iters: int):
    """fn(x) -> scalar running step_fn ``iters`` times, chained (jitted).

    If ``step_fn`` carries a ``consts`` attribute (extra pytrees such as
    model variables), they are passed as jit ARGUMENTS so they stay device
    buffers instead of bloating the compiled program as constants."""
    import jax

    consts = getattr(step_fn, "consts", ())

    @jax.jit
    def chained(x, *consts):
        def body(i, acc):
            return acc + step_fn(x + acc * 1e-12, *consts)

        return jax.lax.fori_loop(0, iters, body, 0.0)

    return lambda x: chained(x, *consts)


def time_chained(step_fn, x0, iters: int = 20, reps: int = 3) -> float:
    """Mean seconds per chained run (compile+warm excluded)."""
    chained = chain(step_fn, iters)
    float(chained(x0))                       # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        float(chained(x0))
    return (time.perf_counter() - t0) / reps
