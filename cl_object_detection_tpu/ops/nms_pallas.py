"""Fused Pallas TPU kernel for batched greedy hard NMS.

Replaces the suppression stage of ops/nms.py (the reference's
``torchvision.ops.batched_nms`` C++/CUDA kernel, model.py:540) on TPU.

This module carries ONE kernel — the measured winner of the r3/r4
win-or-retire campaign (tools/bench_nms.py, k=1024 on v5e):

* ``nms_pallas_batched`` — the fixed-point iteration inside ONE kernel
  with the (k, k) suppression matrix VMEM-resident and batch as a
  pipelined grid axis. The measured BATCHED winner: 0.81 ms per
  16-image batch vs 1.22 ms for the vmapped iterative (the XLA form
  re-reads the suppression matrix from HBM every fixed-point step).
  Wired as ``nms_impl="pallas_fp"`` in ``ops/nms.detect_batch``;
  measured e2e-NEUTRAL on the full B32 predict path (515.1 vs 514.9
  img/s — the NMS stage overlaps other work), so the simpler iterative
  stays the default and this is the documented batched alternative.

Two earlier per-image greedy-scan kernels (``_nms_kernel`` /
``_nms_kernel_v2``) lost to the XLA fixed-point form single-image
(0.70 vs 0.54 ms, measurements/r4/nms.json) and were retired in r5 —
git history and the README "NMS impl A/B" table keep the measurements.

Why a kernel at all: the XLA ``nms_iterative`` path pays ~15 while-loop
steps x a full HBM re-read of the (k, k) suppression matrix per image
(B16/k1024: ~1 GB of traffic). Here the matrix never leaves VMEM.

Layout notes:
  * boxes arrive TRANSPOSED (4, k) so each coordinate is a (1, k) lane
    vector (k multiple of 128);
  * the suppression matrix is built in row blocks of 256 to bound VMEM
    temporaries (k=1024: matrix 4 MB + ~1 MB temps);
  * scores/keep carry a unit middle axis so their (1, 1, k) blocks
    satisfy Mosaic's last-two-dims rule (see ``nms_pallas_batched``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 256


def _nms_fp_kernel(iou_thresh: float, boxes_ref, scores_ref, keep_ref,
                   supp_ref):
    """Fixed-point NMS for ONE image, suppression matrix VMEM-resident.

    Build the (k, k) strictly-lower suppression matrix blockwise on the
    VPU, then run the same ``keep <- valid ∧ ¬(keepᵀS > 0)`` iteration as
    ops/nms.py ``nms_iterative`` via (1,k)x(k,k) MXU matvecs until the
    fixed point. Batch = grid axis, one program per image, so Pallas
    pipelines the per-image box/score DMAs.

    The IoU test uses the SAME division form as ``nms_iterative``
    (``inter / max(union, 1e-8) > t``) so the keep masks are bit-identical
    — a product form (``inter > t * union``) can flip a keep bit when the
    IoU sits within 1 ulp of the threshold.
    """
    k = scores_ref.shape[2]
    boxes = boxes_ref[0]                  # (4, k)
    x1 = boxes[0:1, :]
    y1 = boxes[1:2, :]
    x2 = boxes[2:3, :]
    y2 = boxes[3:4, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    col = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, k), 1)
    for rb in range(k // ROW_BLOCK):
        s = rb * ROW_BLOCK
        rx1 = jnp.transpose(x1[:, s : s + ROW_BLOCK])
        ry1 = jnp.transpose(y1[:, s : s + ROW_BLOCK])
        rx2 = jnp.transpose(x2[:, s : s + ROW_BLOCK])
        ry2 = jnp.transpose(y2[:, s : s + ROW_BLOCK])
        rarea = jnp.transpose(area[:, s : s + ROW_BLOCK])

        iw = jnp.maximum(jnp.minimum(rx2, x2) - jnp.maximum(rx1, x1), 0.0)
        ih = jnp.maximum(jnp.minimum(ry2, y2) - jnp.maximum(ry1, y1), 0.0)
        inter = iw * ih
        union = jnp.maximum(rarea + area - inter, 1e-8)
        row = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, k), 0) + s
        # strictly-lower restriction folded into the matrix: earlier box i
        # suppresses later box j (ops/nms.py nms_iterative semantics)
        supp_ref[pl.ds(s, ROW_BLOCK), :] = (
            (inter / union > iou_thresh) & (row < col)
        ).astype(jnp.float32)

    valid = (scores_ref[0] > 0.0).astype(jnp.float32)      # (1, k)

    def matvec(keep):
        sup = jax.lax.dot_general(
            keep, supp_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return valid * (sup <= 0.0).astype(jnp.float32)

    def cond(carry):
        prev, cur, it = carry
        return jnp.logical_and(it < k, jnp.any(prev != cur))

    def body(carry):
        _, cur, it = carry
        return cur, matvec(cur), it + 1

    _, keep, _ = jax.lax.while_loop(
        cond, body, (valid, matvec(valid), jnp.int32(1))
    )
    keep_ref[0] = keep


@functools.partial(jax.jit, static_argnames=("iou_thresh", "interpret"))
def nms_pallas_batched(
    boxes: jnp.ndarray,     # (B, k, 4) sorted by descending score per image
    scores: jnp.ndarray,    # (B, k)
    iou_thresh: float = 0.5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched greedy-NMS keep masks (B, k) bool in ONE pallas_call —
    bit-identical to ``ops.nms.nms_iterative`` vmapped over the batch
    (same IoU division form, same fixed-point recursion)."""
    b, k = scores.shape
    if k % ROW_BLOCK:
        raise ValueError(f"k={k} must be a multiple of {ROW_BLOCK}")
    boxes_t = jnp.transpose(boxes.astype(jnp.float32), (0, 2, 1))  # (B, 4, k)
    # Mosaic requires a block's last two dims to be (8, 128)-divisible OR
    # equal to the array's — a (1, k) block of a (B, k) array violates the
    # sublane rule, so scores/keep carry a unit middle axis: block
    # (1, 1, k) of (B, 1, k) has last-two == array dims. (Interpret mode
    # doesn't check this; the real backend does.)
    scores_f = scores.astype(jnp.float32)[:, None, :]              # (B, 1, k)

    keep = pl.pallas_call(
        functools.partial(_nms_fp_kernel, iou_thresh),
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        interpret=interpret,
    )(boxes_t, scores_f)
    return keep[:, 0, :] > 0.5
