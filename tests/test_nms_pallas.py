"""Pallas batched NMS kernel (interpret mode on CPU) vs pure-JAX oracles."""
import jax.numpy as jnp
import numpy as np
import pytest

from cl_object_detection_tpu.ops.nms import nms_iterative, nms_padded
from cl_object_detection_tpu.ops.nms_pallas import nms_pallas_batched


@pytest.mark.parametrize("b,k,seed", [(1, 256, 3), (4, 512, 4), (3, 1024, 5)])
def test_batched_fixed_point_matches_reference(b, k, seed, rng):
    r = np.random.RandomState(seed)
    bb = r.rand(b, k, 4).astype(np.float32) * 600
    bb[..., 2:] = bb[..., :2] + 10 + r.rand(b, k, 2).astype(np.float32) * 60
    ss = np.sort(r.rand(b, k).astype(np.float32), axis=1)[:, ::-1].copy()
    ss[:, int(k * 0.8):] = 0.0

    ref = np.stack([
        np.asarray(nms_padded(jnp.asarray(bb[i]), jnp.asarray(ss[i]), 0.5))
        for i in range(b)
    ])
    got = np.asarray(nms_pallas_batched(
        jnp.asarray(bb), jnp.asarray(ss), 0.5, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_bit_identical_to_iterative_near_threshold(rng):
    """The kernel uses the same IoU division form as nms_iterative, so the
    masks must agree even for boxes engineered to sit AT the threshold
    (where a product-form comparison can differ by 1 ulp — ADVICE r4)."""
    k = 256
    # pairs of boxes with IoU exactly 0.5 by construction: unit-height
    # boxes [x, x+2] vs [x+⅔, x+2+⅔]: inter=4/3, union=8/3 -> ratio 0.5
    r = np.random.RandomState(7)
    bb = np.zeros((k, 4), np.float32)
    xs = r.rand(k // 2).astype(np.float32) * 500
    bb[0::2] = np.stack([xs, np.zeros_like(xs), xs + 2, np.ones_like(xs)], 1)
    sh = np.float32(2.0 / 3.0)
    bb[1::2] = bb[0::2] + [sh, 0, sh, 0]
    ss = np.sort(r.rand(k).astype(np.float32))[::-1].copy()

    it = np.asarray(nms_iterative(jnp.asarray(bb), jnp.asarray(ss), 0.5))
    got = np.asarray(nms_pallas_batched(
        jnp.asarray(bb)[None], jnp.asarray(ss)[None], 0.5, interpret=True))[0]
    np.testing.assert_array_equal(got, it)


def test_rejects_unaligned_k():
    with pytest.raises(ValueError):
        nms_pallas_batched(jnp.zeros((2, 100, 4)), jnp.zeros((2, 100)), 0.5,
                           interpret=True)


def test_batched_identical_boxes_keep_one():
    b, k = 2, 256
    bb = np.tile(np.array([[10, 10, 50, 50]], np.float32), (k, 1))
    bb = np.stack([bb, bb + 100])
    ss = np.tile(np.linspace(1.0, 0.5, k).astype(np.float32), (b, 1))
    got = np.asarray(nms_pallas_batched(
        jnp.asarray(bb), jnp.asarray(ss), 0.5, interpret=True))
    assert (got.sum(axis=1) == 1).all() and got[:, 0].all()


def test_legacy_pallas_impl_aliases_to_pallas_fp(rng):
    """nms_impl="pallas" (the retired per-image kernel's name) must keep
    working on detect_batch — it now routes to the batched kernel."""
    from cl_object_detection_tpu.ops.anchors import anchors_for_shape
    from cl_object_detection_tpu.ops.nms import detect_batch

    anchors = jnp.asarray(anchors_for_shape(64, 64))
    a = anchors.shape[0]
    r = np.random.RandomState(11)
    prob = r.rand(2, a, 3).astype(np.float32) * 0.5
    reg = (r.rand(2, a, 4).astype(np.float32) - 0.5) * 0.2
    kw = dict(height=64, width=64, pre_nms_topk=256, max_detections=16)
    legacy = detect_batch(jnp.asarray(prob), jnp.asarray(reg), anchors,
                          nms_impl="pallas", **kw)
    ref = detect_batch(jnp.asarray(prob), jnp.asarray(reg), anchors,
                       nms_impl="iterative", **kw)
    np.testing.assert_array_equal(np.asarray(legacy.valid),
                                  np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(legacy.boxes),
                               np.asarray(ref.boxes), rtol=1e-6)
