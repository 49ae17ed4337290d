"""Pallas NMS kernel (interpret mode on CPU) vs the pure-JAX oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from cl_object_detection_tpu.ops.nms import nms_padded
from cl_object_detection_tpu.ops.nms_pallas import nms_pallas


@pytest.mark.parametrize("k,seed", [(256, 0), (512, 1), (1024, 2)])
def test_matches_reference(k, seed, rng):
    r = np.random.RandomState(seed)
    bb = r.rand(k, 4).astype(np.float32) * 600
    bb[:, 2:] = bb[:, :2] + 10 + r.rand(k, 2).astype(np.float32) * 60
    ss = np.sort(r.rand(k).astype(np.float32))[::-1].copy()
    ss[int(k * 0.8):] = 0.0

    ref = np.asarray(nms_padded(jnp.asarray(bb), jnp.asarray(ss), 0.5))
    got = np.asarray(nms_pallas(jnp.asarray(bb), jnp.asarray(ss), 0.5, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_rejects_unaligned_k():
    with pytest.raises(ValueError):
        nms_pallas(jnp.zeros((100, 4)), jnp.zeros((100,)), 0.5, interpret=True)


def test_all_identical_boxes_keep_one():
    k = 256
    bb = np.tile(np.array([[10, 10, 50, 50]], np.float32), (k, 1))
    ss = np.linspace(1.0, 0.5, k).astype(np.float32)
    got = np.asarray(nms_pallas(jnp.asarray(bb), jnp.asarray(ss), 0.5, interpret=True))
    assert got.sum() == 1 and got[0]


@pytest.mark.parametrize("b,k,seed", [(1, 256, 3), (4, 512, 4), (3, 1024, 5)])
def test_batched_fixed_point_matches_reference(b, k, seed, rng):
    from cl_object_detection_tpu.ops.nms_pallas import nms_pallas_batched

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


def test_batched_identical_boxes_keep_one():
    from cl_object_detection_tpu.ops.nms_pallas import nms_pallas_batched

    b, k = 2, 256
    bb = np.tile(np.array([[10, 10, 50, 50]], np.float32), (k, 1))
    bb = np.stack([bb, bb + 100])
    ss = np.tile(np.linspace(1.0, 0.5, k).astype(np.float32), (b, 1))
    got = np.asarray(nms_pallas_batched(
        jnp.asarray(bb), jnp.asarray(ss), 0.5, interpret=True))
    assert (got.sum(axis=1) == 1).all() and got[:, 0].all()
