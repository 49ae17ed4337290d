"""Fused s2d4 stem (ops/stem_pallas.py): packing math, reference parity
with the direct RGB stem, the Pallas kernel in interpret mode, gradients
through the custom VJP, and the backbone/data-pipeline integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from cl_object_detection_tpu.data.transforms import (
    logical_image_hw,
    space_to_depth,
)
from cl_object_detection_tpu.ops.stem_pallas import (
    _stem_fused_pallas,
    pack_stem_kernel,
    stem_fused,
    stem_fused_reference,
)


def _pack_oracle(k7: np.ndarray) -> np.ndarray:
    """Brute-force transcription of the packing law (independent of the
    gather-table implementation)."""
    k3 = np.zeros((3, 3, 64, 256), k7.dtype)
    for T in range(3):
        for U in range(3):
            for a in range(2):
                for b in range(2):
                    for al in range(4):
                        for be in range(4):
                            t = 4 * (T - 1) + al + 3 - 2 * a
                            u = 4 * (U - 1) + be + 3 - 2 * b
                            if 0 <= t < 7 and 0 <= u < 7:
                                k3[T, U,
                                   (al * 4 + be) * 3:(al * 4 + be) * 3 + 3,
                                   (a * 2 + b) * 64:(a * 2 + b) * 64 + 64] \
                                    = k7[t, u]
    return k3


def _direct_stem(x, k7, bias):
    y = jax.lax.conv_general_dilated(
        x, k7, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y + bias, 0)
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def _rand(shape, seed=0, scale=1.0):
    return (np.random.RandomState(seed).randn(*shape) * scale).astype(
        np.float32)


def test_pack_stem_kernel_matches_oracle():
    k7 = _rand((7, 7, 3, 64), 1, 0.2)
    np.testing.assert_array_equal(
        np.asarray(pack_stem_kernel(jnp.asarray(k7))), _pack_oracle(k7))


@pytest.mark.parametrize("hw", [(64, 96), (32, 32)])
def test_reference_matches_direct_stem(hw):
    H, W = hw
    x = _rand((2, H, W, 3), 2, 0.5)
    k7 = _rand((7, 7, 3, 64), 3, 0.2)
    bias = _rand((64,), 4, 0.05)
    ref = _direct_stem(jnp.asarray(x), jnp.asarray(k7), jnp.asarray(bias))
    x4 = space_to_depth(x, factor=4)
    out = stem_fused_reference(jnp.asarray(x4),
                               pack_stem_kernel(jnp.asarray(k7)),
                               jnp.tile(jnp.asarray(bias), 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_kernel_interpret_matches_reference():
    H, W = 64, 96
    x = _rand((2, H, W, 3), 5, 0.5)
    k7 = _rand((7, 7, 3, 64), 6, 0.2)
    bias = _rand((64,), 7, 0.05)
    x4 = jnp.asarray(space_to_depth(x, factor=4))
    k3 = pack_stem_kernel(jnp.asarray(k7))
    b4 = jnp.tile(jnp.asarray(bias), 4)
    ref = stem_fused_reference(x4, k3, b4)
    out = _stem_fused_pallas(x4, k3.reshape(576, 256),
                             b4.reshape(1, 256), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grad_matches_direct_stem():
    """d loss/d k7 and d loss/d bias agree between the fused custom-VJP op
    and the direct RGB stem (f32) — the training path is exact."""
    H, W = 32, 64
    x = _rand((1, H, W, 3), 8, 0.5)
    k7 = _rand((7, 7, 3, 64), 9, 0.2)
    bias = _rand((64,), 10, 0.05)
    g_img = _rand((1, H // 4, W // 4, 64), 11)

    def loss_direct(k7_, bias_):
        out = _direct_stem(jnp.asarray(x), k7_, bias_)
        return jnp.sum(out * jnp.asarray(g_img))

    x4 = jnp.asarray(space_to_depth(x, factor=4))

    def loss_fused(k7_, bias_):
        out = stem_fused(x4, pack_stem_kernel(k7_), jnp.tile(bias_, 4))
        return jnp.sum(out * jnp.asarray(g_img))

    gd = jax.grad(loss_direct, argnums=(0, 1))(jnp.asarray(k7),
                                               jnp.asarray(bias))
    gf = jax.grad(loss_fused, argnums=(0, 1))(jnp.asarray(k7),
                                              jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gd[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gd[1]),
                               rtol=1e-4, atol=1e-5)


def test_backbone_fused_matches_rgb():
    """ResNetBackbone on a 64-channel s2d4 batch == the RGB path (f32),
    including the probed frozen-BN fold."""
    from cl_object_detection_tpu.models.resnet import ResNetBackbone

    H, W = 64, 96
    bb = ResNetBackbone(depth=18, dtype=jnp.float32)
    x = _rand((2, H, W, 3), 12, 0.5)
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # make the BN affine non-trivial (init is scale=1, bias=0, mean=0)
    variables = jax.tree.map(lambda v: v, variables)
    bs = variables["batch_stats"]["bn1"]["bn"]
    bs["mean"] = jnp.asarray(_rand((64,), 13, 0.1))
    bs["var"] = jnp.abs(jnp.asarray(_rand((64,), 14, 0.1))) + 1.0

    ref = bb.apply(variables, jnp.asarray(x))
    x4 = jnp.asarray(space_to_depth(x, factor=4))
    out = bb.apply(variables, x4)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_uint8_device_normalize_64ch():
    """uint8 s2d4 infeed == host-normalized s2d4 (the c==64 branch of
    _device_normalize tiles the stats over the 48 real channels)."""
    from cl_object_detection_tpu.data.transforms import normalize_image
    from cl_object_detection_tpu.models.resnet import _device_normalize

    img = np.random.RandomState(15).randint(
        0, 256, (1, 16, 16, 3)).astype(np.uint8)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    host = space_to_depth(
        normalize_image(img.astype(np.float32) / 255.0, mean, std), factor=4)
    dev = _device_normalize(
        jnp.asarray(space_to_depth(img, factor=4)), mean, std, jnp.float32)
    np.testing.assert_allclose(np.asarray(dev)[..., :48], host[..., :48],
                               rtol=1e-5, atol=1e-5)


def test_space_to_depth4_layout_and_logical_hw():
    x = _rand((1, 8, 8, 3), 16)
    x4 = space_to_depth(x, factor=4)
    assert x4.shape == (1, 2, 2, 64)
    assert logical_image_hw(x4) == (8, 8)
    # channel (al*4+be)*3+c = pixel (4R+al, 4S+be, c)
    for al in range(4):
        for be in range(4):
            for c in range(3):
                np.testing.assert_array_equal(
                    x4[0, :, :, (al * 4 + be) * 3 + c],
                    x[0, al::4, be::4, c])
    np.testing.assert_array_equal(x4[..., 48:], 0)
