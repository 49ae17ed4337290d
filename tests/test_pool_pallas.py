"""Pallas stem max-pool kernel: bit-parity vs XLA reduce_window.

The kernel itself targets TPU; here it runs under the Pallas interpreter
(CPU) against flax's max_pool oracle. The custom-VJP wrapper's backward
is the XLA select-and-scatter path, checked against jax.grad of the
reference pool.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.mark.parametrize(
    "shape", [(2, 64, 128, 64), (1, 320, 512, 64), (3, 32, 64, 16)]
)
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_pool_kernel_bit_parity(rng, shape, dtype):
    import flax.linen as nn

    from cl_object_detection_tpu.ops.pool_pallas import max_pool_3x3_s2

    x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)
    ref = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    got = max_pool_3x3_s2(x, interpret=True)
    assert got.shape == ref.shape
    assert bool(jnp.all(got == ref))


@pytest.mark.parametrize("shape", [(2, 32, 48, 256), (1, 160, 256, 256)])
def test_phase_pool_kernel_bit_parity(rng, shape):
    """phase_max_pool (Pallas) vs models.resnet.phase_pool (XLA oracle)
    on phase-packed conv outputs."""
    from cl_object_detection_tpu.models.resnet import phase_pool
    from cl_object_detection_tpu.ops.pool_pallas import phase_max_pool

    y4 = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype("bfloat16")
    ref = phase_pool(y4)
    got = phase_max_pool(y4, interpret=True)
    assert got.shape == ref.shape
    assert bool(jnp.all(got == ref))


def test_phase_pool_vjp_matches_xla_grad(rng):
    """phase_max_pool_diff's backward (XLA recompute) == jax.grad of the
    XLA phase pool."""
    import jax

    from cl_object_detection_tpu.models.resnet import phase_pool
    from cl_object_detection_tpu.ops.pool_pallas import _phase_bwd

    y4 = jnp.asarray(rng.randn(1, 8, 16, 256).astype(np.float32))
    g_ref = jax.grad(lambda t: jnp.sum(phase_pool(t) ** 2))(y4)
    (g_got,) = _phase_bwd(y4, phase_pool(y4) * 2)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref))


def test_pool_vjp_matches_xla_pool_grad(rng):
    import jax

    from cl_object_detection_tpu.ops.pool_pallas import _pool_bwd, _xla_pool

    x = jnp.asarray(rng.randn(1, 16, 32, 8).astype(np.float32))
    g_ref = jax.grad(lambda t: jnp.sum(_xla_pool(t) ** 2))(x)
    (g_got,) = _pool_bwd(x, _xla_pool(x) * 2)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref))


def test_backbone_cpu_falls_back(rng):
    """Off-TPU the backbone must not attempt the Pallas kernel."""
    import jax

    from cl_object_detection_tpu.models.resnet import ResNetBackbone

    bb = ResNetBackbone(depth=18, dtype=jnp.float32, pallas_pool=True)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    v = bb.init(jax.random.PRNGKey(0), x)
    c3, c4, c5 = jax.jit(lambda t: bb.apply(v, t))(x)
    assert c3.shape[1:3] == (8, 8)
