"""Pretrained-backbone key mapping: torchvision names -> flax tree."""
import numpy as np
import jax
import jax.numpy as jnp

from cl_object_detection_tpu.config import ModelConfig
from cl_object_detection_tpu.models import create_retinanet
from cl_object_detection_tpu.models.convert import load_pretrained_backbone


def test_load_pretrained_backbone(tmp_path):
    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    rng = np.random.RandomState(0)
    sd = {
        "conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32),
        "bn1.weight": rng.randn(64).astype(np.float32),
        "bn1.bias": rng.randn(64).astype(np.float32),
        "bn1.running_mean": rng.randn(64).astype(np.float32),
        "bn1.running_var": np.abs(rng.randn(64)).astype(np.float32),
        "bn1.num_batches_tracked": np.array(100),
        "layer1.0.conv1.weight": rng.randn(64, 64, 3, 3).astype(np.float32),
        "layer1.0.bn1.weight": rng.randn(64).astype(np.float32),
        "layer2.0.downsample.0.weight": rng.randn(128, 64, 1, 1).astype(np.float32),
        "layer2.0.downsample.1.running_var": np.abs(rng.randn(128)).astype(np.float32),
        "fc.weight": rng.randn(1000, 512).astype(np.float32),  # must be ignored
    }
    npz = str(tmp_path / "w.npz")
    np.savez(npz, **sd)

    out = load_pretrained_backbone(variables, npz)
    bb = out["params"]["backbone"]
    np.testing.assert_allclose(
        np.asarray(bb["conv1"]["kernel"]),
        sd["conv1.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(np.asarray(bb["bn1"]["bn"]["scale"]), sd["bn1.weight"])
    np.testing.assert_allclose(
        np.asarray(out["batch_stats"]["backbone"]["bn1"]["bn"]["mean"]),
        sd["bn1.running_mean"],
    )
    np.testing.assert_allclose(
        np.asarray(bb["layer1_0"]["conv1"]["kernel"]),
        sd["layer1.0.conv1.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(bb["layer2_0"]["downsample_conv"]["kernel"]),
        sd["layer2.0.downsample.0.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(out["batch_stats"]["backbone"]["layer2_0"]["downsample_bn"]["bn"]["var"]),
        sd["layer2.0.downsample.1.running_var"],
    )
    # the model still runs with merged weights
    cls, reg = model.apply(out, jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(cls)).all()
