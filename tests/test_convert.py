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


# ---------------------------------------------------------------------------
# Full-model reference-checkpoint import (models.convert.load_reference_checkpoint)

_FPN_REV = {
    "p5_lateral": "P5_1", "p5_smooth": "P5_2",
    "p4_lateral": "P4_1", "p4_smooth": "P4_2",
    "p3_lateral": "P3_1", "p3_smooth": "P3_2",
    "p6": "P6", "p7": "P7_2",
}


def _flax_path_to_torch_key(coll, parts):
    """Reverse of convert._map_full_key, used to synthesize a state dict
    with the reference's exact key names covering EVERY leaf."""
    if parts[0] == "backbone":
        rest = parts[1:]
        if rest[0] == "conv1":
            return "conv1.weight"
        if rest[0] == "bn1":
            pname = rest[-1]
        if rest[0].startswith("layer"):
            stage, block = rest[0].split("_")
            prefix = f"{stage}.{block}"
            sub, pname = rest[1], rest[-1]
            if sub.startswith("conv"):
                return f"{prefix}.{sub}.weight"
            if sub == "downsample_conv":
                return f"{prefix}.downsample.0.weight"
            if sub == "downsample_bn":
                sub_t = f"{prefix}.downsample.1"
            else:  # bn1/bn2/bn3
                sub_t = f"{prefix}.{sub}"
        else:
            sub_t = "bn1"
            pname = rest[-1]
        bn_name = {"scale": "weight", "bias": "bias",
                   "mean": "running_mean", "var": "running_var"}[pname]
        return f"{sub_t}.{bn_name}"
    if parts[0] == "fpn":
        pname = "weight" if parts[-1] == "kernel" else "bias"
        return f"fpn.{_FPN_REV[parts[1]]}.{pname}"
    head = ("regressionModel" if parts[0] == "regression_head"
            else "classificationModel")
    pname = "weight" if parts[-1] == "kernel" else "bias"
    return f"{head}.{parts[1]}.{pname}"


def test_load_reference_checkpoint_full_coverage(tmp_path):
    import jax.tree_util as jtu

    from cl_object_detection_tpu.models.convert import load_reference_checkpoint

    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    rng = np.random.RandomState(1)
    sd = {}
    expect = {}   # flax path string -> expected array (flax layout)
    for coll in ("params", "batch_stats"):
        for kp, leaf in jtu.tree_flatten_with_path(variables[coll])[0]:
            parts = tuple(getattr(k, "key", str(k)) for k in kp)
            tk = _flax_path_to_torch_key(coll, parts)
            val = rng.randn(*leaf.shape).astype(np.float32)
            if parts[-1] == "var":   # BN running_var must be positive
                val = np.abs(val) + 0.1
            if val.ndim == 4:   # store as torch OIHW
                sd[tk] = val.transpose(3, 2, 0, 1)
            else:
                sd[tk] = val
            expect[coll + "/" + "/".join(parts)] = val
    sd["conv1.num_batches_tracked"] = np.array(7)   # must be ignored
    npz = str(tmp_path / "ref_full.npz")
    np.savez(npz, **sd)

    out = load_reference_checkpoint(variables, npz, strict=True)
    for coll in ("params", "batch_stats"):
        for kp, leaf in jtu.tree_flatten_with_path(out[coll])[0]:
            parts = tuple(getattr(k, "key", str(k)) for k in kp)
            np.testing.assert_allclose(
                np.asarray(leaf), expect[coll + "/" + "/".join(parts)],
                err_msg=coll + "/" + "/".join(parts))

    # model runs with the imported weights
    cls, reg = model.apply(out, jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(cls)).all()

    # strict load rejects an incomplete checkpoint
    sd.pop("regressionModel.output.bias")
    np.savez(str(tmp_path / "partial.npz"), **sd)
    import pytest
    with pytest.raises(ValueError, match="uninitialized"):
        load_reference_checkpoint(variables, str(tmp_path / "partial.npz"))
    # ...but permissive load accepts it
    out2 = load_reference_checkpoint(
        variables, str(tmp_path / "partial.npz"), strict=False)
    assert out2 is not None


def test_torch_to_npz_roundtrip(tmp_path):
    """Reference .pt checkpoint -> torch_to_npz -> strict load, proving the
    documented 'torch needed at conversion time only' path end to end."""
    torch = pytest.importorskip("torch")

    from cl_object_detection_tpu.models.convert import (
        load_reference_checkpoint,
        torch_to_npz,
    )

    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    import jax.tree_util as jtu
    rng = np.random.RandomState(5)
    sd = {}
    for coll in ("params", "batch_stats"):
        for kp, leaf in jtu.tree_flatten_with_path(variables[coll])[0]:
            parts = tuple(getattr(k, "key", str(k)) for k in kp)
            val = rng.randn(*leaf.shape).astype(np.float32)
            sd[_flax_path_to_torch_key(coll, parts)] = torch.from_numpy(
                val.transpose(3, 2, 0, 1) if val.ndim == 4 else val)
    pt = str(tmp_path / "voc2007_checkpoint_30.pt")
    # the reference's exact artifact layout (params.py:307-322)
    torch.save({"epoch": 30, "model_state_dict": sd,
                "epoch_loss": [1.0, 0.5]}, pt)
    npz = str(tmp_path / "converted.npz")
    torch_to_npz(pt, npz)
    out = load_reference_checkpoint(variables, npz, strict=True)
    np.testing.assert_allclose(
        np.asarray(out["params"]["classification_head"]["output"]["kernel"]),
        sd["classificationModel.output.weight"].numpy().transpose(2, 3, 1, 0))


class _NotATensor:
    """Module-level so pickle can round-trip it (weights_only still rejects
    arbitrary classes)."""


def test_pt_pickle_gate(tmp_path):
    """Non-tensor pickles are rejected unless explicitly allowed
    (ADVICE r1: weights_only first; unpickling runs embedded code)."""
    torch = pytest.importorskip("torch")

    from cl_object_detection_tpu.models.convert import _load_state_dict

    pt = str(tmp_path / "sketchy.pt")
    torch.save({"model_state_dict": {"x": torch.zeros(2)},
                "extra": _NotATensor()}, pt)
    with pytest.raises(ValueError, match="allow_pickle"):
        _load_state_dict(pt)
    out = _load_state_dict(pt, allow_pickle=True)
    assert "x" in out


def test_load_reference_checkpoint_torch_pt(tmp_path):
    """The reference's actual artifact: torch.save({'model_state_dict': ...})."""
    torch = pytest.importorskip("torch")

    from cl_object_detection_tpu.models.convert import load_reference_checkpoint

    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    rng = np.random.RandomState(2)
    sd = {}
    import jax.tree_util as jtu
    for coll in ("params", "batch_stats"):
        for kp, leaf in jtu.tree_flatten_with_path(variables[coll])[0]:
            parts = tuple(getattr(k, "key", str(k)) for k in kp)
            tk = _flax_path_to_torch_key(coll, parts)
            val = rng.randn(*leaf.shape).astype(np.float32)
            sd[tk] = torch.from_numpy(
                val.transpose(3, 2, 0, 1) if val.ndim == 4 else val)
    pt = str(tmp_path / "voc2007_checkpoint_10.pt")
    torch.save({"epoch": 10, "model_state_dict": sd}, pt)
    out = load_reference_checkpoint(variables, pt, strict=True)
    k = np.asarray(out["params"]["fpn"]["p6"]["kernel"])
    np.testing.assert_allclose(
        k, sd["fpn.P6.weight"].numpy().transpose(2, 3, 1, 0))


import pytest  # noqa: E402  (used above)
