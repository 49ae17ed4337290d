"""int8 dynamic-PTQ inference path (ops/quant.py).

The reference has no quantized path (fp32 torch throughout,
/root/reference/retinanet/model.py:494-605) — this is a beyond-reference
TPU capability, so the oracle here is our own fp32 path: the quantized
conv must approximate it within symmetric-int8 error bounds, the flax
interceptor must reroute every trunk conv while leaving head ``output``
convs and the param tree untouched, and the whole predict path must run
under jit with detections that agree with fp32 on well-trained scores.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_object_detection_tpu.config import ModelConfig, PredictConfig
from cl_object_detection_tpu.models.retinanet import create_retinanet
from cl_object_detection_tpu.ops import quant


def _float_conv(x, w, b, strides=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, w, (strides, strides), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b


def test_quantized_conv_close_to_float():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (2, 16, 16, 8))
    w = jax.random.normal(k2, (3, 3, 8, 16)) * 0.1
    b = jnp.arange(16.0) * 0.01
    y_q = quant.quantized_conv(x, w, b, strides=1, padding="SAME")
    y_f = _float_conv(x, w, b)
    rel = float(jnp.max(jnp.abs(y_q - y_f)) / jnp.max(jnp.abs(y_f)))
    assert rel < 0.03  # int8 symmetric PTQ: ~1% typical, 3% bound


def test_quantized_conv_strided_no_bias():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (1, 17, 19, 4))
    w = jax.random.normal(k2, (3, 3, 4, 8)) * 0.2
    y_q = quant.quantized_conv(x, w, None, strides=2, padding="SAME")
    y_f = _float_conv(x, w, None, strides=2)
    assert y_q.shape == y_f.shape
    rel = float(jnp.max(jnp.abs(y_q - y_f)) / jnp.max(jnp.abs(y_f)))
    assert rel < 0.03


def test_quantized_conv_exact_for_representable_values():
    # integer weights/activations within [-127,127] with power-of-two-free
    # scales still round-trip exactly through the int8 grid when the max
    # equals 127 (scale exactly 1)
    x = jnp.array(
        np.random.RandomState(0).randint(-127, 128, (1, 8, 8, 4))
    ).astype(jnp.float32)
    x = x.at[0, 0, 0, 0].set(127.0)
    w = jnp.array(
        np.random.RandomState(1).randint(-127, 128, (1, 1, 4, 4))
    ).astype(jnp.float32)
    w = w.at[0, 0, 0, :].set(127.0)
    y_q = quant.quantized_conv(x, w, None, strides=1, padding="VALID")
    y_f = _float_conv(x, w, None, padding="VALID")
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_f), rtol=1e-6)


@pytest.fixture(scope="module")
def small_model():
    model = create_retinanet(ModelConfig(depth=18, pretrained=False), 5)
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (1, 64, 96, 3)) * 255.0
    variables = model.init(rng, img, enable_act=False)

    # head output convs are zero-init (prior-bias scheme) -> outputs would
    # be constant; give them small random weights so the comparison bites
    def randomize(tree, key, path=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                key, sub = jax.random.split(key)
                out[k] = randomize(v, sub, path + (k,))
            elif k == "kernel" and "output" in path:
                key, sub = jax.random.split(key)
                out[k] = jax.random.normal(sub, v.shape, v.dtype) * 1e-3
            else:
                out[k] = v
        return out

    variables = dict(variables)
    variables["params"] = randomize(dict(variables["params"]),
                                    jax.random.PRNGKey(7))
    return model, variables, img


def test_interceptor_excludes_output_convs(small_model, monkeypatch):
    model, variables, img = small_model
    seen = []
    orig = quant.quantized_conv

    def spy(x, kernel, bias, **kw):
        seen.append(kernel.shape)
        return orig(x, kernel, bias, **kw)

    monkeypatch.setattr(quant, "quantized_conv", spy)
    qapply = quant.quantized_apply(model)
    qapply(variables, img, enable_act=False)
    assert len(seen) > 0
    # 5-class x 9-anchor cls output (45) and 4x9 reg output (36) never
    # go through the int8 path
    assert all(s[-1] not in (45, 36) for s in seen)


def test_quantized_model_close_and_jits(small_model):
    model, variables, img = small_model
    logits, reg = model.apply(variables, img, enable_act=False)
    qapply = quant.quantized_apply(model)
    qlogits, qreg = jax.jit(
        lambda v, x: qapply(v, x, enable_act=False))(variables, img)
    assert qlogits.shape == logits.shape and qreg.shape == reg.shape
    lf = np.asarray(logits, np.float32).ravel()
    qf = np.asarray(qlogits, np.float32).ravel()
    assert np.all(np.isfinite(qf))
    # int8 error compounds across ~60 convs; correlation is the robust
    # check that the quantized network computes the same function
    assert np.corrcoef(lf, qf)[0, 1] > 0.98


def test_predict_fn_quantize_flag(small_model):
    from cl_object_detection_tpu.eval.predictor import make_predict_fn

    model, variables, img = small_model
    det_f = make_predict_fn(model, PredictConfig())(variables, img)
    det_q = make_predict_fn(
        model, PredictConfig(quantize=True))(variables, img)
    assert det_q.boxes.shape == det_f.boxes.shape
    assert bool(jnp.all(jnp.isfinite(det_q.scores)))


def test_quantize_composes_with_fused_stem_input(small_model):
    """--quantize together with --fused_stem: the interceptor reroutes
    trunk convs while the s2d4 stem (a raw Pallas/lax path, not nn.Conv)
    stays float — the quantized fused-input model must agree with its own
    fp32 fused-input path the same way the RGB one does."""
    from cl_object_detection_tpu.data.transforms import space_to_depth

    model, variables, img = small_model
    x4 = jnp.asarray(space_to_depth(np.asarray(img), factor=4))
    logits, _ = model.apply(variables, x4, enable_act=False)
    qapply = quant.quantized_apply(model)
    qlogits, _ = jax.jit(
        lambda v, x: qapply(v, x, enable_act=False))(variables, x4)
    assert qlogits.shape == logits.shape
    lf = np.asarray(logits, np.float32).ravel()
    qf = np.asarray(qlogits, np.float32).ravel()
    assert np.all(np.isfinite(qf))
    assert np.corrcoef(lf, qf)[0, 1] > 0.98
