"""Chained-timing harness (utils/benchlib) — the shared discipline behind
bench.py / tools/bench_sweep.py / tools/bench_split.py."""
import jax
import jax.numpy as jnp
import numpy as np

from cl_object_detection_tpu.config import ModelConfig, PredictConfig
from cl_object_detection_tpu.models import create_retinanet
from cl_object_detection_tpu.ops.anchors import anchors_for_shape
from cl_object_detection_tpu.utils.benchlib import (
    chain,
    make_predict_sum,
    time_chained,
)


def test_chain_runs_n_iterations():
    calls = jnp.asarray(0.0)

    def step(x):
        return jnp.sum(x) * 0.0 + 1.0   # each iteration adds exactly 1

    out = float(chain(step, 7)(jnp.ones((2, 2))))
    assert out == 7.0


def test_predict_sum_path():
    model = create_retinanet(ModelConfig(depth=18, compute_dtype="float32"), 4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    anchors = jnp.asarray(anchors_for_shape(64, 64))
    ps = make_predict_sum(model, variables, anchors,
                          PredictConfig(pre_nms_topk=256), 64, 64)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3)
                    .astype(np.float32))
    dt = time_chained(ps, x, iters=2, reps=1)
    assert dt > 0
    # variables ride as runtime buffers via .consts (NOT closure constants
    # — closed-over params inflate the compile payload with the model size;
    # the dev rig's remote-compile endpoint 413s at R152)
    assert ps.consts and "params" in ps.consts[0]
    assert np.isfinite(float(ps(x, *ps.consts)))
