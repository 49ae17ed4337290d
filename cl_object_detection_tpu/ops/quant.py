"""Dynamic int8 quantized inference for the predict path.

TPU-native rationale: the v5e MXU executes int8 contractions at ~2x the
bf16 rate (394 vs 197 TOPS), so the conv-bound predict path can approach
2x by feeding the MXU int8 operands. The reference has no quantized path
at all (fp32 torch throughout, /root/reference/retinanet/model.py:494-605);
this is a beyond-reference capability.

Measured on this dev runtime (v5e single chip, R50 608x832 B32, the
bench.py operating point): **mAP-neutral** (0.3004 vs 0.3001 mAP50 on the
trained 20-class toy eval, BiC-corrected) but **not faster** — 497 vs 513
img/s/chip. The emitted HLO keeps the s8xs8->s32 convolution, but this
XLA build does not hit the int8 MXU fast path for convs (and the dynamic
quantize/requantize adds ~3%). The path stays default-off: correctness
is tested (tests/test_quant.py) so the 2x is there for the taking on
runtimes whose conv emitter exploits int8 operands.

Scheme (standard symmetric PTQ):

    s_w[o] = max|W[...,o]| / 127     per output channel (zero-point 0)
    s_x    = max|x| / 127            per tensor, dynamic per batch
    y      = conv(round(x/s_x), round(W/s_w)) * s_x * s_w  (+ bias)

Dynamic activation scales avoid a calibration pass entirely — the max
reduce and the requantize round/clip are cheap elementwise/reduce work
XLA fuses around the conv. Symmetric quantization keeps zero exact,
which matters because ReLU outputs are half zeros and SAME padding
introduces exact zeros.

Integration is via ``flax.linen.intercept_methods``: every ``nn.Conv``
call in the model (backbone blocks, FPN, head trunks) is redirected to
the int8 path with **zero model-code changes** and an unchanged param
tree (checkpoints load as-is). Excluded: the cls/reg head ``output``
convs (score-sensitive final layers, standard PTQ practice) and the
raw-lax stem conv (cin=3 maps poorly to the MXU regardless).

Enable with ``PredictConfig.quantize=True`` (CLI ``--quantize``); measure
the mAP delta with cli.validate A/B before trusting a deployment.
"""
from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    t = tuple(v)
    return (t[0], t[0]) if len(t) == 1 else (t[0], t[1])


def _flax_padding(padding, kernel_size):
    """Reproduce flax nn.Conv padding canonicalization for our use cases."""
    if isinstance(padding, str):
        return padding                       # 'SAME' / 'VALID'
    if isinstance(padding, int):
        return [(padding, padding)] * 2
    pads = []
    for p in padding:
        pads.append((p, p) if isinstance(p, int) else tuple(p))
    return pads


def quantized_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias,
    *,
    strides,
    padding,
    kernel_dilation=1,
    input_dilation=1,
    feature_group_count: int = 1,
    out_dtype=None,
) -> jnp.ndarray:
    """int8 x int8 -> int32 conv with fp dequantize; NHWC/HWIO layout."""
    out_dtype = out_dtype or x.dtype
    kh, kw = kernel.shape[0], kernel.shape[1]

    kf = kernel.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(kf / s_w), -127, 127).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)

    y = jax.lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=_pair(strides or 1),
        padding=_flax_padding(padding, (kh, kw)),
        lhs_dilation=_pair(input_dilation or 1),
        rhs_dilation=_pair(kernel_dilation or 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * s_w)   # (out,) broadcast over NHWC
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def make_quant_interceptor(exclude_names: Sequence[str] = ("output",)):
    """flax interceptor: reroute nn.Conv.__call__ through quantized_conv."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (
            not isinstance(mod, nn.Conv)
            or context.method_name != "__call__"
            or mod.name in exclude_names
        ):
            return next_fun(*args, **kwargs)
        params = mod.variables["params"]
        kernel = params["kernel"]
        bias = params.get("bias") if mod.use_bias else None
        return quantized_conv(
            args[0],
            kernel,
            bias,
            strides=mod.strides,
            padding=mod.padding,
            kernel_dilation=mod.kernel_dilation,
            input_dilation=mod.input_dilation,
            feature_group_count=mod.feature_group_count,
            out_dtype=mod.dtype or args[0].dtype,
        )

    return interceptor


def quantized_apply(model, exclude_names: Sequence[str] = ("output",)) -> Callable:
    """Wrap ``model.apply`` so every non-excluded nn.Conv runs int8.

    Returns a function with model.apply's signature. The interception
    context is entered at trace time, so the result jits normally.
    """
    interceptor = make_quant_interceptor(exclude_names)

    @functools.wraps(model.apply)
    def apply(*args, **kwargs):
        with nn.intercept_methods(interceptor):
            return model.apply(*args, **kwargs)

    return apply
