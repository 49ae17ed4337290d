"""flax ResNet backbones (18/34/50/101/152) with permanently-frozen BN.

Architecture matches the reference backbone
(/root/reference/retinanet/model.py:273-345, retinanet/utils.py:12-80):
7x7/2 stem -> BN -> ReLU -> 3x3/2 maxpool -> 4 residual stages; BasicBlock
for 18/34, Bottleneck (stride on the 3x3, torchvision-v1.5 style) for
50/101/152. Returns (C3, C4, C5) for the FPN.

BatchNorm is ALWAYS in inference mode — the reference freezes BN at init
and re-freezes every epoch (model.py:329, 347-351; train.py:191) — so here
``use_running_average=True`` unconditionally and the ``batch_stats``
collection is never mutated. BN scale/bias remain trainable parameters,
exactly as ``layer.eval()`` leaves them in torch.

Layout is NHWC (XLA:TPU's native conv layout); compute dtype is
configurable (bfloat16 by default) with float32 params.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

DEPTH_LAYERS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}

# He-normal fan_out: the reference init is normal(0, sqrt(2/n)),
# n = kh*kw*out_channels (model.py:314-318).
he_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class FrozenBN(nn.Module):
    """Inference-mode BatchNorm: trainable scale/bias, constant stats."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=True,
            epsilon=1e-5,
            momentum=0.1,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x):
        conv = partial(
            nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=he_fan_out,
        )
        residual = x
        out = conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                   padding=1, name="conv1")(x)
        out = FrozenBN(self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, (3, 3), padding=1, name="conv2")(out)
        out = FrozenBN(self.dtype, name="bn2")(out)
        if x.shape[-1] != self.planes or self.stride != 1:
            residual = conv(self.planes, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(x)
            residual = FrozenBN(self.dtype, name="downsample_bn")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x):
        conv = partial(
            nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=he_fan_out,
        )
        out_ch = self.planes * 4
        residual = x
        out = conv(self.planes, (1, 1), name="conv1")(x)
        out = FrozenBN(self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                   padding=1, name="conv2")(out)
        out = FrozenBN(self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv(out_ch, (1, 1), name="conv3")(out)
        out = FrozenBN(self.dtype, name="bn3")(out)
        if x.shape[-1] != out_ch or self.stride != 1:
            residual = conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                            name="downsample_conv")(x)
            residual = FrozenBN(self.dtype, name="downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNetBackbone(nn.Module):
    """Stem + 4 stages; returns (C3, C4, C5)."""
    depth: int = 50
    dtype: Any = jnp.float32
    remat: bool = False   # rematerialize residual blocks (trade FLOPs for HBM)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        kind, layers = DEPTH_LAYERS[self.depth]
        block = BasicBlock if kind == "basic" else Bottleneck
        if self.remat:
            block = nn.remat(block)

        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=he_fan_out, name="conv1")(x)
        x = FrozenBN(self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = (64, 128, 256, 512)
        for stage, (p, n) in enumerate(zip(planes, layers)):
            stride = 1 if stage == 0 else 2
            for i in range(n):
                x = block(p, stride if i == 0 else 1, self.dtype,
                          name=f"layer{stage + 1}_{i}")(x)
            if stage >= 1:
                outs.append(x)
        c3, c4, c5 = outs
        return c3, c4, c5

    @staticmethod
    def stage_channels(depth: int) -> Tuple[int, int, int]:
        kind, _ = DEPTH_LAYERS[depth]
        mult = 1 if kind == "basic" else 4
        return (128 * mult, 256 * mult, 512 * mult)
