"""RetinaNet classification / regression heads.

Matches the reference ``RegressionModel`` / ``ClassificationModel``
(/root/reference/retinanet/model.py:94-214): a 4x(3x3 conv + ReLU) trunk
per head, then a 3x3 output conv producing ``A*4`` box deltas or ``A*C``
class logits per cell. The output channel layout is ANCHOR-MAJOR
(channel = a*C + c), identical to the reference's
``view(B, W, H, A, C)`` reshape (model.py:196-200) — classifier-expansion
surgery (expand.py) relies on this layout contract.

Output-layer init: weights 0; classification bias -log((1-prior)/prior),
regression bias 0 (model.py:321-327).

Heads use ``setup()`` (not compact) so ``extract_feature`` / ``classify``
are directly callable via ``apply(..., method=...)`` — the reference's
split paths for the prototype method (model.py:157-184).
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .resnet import he_fan_out


def prior_bias_init(prior: float):
    value = -math.log((1.0 - prior) / prior)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


class RegressionHead(nn.Module):
    num_anchors: int = 9
    channels: int = 256
    num_layers: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        self.convs = [
            nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=he_fan_out,
                    name=f"conv{i + 1}")
            for i in range(self.num_layers)
        ]
        self.output = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="output",
        )

    def __call__(self, x) -> jnp.ndarray:
        for conv in self.convs:
            x = nn.relu(conv(x))
        out = self.output(x).astype(jnp.float32)
        b, h, w, _ = out.shape
        return out.reshape(b, h * w * self.num_anchors, 4)


class ClassificationHead(nn.Module):
    num_classes: int
    num_anchors: int = 9
    channels: int = 256
    num_layers: int = 4
    prior: float = 0.01
    dtype: Any = jnp.float32

    def setup(self):
        self.convs = [
            nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=he_fan_out,
                    name=f"conv{i + 1}")
            for i in range(self.num_layers)
        ]
        self.output = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding=1,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=prior_bias_init(self.prior), name="output",
        )

    def extract_feature(self, x) -> jnp.ndarray:
        """Trunk features: conv4 output BEFORE its ReLU (model.py:157-170)."""
        for conv in self.convs[:-1]:
            x = nn.relu(conv(x))
        return self.convs[-1](x)

    def classify(self, feat, enable_act: bool = True) -> jnp.ndarray:
        """ReLU + output conv (+ sigmoid), (B,H,W,A*C) -> (B,H*W*A,C)."""
        out = self.output(nn.relu(feat)).astype(jnp.float32)
        if enable_act:
            out = nn.sigmoid(out)
        b, h, w, _ = out.shape
        return out.reshape(b, h * w * self.num_anchors, self.num_classes)

    def __call__(self, x, enable_act: bool = True) -> jnp.ndarray:
        return self.classify(self.extract_feature(x), enable_act)
