"""Feature Pyramid Network P3-P7.

Matches the reference ``PyramidFeatures``
(/root/reference/retinanet/model.py:45-91): 1x1 laterals on C3-C5, nearest
2x top-down adds, 3x3 smoothing convs, P6 = 3x3/2 conv on C5,
P7 = ReLU + 3x3/2 conv on P6.
"""
from __future__ import annotations

from functools import partial
from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .resnet import he_fan_out


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x nearest upsample (torch nn.Upsample(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5) -> List[jnp.ndarray]:
        conv = partial(nn.Conv, self.channels, dtype=self.dtype,
                       param_dtype=jnp.float32, kernel_init=he_fan_out)

        p5 = conv((1, 1), name="p5_lateral")(c5)
        p5_up = upsample2x_nearest(p5)
        p5 = conv((3, 3), padding=1, name="p5_smooth")(p5)

        p4 = conv((1, 1), name="p4_lateral")(c4) + p5_up
        p4_up = upsample2x_nearest(p4)
        p4 = conv((3, 3), padding=1, name="p4_smooth")(p4)

        p3 = conv((1, 1), name="p3_lateral")(c3) + p4_up
        p3 = conv((3, 3), padding=1, name="p3_smooth")(p3)

        p6 = conv((3, 3), strides=(2, 2), padding=1, name="p6")(c5)
        p7 = conv((3, 3), strides=(2, 2), padding=1, name="p7")(nn.relu(p6))

        return [p3, p4, p5, p6, p7]
