"""The full RetinaNet: backbone + FPN + heads, with all forward variants.

Mirrors the reference ``ResNet`` composite model's API surface
(/root/reference/retinanet/model.py:273-615) as a flax module:

  * ``__call__(images, enable_act)``          -> (cls (B,A,C), reg (B,A,4))
    (the reference's ``forward``, model.py:450-491; anchors are NOT
    recomputed per step — they're static per canonical shape, see
    ops/anchors.py)
  * ``forward_features``                      -> [P3..P7]
    (reference ``forward_feature``, model.py:389-400)
  * ``forward_all``                           -> (cls, reg, feats)
  * ``classification_features``               -> (cls, reg, feats,
    unfolded 3x3 trunk features) (reference ``forward_prototype`` /
    ``get_classification_feature``, model.py:402-447)

Heads are shared across the 5 pyramid levels (same submodule applied per
level), and per-level outputs concatenate along the anchor axis in P3..P7
order, matching the anchor grid layout of ops/anchors.py.
"""
from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import ModelConfig
from .fpn import FPN
from .heads import ClassificationHead, RegressionHead
from .resnet import ResNetBackbone


def unfold3x3(x: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.Unfold(kernel=3, padding=1) equivalent for NHWC input.

    (B, H, W, C) -> (B, H*W, C*9), channel-major patch order (c*9 + p),
    matching torch's (B, C*k*k, L) layout transposed.
    """
    b, h, w, c = x.shape
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = [
        p[:, dy : dy + h, dx : dx + w, :]
        for dy in range(3)
        for dx in range(3)
    ]
    # stack -> (B, H, W, 9, C); want channel-major (C, 9)
    stacked = jnp.stack(patches, axis=3)
    out = jnp.transpose(stacked, (0, 1, 2, 4, 3)).reshape(b, h * w, c * 9)
    return out


class RetinaNet(nn.Module):
    depth: int = 50
    num_classes: int = 20
    fpn_channels: int = 256
    num_anchors: int = 9
    prior: float = 0.01
    head_layers: int = 4
    dtype: Any = jnp.float32

    remat: bool = False
    input_mean: tuple = (0.485, 0.456, 0.406)
    input_std: tuple = (0.229, 0.224, 0.225)

    def setup(self):
        self.backbone = ResNetBackbone(self.depth, self.dtype, self.remat,
                                       input_mean=self.input_mean,
                                       input_std=self.input_std,
                                       name="backbone")
        self.fpn = FPN(self.fpn_channels, self.dtype, name="fpn")
        self.regression_head = RegressionHead(
            self.num_anchors, self.fpn_channels, self.head_layers, self.dtype,
            name="regression_head",
        )
        self.classification_head = ClassificationHead(
            self.num_classes, self.num_anchors, self.fpn_channels,
            self.head_layers, self.prior, self.dtype,
            name="classification_head",
        )

    # ------------------------------------------------------------------
    def _features(self, images) -> List[jnp.ndarray]:
        c3, c4, c5 = self.backbone(images)
        return self.fpn(c3, c4, c5)

    def forward_features(self, images) -> List[jnp.ndarray]:
        return self._features(images)

    def _heads(self, feats, enable_act: bool):
        reg = jnp.concatenate([self.regression_head(f) for f in feats], axis=1)
        cls = jnp.concatenate(
            [self.classification_head(f, enable_act) for f in feats], axis=1
        )
        return cls, reg

    def __call__(self, images, enable_act: bool = True):
        return self._heads(self._features(images), enable_act)

    def forward_all(self, images, enable_act: bool = True):
        feats = self._features(images)
        cls, reg = self._heads(feats, enable_act)
        return cls, reg, feats

    def classification_features(self, images, enable_act: bool = True):
        """Reference forward_prototype (model.py:422-447): also returns the
        3x3-unfolded classification-trunk features, (B, sum HW, C*9)."""
        feats = self._features(images)
        reg = jnp.concatenate([self.regression_head(f) for f in feats], axis=1)
        trunk = [self.classification_head.extract_feature(f) for f in feats]
        cls = jnp.concatenate(
            [self.classification_head.classify(t, enable_act) for t in trunk],
            axis=1,
        )
        unfolded = jnp.concatenate(
            [unfold3x3(t.astype(jnp.float32)) for t in trunk], axis=1
        )
        return cls, reg, feats, unfolded


def create_retinanet(cfg: ModelConfig, num_classes: int) -> RetinaNet:
    """Factory mirroring the reference ``create_retinanet(depth, n)``
    (model.py:617-637)."""
    if tuple(cfg.pyramid_levels) != (3, 4, 5, 6, 7):
        raise ValueError(
            "pyramid_levels is fixed to P3-P7 (the FPN, heads and anchor "
            "grids are built for 5 levels); got "
            f"{cfg.pyramid_levels}")
    if cfg.param_dtype != "float32":
        raise ValueError("params are kept float32 (optimizer precision); "
                         f"got param_dtype={cfg.param_dtype}")
    return RetinaNet(
        depth=cfg.depth,
        num_classes=num_classes,
        fpn_channels=cfg.fpn_channels,
        num_anchors=cfg.num_anchors,
        prior=cfg.prior,
        head_layers=cfg.head_layers,
        dtype=jnp.dtype(cfg.compute_dtype),
        remat=cfg.remat,
        input_mean=tuple(cfg.input_mean),
        input_std=tuple(cfg.input_std),
    )
