"""Anchor generation — precomputed per static image shape.

Numerically equivalent to the reference's pyramid anchors
(/root/reference/retinanet/anchors.py:6-129): levels 3-7, stride 2^l, base
size 2^(l+2), 3 ratios {0.5, 1, 2} x 3 scales {1, 2^1/3, 2^2/3} = 9 anchors
per cell, laid out level-major, cell-row-major, with the 9 per-cell anchors
ratio-major/scale-minor. Feature-map sizes use ceil(image/2^l).

The reference regenerates this in numpy on EVERY forward pass
(anchors.py:21-40); here shapes are static so the grid is computed once per
canonical shape and cached as a device-constant.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np

RATIOS = (0.5, 1.0, 2.0)
SCALES = (2.0 ** 0.0, 2.0 ** (1.0 / 3.0), 2.0 ** (2.0 / 3.0))


def generate_base_anchors(
    base_size: float,
    ratios: Sequence[float] = RATIOS,
    scales: Sequence[float] = SCALES,
) -> np.ndarray:
    """(len(ratios)*len(scales), 4) xyxy anchors centered at the origin.

    Same parameterization as the reference (anchors.py:42-73): each anchor
    has area (base_size*scale)^2 distributed by aspect ratio h/w.
    """
    ratios = np.asarray(ratios, np.float64)
    scales = np.asarray(scales, np.float64)
    n = len(ratios) * len(scales)
    side = base_size * np.tile(scales, len(ratios))          # (n,)
    areas = side * side
    r = np.repeat(ratios, len(scales))
    w = np.sqrt(areas / r)
    h = w * r
    out = np.stack([-w / 2, -h / 2, w / 2, h / 2], axis=1)
    return out.astype(np.float32).reshape(n, 4)


def feature_shapes(
    height: int, width: int, pyramid_levels: Sequence[int] = (3, 4, 5, 6, 7)
) -> Tuple[Tuple[int, int], ...]:
    """Per-level (H, W): ceil division, as the reference (anchors.py:25)."""
    return tuple(
        ((height + 2**l - 1) // 2**l, (width + 2**l - 1) // 2**l)
        for l in pyramid_levels
    )


@functools.lru_cache(maxsize=16)
def anchors_for_shape(
    height: int,
    width: int,
    pyramid_levels: Tuple[int, ...] = (3, 4, 5, 6, 7),
) -> np.ndarray:
    """All anchors for a canonical image shape: (sum_l Hl*Wl*9, 4) xyxy f32.

    Cell centers are at ((i + 0.5) * stride) (anchors.py:109-117).
    """
    chunks = []
    for (fh, fw), level in zip(feature_shapes(height, width, pyramid_levels), pyramid_levels):
        stride = 2**level
        base = generate_base_anchors(2.0 ** (level + 2))
        sx = (np.arange(fw, dtype=np.float32) + 0.5) * stride
        sy = (np.arange(fh, dtype=np.float32) + 0.5) * stride
        cx, cy = np.meshgrid(sx, sy)                         # (fh, fw)
        shifts = np.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
        chunks.append((shifts + base[None]).reshape(-1, 4))
    return np.concatenate(chunks, axis=0).astype(np.float32)


def num_anchors_for_shape(
    height: int, width: int, pyramid_levels: Tuple[int, ...] = (3, 4, 5, 6, 7)
) -> int:
    return sum(fh * fw * 9 for fh, fw in feature_shapes(height, width, pyramid_levels))


def as_anchor_provider(anchors):
    """Normalize an ``anchors`` argument to a per-batch provider.

    IL tool passes (MAS, prototypes, similarity, BiC, A-GEM) iterate
    orientation-bucketed loaders; landscape and portrait frames have the
    SAME anchor count but different grids, so a single anchors array
    silently mis-matches every portrait batch. Helpers accept either a
    constant array (single-shape loaders, tests) or a callable
    ``images -> anchors`` (``ILTrainer.anchors_for``) and resolve it per
    batch; their jitted steps take anchors as a traced argument so each
    distinct shape compiles once.
    """
    if callable(anchors):
        return anchors
    import jax.numpy as jnp

    arr = jnp.asarray(anchors)   # hoist the host->device transfer once
    return lambda images: arr
