"""Anchor generation: golden math + parity vs the reference implementation."""
import os
import sys

import numpy as np
import pytest

from cl_object_detection_tpu.ops.anchors import (
    anchors_for_shape,
    feature_shapes,
    generate_base_anchors,
    num_anchors_for_shape,
)


def test_base_anchor_golden():
    """Hand-computed: base_size 32, ratio 1, scale 1 -> 32x32 box at origin."""
    a = generate_base_anchors(32.0)
    assert a.shape == (9, 4)
    # ordering is ratio-major, scale-minor: index 3 = ratio 1.0, scale 2^0
    np.testing.assert_allclose(a[3], [-16, -16, 16, 16], atol=1e-4)
    # ratio 0.5 => h/w = 0.5, area = (32*scale)^2
    w = np.sqrt(32.0**2 / 0.5)
    np.testing.assert_allclose(a[0], [-w / 2, -w * 0.5 / 2, w / 2, w * 0.5 / 2], rtol=1e-5)
    # areas preserved per scale
    areas = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    scales = np.array([2 ** (i / 3) for i in [0, 1, 2]] * 3)
    np.testing.assert_allclose(areas, (32 * scales) ** 2, rtol=1e-5)


def test_feature_shapes_ceil():
    assert feature_shapes(640, 1024) == ((80, 128), (40, 64), (20, 32), (10, 16), (5, 8))
    assert feature_shapes(609, 1025)[0] == (77, 129)


def test_anchor_count():
    n = num_anchors_for_shape(640, 1024)
    assert n == (80 * 128 + 40 * 64 + 20 * 32 + 10 * 16 + 5 * 8) * 9
    assert anchors_for_shape(640, 1024).shape == (n, 4)


def test_first_cell_centers():
    a = anchors_for_shape(256, 256)
    # level 3, first cell center at (4, 4); anchor 3 is the square 32x32
    np.testing.assert_allclose(a[3], [4 - 16, 4 - 16, 4 + 16, 4 + 16], atol=1e-4)


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="reference absent")
def test_parity_with_reference_numpy():
    """Bit-parity with the reference's numpy anchors (anchors.py:42-129)."""
    sys.path.insert(0, "/root/reference")
    try:
        from retinanet.anchors import anchors_for_shape as ref_anchors
    except Exception as e:  # torch missing etc.
        pytest.skip(f"cannot import reference: {e}")
    finally:
        sys.path.pop(0)

    ref = ref_anchors(
        (320, 512),
        pyramid_levels=[3, 4, 5, 6, 7],
        ratios=np.array([0.5, 1, 2]),
        scales=np.array([2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0)]),
        strides=[2 ** x for x in [3, 4, 5, 6, 7]],
        sizes=[2 ** (x + 2) for x in [3, 4, 5, 6, 7]],
    )
    ours = anchors_for_shape(320, 512)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-3)
