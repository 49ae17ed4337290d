"""Stem max-pool helpers (XLA forms).

``phase_pool`` is the shift-only factored 3x3/2 pool over the
phase-packed stem-conv layout — consumed by the s2d stem
(models/resnet.py) and as the epilogue of the fused Pallas stem
(ops/stem_pallas.py). Reference semantics: torch
``MaxPool2d(3, stride=2, padding=1)`` (/root/reference/retinanet/model.py:284).

Historical note: r1/r2 also carried bit-exact Pallas *pool* kernels
(ops/pool_pallas.py, removed in r3 — see git history). They measured
strictly slower than XLA's fused reduce_window on this runtime (~30 µs
fixed cost per grid program floors a bandwidth-bound many-program kernel
at ~4.8 ms vs XLA's ~2 ms; README "Measured stem dead ends"), so the
maintained surface keeps only the winning forms.
"""
from __future__ import annotations

import jax.numpy as jnp


def phase_pool(y4: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 pad-1 max-pool over a phase-packed conv output.

    ``y4[..., (a*2+b)*64+o]`` = conv pixel (2i+a, 2j+b, o); pool output
    (i, j) needs conv rows {2i-1, 2i, 2i+1} x cols {2j-1, 2j, 2j+1}.
    The window is separable, so this factors into a row stage then a col
    stage — 4 elementwise maxes + 2 whole shifts, all contiguous:

      row:  ru[i] = max(A0[i], A1[i], A1[i-1])   (A = a-phase half)
      col:  m[j]  = max(RB0[j], RB1[j], RB1[j-1]) (B = b-phase half of ru)
    """
    neg = jnp.asarray(-jnp.inf, y4.dtype)
    a0 = y4[..., 0:128]          # conv row 2i,   both col phases
    a1 = y4[..., 128:256]        # conv row 2i+1
    a1_up = jnp.concatenate(
        [jnp.full_like(a1[:, :1], neg), a1[:, :-1]], axis=1)  # row 2i-1
    ru = jnp.maximum(jnp.maximum(a0, a1), a1_up)   # (B, H4, W4, 128)

    b0 = ru[..., 0:64]           # conv col 2j
    b1 = ru[..., 64:128]         # conv col 2j+1
    b1_left = jnp.concatenate(
        [jnp.full_like(b1[:, :, :1], neg), b1[:, :, :-1]], axis=2)
    return jnp.maximum(jnp.maximum(b0, b1), b1_left)
