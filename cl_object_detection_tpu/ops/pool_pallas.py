"""Fused Pallas TPU kernel: 3x3/2 max-pool (the ResNet stem pool).

XLA lowers ``reduce_window`` for the overlapping 3x3 stride-2 window at
~20% of HBM bandwidth (4.1 ms standalone for (16,320,512,64) bf16 on
v5e). This kernel reaches near-BW by exploiting two layout facts:

* **Column parity = lane halves.** Viewing the input as
  ``(B, H, W/2, 2*C)`` (a free reshape for C=64: one 128-lane tile holds
  [col 2j | col 2j+1]), the column pool needs no stride-2 access — the
  even/odd planes are static half-tile lane slices, and "previous odd
  column" is a 1-sublane shift.
* **Row parity = untiled-dim slicing.** Rows are a non-tiled block dim,
  so ``rows[0::2]`` / ``rows[1::2]`` is pure addressing.

The 1-row top halo (pool row i reads conv rows 2i-1, 2i, 2i+1) comes in
as a second view of the same input with a single-row BlockSpec clamped at
the image edge; the first band masks it to -inf.

Reference semantics: torch ``MaxPool2d(3, stride=2, padding=1)``
(/root/reference/retinanet/model.py:284, stem) for even H, W.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG = float("-inf")


def _pool_kernel(halo_ref, x_ref, o_ref):
    # x_ref: (1, 2P, Wh, 2C) conv rows [2*i0 .. 2*i0+2P)
    # halo_ref: (1, 1, Wh, 2C) conv row max(2*i0-1, 0)
    # o_ref: (1, P, Wh, C)
    i = pl.program_id(1)
    x = x_ref[0]                      # (2P, Wh, 2C)
    # row-parity split via reshape (strided indexing on the untiled dim
    # lowers to an unsupported gather in Mosaic; this is pure addressing)
    p2, wh, c2 = x.shape
    xr = x.reshape(p2 // 2, 2, wh, c2)
    even = xr[:, 0]                   # conv rows 2r   -> (P, Wh, 2C)
    odd = xr[:, 1]                    # conv rows 2r+1 -> (P, Wh, 2C)
    halo = halo_ref[0]                # (1, Wh, 2C)
    halo = jnp.where(i == 0, jnp.full_like(halo, _NEG), halo)
    above = jnp.concatenate([halo, odd[:-1]], axis=0)   # conv rows 2r-1
    m1 = jnp.maximum(jnp.maximum(above, even), odd)     # (P, Wh, 2C)

    c = o_ref.shape[-1]
    # shift BEFORE the lane slice: Mosaic cannot concatenate a
    # lane-offset slice with an aligned filler ("offset mismatch on
    # non-concat dimension"); shifting the full-width tensor keeps
    # aligned layouts and the slice afterwards is a plain offset read
    m1_prev = jnp.concatenate(
        [jnp.full_like(m1[:, :1], _NEG), m1[:, :-1]], axis=1
    )
    ev = m1[:, :, :c]                 # col 2j
    od = m1[:, :, c:]                 # col 2j+1
    od_prev = m1_prev[:, :, c:]       # col 2j-1
    o_ref[0] = jnp.maximum(jnp.maximum(od_prev, ev), od)


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def max_pool_3x3_s2(
    x: jnp.ndarray, band: int = 16, interpret: bool = False
) -> jnp.ndarray:
    """3x3 stride-2 padding-1 max-pool over NHWC, H and W even.

    Matches ``nn.max_pool(x, (3,3), strides=(2,2), padding=((1,1),(1,1)))``
    bit-for-bit; used for the ResNet stem (H=W/2 grid, C=64).
    """
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    ph, pw = h // 2, w // 2
    while ph % band:
        band //= 2
    xv = x.reshape(b, h, pw, 2 * c)

    grid = (b, ph // band)
    out = pl.pallas_call(
        _pool_kernel,
        grid=grid,
        in_specs=[
            # top halo: conv row 2*i0-1, clamped to 0 for the first band
            # (block shape 1 in the row dim -> block index == row index)
            pl.BlockSpec(
                (1, 1, pw, 2 * c),
                lambda bi, i: (bi, jnp.maximum(2 * band * i - 1, 0), 0, 0),
            ),
            pl.BlockSpec(
                (1, 2 * band, pw, 2 * c), lambda bi, i: (bi, i, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, band, pw, c), lambda bi, i: (bi, i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, ph, pw, c), x.dtype),
        interpret=interpret,
    )(xv, xv)
    return out


def _xla_pool(x: jnp.ndarray) -> jnp.ndarray:
    init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x, init, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@jax.custom_vjp
def max_pool_3x3_s2_diff(x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable wrapper: Pallas kernel forward, XLA
    select-and-scatter backward (Pallas calls have no autodiff rule; the
    backward is the same op XLA emits for reduce_window's VJP)."""
    return max_pool_3x3_s2(x)


def _pool_fwd(x):
    return max_pool_3x3_s2(x), x


def _pool_bwd(x, g):
    _, vjp = jax.vjp(_xla_pool, x)
    return vjp(g)


max_pool_3x3_s2_diff.defvjp(_pool_fwd, _pool_bwd)


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


def _phase_pool_kernel(halo_ref, x_ref, o_ref):
    # x_ref: (1, P, W4, 256) phase-packed conv rows [i0, i0+P)
    # halo_ref: (1, 1, W4, 256) row i0-1 (for its a=1 blocks)
    # o_ref: (1, P, W4, 64)
    i = pl.program_id(1)
    x = x_ref[0]                       # (P, W4, 256)
    halo = halo_ref[0]                 # (1, W4, 256)
    halo = jnp.where(i == 0, jnp.full_like(halo, _NEG), halo)

    # all shifts happen on the full 256-lane tensors (concat of
    # lane-offset slices is unsupported in Mosaic); channel-block slices
    # come after and feed jnp.maximum directly
    x_up = jnp.concatenate([halo, x[:-1]], axis=0)          # row i-1
    neg_col = jnp.full_like(x[:, :1], _NEG)
    x_left = jnp.concatenate([neg_col, x[:, :-1]], axis=1)  # col j-1
    x_upleft = jnp.concatenate(
        [jnp.full_like(x_up[:, :1], _NEG), x_up[:, :-1]], axis=1)

    def blocks(t):
        return t[:, :, 0:64], t[:, :, 64:128], t[:, :, 128:192], t[:, :, 192:256]

    _, _, u10, u11 = blocks(x_up)
    _, _, _, ul11 = blocks(x_upleft)
    b00, b01, b10, b11 = blocks(x)
    _, l01, _, l11 = blocks(x_left)

    m = jnp.maximum(jnp.maximum(ul11, u10), u11)            # conv row 2i-1
    m = jnp.maximum(m, jnp.maximum(jnp.maximum(l01, b00), b01))   # row 2i
    m = jnp.maximum(m, jnp.maximum(jnp.maximum(l11, b10), b11))   # row 2i+1
    o_ref[0] = m


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def phase_max_pool(
    y4: jnp.ndarray, band: int = 16, interpret: bool = False
) -> jnp.ndarray:
    """3x3/2 pad-1 max-pool over a PHASE-PACKED stem-conv output.

    ``y4`` is (B, H/4, W/4, 256) with channel (a*2+b)*64+o = conv pixel
    (2i+a, 2j+b, o) (models.resnet.StemConv s2d path); returns
    (B, H/4, W/4, 64). All accesses are 64-aligned channel slices, whole
    row shifts (untiled dim) and 1-sublane col shifts — the XLA version
    (models.resnet.phase_pool) materializes the shifted copies and costs
    ~7 ms for (16,160,256,256) bf16 on v5e; this reads the input once.
    """
    b, h4, w4, c4 = y4.shape
    assert c4 == 256, y4.shape
    while h4 % band:
        band //= 2
    grid = (b, h4 // band)
    return pl.pallas_call(
        _phase_pool_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, w4, 256),
                lambda bi, i: (bi, jnp.maximum(band * i - 1, 0), 0, 0),
            ),
            pl.BlockSpec((1, band, w4, 256), lambda bi, i: (bi, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, band, w4, 64), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h4, w4, 64), y4.dtype),
        interpret=interpret,
    )(y4, y4)


@jax.custom_vjp
def phase_max_pool_diff(y4: jnp.ndarray) -> jnp.ndarray:
    """Differentiable wrapper: Pallas forward, XLA recompute backward."""
    return phase_max_pool(y4)


def _phase_fwd(y4):
    return phase_max_pool(y4), y4


def _phase_bwd(y4, g):
    _, vjp = jax.vjp(phase_pool, y4)
    return vjp(g)


phase_max_pool_diff.defvjp(_phase_fwd, _phase_bwd)
