"""Fused space-to-depth stem: conv7x7/2 + frozen-BN + ReLU + maxpool3x3/2
as ONE Pallas kernel over a host 4x4-space-to-depth input.

The reference stem (/root/reference/retinanet/model.py:281-284: 7x7/2
conv, BN, ReLU, 3x3/2 max-pool) is the worst op in the network for the
MXU: cin=3 fills 3/128 contraction lanes, so XLA's conv emitter runs it
at ~5% MXU (4.8 ms of a 23 ms backbone per 16-image 640x1024 batch), and
the overlapping pool adds a ~20%-of-HBM-BW reduce_window. Measured fix
(v5e, B16 608x832 bf16): XLA direct conv+bias+relu+pool **6.71 ms** ->
this kernel **2.65 ms**.

How it works:

* The host ships the image 4x4 space-to-depth: ``x4[R,S,(al*4+be)*3+c] =
  X[4R+al, 4S+be, c]``, zero-padded 48->64 channels
  (data/transforms.space_to_depth(factor=4)). On the H/4 grid the 7x7/2
  conv becomes a **3x3 stride-1** conv producing the phase-packed output
  ``y4[I,J,(a*2+b)*64+o] = conv(2I+a, 2J+b, o)``: output row 2I+a reads
  input rows 4I+2a-3..4I+2a+3 = packed blocks I-1..I+1.
  ``pack_stem_kernel`` derives the (3,3,64,256) kernel from the stored
  (7,7,3,64) parameter: ``k3[T,U,(al,be,c),(a,b,o)] =
  k7[4(T-1)+al+3-2a, 4(U-1)+be+3-2b, c, o]`` (zero outside the support).
* Inside the kernel the 9 taps concatenate along lanes into an im2col
  tile (K = 9*64 = 576), so the conv is one MXU matmul per band instead
  of a lane-starved conv; bias (the folded frozen-BN affine) and ReLU
  apply on the f32 accumulator tile.
* The 3x3/2 pool never touches HBM: on the phase-packed y4 tile it is a
  shift-only max over channel blocks (same factoring as
  ops.pool.phase_pool), emitted per band with a 1-row halo.

Autodiff: ``stem_fused`` is a custom-VJP op — Pallas forward on TPU, and
a backward through the pure-XLA reference (`stem_fused_reference`), whose
cin=64/cout=256 3x3 conv grads are themselves MXU-friendly (unlike the
direct 7x7 cin=3 grads).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .pool import phase_pool

NEG = float("-inf")


@functools.lru_cache(maxsize=1)
def _pack_tables():
    """Gather indices into the (3,4)-zero-padded 14x14 kernel:
    idx[T,U,al,be,a,b] -> (t+3, u+3) with t = 4(T-1)+al+3-2a (resp. u)."""
    T, U, al, be, a, b = np.meshgrid(
        np.arange(3), np.arange(3), np.arange(4), np.arange(4),
        np.arange(2), np.arange(2), indexing="ij")
    t_idx = 4 * (T - 1) + al + 3 - 2 * a + 3
    u_idx = 4 * (U - 1) + be + 3 - 2 * b + 3
    return t_idx, u_idx


def pack_stem_kernel(k7: jnp.ndarray) -> jnp.ndarray:
    """(7,7,3,64) -> (3,3,64,256) phase-packed conv kernel (differentiable:
    pad + gather + transpose, so d(loss)/d(k7) flows through)."""
    wp = jnp.pad(k7, ((3, 4), (3, 4), (0, 0), (0, 0)))
    t_idx, u_idx = _pack_tables()
    g = wp[t_idx, u_idx]                       # (T,U,al,be,a,b,3,64)
    g = g.transpose(0, 1, 2, 3, 6, 4, 5, 7)    # (T,U,al,be,c,a,b,o)
    k3 = g.reshape(3, 3, 48, 256)
    return jnp.pad(k3, ((0, 0), (0, 0), (0, 16), (0, 0)))


def stem_fused_reference(x4: jnp.ndarray, k3: jnp.ndarray,
                         bias4: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA oracle (and the backward graph): 3x3/1 conv on the packed
    grid + bias + ReLU + phase pool. Bit-equal to the kernel up to bf16
    accumulation-order rounding."""
    y4 = jax.lax.conv_general_dilated(
        x4, k3.astype(x4.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y4 = jnp.maximum(y4 + bias4.astype(y4.dtype), 0)
    return phase_pool(y4)


def _shift_cols(t, d, fill):
    if d == 0:
        return t
    f = jnp.full_like(t[:, :, :1], fill)
    if d == 1:   # position J holds col J-1
        return jnp.concatenate([f, t[:, :, :-1]], axis=2)
    return jnp.concatenate([t[:, :, 1:], f], axis=2)


def _fused_kernel(top_ref, x_ref, bot_ref, w_ref, b_ref, o_ref, *, band):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    # halo rows beyond the image are the conv's zero padding
    top = jnp.where(i == 0, jnp.zeros_like(top_ref[:]), top_ref[:])
    bot = jnp.where(i == n_i - 1, jnp.zeros_like(bot_ref[:]), bot_ref[:])
    rows = jnp.concatenate([top, x_ref[:], bot], axis=1)  # (BB, band+3, W4, 64)

    taps = []
    for T in range(3):
        sl = rows[:, T:T + band + 1]
        for U in range(3):
            taps.append(_shift_cols(sl, 1 - U, 0.0))
    X = jnp.concatenate(taps, axis=-1)                    # (BB, band+1, W4, 576)
    BB, P1, W4, K = X.shape
    Y = jax.lax.dot_general(
        X.reshape(BB * P1 * W4, K), w_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y4 = (Y.reshape(BB, P1, W4, 256).astype(o_ref.dtype)
          + b_ref[0].astype(o_ref.dtype))
    y4 = jnp.maximum(y4, 0)
    # tile row 0 is y4[band*i - 1], the pool's up-row halo; for the first
    # band it is the fictional row -1 -> -inf (outside the pool window)
    row_ix = jax.lax.broadcasted_iota(jnp.int32, y4.shape, 1)
    y4 = jnp.where((i == 0) & (row_ix == 0), NEG, y4)

    up, cur = y4[:, :-1], y4[:, 1:]                       # (BB, band, W4, 256)
    cur_l = _shift_cols(cur, 1, NEG)
    up_l = _shift_cols(up, 1, NEG)
    blk = lambda t, k: t[..., 64 * k:64 * (k + 1)]
    # pool (i,j) = max over conv rows {2i-1,2i,2i+1} x cols {2j-1,2j,2j+1};
    # row 2i-1 lives in up's a=1 blocks, rows 2i/2i+1 in cur's a=0/1
    m = jnp.maximum(jnp.maximum(blk(up_l, 3), blk(up, 2)), blk(up, 3))
    m = jnp.maximum(m, jnp.maximum(jnp.maximum(blk(cur_l, 1), blk(cur, 0)),
                                   blk(cur, 1)))
    m = jnp.maximum(m, jnp.maximum(jnp.maximum(blk(cur_l, 3), blk(cur, 2)),
                                   blk(cur, 3)))
    o_ref[:] = m


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def _stem_fused_pallas(x4, wm, bias4, band: int = 8, interpret: bool = False):
    """grid (B, H4/band); block sizes chosen so the im2col tile
    ((band+1) x W4 x 576 bf16) + f32 accumulator fit VMEM — band 8 at
    W4<=256 measured fastest (larger bands overflow VMEM)."""
    B, H4, W4, C = x4.shape
    assert C == 64 and H4 % band == 0 and band % 2 == 0, (x4.shape, band)
    grid = (B, H4 // band)
    kern = functools.partial(_fused_kernel, band=band)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            # top halo rows band*i-2 .. band*i-1 (block-index clamped at
            # the image edge; masked to conv-zero in the kernel)
            pl.BlockSpec((1, 2, W4, 64),
                         lambda bi, i: (bi, jnp.maximum(i * (band // 2) - 1, 0),
                                        0, 0)),
            pl.BlockSpec((1, band, W4, 64), lambda bi, i: (bi, i, 0, 0)),
            # bottom halo row band*(i+1) (clamped; masked in-kernel)
            pl.BlockSpec((1, 1, W4, 64),
                         lambda bi, i: (bi, jnp.minimum((i + 1) * band, H4 - 1),
                                        0, 0)),
            pl.BlockSpec((576, 256), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, 256), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, band, W4, 64), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H4, W4, 64), x4.dtype),
        interpret=interpret,
    )(x4, x4, x4, wm, bias4)


def _dispatch(x4, k3, bias4):
    if jax.default_backend() == "tpu" and x4.shape[1] % 8 == 0:
        return _stem_fused_pallas(x4, k3.reshape(576, 256).astype(x4.dtype),
                                  bias4.reshape(1, 256).astype(jnp.float32))
    return stem_fused_reference(x4, k3, bias4)


@jax.custom_vjp
def stem_fused(x4: jnp.ndarray, k3: jnp.ndarray,
               bias4: jnp.ndarray) -> jnp.ndarray:
    """Fused stem on a (B, H/4, W/4, 64) space-to-depth batch -> pooled
    (B, H/4, W/4, 64). Pallas kernel on TPU (canonical %32 frames give
    H4 % 8 == 0), pure-XLA reference elsewhere; backward always through
    the reference graph (recompute — the kernel saves no residuals)."""
    return _dispatch(x4, k3, bias4)


def _stem_fwd(x4, k3, bias4):
    return _dispatch(x4, k3, bias4), (x4, k3, bias4)


def _stem_bwd(res, g):
    x4, k3, bias4 = res
    _, vjp = jax.vjp(stem_fused_reference, x4, k3, bias4)
    return vjp(g)


stem_fused.defvjp(_stem_fwd, _stem_bwd)
