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

from ..ops.pool import phase_pool  # shift-only s2d stem pool

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


class StemConv(nn.Module):
    """The 7x7/2 stem conv; accepts plain RGB or space-to-depth input.

    The parameter keeps the reference layout (7, 7, 3, 64) under
    ``conv1/kernel`` (torchvision import / expansion untouched). Two
    input forms:

    * ``(B, H, W, 3)``  — the classic direct conv (model.py:281).
    * ``(B, H/2, W/2, 12)`` — host space-to-depth input (see
      data/transforms.space_to_depth): computes the conv **phase-packed**
      as one 5x5/2 conv with a (5,5,12,256) kernel derived from the same
      parameter — output channel (a*2+b)*64+o holds conv-output pixel
      (2i+a, 2j+b, o). The stride-2 cin=3 conv maps terribly onto the
      MXU; this form trades it for one MXU-friendlier conv and makes the
      following 3x3/2 max-pool a shift-only max over channel blocks
      (``phase_pool``), with no strided memory access anywhere.
    * ``(B, H/4, W/4, 64)`` — host 4x4 space-to-depth input
      (transforms.space_to_depth(factor=4), DataConfig.fused_stem): the
      whole stem (conv + folded BN + ReLU + 3x3/2 max-pool) runs as ONE
      fused Pallas im2col-matmul kernel (ops/stem_pallas.py; measured
      2.65 vs 6.71 ms XLA per B16 608x832 batch) and returns the POOLED
      (B, H/4, W/4, 64) tensor directly. Requires the BN fold
      (bn_scale/bn_bias).

    Derivation: y[r] = sum_t X[r+t-2, alpha] w'[2t+alpha] on the H/2 grid
    (w' = k7 zero-padded to 8 taps); phase-packing y4[i,(a,..)] = y[2i+a]
    gives K5[T,U,(alpha,beta,c),(a,b,o)] = w'[2(T-a)+alpha, 2(U-b)+beta,
    c, o], a stride-2 5-tap conv with padding (2,1). Bit-equal to the
    direct form up to dtype rounding (tests/test_model.py).
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bn_scale=None, bn_bias=None):
        import jax.lax as lax

        kernel = self.param("kernel", he_fan_out, (7, 7, 3, 64), jnp.float32)
        dn = ("NHWC", "HWIO", "NHWC")
        if x.shape[-1] == 3:
            assert bn_scale is None
            return lax.conv_general_dilated(
                x, kernel.astype(self.dtype), (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=dn)
        if x.shape[-1] == 64:
            # fused stem: conv + BN + ReLU + pool in one kernel; returns
            # the pooled tensor (the caller skips relu/pool)
            from ..ops.stem_pallas import pack_stem_kernel, stem_fused

            assert bn_scale is not None and bn_bias is not None
            k3 = pack_stem_kernel(
                (kernel * bn_scale.astype(kernel.dtype)).astype(self.dtype))
            return stem_fused(x, k3, jnp.tile(bn_bias, 4))
        assert x.shape[-1] == 12, x.shape
        k = kernel
        if bn_scale is not None:
            # fold the frozen-BN affine into the conv: bn(conv(x, k)) ==
            # conv(x, k*scale) + bias (exact — BN stats are constant;
            # scale/bias stay differentiable wrt the BN parameters)
            k = k * bn_scale.astype(k.dtype)
        k = k.astype(self.dtype)
        # W4[t,u,(alpha,beta,c),o] = w'[2t+alpha, 2u+beta, c, o]
        kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w4 = kp.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
        w4 = w4.reshape(4, 4, 12, 64)
        # K5 block (a,b) = W4 placed at offset (a,b) in the 5x5 grid
        k5 = jnp.stack(
            [jnp.pad(w4, ((a, 1 - a), (b, 1 - b), (0, 0), (0, 0)))
             for a in range(2) for b in range(2)],
            axis=3,
        ).reshape(5, 5, 12, 256)
        y4 = lax.conv_general_dilated(
            x, k5, (2, 2), [(2, 1), (2, 1)], dimension_numbers=dn)
        if bn_bias is not None:
            y4 = y4 + jnp.tile(bn_bias, 4).astype(y4.dtype)
        return y4


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


def _stem_pool(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 pad-1 max-pool after the stem conv (reference model.py:284).

    Plain XLA reduce_window: bit-exact Pallas pool kernels were built and
    benched in r1/r2 but measured strictly slower on this runtime (README
    "Measured stem dead ends"; removed in r3 — git history has them)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def _device_normalize(x, mean, std, dtype):
    """On-device (x/255 - mean)/std for uint8 input batches
    (DataConfig.transfer_dtype="uint8": ships 4x less infeed than
    host-normalized float32). Handles both the RGB layout and the
    space-to-depth layout (channels (row-phase, col-phase, c) — stats
    tile 4x). Float inputs pass through untouched (already normalized on
    host, transforms.normalize_image)."""
    if x.dtype != jnp.uint8:
        return x.astype(dtype)
    c = x.shape[-1]
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    if c == 12:
        mean, std = jnp.tile(mean, 4), jnp.tile(std, 4)
    elif c == 64:
        # 4x4 s2d layout: 48 real channels (al,be,c) + 16 zero pad. The
        # pad channels normalize to a nonzero constant, which is harmless
        # — the packed stem kernel's rows for them are zero.
        mean = jnp.concatenate([jnp.tile(mean, 16), jnp.zeros(16)])
        std = jnp.concatenate([jnp.tile(std, 16), jnp.ones(16)])
    out = (x.astype(jnp.float32) / 255.0 - mean) / std
    return out.astype(dtype)


class ResNetBackbone(nn.Module):
    """Stem + 4 stages; returns (C3, C4, C5)."""
    depth: int = 50
    dtype: Any = jnp.float32
    remat: bool = False   # rematerialize residual blocks (trade FLOPs for HBM)
    input_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    input_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        kind, layers = DEPTH_LAYERS[self.depth]
        block = BasicBlock if kind == "basic" else Bottleneck
        if self.remat:
            block = nn.remat(block)

        x = _device_normalize(x, self.input_mean, self.input_std, self.dtype)
        if x.shape[-1] == 64:
            # fused 4x4-s2d stem (conv+BN+ReLU+pool in one Pallas kernel,
            # ops/stem_pallas.py); BN probed as in the 12-channel branch
            bn = FrozenBN(jnp.float32, name="bn1")
            bn_bias = bn(jnp.zeros((1, 1, 1, 64)))[0, 0, 0]
            bn_scale = bn(jnp.ones((1, 1, 1, 64)))[0, 0, 0] - bn_bias
            x = StemConv(self.dtype, name="conv1")(
                x, bn_scale=bn_scale, bn_bias=bn_bias)
        elif x.shape[-1] == 12:
            # space-to-depth stem: BN folded into the phase-packed conv
            # (so XLA fuses conv+bias+relu in one pass) -> factored
            # shift-only max-pool. The frozen BN is an affine per channel;
            # probing the SAME bn1 module on 0s and 1s extracts
            # (scale, bias) exactly and differentiably without touching
            # flax param internals.
            bn = FrozenBN(jnp.float32, name="bn1")
            bn_bias = bn(jnp.zeros((1, 1, 1, 64)))[0, 0, 0]
            bn_scale = bn(jnp.ones((1, 1, 1, 64)))[0, 0, 0] - bn_bias
            y4 = StemConv(self.dtype, name="conv1")(
                x, bn_scale=bn_scale, bn_bias=bn_bias)
            y4 = nn.relu(y4)
            x = phase_pool(y4)
        else:
            x = StemConv(self.dtype, name="conv1")(x)
            x = nn.relu(FrozenBN(self.dtype, name="bn1")(x))
            x = _stem_pool(x)

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
