"""ResNet-50 backbone with frozen BatchNorm, NHWC, bf16-friendly.

Parity targets: training/detr_backbone.py:29-114 (FrozenBatchNorm2d,
Backbone over torchvision resnet50, layer4 output, conv1+layer1 frozen)
— rebuilt as a flax module in channels-last layout so every conv maps
directly onto the TPU MXU.

Freezing model: FrozenBatchNorm statistics/affines are wrapped in
``stop_gradient`` inside the module (they can never train), and the
conv1/layer1 weights are excluded from the optimizer via the param-path
mask in ``training/optimizers.py`` (reference: detr_backbone.py:72-74
sets requires_grad=False on everything but layer2-4).

Pretrained SwAV / UP-DETR weights load through
``layoutdetr_tpu.utils.torch_convert`` instead of a construction-time
URL download (reference quirk: detr_backbone.py:110 downloads inside
``__init__``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


class FrozenBatchNorm(nn.Module):
    """Affine-only BN with fixed statistics (detr_backbone.py:29-65).

    y = (x - mean) * weight / sqrt(var + eps) + bias, all constants.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("running_var", nn.initializers.ones, (self.features,), jnp.float32)
        weight, bias, mean, var = jax.tree.map(lax.stop_gradient, (weight, bias, mean, var))
        scale = weight * lax.rsqrt(var + self.eps)
        shift = bias - mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class Conv(nn.Module):
    """Bias-free conv (torchvision resnet convs carry no bias), HWIO weights."""

    features: int
    kernel: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.kernel, self.kernel, x.shape[-1], self.features),
            jnp.float32,
        )
        pad = self.kernel // 2
        precision = lax.Precision.HIGHEST if self.dtype == jnp.float32 else None
        return lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 with expansion 4 (torchvision Bottleneck semantics)."""

    features: int  # bottleneck width; output = 4 * features
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = Conv(self.features, 1, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.features, name="bn1")(out)
        out = nn.relu(out)
        out = Conv(self.features, 3, stride=self.stride, dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.features, name="bn2")(out)
        out = nn.relu(out)
        out = Conv(self.features * 4, 1, dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.features * 4, name="bn3")(out)
        if self.downsample:
            identity = Conv(self.features * 4, 1, stride=self.stride, dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.features * 4, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    """torchvision-resnet50-shaped backbone returning layer4 ([B, H/32, W/32, 2048])."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(64, 7, stride=2, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(kernel=3, stride=2, padding=1); -inf pad keeps edges exact.
        x = lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
        )
        widths = (64, 128, 256, 512)
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, widths), start=1):
            for block in range(blocks):
                stride = 2 if (block == 0 and stage > 1) else 1
                x = Bottleneck(
                    width,
                    stride=stride,
                    downsample=(block == 0),
                    dtype=self.dtype,
                    name=f"layer{stage}_{block}",
                )(x)
        return x


FROZEN_PREFIXES = ("conv1", "bn1", "layer1_")
"""Param-name prefixes of backbone parts the reference never trains
(detr_backbone.py:72-74); consumed by the optimizer mask."""
