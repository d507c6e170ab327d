"""StyleGAN2 component library, NHWC / TPU-native.

Parity target: training/networks_stylegan2.py — the subset the active
LayoutDETR graph uses (Decoder as the discriminator's background
reconstructor, networks_detr.py:261) plus the Encoder stack used by the
legacy layoutganpp variant (networks_layoutganpp.py:38-211) and the full
image Discriminator for completeness.

TPU-first design decisions:

- **Layout**: NHWC activations, HWIO weights — convs hit the MXU
  directly without layout transposes.
- **Modulated conv** (reference networks_stylegan2.py:30-87): the
  reference's "fused" path reshapes the batch into conv groups to give
  every sample its own kernel — a CUDA grouped-conv trick that shrinks
  the contraction the MXU sees. Here modulation always executes as
  ``scale inputs -> one shared-weight conv -> demodulate outputs``
  (mathematically identical to the reference's non-fused branch,
  networks_stylegan2.py:66-75), so the conv stays one large MXU op for
  the whole batch and XLA fuses the two elementwise scalings into it.
- ``fma``/gradfix equivalents are unnecessary (JAX autodiff).
- fp16-resolution machinery maps to a single ``dtype`` knob (bf16 on
  TPU rather than fp16; no channels_last juggling — NHWC already).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from layoutdetr_tpu.ops import (
    activation_funcs,
    bias_act,
    conv2d_resample,
    downsample2d,
    setup_filter,
    upsample2d,
)


def normalize_2nd_moment(x, axis=-1, eps=1e-8):
    """x * rsqrt(mean(x^2)) (networks_stylegan2.py:23-25)."""
    return x * jnp.reciprocal(jnp.sqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps))


class FullyConnectedLayer(nn.Module):
    """Equalized-LR linear (networks_stylegan2.py:92-126).

    weight ~ N(0,1)/lr_mult scaled at runtime by lr_mult/sqrt(in);
    bias starts at ``bias_init`` and is scaled by lr_mult.
    """

    features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0 / self.lr_multiplier),
            (in_features, self.features),
            jnp.float32,
        )
        weight_gain = self.lr_multiplier / math.sqrt(in_features)
        from layoutdetr_tpu.models.layers import dot_hp

        y = dot_hp(x.astype(self.dtype), (w * weight_gain).astype(self.dtype), self.dtype)
        b = None
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.constant(self.bias_init), (self.features,), jnp.float32
            )
            b = (b * self.lr_multiplier).astype(y.dtype)
        return bias_act(y, b, dim=-1, act=self.activation)


class Conv2dLayer(nn.Module):
    """Equalized-LR conv with optional up/down resampling
    (networks_stylegan2.py:131-184). x: [N, H, W, C]."""

    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, gain=1.0):
        in_channels = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, in_channels, self.out_channels), jnp.float32
        )
        weight_gain = 1.0 / math.sqrt(in_channels * k * k)
        f = setup_filter(np.asarray(self.resample_filter))
        x = conv2d_resample(
            x.astype(self.dtype),
            (w * weight_gain).astype(self.dtype),
            f=f, up=self.up, down=self.down, padding=k // 2,
            flip_weight=(self.up == 1),
        )
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32).astype(x.dtype)
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, dim=-1, act=self.activation, gain=act_gain, clamp=act_clamp)


def modulated_conv2d(x, weight, styles, noise=None, up=1, padding=0,
                     resample_filter=None, demodulate=True, flip_weight=True):
    """Style-modulated conv (networks_stylegan2.py:30-87), input-scaling form.

    x: [N, H, W, Ci]; weight: [kh, kw, Ci, Co]; styles: [N, Ci].
    Executes scale-in -> shared conv -> scale-out; identical math to the
    reference's per-sample-weight formulation, but the MXU sees one
    batched conv.
    """
    kh, kw, ci, co = weight.shape
    dcoefs = None
    if demodulate:
        # [N, Co] = rsqrt(sum_{k,k,i} (w * s_i)^2)
        w2 = jnp.square(weight.astype(jnp.float32)).sum(axis=(0, 1))  # [Ci, Co]
        sigma = jnp.einsum("ni,io->no", jnp.square(styles.astype(jnp.float32)), w2)
        dcoefs = jnp.reciprocal(jnp.sqrt(sigma + 1e-8))

    x = x * styles.astype(x.dtype)[:, None, None, :]
    x = conv2d_resample(
        x, weight.astype(x.dtype), f=resample_filter, up=up, padding=padding,
        flip_weight=flip_weight,
    )
    if demodulate and noise is not None:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :] + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x


class SynthesisLayer(nn.Module):
    """Modulated conv + noise + lrelu (networks_stylegan2.py:272-331)."""

    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w, noise_mode="random", gain=1.0):
        assert noise_mode in ("random", "const", "none")
        in_channels = x.shape[-1]
        styles = FullyConnectedLayer(in_channels, bias_init=1.0, name="affine")(w)
        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.kernel_size, self.kernel_size, in_channels, self.out_channels), jnp.float32,
        )
        noise = None
        if self.use_noise and noise_mode != "none":
            strength = self.param("noise_strength", nn.initializers.zeros, (), jnp.float32)
            if noise_mode == "random":
                rng = self.make_rng("noise")
                noise = jax.random.normal(rng, (x.shape[0], self.resolution, self.resolution, 1)) * strength
            else:
                const = self.param(
                    "noise_const", nn.initializers.normal(1.0),
                    (self.resolution, self.resolution), jnp.float32,
                )
                noise = (const * strength)[None, :, :, None]

        f = setup_filter(np.asarray(self.resample_filter))
        x = modulated_conv2d(
            x, weight, styles, noise=noise, up=self.up, padding=self.kernel_size // 2,
            resample_filter=f, flip_weight=(self.up == 1),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32).astype(x.dtype)
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, dim=-1, act=self.activation, gain=act_gain, clamp=act_clamp)


class ToRGBLayer(nn.Module):
    """1x1 modulated conv to image channels, no demod (networks_stylegan2.py:336-356)."""

    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w):
        in_channels = x.shape[-1]
        weight_gain = 1.0 / math.sqrt(in_channels * self.kernel_size ** 2)
        styles = FullyConnectedLayer(in_channels, bias_init=1.0, name="affine")(w) * weight_gain
        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.kernel_size, self.kernel_size, in_channels, self.out_channels), jnp.float32,
        )
        x = modulated_conv2d(x, weight, styles, demodulate=False)
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32).astype(x.dtype)
        return bias_act(x, b, dim=-1, clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """One resolution level of the synthesis net (networks_stylegan2.py:361-457).

    'skip' architecture (the only one the LayoutDETR decoder uses).
    """

    in_channels: int  # 0 = first (const) block
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = 256.0
    use_noise: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def num_conv(self):
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self):
        return 1 if (self.is_last or self.architecture == "skip") else 0

    @nn.compact
    def __call__(self, x, img, ws, noise_mode="random"):
        """ws: [B, num_conv+num_torgb, w_dim]."""
        w_idx = 0
        common = dict(w_dim=self.w_dim, resolution=self.resolution, conv_clamp=self.conv_clamp,
                      use_noise=self.use_noise, dtype=self.dtype)
        if self.in_channels == 0:
            const = self.param(
                "const", nn.initializers.normal(1.0),
                (self.resolution, self.resolution, self.out_channels), jnp.float32,
            )
            x = jnp.broadcast_to(const[None], (ws.shape[0],) + const.shape).astype(self.dtype)
            x = SynthesisLayer(self.out_channels, name="conv1", **common)(x, ws[:, w_idx], noise_mode)
            w_idx += 1
        elif self.architecture == "resnet":
            y = Conv2dLayer(self.out_channels, 1, use_bias=False, up=2,
                            resample_filter=self.resample_filter, dtype=self.dtype, name="skip")(
                x, gain=math.sqrt(0.5))
            x = SynthesisLayer(self.out_channels, up=2, resample_filter=self.resample_filter,
                               name="conv0", **common)(x, ws[:, w_idx], noise_mode)
            w_idx += 1
            x = SynthesisLayer(self.out_channels, name="conv1", **common)(
                x, ws[:, w_idx], noise_mode, gain=math.sqrt(0.5))
            w_idx += 1
            x = y + x
        else:
            x = SynthesisLayer(self.out_channels, up=2, resample_filter=self.resample_filter,
                               name="conv0", **common)(x, ws[:, w_idx], noise_mode)
            w_idx += 1
            x = SynthesisLayer(self.out_channels, name="conv1", **common)(x, ws[:, w_idx], noise_mode)
            w_idx += 1

        if img is not None:
            img = upsample2d(img, setup_filter(np.asarray(self.resample_filter)))
        if self.is_last or self.architecture == "skip":
            y = ToRGBLayer(self.img_channels, self.w_dim, conv_clamp=self.conv_clamp,
                           dtype=self.dtype, name="torgb")(x, ws[:, w_idx])
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


class SynthesisNetwork(nn.Module):
    """Progressive synthesis stack (networks_stylegan2.py:465-520)."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = 256.0
    use_noise: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def block_resolutions(self):
        return [2 ** i for i in range(2, int(math.log2(self.img_resolution)) + 1)]

    @property
    def num_ws(self):
        n = 0
        for res in self.block_resolutions:
            n += 1 if res == 4 else 2
            if res == self.img_resolution:
                n += 1
        return n

    @nn.compact
    def __call__(self, ws, noise_mode="random"):
        channels = {res: min(self.channel_base // res, self.channel_max) for res in self.block_resolutions}
        x = img = None
        w_idx = 0
        for res in self.block_resolutions:
            in_ch = 0 if res == 4 else channels[res // 2]
            block = SynthesisBlock(
                in_ch, channels[res], w_dim=self.w_dim, resolution=res,
                img_channels=self.img_channels, is_last=(res == self.img_resolution),
                conv_clamp=self.conv_clamp, use_noise=self.use_noise, dtype=self.dtype,
                name=f"b{res}",
            )
            take = block.num_conv + block.num_torgb
            x, img = block(x, img, ws[:, w_idx:w_idx + take], noise_mode)
            w_idx += block.num_conv  # torgb reuses the next block's first w (reference :505-508)
        return img


class DecoderMappingNetwork(nn.Module):
    """z -> broadcast ws, no 2nd-moment normalize (networks_stylegan2.py:903-967)."""

    z_dim: int
    w_dim: int
    num_ws: int
    num_layers: int = 8
    lr_multiplier: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        x = z.astype(jnp.float32)
        for i in range(self.num_layers):
            features = self.w_dim
            x = FullyConnectedLayer(
                features, activation="lrelu", lr_multiplier=self.lr_multiplier,
                dtype=self.dtype, name=f"fc{i}",
            )(x)
        return jnp.repeat(x[:, None, :], self.num_ws, axis=1)


class MappingNetwork(nn.Module):
    """StyleGAN2 mapping with optional label embed (networks_stylegan2.py:189-267)."""

    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 8
    lr_multiplier: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, c=None):
        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            y = normalize_2nd_moment(FullyConnectedLayer(self.w_dim, name="embed")(c.astype(jnp.float32)))
            x = jnp.concatenate([x, y], axis=-1) if x is not None else y
        for i in range(self.num_layers):
            x = FullyConnectedLayer(
                self.w_dim, activation="lrelu", lr_multiplier=self.lr_multiplier,
                dtype=self.dtype, name=f"fc{i}",
            )(x)
        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)
        return x


class Decoder(nn.Module):
    """Latent -> image decoder; the D's background reconstructor
    (networks_stylegan2.py:971-994; instantiated networks_detr.py:261 with
    z_dim=256, w_dim=512, channel_base=8192, channel_max=512,
    img_resolution=background_size, use_noise=False, conv_clamp=None)."""

    z_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    use_noise: bool = False
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, noise_mode="random"):
        synth = SynthesisNetwork(
            w_dim=self.w_dim, img_resolution=self.img_resolution, img_channels=self.img_channels,
            channel_base=self.channel_base, channel_max=self.channel_max,
            conv_clamp=self.conv_clamp, use_noise=self.use_noise, dtype=self.dtype,
            name="synthesis",
        )
        ws = DecoderMappingNetwork(
            z_dim=self.z_dim, w_dim=self.w_dim, num_ws=synth.num_ws, dtype=self.dtype, name="mapping"
        )(z)
        return synth(ws, noise_mode=noise_mode)


class DiscriminatorBlock(nn.Module):
    """Downsampling resnet block (networks_stylegan2.py:553-634)."""

    in_channels: int  # 0 = first block (takes img via fromrgb)
    tmp_channels: int
    out_channels: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, img):
        common = dict(activation=self.activation, conv_clamp=self.conv_clamp, dtype=self.dtype)
        if self.in_channels == 0 or self.architecture == "skip":
            y = Conv2dLayer(self.tmp_channels, 1, name="fromrgb", **common)(img)
            x = x + y if x is not None else y
            img = downsample2d(img, setup_filter(np.asarray(self.resample_filter))) if self.architecture == "skip" else None
        if self.architecture == "resnet":
            y = Conv2dLayer(self.out_channels, 1, use_bias=False, down=2,
                            resample_filter=self.resample_filter, dtype=self.dtype, name="skip")(
                x, gain=math.sqrt(0.5))
            x = Conv2dLayer(self.tmp_channels, 3, name="conv0", **common)(x)
            x = Conv2dLayer(self.out_channels, 3, down=2, resample_filter=self.resample_filter,
                            name="conv1", **common)(x, gain=math.sqrt(0.5))
            x = y + x
        else:
            x = Conv2dLayer(self.tmp_channels, 3, name="conv0", **common)(x)
            x = Conv2dLayer(self.out_channels, 3, down=2, resample_filter=self.resample_filter,
                            name="conv1", **common)(x)
        return x, img


class MinibatchStdLayer(nn.Module):
    """Cross-sample stddev feature (networks_stylegan2.py:642-666). NHWC."""

    group_size: Optional[int] = 4
    num_channels: int = 1

    def __call__(self, x):
        n, h, w, c = x.shape
        g = min(self.group_size, n) if self.group_size is not None else n
        f = self.num_channels
        y = x.reshape(g, -1, h, w, f, c // f)
        y = y - y.mean(axis=0)
        y = jnp.square(y).mean(axis=0)
        y = jnp.sqrt(y + 1e-8)
        y = y.mean(axis=(1, 2, 4))  # [n//g, F]
        y = jnp.repeat(y[:, None, None, :], g, axis=0).reshape(n, 1, 1, f)
        y = jnp.broadcast_to(y, (n, h, w, f))
        return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)


class EncoderEpilogue(nn.Module):
    """4x4 -> embedding head (networks_stylegan2.py:797-840)."""

    out_channels: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, img):
        in_channels = x.shape[-1]
        if self.architecture == "skip":
            x = x + Conv2dLayer(in_channels, 1, activation=self.activation, dtype=self.dtype,
                                name="fromrgb")(img)
        x = Conv2dLayer(in_channels, 3, activation=self.activation, conv_clamp=self.conv_clamp,
                        dtype=self.dtype, name="conv")(x)
        # Flatten in NCHW order for torch-checkpoint weight compatibility.
        n = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
        x = FullyConnectedLayer(in_channels, activation=self.activation, name="fc")(x)
        return FullyConnectedLayer(self.out_channels, name="out")(x)


class Encoder(nn.Module):
    """Image -> embedding encoder (networks_stylegan2.py:848-898)."""

    img_resolution: int
    out_channels: int
    img_channels: int = 3
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = 256.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        res_log2 = int(math.ceil(math.log2(self.img_resolution)))
        block_resolutions = [2 ** i for i in range(res_log2, 2, -1)]
        channels = {res: min(self.channel_base // res, self.channel_max)
                    for res in block_resolutions + [4]}
        x = None
        for res in block_resolutions:
            in_ch = channels[res] if res < 2 ** res_log2 else 0
            x, img = DiscriminatorBlock(
                in_ch, channels[res], channels[res // 2], architecture=self.architecture,
                conv_clamp=self.conv_clamp, dtype=self.dtype, name=f"b{res}",
            )(x, img)
        return EncoderEpilogue(
            self.out_channels, architecture=self.architecture, conv_clamp=self.conv_clamp,
            dtype=self.dtype, name="b4",
        )(x, img)
