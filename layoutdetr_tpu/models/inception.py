"""InceptionV3 feature extractor for image FID (TF inception-2015-12-05 port).

Parity target: the reference featurizes composited banner images with
NVIDIA's TorchScript port of the TF-Slim Inception
(metrics/frechet_inception_distance.py:22, detector_kwargs
return_features=True -> 2048-dim pool3 features). The same network is
publicly distributed as pytorch-fid's ``pt_inception-2015-12-05``
state dict (torchvision InceptionV3 naming with three FID-specific
tweaks); `utils/torch_convert.convert_inception` maps that naming onto
this module.

FID-variant differences from stock torchvision InceptionV3 (public
pytorch_fid/inception.py behavior):
- InceptionA/C/E pool branches use avg-pool with
  count_include_pad=False;
- Mixed_7c (second InceptionE) uses a MAX pool branch;
- features are the 2048-dim global-average pool before the fc.

TPU-first: NHWC layout, frozen inference BN folded to one
multiply-add, bf16-able via ``dtype``; the whole extractor jits into a
single XLA program (conv+BN+ReLU fuse on the MXU/VPU).
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


class BasicConv2d(nn.Module):
    """Conv(bias=False) + frozen BN(eps=0.001) + ReLU."""

    out: int
    kernel: tuple
    stride: tuple = (1, 1)
    padding: tuple = (0, 0)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param("conv", nn.initializers.lecun_normal(), (kh, kw, cin, self.out), jnp.float32)
        gamma = self.param("bn_weight", nn.initializers.ones, (self.out,), jnp.float32)
        beta = self.param("bn_bias", nn.initializers.zeros, (self.out,), jnp.float32)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones, (self.out,), jnp.float32)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), self.stride,
            [(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        scale = (gamma * lax.rsqrt(var + 1e-3)).astype(self.dtype)
        shift = (beta - mean * gamma * lax.rsqrt(var + 1e-3)).astype(self.dtype)
        return nn.relu(y * scale + shift)


def _avg_pool_no_pad(x):
    """3x3 stride-1 avg pool, count_include_pad=False (FID tweak)."""
    ones = jnp.ones(x.shape[1:3] + (1,), x.dtype)[None]
    summed = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                               [(0, 0), (1, 1), (1, 1), (0, 0)])
    count = lax.reduce_window(ones, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    return summed / count


def _max_pool(x, window, stride, pad=0):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        b1 = C(64, (1, 1), name="branch1x1")(x)
        b5 = C(48, (1, 1), name="branch5x5_1")(x)
        b5 = C(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = C(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = C(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = C(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = C(self.pool_features, (1, 1), name="branch_pool")(_avg_pool_no_pad(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        b3 = C(384, (3, 3), stride=(2, 2), name="branch3x3")(x)
        bd = C(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = C(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = C(96, (3, 3), stride=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        c7 = self.c7
        b1 = C(192, (1, 1), name="branch1x1")(x)
        b7 = C(c7, (1, 1), name="branch7x7_1")(x)
        b7 = C(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = C(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = C(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = C(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = C(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = C(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = C(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = C(192, (1, 1), name="branch_pool")(_avg_pool_no_pad(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        b3 = C(192, (1, 1), name="branch3x3_1")(x)
        b3 = C(320, (3, 3), stride=(2, 2), name="branch3x3_2")(b3)
        b7 = C(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = C(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = C(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = C(192, (3, 3), stride=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # Mixed_7c uses "max" (FID tweak)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        b1 = C(320, (1, 1), name="branch1x1")(x)
        b3 = C(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            C(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            C(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = C(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = C(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            C(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            C(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool == "max":
            pooled = _max_pool(x, 3, 1, pad=1)
        else:
            pooled = _avg_pool_no_pad(x)
        bp = C(192, (1, 1), name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """FID InceptionV3: uint8-preprocessed NHWC input -> 2048 features."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = partial(BasicConv2d, dtype=self.dtype)
        x = C(32, (3, 3), stride=(2, 2), name="Conv2d_1a_3x3")(x)
        x = C(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = C(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = C(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = C(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE("avg", dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE("max", dtype=self.dtype, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # [B, 2048]


def preprocess_uint8(imgs, size: int = 299):
    """uint8 NHWC [0,255] -> bilinear-resized [-1,1] float (pytorch-fid
    resize_input/normalize_input semantics)."""
    x = imgs.astype(jnp.float32) / 255.0
    b, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), method="bilinear")
    return x * 2.0 - 1.0


def make_feature_fn(params, dtype=jnp.float32):
    """jitted uint8 NHWC images -> [B, 2048] pool3 features."""
    net = InceptionV3(dtype=dtype)

    @jax.jit
    def features(imgs):
        return net.apply({"params": params}, preprocess_uint8(imgs))

    return features


def load_inception_params(path_or_params):
    """Accept a ready params pytree, an .npz of flattened 'a/b/c' keys,
    or a torch .pt/.pth state dict (converted via convert_inception)."""
    if not isinstance(path_or_params, str):
        return path_or_params
    path = path_or_params
    import os

    if os.path.isdir(path):  # orbax checkpoint (torch_convert --kind inception)
        from layoutdetr_tpu.utils.checkpoint import restore_checkpoint

        tree = restore_checkpoint(path)
        return tree.get("params", tree) if isinstance(tree, dict) else tree
    if path.endswith(".npz"):
        import numpy as np

        flat = dict(np.load(path))
        params: dict = {}
        for k, v in flat.items():
            node = params
            parts = k.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
        return params
    from layoutdetr_tpu.utils.torch_convert import convert_inception, load_torch_state_dict

    return convert_inception(load_torch_state_dict(path))
