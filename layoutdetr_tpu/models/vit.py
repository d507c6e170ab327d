"""Vision Transformer backbone (optional image encoder).

Parity target: training/networks_vit.py — the alternative multimodal
image backbone (MaskEmbed patchifier :27-46, ViT blocks :115-137,
VisionTransformer :139-229, VisionTransformerDecoder :231-308). The
reference ships it unwired (imported by nothing, SURVEY.md §2.5); here
it is a drop-in backbone choice for the Generator/Discriminator via
``backbone='vit'`` (BASELINE config 5 treats the ViT backbone as the
multimodal workload).

TPU-native: patchify = one strided conv on the MXU; pre-norm blocks;
bf16-ready via ``dtype``; returns a spatial feature map
[B, H/ps, W/ps, embed_dim] so the DETR transformer consumes it exactly
like the ResNet's layer4 output.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from layoutdetr_tpu.models.layers import Dense, LayerNorm, einsum_hp


class PatchEmbed(nn.Module):
    """Conv patchifier (networks_vit.py:27-46 MaskEmbed, flatten variant)."""

    patch_size: int = 16
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ps = self.patch_size
        w = self.param("kernel", nn.initializers.xavier_uniform(),
                       (ps, ps, x.shape[-1], self.embed_dim), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32)
        precision = lax.Precision.HIGHEST if self.dtype == jnp.float32 else None
        y = lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (ps, ps), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
        )
        return y + b.astype(y.dtype)


class ViTBlock(nn.Module):
    """Pre-norm MHSA + MLP block (networks_vit.py:115-137)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = LayerNorm(name="norm1")(x)
        B, S, D = h.shape
        hd = D // self.num_heads
        qkv = Dense(3 * D, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B, S, 3, self.num_heads, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        attn = einsum_hp("bqhd,bkhd->bhqk", q, k, self.dtype) / jnp.sqrt(
            jnp.asarray(hd, jnp.float32)).astype(q.dtype)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = einsum_hp("bhqk,bkhd->bqhd", attn, v, self.dtype).reshape(B, S, D)
        x = x + Dense(D, dtype=self.dtype, name="proj")(out)

        h = LayerNorm(name="norm2")(x)
        h = Dense(int(D * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = Dense(D, dtype=self.dtype, name="fc2")(h)
        return x + h


class VisionTransformer(nn.Module):
    """ViT returning a spatial feature map for DETR consumption."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        tokens = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                            name="patch_embed")(x).reshape(b, gh * gw, self.embed_dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw, self.embed_dim), jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)
        for i in range(self.depth):
            tokens = ViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                              dtype=self.dtype, name=f"blocks_{i}")(tokens, deterministic)
        tokens = LayerNorm(name="norm")(tokens)
        return tokens.reshape(b, gh, gw, self.embed_dim)


class VisionTransformerDecoder(nn.Module):
    """Patch-reconstruction decoder (networks_vit.py:231-308): tokens ->
    pixel patches, used for masked-image-modeling style objectives."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 4
    num_heads: int = 12
    out_chans: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, deterministic=True):
        b, gh, gw, d = tokens.shape
        x = tokens.reshape(b, gh * gw, d)
        for i in range(self.depth):
            x = ViTBlock(d, self.num_heads, dtype=self.dtype, name=f"blocks_{i}")(x, deterministic)
        x = LayerNorm(name="norm")(x)
        ps = self.patch_size
        x = Dense(ps * ps * self.out_chans, dtype=self.dtype, name="pred")(x)
        x = x.reshape(b, gh, gw, ps, ps, self.out_chans)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * ps, gw * ps, self.out_chans)
        return x
