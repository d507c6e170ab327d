"""2D sine/cosine position embeddings for image feature maps.

Parity target: training/detr_position_encoding.py:22-58
(PositionEmbeddingSine) and :61-86 (PositionEmbeddingLearned).

Output is channels-last ``[B, H, W, 2*num_pos_feats]`` (the reference
returns NCHW). For fixed-size batches (the normal TPU case — the data
pipeline always ships same-size backgrounds) the embedding is a
constant and XLA hoists it out of the step entirely; the mask argument
exists for parity with the reference's NestedTensor padding.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def sine_position_embedding(mask, num_pos_feats=128, temperature=10000.0, normalize=True, scale=None):
    """mask: [B, H, W] bool, True = *padded* (reference semantics).

    Returns [B, H, W, 2*num_pos_feats] (y-features then x-features,
    matching the reference's channel order after its NCHW concat).
    """
    if scale is None:
        scale = 2 * math.pi
    not_mask = ~mask
    y_embed = jnp.cumsum(not_mask.astype(jnp.float32), axis=1)
    x_embed = jnp.cumsum(not_mask.astype(jnp.float32), axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t  # [B, H, W, F]
    pos_y = y_embed[..., None] / dim_t
    # Interleave sin on even indices, cos on odd indices.
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class PositionEmbeddingSine(nn.Module):
    num_pos_feats: int = 128
    temperature: float = 10000.0
    normalize: bool = True

    def __call__(self, x, mask=None):
        """x: [B, H, W, C]; mask: [B, H, W] bool True=padded (None = no padding)."""
        if mask is None:
            mask = jnp.zeros(x.shape[:3], dtype=bool)
        return sine_position_embedding(
            mask, self.num_pos_feats, self.temperature, self.normalize
        ).astype(x.dtype)


class PositionEmbeddingLearned(nn.Module):
    """Learned row/col embeddings (reference :61-86). Max 50 per axis."""

    num_pos_feats: int = 256

    @nn.compact
    def __call__(self, x, mask=None):
        h, w = x.shape[1], x.shape[2]
        row = self.param("row_embed", nn.initializers.uniform(1.0), (50, self.num_pos_feats), jnp.float32)
        col = self.param("col_embed", nn.initializers.uniform(1.0), (50, self.num_pos_feats), jnp.float32)
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(col[None, :w, :], (h, w, self.num_pos_feats)),
                jnp.broadcast_to(row[:h, None, :], (h, w, self.num_pos_feats)),
            ],
            axis=-1,
        )
        return jnp.broadcast_to(pos[None], (x.shape[0],) + pos.shape).astype(x.dtype)
