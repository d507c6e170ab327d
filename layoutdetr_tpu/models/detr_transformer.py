"""DETR-style transformer encoder/decoder, batch-first.

Parity targets: training/detr_transformer.py (Transformer :73-112,
TransformerWithToken :22-70, encoder/decoder layers :115-322) and
training/util.py:13-43 (TransformerWithToken_layoutganpp, the plain
torch TransformerEncoder with a learned CLS token).

TPU-native differences from the reference:
- batch-first [B, S, D] (no [S, B, D] permutes);
- image memory arrives as [B, H, W, C] and is flattened to [B, HW, C]
  once, with its positional embedding added as a separate operand (pos
  added to q/k only, never v — DETR semantics);
- key-padding masks become additive fp32 biases built once per call;
- post-norm (normalize_before=False) is the only mode the active models
  use (networks_detr.py:106) — pre-norm is supported via a flag.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from layoutdetr_tpu.models.layers import (
    Dense,
    LayerNorm,
    MultiHeadAttention,
    padding_bias,
    xavier_uniform,
)


class TransformerEncoderLayer(nn.Module):
    """Self-attention + FFN, post-norm by default (detr_transformer.py:180-237)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, *, pos=None, attn_bias=None, deterministic=True):
        def with_pos(x):
            return x if pos is None else x + pos

        def sa(x):
            return MultiHeadAttention(
                self.nhead, dropout=self.dropout, dtype=self.dtype, name="self_attn"
            )(with_pos(x), with_pos(x), x, attn_bias=attn_bias, deterministic=deterministic)

        def ffn(x):
            h = Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
            h = nn.relu(h)
            if not deterministic:
                h = nn.Dropout(self.dropout, deterministic=False)(h)
            return Dense(self.d_model, dtype=self.dtype, name="linear2")(h)

        drop = lambda x: x if deterministic else nn.Dropout(self.dropout, deterministic=False)(x)
        norm1 = LayerNorm(name="norm1")
        norm2 = LayerNorm(name="norm2")
        if self.normalize_before:
            src = src + drop(sa(norm1(src)))
            src = src + drop(ffn(norm2(src)))
        else:
            src = norm1(src + drop(sa(src)))
            src = norm2(src + drop(ffn(src)))
        return src


class TransformerDecoderLayer(nn.Module):
    """Self-attn + cross-attn + FFN (detr_transformer.py:240-322)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, *, pos=None, query_pos=None,
                 tgt_attn_bias=None, memory_attn_bias=None, deterministic=True):
        def with_qpos(x):
            return x if query_pos is None else x + query_pos

        def with_pos(x):
            return x if pos is None else x + pos

        def sa(x):
            return MultiHeadAttention(
                self.nhead, dropout=self.dropout, dtype=self.dtype, name="self_attn"
            )(with_qpos(x), with_qpos(x), x, attn_bias=tgt_attn_bias, deterministic=deterministic)

        def ca(x):
            return MultiHeadAttention(
                self.nhead, dropout=self.dropout, dtype=self.dtype, name="multihead_attn"
            )(with_qpos(x), with_pos(memory), memory, attn_bias=memory_attn_bias,
              deterministic=deterministic)

        def ffn(x):
            h = Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
            h = nn.relu(h)
            if not deterministic:
                h = nn.Dropout(self.dropout, deterministic=False)(h)
            return Dense(self.d_model, dtype=self.dtype, name="linear2")(h)

        drop = lambda x: x if deterministic else nn.Dropout(self.dropout, deterministic=False)(x)
        norm1 = LayerNorm(name="norm1")
        norm2 = LayerNorm(name="norm2")
        norm3 = LayerNorm(name="norm3")
        if self.normalize_before:
            tgt = tgt + drop(sa(norm1(tgt)))
            tgt = tgt + drop(ca(norm2(tgt)))
            tgt = tgt + drop(ffn(norm3(tgt)))
        else:
            tgt = norm1(tgt + drop(sa(tgt)))
            tgt = norm2(tgt + drop(ca(tgt)))
            tgt = norm3(tgt + drop(ffn(tgt)))
        return tgt


class Transformer(nn.Module):
    """DETR transformer: image memory encoder + layout-query decoder.

    Parity: detr_transformer.py:73-112; the Generator instantiates it
    with d_model=256, nhead=8, 6+6 layers, FFN 2048, post-norm
    (networks_detr.py:99-108).
    """

    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    with_token: bool = False  # TransformerWithToken (detr_transformer.py:22-70)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, src_mask, pos_embed, tgt, tgt_key_padding_mask, deterministic=True):
        """src: [B,H,W,C] image features; src_mask: [B,H,W] bool True=padded
        (or None); pos_embed: [B,H,W,C]; tgt: [B,N,C] queries;
        tgt_key_padding_mask: [B,N] bool True=padded.

        Returns (hs [B, N(+1 with token), C], memory [B, H, W, C]).
        """
        b, h, w, c = src.shape
        src = src.reshape(b, h * w, c)
        pos = pos_embed.reshape(b, h * w, c).astype(src.dtype)
        mem_mask = None if src_mask is None else src_mask.reshape(b, h * w)
        mem_bias = padding_bias(mem_mask)

        x = src
        for i in range(self.num_encoder_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.normalize_before, dtype=self.dtype, name=f"encoder_layers_{i}",
            )(x, pos=pos, attn_bias=mem_bias, deterministic=deterministic)
        if self.normalize_before:
            x = LayerNorm(name="encoder_norm")(x)
        memory = x

        if self.with_token:
            token = self.param("token", nn.initializers.normal(1.0), (1, 1, self.d_model), jnp.float32)
            tgt = jnp.concatenate([jnp.broadcast_to(token, (b, 1, self.d_model)).astype(tgt.dtype), tgt], axis=1)
            tok_pad = jnp.zeros((b, 1), dtype=bool)
            tgt_key_padding_mask = jnp.concatenate([tok_pad, tgt_key_padding_mask], axis=1)

        tgt_bias = padding_bias(tgt_key_padding_mask)
        y = tgt
        for i in range(self.num_decoder_layers):
            y = TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.normalize_before, dtype=self.dtype, name=f"decoder_layers_{i}",
            )(y, memory, pos=pos, tgt_attn_bias=tgt_bias, memory_attn_bias=mem_bias,
              deterministic=deterministic)
        y = LayerNorm(name="decoder_norm")(y)

        return y, memory.reshape(b, h, w, c)


class TorchEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer semantics (post-norm, relu, gelu optional).

    Used by the discriminator's decoders and LayoutNet, which build on
    stock torch layers rather than the DETR variants (networks_detr.py:242,
    training/util.py:21-25, networks_layoutnet.py:41-43).
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, attn_bias=None, deterministic=True):
        drop = lambda t: t if deterministic else nn.Dropout(self.dropout, deterministic=False)(t)
        sa = MultiHeadAttention(self.nhead, dropout=self.dropout, dtype=self.dtype, name="self_attn")(
            x, x, x, attn_bias=attn_bias, deterministic=deterministic
        )
        x = LayerNorm(name="norm1")(x + drop(sa))
        h = Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        if not deterministic:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
        h = Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        x = LayerNorm(name="norm2")(x + drop(h))
        return x


class TransformerWithTokenEncoder(nn.Module):
    """Learned CLS token + N torch encoder layers.

    Parity: training/util.py:13-43 (TransformerWithToken_layoutganpp).
    Batch-first: x [B, N, D], padding_mask [B, N] True=padded.
    Returns [B, N+1, D]; index 0 is the token.
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    num_layers: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        b = x.shape[0]
        token = self.param("token", nn.initializers.normal(1.0), (1, 1, self.d_model), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(token, (b, 1, self.d_model)).astype(x.dtype), x], axis=1)
        pad = jnp.concatenate([jnp.zeros((b, 1), bool), padding_mask], axis=1)
        bias = padding_bias(pad)
        for i in range(self.num_layers):
            x = TorchEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                dtype=self.dtype, name=f"layers_{i}",
            )(x, attn_bias=bias, deterministic=deterministic)
        return x
