"""Legacy LayoutGAN++ generator/discriminator variant.

Parity target: training/networks_layoutganpp.py:38-211 — the non-DETR
variant: background encoded by a StyleGAN2 ``Encoder`` into one global
feature (no spatial cross-attention), element tokens through a plain
transformer encoder, text length as a scalar ``len/40`` feature, text
truncated at 40 tokens. Selectable via config (the reference required
editing ``c.G_kwargs.class_name``; here it's a first-class
``--variant layoutganpp``-style choice in the model registry).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from layoutdetr_tpu.models.bert import BertLMHeadModel
from layoutdetr_tpu.models.detr_transformer import TorchEncoderLayer, TransformerWithTokenEncoder
from layoutdetr_tpu.models.generator import GeneratorConfig, TextEncoder
from layoutdetr_tpu.models.layers import Dense, padding_bias
from layoutdetr_tpu.models.stylegan2 import Decoder, Encoder, normalize_2nd_moment


@dataclasses.dataclass(frozen=True)
class LayoutGanPPConfig(GeneratorConfig):
    f_dim: int = 256
    num_heads: int = 4
    num_layers: int = 8
    max_text_length: int = 40  # networks_layoutganpp.py:82 tokenizes at 40


class LayoutGanPPGenerator(nn.Module):
    cfg: LayoutGanPPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, bbox_class, bbox_real, text_ids, text_mask, text_len,
                 padding_mask, background, deterministic=True):
        cfg = self.cfg
        b, n = bbox_class.shape
        z0 = normalize_2nd_moment(z.reshape(b, -1).astype(jnp.float32))
        zf = Dense(cfg.f_dim // 2, dtype=self.dtype, name="fc_z")(z0)
        zf = jnp.broadcast_to(zf[:, None, :], (b, n, cfg.f_dim // 2))

        text_feat = TextEncoder(cfg.encoder_bert_config(), dtype=self.dtype,
                                name="text_encoder")(text_ids, text_mask, deterministic)
        # Scalar normalized char length (networks_layoutganpp.py:84).
        tl = (text_len.astype(jnp.float32) / 40.0)[..., None].astype(self.dtype)

        bg_feat = Encoder(
            img_resolution=cfg.background_size, out_channels=cfg.im_f_dim,
            channel_base=8192, channel_max=cfg.im_f_dim, conv_clamp=None,
            dtype=self.dtype, name="bg_encoder",
        )(background)
        bg_feat = jnp.broadcast_to(bg_feat[:, None, :], (b, n, cfg.im_f_dim)).astype(self.dtype)

        x = jnp.concatenate([zf, text_feat, tl, bg_feat], axis=-1)
        x = nn.relu(Dense(cfg.im_f_dim, dtype=self.dtype, name="fc_in")(x))

        bias = padding_bias(padding_mask)
        for i in range(cfg.num_layers):
            x = TorchEncoderLayer(cfg.im_f_dim, cfg.num_heads, cfg.im_f_dim,
                                  dtype=self.dtype, name=f"transformer_layers_{i}")(
                x, attn_bias=bias, deterministic=deterministic)
        return nn.sigmoid(Dense(4, dtype=self.dtype, name="fc_out")(x).astype(jnp.float32))


class LayoutGanPPDiscriminator(nn.Module):
    cfg: LayoutGanPPConfig
    max_bbox: int = 50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bbox, bbox_class, text_ids, text_mask, text_len,
                 padding_mask, background, reconst=False, deterministic=True):
        cfg = self.cfg
        b, n = bbox_class.shape
        valid = ~padding_mask

        bf = Dense(cfg.f_dim // 2, dtype=self.dtype, name="fc_bbox")(bbox.astype(self.dtype))
        text_feat = TextEncoder(cfg.encoder_bert_config(), dtype=self.dtype,
                                name="text_encoder")(text_ids, text_mask, deterministic)
        tl = (text_len.astype(jnp.float32) / 40.0)[..., None].astype(self.dtype)
        bg_feat = Encoder(
            img_resolution=cfg.background_size, out_channels=cfg.im_f_dim,
            channel_base=8192, channel_max=cfg.im_f_dim, conv_clamp=None,
            dtype=self.dtype, name="bg_encoder",
        )(background)
        bg_feat = jnp.broadcast_to(bg_feat[:, None, :], (b, n, cfg.im_f_dim)).astype(self.dtype)

        x = Dense(cfg.im_f_dim, dtype=self.dtype, name="enc_fc_in")(
            jnp.concatenate([bf, text_feat, tl, bg_feat], axis=-1))
        x = nn.relu(x)
        x = TransformerWithTokenEncoder(
            cfg.im_f_dim, nhead=cfg.num_heads, dim_feedforward=cfg.im_f_dim,
            num_layers=cfg.num_layers, dtype=self.dtype, name="enc_transformer",
        )(x, padding_mask, deterministic=deterministic)
        x0 = x[:, 0, :]
        logit_disc = Dense(1, dtype=self.dtype, name="fc_out_disc")(x0)[..., 0].astype(jnp.float32)

        if not reconst:
            return logit_disc

        pos_token = self.param("pos_token", nn.initializers.uniform(1.0),
                               (self.max_bbox, cfg.f_dim), jnp.float32)
        xx = jnp.broadcast_to(x0[:, None, :], (b, n, cfg.im_f_dim))
        t = jnp.broadcast_to(pos_token[None, :n, :], (b, n, cfg.f_dim)).astype(xx.dtype)
        xx = nn.relu(Dense(cfg.im_f_dim, dtype=self.dtype, name="dec_fc_in")(
            jnp.concatenate([xx, t], axis=-1)))
        bias = padding_bias(padding_mask)
        for i in range(cfg.num_layers):
            xx = TorchEncoderLayer(cfg.im_f_dim, cfg.num_heads, cfg.im_f_dim,
                                   dtype=self.dtype, name=f"dec_layers_{i}")(
                xx, attn_bias=bias, deterministic=deterministic)
        bbox_pred = nn.sigmoid(Dense(4, dtype=self.dtype, name="fc_out_bbox")(xx).astype(jnp.float32))

        tmax = text_ids.shape[-1]
        dec_ids = jnp.asarray(text_ids).at[:, :, 0].set(cfg.bos_token_id).reshape(b * n, tmax)
        dec_targets = jnp.where(dec_ids == cfg.pad_token_id, -100, dec_ids)
        _, loss_lm = BertLMHeadModel(cfg.decoder_bert_config(), dtype=self.dtype,
                                     name="text_decoder")(
            dec_ids, text_mask.reshape(b * n, tmax),
            encoder_hidden_states=xx.reshape(b * n, 1, cfg.im_f_dim),
            encoder_attention_mask=jnp.ones((b * n, 1), jnp.int32),
            labels=dec_targets, row_mask=valid.reshape(b * n),
            mode="text", deterministic=deterministic,
        )

        bg_rec = Decoder(
            z_dim=cfg.im_f_dim, w_dim=cfg.im_f_dim, img_resolution=cfg.background_size,
            img_channels=3, use_noise=False, channel_base=8192, channel_max=cfg.im_f_dim,
            conv_clamp=None, dtype=self.dtype, name="bg_decoder",
        )(x0)
        return logit_disc, bbox_pred, loss_lm, bg_rec
