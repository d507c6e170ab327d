"""LayoutDETR Discriminator: conditional + unconditional critics with
reconstruction decoders.

Parity target: training/networks_detr.py:190-361.

Structure:
- conditional branch: own ResNet50 + per-element (bbox, label, text,
  text-len) features -> DETR TransformerWithToken -> CLS logit;
- unconditional branch: (bbox, label) -> plain transformer-with-token
  (training/util.py:13-43) -> CLS logit;
- reconstruction decoders (reconst=True): pos_token-conditioned
  transformer encoders regressing bbox/labels, a BERT LM text decoder,
  a text-length head, and a StyleGAN2 ``Decoder`` reconstructing the
  background from the CLS feature (networks_detr.py:239-261, 314-361).

Pre-tokenized text in, masked losses out — same tensorization strategy
as the Generator.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from layoutdetr_tpu.models.bert import BertLMHeadModel
from layoutdetr_tpu.models.detr_transformer import (
    TorchEncoderLayer,
    Transformer,
    TransformerWithTokenEncoder,
)
from layoutdetr_tpu.models.generator import GeneratorConfig, TextEncoder
from layoutdetr_tpu.models.layers import Dense, MLP, padding_bias
from layoutdetr_tpu.metrics.layout_metrics import masked_cross_entropy
from layoutdetr_tpu.models.position_encoding import PositionEmbeddingSine
from layoutdetr_tpu.models.resnet import ResNet50
from layoutdetr_tpu.models.stylegan2 import Decoder


class _ReconstDecoder(nn.Module):
    """CLS feature + learned positional tokens -> per-element features.

    Parity: networks_detr.py:239-243, 315-321 (pos_token, dec_fc_in,
    6-layer torch TransformerEncoder).
    """

    hidden_dim: int
    num_layers: int = 6
    nhead: int = 8
    dim_feedforward: int = 2048
    max_bbox: int = 50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0, padding_mask, deterministic=True):
        b, d = x0.shape
        n = padding_mask.shape[1]
        pos_token = self.param(
            "pos_token", nn.initializers.uniform(1.0), (self.max_bbox, self.hidden_dim), jnp.float32
        )
        x = jnp.broadcast_to(x0[:, None, :], (b, n, d))
        t = jnp.broadcast_to(pos_token[None, :n, :], (b, n, self.hidden_dim)).astype(x.dtype)
        x = jnp.concatenate([x, t], axis=-1)
        x = nn.relu(Dense(self.hidden_dim, dtype=self.dtype, name="dec_fc_in")(x))
        bias = padding_bias(padding_mask)
        for i in range(self.num_layers):
            x = TorchEncoderLayer(
                self.hidden_dim, self.nhead, self.dim_feedforward, dtype=self.dtype,
                name=f"dec_layers_{i}",
            )(x, attn_bias=bias, deterministic=deterministic)
        return x


class Discriminator(nn.Module):
    cfg: GeneratorConfig
    max_bbox: int = 50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bbox, bbox_class, text_ids, text_mask, text_len,
                 padding_mask, background, reconst=False, deterministic=True,
                 text_feat=None):
        """bbox: [B, N, 4]; rest as in Generator (incl. the optional
        hoisted ``text_feat`` — the text encoder is frozen, see
        Generator.__call__). Returns (logit_disc [B], logit_disc_uncond
        [B]) or the full reconst tuple."""
        cfg = self.cfg
        b, n = bbox_class.shape
        valid = ~padding_mask

        # --- Conditional encoder (networks_detr.py:282-300) ---
        from layoutdetr_tpu.models.generator import _image_backbone

        bg_feat = _image_backbone(cfg, self.dtype)(background)
        pos = PositionEmbeddingSine(num_pos_feats=cfg.hidden_dim // 2, name="pos_embed")(bg_feat)
        bg_proj = Dense(cfg.hidden_dim, dtype=self.dtype, name="input_proj")(bg_feat)

        bf = Dense(cfg.bert_f_dim, dtype=self.dtype, name="fc_bbox")(bbox.astype(self.dtype))
        emb_label = self.param(
            "emb_label", nn.initializers.normal(1.0), (cfg.num_bbox_labels, cfg.bert_f_dim), jnp.float32
        )
        lf = jnp.take(emb_label, bbox_class, axis=0).astype(self.dtype)
        if text_feat is None:
            text_feat = TextEncoder(cfg.encoder_bert_config(), dtype=self.dtype,
                                    name="text_encoder")(text_ids, text_mask, deterministic)
        text_feat = text_feat.astype(self.dtype)
        enc_text_len = self.param(
            "enc_text_len", nn.initializers.normal(1.0), (cfg.text_len_table, cfg.bert_f_dim), jnp.float32
        )
        tlf = jnp.take(enc_text_len, jnp.clip(text_len, 0, cfg.text_len_table - 1), axis=0).astype(self.dtype)

        x = jnp.concatenate([bf, lf, text_feat, tlf], axis=-1)
        x = nn.relu(MLP(cfg.bert_f_dim, cfg.hidden_dim, 3, dtype=self.dtype, name="enc_fc_in")(x))

        hs, _ = Transformer(
            d_model=cfg.hidden_dim, nhead=cfg.nhead,
            num_encoder_layers=cfg.num_encoder_layers,
            num_decoder_layers=cfg.num_decoder_layers,
            dim_feedforward=cfg.dim_feedforward, dropout=cfg.dropout,
            with_token=True, dtype=self.dtype, name="enc_transformer",
        )(bg_proj, None, pos, x, padding_mask, deterministic=deterministic)
        x0 = hs[:, 0, :]  # CLS slot (token was prepended at index 0)
        logit_disc = Dense(1, dtype=self.dtype, name="fc_out_disc")(x0)[..., 0].astype(jnp.float32)

        # --- Unconditional branch (networks_detr.py:302-309) ---
        bfu = Dense(cfg.bert_f_dim, dtype=self.dtype, name="fc_bbox_uncond")(bbox.astype(self.dtype))
        emb_label_u = self.param(
            "emb_label_uncond", nn.initializers.normal(1.0), (cfg.num_bbox_labels, cfg.bert_f_dim), jnp.float32
        )
        lfu = jnp.take(emb_label_u, bbox_class, axis=0).astype(self.dtype)
        xu = jnp.concatenate([bfu, lfu], axis=-1)
        xu = nn.relu(MLP(cfg.bert_f_dim, cfg.hidden_dim, 3, dtype=self.dtype, name="enc_fc_in_uncond")(xu))
        xu = TransformerWithTokenEncoder(
            cfg.hidden_dim, nhead=cfg.nhead, dim_feedforward=cfg.dim_feedforward,
            num_layers=cfg.uncond_encoder_layers, dtype=self.dtype,
            name="enc_transformer_uncond",
        )(xu, padding_mask, deterministic=deterministic)
        x0_uncond = xu[:, 0, :]
        logit_disc_uncond = Dense(1, dtype=self.dtype, name="fc_out_disc_uncond")(x0_uncond)[..., 0].astype(jnp.float32)

        if not reconst:
            return logit_disc, logit_disc_uncond

        # --- Conditional reconstruction decoder (networks_detr.py:314-349) ---
        feats = _ReconstDecoder(
            cfg.hidden_dim, num_layers=cfg.reconst_decoder_layers,
            nhead=cfg.nhead, dim_feedforward=cfg.dim_feedforward,
            max_bbox=self.max_bbox, dtype=self.dtype, name="dec_transformer",
        )(x0, padding_mask, deterministic)
        bbox_pred = nn.sigmoid(Dense(4, dtype=self.dtype, name="bbox_embed")(feats).astype(jnp.float32))
        logit_cls = Dense(cfg.num_bbox_labels, dtype=self.dtype, name="fc_out_cls")(feats)

        t = text_ids.shape[-1]
        dec_ids = jnp.asarray(text_ids).at[:, :, 0].set(cfg.bos_token_id).reshape(b * n, t)
        dec_targets = jnp.where(dec_ids == cfg.pad_token_id, -100, dec_ids)
        enc_states = feats.reshape(b * n, 1, cfg.hidden_dim)
        _, loss_lm = BertLMHeadModel(cfg.decoder_bert_config(), dtype=self.dtype, name="text_decoder")(
            dec_ids, text_mask.reshape(b * n, t),
            encoder_hidden_states=enc_states,
            encoder_attention_mask=jnp.ones((b * n, 1), jnp.int32),
            labels=dec_targets, row_mask=valid.reshape(b * n),
            mode="text", deterministic=deterministic,
        )

        text_len_rec = Dense(cfg.text_len_table, dtype=self.dtype, name="fc_text_len_rec")(feats)
        loss_text_len = masked_cross_entropy(
            text_len_rec, jnp.clip(text_len, 0, cfg.text_len_table - 1), valid
        )

        # Background reconstruction (networks_detr.py:261, 349).
        bg_rec = Decoder(
            z_dim=cfg.hidden_dim, w_dim=cfg.im_f_dim, img_resolution=cfg.background_size,
            img_channels=3, use_noise=False, channel_base=8192, channel_max=cfg.im_f_dim,
            conv_clamp=None, dtype=self.dtype, name="bg_decoder",
        )(x0)

        # --- Unconditional reconstruction decoder (networks_detr.py:352-359) ---
        feats_u = _ReconstDecoder(
            cfg.hidden_dim, num_layers=cfg.reconst_decoder_layers,
            nhead=cfg.nhead, dim_feedforward=cfg.dim_feedforward,
            max_bbox=self.max_bbox, dtype=self.dtype, name="dec_transformer_uncond",
        )(x0_uncond, padding_mask, deterministic)
        bbox_pred_uncond = nn.sigmoid(Dense(4, dtype=self.dtype, name="bbox_embed_uncond")(feats_u).astype(jnp.float32))
        logit_cls_uncond = Dense(cfg.num_bbox_labels, dtype=self.dtype, name="fc_out_cls_uncond")(feats_u)

        return (logit_disc, logit_disc_uncond, bbox_pred, logit_cls, loss_lm,
                loss_text_len, bg_rec, bbox_pred_uncond, logit_cls_uncond)
