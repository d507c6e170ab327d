"""LayoutNet: the (bbox, label) feature network behind layout-FID.

Parity target: training/networks_layoutnet.py:17-86 — a 4-layer
transformer-with-token over per-element (bbox, label) pairs, d=256,
nhead=4, FFN d//2, max 50 boxes. ``extract_features`` returns the CLS
output; the forward adds discriminator/classifier/bbox heads (the
training heads of the original LayoutGAN++ metric net).

Includes the reference's hardcoded label remappings for the ads/CGL
datasets (networks_layoutnet.py:51-61), implemented as functional
lookup tables (no in-place mutation).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from layoutdetr_tpu.models.detr_transformer import TorchEncoderLayer, TransformerWithTokenEncoder
from layoutdetr_tpu.models.layers import Dense, padding_bias

# label_idx_replace (ads datasets): {header, pre-header, post-header,
# body text, disclaimer} -> TEXT(2), button -> BUTTON(4), logo ->
# PICTOGRAM(3), callout -> ADVERTISEMENT(7).
_ADS_REMAP = jnp.array([2, 2, 2, 2, 2, 4, 7, 3, 8, 9, 10, 11, 12])
# label_idx_replace_2 (CGL): Logo->3, Text->2, Underlay->4,
# Embellishment->3, Highlighted text->2.
_CGL_REMAP = jnp.array([3, 2, 4, 3, 2, 5, 6, 7, 8, 9, 10, 11, 12])


def remap_labels(label, label_idx_replace=False, label_idx_replace_2=False):
    if label_idx_replace:
        return jnp.take(_ADS_REMAP, jnp.clip(label, 0, _ADS_REMAP.shape[0] - 1), axis=0)
    if label_idx_replace_2:
        return jnp.take(_CGL_REMAP, jnp.clip(label, 0, _CGL_REMAP.shape[0] - 1), axis=0)
    return label


class LayoutNet(nn.Module):
    num_label: int
    d_model: int = 256
    nhead: int = 4
    num_layers: int = 4
    max_bbox: int = 50
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.emb_label = self.param(
            "emb_label_table", nn.initializers.normal(1.0), (self.num_label, self.d_model), jnp.float32
        )
        self.pos_token = self.param(
            "pos_token", nn.initializers.uniform(1.0), (self.max_bbox, self.d_model), jnp.float32
        )
        self.fc_bbox = Dense(self.d_model, dtype=self.dtype)
        self.enc_fc_in = Dense(self.d_model, dtype=self.dtype)
        self.enc_transformer = TransformerWithTokenEncoder(
            self.d_model, nhead=self.nhead, dim_feedforward=self.d_model // 2,
            num_layers=self.num_layers, dtype=self.dtype,
        )
        self.fc_out_disc = Dense(1, dtype=self.dtype)
        self.dec_fc_in = Dense(self.d_model, dtype=self.dtype)
        self.dec_layers = [
            TorchEncoderLayer(self.d_model, self.nhead, self.d_model // 2, dtype=self.dtype)
            for _ in range(self.num_layers)
        ]
        self.fc_out_cls = Dense(self.num_label, dtype=self.dtype)
        self.fc_out_bbox = Dense(4, dtype=self.dtype)

    def _emb_label(self, label):
        return jnp.take(self.emb_label, label, axis=0).astype(self.dtype)

    def extract_features(self, bbox, label, padding_mask,
                         label_idx_replace=False, label_idx_replace_2=False):
        """bbox [B,N,4], label [B,N], padding_mask [B,N] True=padded -> [B, d]."""
        label = remap_labels(label, label_idx_replace, label_idx_replace_2)
        b = self.fc_bbox(bbox.astype(self.dtype))
        l = self._emb_label(label)
        x = nn.relu(self.enc_fc_in(jnp.concatenate([b, l], axis=-1)))
        x = self.enc_transformer(x, padding_mask)
        return x[:, 0, :]

    def __call__(self, bbox, label, padding_mask):
        bsz, n = label.shape
        x0 = self.extract_features(bbox, label, padding_mask)
        logit_disc = self.fc_out_disc(x0)[..., 0]

        x = jnp.broadcast_to(x0[:, None, :], (bsz, n, self.d_model))
        t = jnp.broadcast_to(self.pos_token[None, :n, :], (bsz, n, self.d_model)).astype(x.dtype)
        x = nn.relu(self.dec_fc_in(jnp.concatenate([x, t], axis=-1)))
        bias = padding_bias(padding_mask)
        for layer in self.dec_layers:
            x = layer(x, attn_bias=bias)
        logit_cls = self.fc_out_cls(x)
        bbox_pred = nn.sigmoid(self.fc_out_bbox(x).astype(jnp.float32))
        return logit_disc, logit_cls, bbox_pred
