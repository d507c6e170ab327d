"""LayoutDETR Generator: DETR-style conditional layout generator.

Parity target: training/networks_detr.py:65-187.

Inputs are fully tensorized — the reference runs a CPU tokenizer inside
``forward`` (networks_detr.py:145), serializing every training step;
here text arrives pre-tokenized from the data pipeline as fixed-shape
``[B, N, T]`` ids/masks (SURVEY.md §7 hard part 3), so the whole
forward jits into one XLA program.

Defaults mirror train.py:168-183 / networks_detr.py:66-71:
z_dim=4, hidden_dim=256, BERT 768 wide / 4 heads / 12 encoder layers /
2 decoder layers, max_text_length=256, N=9 elements.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from layoutdetr_tpu.models.bert import BertConfig, BertLMHeadModel, BertModel
from layoutdetr_tpu.models.detr_transformer import Transformer
from layoutdetr_tpu.models.layers import Dense, MLP
from layoutdetr_tpu.models.position_encoding import PositionEmbeddingSine
from layoutdetr_tpu.models.resnet import ResNet50
from layoutdetr_tpu.models.stylegan2 import normalize_2nd_moment
from layoutdetr_tpu.metrics.layout_metrics import masked_cross_entropy, masked_mse


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    z_dim: int = 4
    num_bbox_labels: int = 8
    max_elements: int = 9
    hidden_dim: int = 256
    bert_f_dim: int = 768
    bert_num_heads: int = 4
    bert_num_encoder_layers: int = 12
    bert_num_decoder_layers: int = 2
    im_f_dim: int = 512
    max_text_length: int = 256
    # Character-length embedding table size / text_len_rec class count.
    # The reference ties this to max_text_length (networks_detr.py:103,
    # 149: nn.Embedding(max_text_length, ...) indexed by raw char
    # length — unclipped there, so >= max_text_length-char strings are
    # OOB; we clip). Decoupled here so the token dimension T can shrink
    # to the dataset's measured max token length (--max-text-length
    # auto, which passes text_len_table=256 explicitly) without changing
    # the char-length embedding numerics or head widths. Default None =
    # the reference tie (table size max_text_length), so directly
    # constructed configs match reference checkpoints at any T.
    text_len_table: Optional[int] = None
    vocab_size: int = 30524
    bos_token_id: int = 30522
    pad_token_id: int = 0
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    # D-side decoder depths, hardcoded 6 in the reference
    # (networks_detr.py:243,270,277: nn.TransformerEncoder num_layers=6
    # and TransformerWithToken_layoutganpp num_layers=6). Config knobs
    # here so tiny test/dryrun configs compile fast; 6 = parity.
    reconst_decoder_layers: int = 6
    uncond_encoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    background_size: int = 256
    backbone: str = "resnet50"  # or "vit" (networks_vit alternative)
    # ResNet stage depths (torchvision resnet50 = (3, 4, 6, 3),
    # detr_backbone.py:98-114). Shrunk only by tiny test/dryrun configs
    # — compile-time knob; the topology (4 stages, /32 stride, 2048-ch
    # layer4) is depth-independent.
    backbone_stage_sizes: tuple = (3, 4, 6, 3)
    # BERT FFN width (med_config.json intermediate_size; 3072 at width 768).
    bert_intermediate_size: int = 3072
    bert_max_position_embeddings: int = 512
    # Rematerialize BERT layers under autodiff (see BertConfig.remat):
    # makes the fp32 full-dims step fit batch 16 on a single chip.
    remat: bool = False

    def __post_init__(self):
        # gcfg.json sidecars round-trip tuples as lists; the config must
        # stay hashable (it keys jit caches).
        object.__setattr__(self, "backbone_stage_sizes",
                           tuple(self.backbone_stage_sizes))
        if self.text_len_table is None:
            # Reference tie: the char-length table is sized by
            # max_text_length (networks_detr.py:103).
            object.__setattr__(self, "text_len_table", self.max_text_length)

    def encoder_bert_config(self):
        # hidden_size follows bert_f_dim: the reference requires the text
        # CLS feature width to equal bert_f_dim (fc_in input is 4x that,
        # networks_detr.py:97), so the two are one knob here.
        return BertConfig(
            vocab_size=self.vocab_size,
            hidden_size=self.bert_f_dim,
            intermediate_size=self.bert_intermediate_size,
            max_position_embeddings=self.bert_max_position_embeddings,
            num_hidden_layers=self.bert_num_encoder_layers,
            num_attention_heads=self.bert_num_heads,
            encoder_width=self.bert_f_dim,
            remat=self.remat,
        )

    def decoder_bert_config(self):
        return BertConfig(
            vocab_size=self.vocab_size,
            hidden_size=self.bert_f_dim,
            intermediate_size=self.bert_intermediate_size,
            max_position_embeddings=self.bert_max_position_embeddings,
            num_hidden_layers=self.bert_num_decoder_layers,
            num_attention_heads=self.bert_num_heads,
            encoder_width=self.im_f_dim,
            remat=self.remat,
        )


def _image_backbone(cfg: "GeneratorConfig", dtype):
    """ResNet50 (default) or ViT backbone, both named 'backbone'."""
    if cfg.backbone == "vit":
        from layoutdetr_tpu.models.vit import VisionTransformer

        return VisionTransformer(dtype=dtype, name="backbone")
    return ResNet50(stage_sizes=tuple(cfg.backbone_stage_sizes),
                    dtype=dtype, name="backbone")


class TextEncoder(nn.Module):
    """Per-element BERT CLS features, batched over B*N sequences at once.

    Parity: networks_detr.py:145-147 (text_encoder mode='text', CLS slot).
    """

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_ids, text_mask, deterministic=True):
        b, n, t = text_ids.shape
        hidden = BertModel(self.config, dtype=self.dtype, name="bert")(
            text_ids.reshape(b * n, t), text_mask.reshape(b * n, t),
            mode="text", deterministic=deterministic,
        )
        return hidden[:, 0, :].reshape(b, n, -1)


def make_text_feature_fn(cfg: "GeneratorConfig", dtype=jnp.float32,
                         flash: Optional[bool] = None, mesh=None,
                         flash_interpret: bool = False):
    """Standalone text-CLS-feature extractor over a model's frozen
    ``text_encoder`` param subtree (params["params"]["text_encoder"] of a
    Generator or Discriminator). Used by the train step to hoist the
    frozen BERT passes out of the phase graphs.

    ``flash``: use the fused Pallas attention kernel (safe here — the
    hoisted pass is forward-only; defaults to on for TPU backends). A
    Mosaic pallas_call cannot be auto-partitioned by GSPMD, so on a
    multi-device ``mesh`` the whole extractor is wrapped in a
    ``shard_map`` over the 'data' axis: the batch dimension of the
    hoisted pass is embarrassingly parallel, so each shard runs the
    fused kernel on its local slice (params replicated, per-shard
    dropout streams folded from the data-axis index). Exception: a
    tensor-parallel mesh ('model' axis > 1) shards the BERT kernels
    themselves (parallel/mesh.py TP_RULES), which the data-axis-only
    kernel can't express — TP runs fall back to the XLA attention path.

    ``flash_interpret`` runs the kernel through the TPU interpreter
    (CPU tests of the sharded flash path)."""
    import jax

    bert_cfg = cfg.encoder_bert_config()
    if flash is None:
        # Default on for TPU, but only when partitioning is accounted
        # for: with no mesh given a caller may still jit over a
        # multi-device mesh, where an unwrapped Mosaic pallas_call
        # cannot be auto-partitioned by GSPMD — require single-device
        # in that case (pass mesh= to get the shard_map wrapper).
        flash = jax.default_backend() == "tpu" and (
            mesh is not None or len(jax.devices()) == 1)
    tp = (mesh is not None and "model" in mesh.axis_names
          and mesh.shape["model"] > 1)
    if tp:
        flash = False
    if flash:
        bert_cfg = dataclasses.replace(bert_cfg, flash_attention=True,
                                       flash_interpret=flash_interpret)
    enc = TextEncoder(bert_cfg, dtype=dtype)

    def fn(text_encoder_params, text_ids, text_mask, deterministic=True, rngs=None):
        return enc.apply({"params": text_encoder_params}, text_ids, text_mask,
                         deterministic, rngs=rngs)

    if flash and mesh is not None and mesh.shape.get("data", 1) > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def sharded_fn(text_encoder_params, text_ids, text_mask,
                       deterministic=True, rngs=None):
            det = bool(deterministic)
            key = (rngs["dropout"] if isinstance(rngs, dict) and "dropout" in rngs
                   else jax.random.PRNGKey(0))

            def inner(params, ids, mask, k):
                if det:
                    local_rngs = None
                else:
                    local_rngs = {"dropout": jax.random.fold_in(
                        k, jax.lax.axis_index("data"))}
                return fn(params, ids, mask, det, rngs=local_rngs)

            return shard_map(
                inner, mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P()),
                out_specs=P("data"), check_vma=False,
            )(text_encoder_params, text_ids, text_mask, key)

        return sharded_fn
    return fn


class Generator(nn.Module):
    """z + labels + texts + background -> bboxes (+ reconstruction heads)."""

    cfg: GeneratorConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, bbox_class, bbox_real, text_ids, text_mask, text_len,
                 padding_mask, background, reconst=False, deterministic=True,
                 text_feat=None):
        """
        z: [B, N, z_dim] noise; bbox_class: [B, N] int; bbox_real: [B, N, 4]
        (unused in the forward path, parity with reference signature);
        text_ids/text_mask: [B, N, T]; text_len: [B, N] int (character
        lengths, clipped to text_len_table-1 — the reference indexes its
        table with the RAW unclipped len(t), networks_detr.py:149, which
        is OOB for >= table-size strings; clipping is a deliberate
        safety deviation); padding_mask: [B, N] bool
        True = padded; background: [B, S, S, 3] ImageNet-normalized.

        text_feat: optional precomputed [B, N, bert_f_dim] text CLS
        features. The text encoder is FROZEN in training (reference
        training_loop.py:282-283), so the train step hoists this pass
        out of the G/D phase graphs and computes it once per batch —
        dropping 3 of the 5 per-step BERT-encoder executions, the
        dominant FLOPs at max_text_length=256. When None the encoder
        runs inline (init, eval, standalone use).
        """
        cfg = self.cfg
        del bbox_real
        b, n = bbox_class.shape

        # --- Background features (networks_detr.py:136-138, 154) ---
        bg_feat = _image_backbone(cfg, self.dtype)(background)
        pos = PositionEmbeddingSine(num_pos_feats=cfg.hidden_dim // 2, name="pos_embed")(bg_feat)
        bg_proj = Dense(cfg.hidden_dim, dtype=self.dtype, name="input_proj")(bg_feat)

        # --- Element queries (networks_detr.py:140-152) ---
        z0 = normalize_2nd_moment(z.reshape(b, -1).astype(jnp.float32))  # [B, N*z_dim]
        zf = Dense(cfg.bert_f_dim, dtype=self.dtype, name="fc_z")(z0)
        zf = jnp.broadcast_to(zf[:, None, :], (b, n, cfg.bert_f_dim))

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

        x = jnp.concatenate([zf, lf, text_feat, tlf], axis=-1)
        x = nn.relu(MLP(cfg.bert_f_dim, cfg.hidden_dim, 3, dtype=self.dtype, name="fc_in")(x))

        # --- DETR transformer + bbox head (networks_detr.py:154-155) ---
        hs, _ = Transformer(
            d_model=cfg.hidden_dim, nhead=cfg.nhead,
            num_encoder_layers=cfg.num_encoder_layers,
            num_decoder_layers=cfg.num_decoder_layers,
            dim_feedforward=cfg.dim_feedforward, dropout=cfg.dropout,
            dtype=self.dtype, name="transformer",
        )(bg_proj, None, pos, x, padding_mask, deterministic=deterministic)
        bbox_fake = nn.sigmoid(
            MLP(cfg.hidden_dim, 4, 3, dtype=self.dtype, name="bbox_embed")(hs).astype(jnp.float32)
        )

        if not reconst:
            return bbox_fake

        valid = ~padding_mask

        # --- Reconstruction heads (networks_detr.py:160-187) ---
        z_rec = Dense(cfg.z_dim * cfg.max_elements, dtype=self.dtype, name="fc_z_rec")(hs)
        z_tgt = jnp.broadcast_to(z0[:, None, :], z_rec.shape)
        loss_z = masked_mse(z_rec.astype(jnp.float32), z_tgt, valid)

        logit_cls = Dense(cfg.num_bbox_labels, dtype=self.dtype, name="fc_out_cls")(hs)

        # Text decoder: mode='text' skips cross-attention, making this an
        # unconditional LM loss — the reference's (preserved) quirk
        # (networks_detr.py:180, med.py:361). Pass mode='multimodal' to
        # actually condition on the per-element feature.
        t = text_ids.shape[-1]
        dec_ids = jnp.asarray(text_ids).at[:, :, 0].set(cfg.bos_token_id).reshape(b * n, t)
        dec_targets = jnp.where(dec_ids == cfg.pad_token_id, -100, dec_ids)
        enc_states = hs.reshape(b * n, 1, cfg.hidden_dim)
        _, loss_lm = BertLMHeadModel(cfg.decoder_bert_config(), dtype=self.dtype, name="text_decoder")(
            dec_ids, text_mask.reshape(b * n, t),
            encoder_hidden_states=enc_states,
            encoder_attention_mask=jnp.ones((b * n, 1), jnp.int32),
            labels=dec_targets, row_mask=valid.reshape(b * n),
            mode="text", deterministic=deterministic,
        )

        text_len_rec = Dense(cfg.text_len_table, dtype=self.dtype, name="fc_text_len_rec")(hs)
        loss_text_len = masked_cross_entropy(
            text_len_rec, jnp.clip(text_len, 0, cfg.text_len_table - 1), valid
        )

        return bbox_fake, loss_z, logit_cls, loss_lm, loss_text_len
