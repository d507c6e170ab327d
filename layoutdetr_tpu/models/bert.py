"""BERT encoder / causal-LM decoder with optional cross-attention (MED).

Parity target: training/med.py — the BLIP "MED" BERT variant used as
the text encoder (12-layer, mode='text') and text decoder
(BertLMHeadModel with label-smoothed shifted LM loss, med.py:905-920)
in both Generator and Discriminator (networks_detr.py:87-131, 212-257).

Faithfully reproduced behaviors:
- embeddings = word + absolute position, LayerNorm eps 1e-12, no
  token-type embeddings (med.py:55-97);
- additive attention masks with the HF constant -10000.0
  (med.py:612-671), causal for the decoder;
- cross-attention K/V projections sized by ``encoder_width`` and only
  *executed* in mode='multimodal' (med.py:361) — in mode='text' the
  cross-attention is skipped, which makes the reference's text
  "reconstruction" an unconditional LM (SURVEY.md §2.5 quirk, preserved
  behind ``mode``);
- LM loss: shift-by-one, CrossEntropy with label_smoothing=0.1,
  ignore_index=-100 (med.py:912-918) — implemented as a masked mean
  over static shapes.

TPU-first: batch-first, fused QKV for self-attention, fp32 softmax/LN,
bf16 matmuls via ``dtype``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from layoutdetr_tpu.models.layers import Dense, LayerNorm, bert_normal

NEG_MASK = -10000.0
IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """Mirror of configs/med_config.json fields the models consume."""

    vocab_size: int = 30524  # 30522 + [DEC] + [ENC] (networks_detr.py:93)
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    pad_token_id: int = 0
    encoder_width: int = 768
    add_cross_attention: bool = True
    # Fused Pallas attention (ops/attention.py) for self-attention with a
    # key-only mask. FORWARD-ONLY: enable it where gradients never flow
    # (the frozen hoisted text encoders, inference). flash_interpret runs
    # the kernel through the TPU interpreter (CPU tests).
    flash_attention: bool = False
    flash_interpret: bool = False
    # Rematerialize each BertLayer under autodiff (jax.checkpoint):
    # layer-internal activations (attention scores, FFN intermediates —
    # the dominant HLO temps at T=256, B*9 sequences) are recomputed in
    # the backward pass instead of living in HBM. Numerically identical;
    # trades ~1 extra forward of FLOPs for O(layers) less live memory.
    remat: bool = False


class BertSelfAttention(nn.Module):
    """Self- or cross-attention (med.py:100-230): separate q/k/v denses.

    K/V input width = ``kv_width`` (``encoder_width`` when cross).
    """

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, kv, attn_bias, deterministic=True):
        cfg = self.config
        h = cfg.num_attention_heads
        d = cfg.hidden_size
        hd = d // h
        q = Dense(d, kernel_init=bert_normal, bias_init=nn.initializers.zeros, dtype=self.dtype, name="query")(hidden)
        k = Dense(d, kernel_init=bert_normal, bias_init=nn.initializers.zeros, dtype=self.dtype, name="key")(kv)
        v = Dense(d, kernel_init=bert_normal, bias_init=nn.initializers.zeros, dtype=self.dtype, name="value")(kv)
        B, Q, _ = q.shape
        K = k.shape[1]
        q = q.reshape(B, Q, h, hd)
        k = k.reshape(B, K, h, hd)
        v = v.reshape(B, K, h, hd)

        # Fused-kernel fast path: self-attention with a key-only padding
        # bias ([B,1,1,K]); logits/probs never touch HBM.
        key_only_bias = (attn_bias is not None and attn_bias.ndim == 4
                         and attn_bias.shape[1] == 1 and attn_bias.shape[2] == 1)
        if cfg.flash_attention and hidden is kv and Q == K and key_only_bias:
            import math

            from layoutdetr_tpu.ops.attention import fused_attention

            rate, seed = 0.0, None
            if not deterministic and cfg.attention_probs_dropout_prob > 0:
                rate = cfg.attention_probs_dropout_prob
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max)
            out = fused_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), attn_bias[:, 0, 0, :].astype(jnp.float32),
                scale=1.0 / math.sqrt(hd), dropout_rate=rate, seed=seed,
                interpret=cfg.flash_interpret,
            )
            return out.transpose(0, 2, 1, 3).reshape(B, Q, d)

        from layoutdetr_tpu.models.layers import einsum_hp

        scores = einsum_hp("bqhd,bkhd->bhqk", q, k, self.dtype) / jnp.sqrt(
            jnp.asarray(hd, jnp.float32)).astype(q.dtype)
        scores = scores.astype(jnp.float32)
        if attn_bias is not None:
            scores = scores + attn_bias
        probs = nn.softmax(scores, axis=-1)
        if not deterministic:
            probs = nn.Dropout(self.config.attention_probs_dropout_prob, deterministic=False)(probs)
        out = einsum_hp("bhqk,bkhd->bqhd", probs.astype(v.dtype), v, self.dtype).reshape(B, Q, d)
        return out


class BertAttention(nn.Module):
    """SelfAttention + output dense + residual LayerNorm (med.py:233-320)."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, kv, attn_bias, deterministic=True):
        ctx = BertSelfAttention(self.config, dtype=self.dtype, name="self")(
            hidden, kv, attn_bias, deterministic
        )
        ctx = Dense(self.config.hidden_size, kernel_init=bert_normal,
                    bias_init=nn.initializers.zeros, dtype=self.dtype, name="output_dense")(ctx)
        if not deterministic:
            ctx = nn.Dropout(self.config.hidden_dropout_prob, deterministic=False)(ctx)
        return LayerNorm(eps=self.config.layer_norm_eps, name="output_layernorm")(hidden + ctx)


class BertLayer(nn.Module):
    """Self-attn -> (cross-attn in multimodal mode) -> FFN (med.py:323-386)."""

    config: BertConfig
    has_cross: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attn_bias, encoder_hidden=None, encoder_bias=None,
                 use_cross=False, deterministic=True):
        hidden = BertAttention(self.config, dtype=self.dtype, name="attention")(
            hidden, hidden, attn_bias, deterministic
        )
        if self.has_cross and use_cross:
            assert encoder_hidden is not None
            hidden = BertAttention(self.config, dtype=self.dtype, name="crossattention")(
                hidden, encoder_hidden, encoder_bias, deterministic
            )
        inter = Dense(self.config.intermediate_size, kernel_init=bert_normal,
                      bias_init=nn.initializers.zeros, dtype=self.dtype, name="intermediate_dense")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = Dense(self.config.hidden_size, kernel_init=bert_normal,
                    bias_init=nn.initializers.zeros, dtype=self.dtype, name="output_dense")(inter)
        if not deterministic:
            out = nn.Dropout(self.config.hidden_dropout_prob, deterministic=False)(out)
        return LayerNorm(eps=self.config.layer_norm_eps, name="output_layernorm")(hidden + out)


class BertEmbeddings(nn.Module):
    """word + position embeddings + LN (med.py:55-97; no token-type)."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, deterministic=True):
        cfg = self.config
        word = self.param("word_embeddings", bert_normal, (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        pos = self.param("position_embeddings", bert_normal,
                         (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32)
        seq = input_ids.shape[-1]
        x = jnp.take(word, input_ids, axis=0) + pos[None, :seq]
        x = LayerNorm(eps=cfg.layer_norm_eps, name="layernorm")(x)
        if not deterministic:
            x = nn.Dropout(cfg.hidden_dropout_prob, deterministic=False)(x)
        return x.astype(self.dtype)


def extended_attention_bias(attention_mask, is_decoder):
    """[B, T] 1=attend mask -> additive [B, 1, (T), T] bias (med.py:612-671)."""
    am = attention_mask.astype(jnp.float32)
    if is_decoder:
        t = am.shape[-1]
        causal = jnp.tril(jnp.ones((t, t), jnp.float32))
        ext = causal[None] * am[:, None, :]  # [B, T, T]
        return (1.0 - ext[:, None]) * NEG_MASK
    return (1.0 - am[:, None, None, :]) * NEG_MASK


class BertModel(nn.Module):
    """Encoder stack; mode='text' skips cross-attention (med.py:574-812)."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, *, encoder_hidden_states=None,
                 encoder_attention_mask=None, is_decoder=False, mode="text",
                 deterministic=True):
        cfg = self.config
        x = BertEmbeddings(cfg, dtype=self.dtype, name="embeddings")(input_ids, deterministic)
        attn_bias = extended_attention_bias(attention_mask, is_decoder)
        enc_bias = None
        if encoder_attention_mask is not None:
            enc_bias = (1.0 - encoder_attention_mask.astype(jnp.float32)[:, None, None, :]) * NEG_MASK
        # nn.remat static_argnums count the module instance as arg 0;
        # use_cross (5) and deterministic (6) are Python bools.
        layer_cls = (nn.remat(BertLayer, static_argnums=(5, 6))
                     if cfg.remat else BertLayer)
        for i in range(cfg.num_hidden_layers):
            x = layer_cls(cfg, has_cross=cfg.add_cross_attention, dtype=self.dtype, name=f"layer_{i}")(
                x, attn_bias, encoder_hidden_states, enc_bias,
                mode == "multimodal", deterministic,
            )
        return x


class BertLMHead(nn.Module):
    """MLM transform + vocab projection (HF BertOnlyMLMHead structure)."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = Dense(cfg.hidden_size, kernel_init=bert_normal,
                  bias_init=nn.initializers.zeros, dtype=self.dtype, name="transform_dense")(x)
        x = nn.gelu(x, approximate=False)
        x = LayerNorm(eps=cfg.layer_norm_eps, name="transform_layernorm")(x)
        return Dense(cfg.vocab_size, kernel_init=bert_normal,
                     bias_init=nn.initializers.zeros, dtype=self.dtype, name="decoder")(x)


def lm_loss_label_smoothed(logits, labels, row_mask=None, label_smoothing=0.1):
    """Shifted next-token CE with label smoothing and ignore_index=-100.

    Parity: med.py:912-918 (torch CrossEntropyLoss(label_smoothing=0.1)
    over gathered valid rows). ``row_mask`` [B] masks whole sequences
    (padded layout elements); the mean is over non-ignored tokens of
    valid rows — exactly what the reference's gather + mean computes.
    """
    logits = logits[:, :-1].astype(jnp.float32)
    labels = labels[:, 1:]
    valid_tok = labels != IGNORE_INDEX
    if row_mask is not None:
        valid_tok = valid_tok & row_mask[:, None]
    safe_labels = jnp.where(valid_tok, labels, 0)

    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    smooth = -logp.mean(axis=-1)
    eps = label_smoothing
    per_tok = (1.0 - eps) * nll + eps * smooth
    m = valid_tok.astype(per_tok.dtype)
    return jnp.sum(per_tok * m) / jnp.maximum(m.sum(), 1.0)


class BertLMHeadModel(nn.Module):
    """Causal decoder + LM head (med.py:814-957)."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, *, encoder_hidden_states=None,
                 encoder_attention_mask=None, labels=None, row_mask=None,
                 mode="text", deterministic=True):
        hidden = BertModel(self.config, dtype=self.dtype, name="bert")(
            input_ids, attention_mask,
            encoder_hidden_states=encoder_hidden_states,
            encoder_attention_mask=encoder_attention_mask,
            is_decoder=True, mode=mode, deterministic=deterministic,
        )
        logits = BertLMHead(self.config, dtype=self.dtype, name="cls")(hidden)
        if labels is None:
            return logits
        return logits, lm_loss_label_smoothed(logits, labels, row_mask)
