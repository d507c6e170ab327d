"""Shared flax building blocks: initializers, MLP, multi-head attention.

These are the substrate under every model in the framework (DETR
transformer, BERT/MED, discriminator decoders, LayoutNet). Design is
TPU-first:

- batch-first ``[B, S, D]`` everywhere (the reference uses torch's
  seq-first ``[S, B, D]``, an artifact of nn.MultiheadAttention);
- attention Q/K/V packed into one ``[D, 3D]`` matmul so the MXU sees
  few large contractions instead of many small ones;
- softmax and layer norms computed in float32 regardless of the
  activation dtype (bf16-safe);
- masks are additive float biases built once per forward, never
  boolean gathers (static shapes under jit).

Reference behavior being reproduced: torch nn.MultiheadAttention with
``key_padding_mask`` + optional additive ``attn_mask``
(used throughout training/detr_transformer.py and training/med.py).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Initializers (parity with the torch modules being rebuilt)
# ---------------------------------------------------------------------------

def torch_linear_init(in_features):
    """torch nn.Linear default: U(-1/sqrt(in), 1/sqrt(in)) for weight and bias."""
    bound = 1.0 / math.sqrt(in_features)

    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


xavier_uniform = nn.initializers.xavier_uniform()
bert_normal = nn.initializers.normal(stddev=0.02)


def _prec(dtype):
    """Full precision for fp32 operands; None (fast MXU path) for bf16.

    JAX's default matmul precision rounds fp32 operands toward bf16 on
    MXU-class backends; this framework's contract is that fp32 means
    fp32 and the bf16 speed path is chosen explicitly via module dtype.
    """
    from jax import lax

    return lax.Precision.HIGHEST if dtype == jnp.float32 else None


def dot_hp(x, w, dtype):
    return jnp.dot(x, w, precision=_prec(dtype))


def einsum_hp(spec, a, b, dtype):
    return jnp.einsum(spec, a, b, precision=_prec(dtype))


class Dense(nn.Module):
    """nn.Dense with torch nn.Linear default init and fp32 params."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kinit = self.kernel_init or torch_linear_init(in_features)
        binit = self.bias_init or torch_linear_init(in_features)
        kernel = self.param("kernel", kinit, (in_features, self.features), jnp.float32)
        y = dot_hp(x.astype(self.dtype), kernel.astype(self.dtype), self.dtype)
        if self.use_bias:
            bias = self.param("bias", binit, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class MLP(nn.Module):
    """ReLU MLP head (reference: training/networks_detr.py:50-62)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = Dense(self.output_dim if last else self.hidden_dim, dtype=self.dtype, name=f"layers_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x


class LayerNorm(nn.Module):
    """fp32 LayerNorm over the trailing axis (torch nn.LayerNorm parity)."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        y = (x - mean) / jnp.sqrt(var + self.eps) * scale + bias
        return y.astype(orig_dtype)


def padding_bias(key_padding_mask, dtype=jnp.float32, neg=-jnp.inf):
    """[B, S] bool (True = padded) -> [B, 1, 1, S] additive bias."""
    if key_padding_mask is None:
        return None
    return jnp.where(key_padding_mask[:, None, None, :], neg, 0.0).astype(dtype)


class MultiHeadAttention(nn.Module):
    """Multi-head attention, batch-first, packed QKV when self-attending.

    Matches torch nn.MultiheadAttention math: shared ``in_proj`` for
    q/k/v (a single [D, 3D] parameter when q is k is v), scaled dot
    product with additive bias, output projection. Softmax runs in
    fp32; matmuls run in ``dtype``.
    """

    num_heads: int
    dropout: float = 0.0
    kernel_init: Callable = xavier_uniform
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k=None, v=None, *, attn_bias=None, deterministic=True):
        """q: [B, Q, D]; k/v: [B, K, D] (None = self-attention).

        attn_bias: additive float bias broadcastable to [B, H, Q, K]
        (build with ``padding_bias`` / causal helpers).
        """
        if k is None:
            k = q
        if v is None:
            v = k
        d_model = q.shape[-1]
        assert d_model % self.num_heads == 0
        head_dim = d_model // self.num_heads

        # torch nn.MultiheadAttention parameter layout: one packed
        # in_proj [D, 3D] whose thirds project q, k, v respectively —
        # regardless of whether the inputs coincide. When q/k/v are the
        # same array (pure self-attention) a single fused matmul feeds
        # the MXU; otherwise each input hits its slice.
        w = self.param("in_proj_kernel", self.kernel_init, (d_model, 3 * d_model), jnp.float32)
        bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d_model,), jnp.float32)
        w = w.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if k is q and v is q:
            qkv = dot_hp(q.astype(self.dtype), w, self.dtype) + bias
            qh, kh, vh = jnp.split(qkv, 3, axis=-1)
        else:
            wq, wk, wv = jnp.split(w, 3, axis=-1)
            bq, bk, bv = jnp.split(bias, 3)
            qh = dot_hp(q.astype(self.dtype), wq, self.dtype) + bq
            kh = dot_hp(k.astype(self.dtype), wk, self.dtype) + bk
            vh = dot_hp(v.astype(self.dtype), wv, self.dtype) + bv

        B, Q, _ = qh.shape
        K = kh.shape[1]
        qh = qh.reshape(B, Q, self.num_heads, head_dim)
        kh = kh.reshape(B, K, self.num_heads, head_dim)
        vh = vh.reshape(B, K, self.num_heads, head_dim)

        scores = einsum_hp("bqhd,bkhd->bhqk", qh, kh, self.dtype) / math.sqrt(head_dim)
        scores = scores.astype(jnp.float32)
        if attn_bias is not None:
            scores = scores + attn_bias
        probs = nn.softmax(scores, axis=-1)
        # Fully-masked rows produce NaN (softmax over all -inf); zero them,
        # matching torch's behavior of such rows being unused downstream.
        probs = jnp.nan_to_num(probs)
        if self.dropout > 0.0 and not deterministic:
            probs = nn.Dropout(rate=self.dropout, deterministic=False)(probs)
        probs = probs.astype(self.dtype)

        out = einsum_hp("bhqk,bkhd->bqhd", probs, vh, self.dtype).reshape(B, Q, d_model)
        wo = self.param("out_kernel", self.kernel_init, (d_model, d_model), jnp.float32)
        bo = self.param("out_bias", nn.initializers.zeros, (d_model,), jnp.float32)
        return dot_hp(out, wo.astype(self.dtype), self.dtype) + bo.astype(self.dtype)
