"""Fused multi-head attention (Pallas TPU kernel) + jnp reference.

Motivation: the hoisted frozen BERT text encoders dominate the train
step, and their attention materializes [B*N, heads, S, S] probability
tensors in HBM between the two matmuls (~24 GB of traffic per step at
the production workload). This kernel keeps the logits/probs of each
(batch, head) cell entirely in VMEM: q@k^T, bias, softmax, optional
dropout (in-kernel TPU PRNG), p@v — one HBM read of q/k/v and one write
of the output. At S=256, D=64 a whole cell fits VMEM, so no online
(streaming) softmax is needed.

FORWARD-ONLY by design: used where gradients never flow (the frozen,
hoisted text encoders — reference training_loop.py:282-283 — and
inference). Differentiating through it raises; trainable attention
(DETR, text decoder) keeps the XLA path.

Shipped with a pure-jnp reference (`attention_ref`) and an
``interpret=`` switch so CPU tests exercise the kernel logic exactly
(the reference impl='ref' pattern, SURVEY.md §4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_ref(q, k, v, bias, scale, dropout_rate=0.0, keep_mask=None):
    """jnp reference: q,k,v [B,H,S,D]; bias [B,S] additive (broadcast over
    queries); optional precomputed keep_mask [B,H,S,S] for dropout."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits * scale + bias[:, None, None, :]
    p = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and keep_mask is not None:
        p = jnp.where(keep_mask, p / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


def _attn_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                 scale, dropout_rate):
    q = q_ref[0, 0].astype(jnp.float32)          # [S, D]
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                     # [S, S]
    logits = logits + bias_ref[0, 0][None, :]
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        b = pl.program_id(0)
        h = pl.program_id(1)
        pltpu.prng_seed(seed_ref[0] + b * pl.num_programs(1) + h)
        bits = pltpu.prng_random_bits(p.shape)    # uint32
        threshold = jnp.uint32(dropout_rate * 4294967296.0)
        keep = bits >= threshold
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "dropout_rate", "interpret"))
def fused_attention(q, k, v, bias, *, scale, dropout_rate=0.0, seed=None,
                    interpret=False):
    """q,k,v: [B,H,S,D]; bias: [B,S] additive key mask. Returns [B,H,S,D].

    ``seed``: int32 scalar array for in-kernel dropout (required when
    dropout_rate > 0). Forward-only — see module docstring.
    """
    b, h, s, d = q.shape
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, s, d), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda i, j, *_: (i, j, 0, 0)),
            # [B,1,S]: middle singleton keeps the sublane block dim equal
            # to the array dim (Mosaic tiling rule).
            pl.BlockSpec((1, 1, s), lambda i, j, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, s, d), lambda i, j, *_: (i, j, 0, 0)),
    )
    # On non-TPU backends the HLO interpreter lacks the TPU PRNG
    # primitives; pltpu.InterpretParams emulates full TPU semantics.
    interp = pltpu.InterpretParams() if interpret else False
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, dropout_rate=dropout_rate),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=grid_spec,
        interpret=interp,
    )(seed, q, k, v, bias.astype(jnp.float32)[:, None, :])
