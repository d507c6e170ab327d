"""Optimizer construction with lazy-regularization scaling and freezing.

Parity targets:
- Adam betas (0, 0.99), eps 1e-8, lr 1e-5 for both G and D
  (train.py:161-162, 204-205);
- lazy-regularization lr/beta scaling by mb_ratio = I/(I+1) when a reg
  interval is set (training_loop.py:190-197) — applied even when the
  corresponding regularizer weight is 0, as the reference does;
- frozen subtrees: the BERT text encoder (training_loop.py:282-283) and
  the backbone's conv1/bn1/layer1 (detr_backbone.py:72-74). FrozenBN
  statistics are additionally stop-gradient'ed inside the module.

Freezing is an ``optax.multi_transform`` over a path mask, which also
keeps Adam moment buffers out of memory for frozen params.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import optax

G_FROZEN_SUBSTRINGS: Tuple[str, ...] = (
    "text_encoder",
    "backbone/conv1", "backbone/bn1", "backbone/layer1_",
)
D_FROZEN_SUBSTRINGS: Tuple[str, ...] = G_FROZEN_SUBSTRINGS


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def freeze_mask(params, frozen_substrings: Sequence[str]):
    """Pytree of 'train'/'freeze' labels by param path substring match."""
    def label(path, _):
        p = _path_str(path)
        return "freeze" if any(s in p for s in frozen_substrings) else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    params,
    lr: float = 1e-5,
    betas: Tuple[float, float] = (0.0, 0.99),
    eps: float = 1e-8,
    reg_interval: Optional[int] = None,
    frozen_substrings: Sequence[str] = (),
) -> optax.GradientTransformation:
    if reg_interval is not None:
        mb_ratio = reg_interval / (reg_interval + 1)
        lr = lr * mb_ratio
        betas = tuple(b ** mb_ratio for b in betas)
    adam = optax.adam(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps)
    if not frozen_substrings:
        return adam
    return optax.multi_transform(
        {"train": adam, "freeze": optax.set_to_zero()},
        freeze_mask(params, frozen_substrings),
    )
