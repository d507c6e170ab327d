"""GAN loss terms for LayoutDETR training, as pure jax functions.

Parity target: training/loss.py:28-218 (StyleGAN2Loss) — same terms,
same default weights, same softplus adversarial objectives; rewritten
as pure functions over (apply_fn, params, batch, rng) so each phase
jits into a single XLA program with ``jax.grad`` around it (the
reference accumulates .backward() calls per phase).

Masking convention: batch['mask'] is True for *valid* elements (the
loss functions here take care of inverting to the reference's
padding_mask semantics at the model boundary).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from layoutdetr_tpu.metrics.layout_metrics import (
    compute_alignment,
    compute_overlap,
    generalized_iou_loss,
    masked_cross_entropy,
    masked_mse,
)


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Defaults mirror training/loss.py:30-32 (as resolved by train.py:262-275)."""

    Dreal_bbox_cls_weight: float = 50.0
    Dreal_bbox_rec_weight: float = 500.0
    Dreal_text_rec_weight: float = 0.1
    Dreal_text_len_rec_weight: float = 2.0
    Dreal_im_rec_weight: float = 0.5
    Ggen_bbox_rec_weight: float = 100.0
    Ggen_bbox_gIoU_weight: float = 4.0
    Ggen_overlapping_weight: float = 7.0
    Ggen_alignment_weight: float = 17.0
    Ggen_z_rec_weight: float = 5.0
    Ggen_bbox_cls_weight: float = 50.0
    Ggen_text_rec_weight: float = 1.0
    Ggen_text_len_rec_weight: float = 1.0
    pl_weight: float = 0.0
    r1_gamma: float = 0.0


def _model_inputs(batch: Dict[str, Any], text_feat_key: str = None) -> Dict[str, Any]:
    """Model kwargs from a batch. ``text_feat_key`` ("text_feat_g" /
    "text_feat_d") selects the hoisted frozen-text-encoder features the
    train step may have precomputed (see make_train_step)."""
    out = dict(
        bbox_class=batch["labels"],
        text_ids=batch["text_ids"],
        text_mask=batch["text_mask"],
        text_len=batch["text_len"],
        padding_mask=~batch["mask"],
        background=batch["background"],
    )
    if text_feat_key is not None and text_feat_key in batch:
        out["text_feat"] = batch[text_feat_key]
    return out


def _fold_rngs(rngs, i: int):
    """Derive an independent rng dict for one forward pass.

    The reference's separate forwards each draw fresh dropout masks;
    handing the SAME rngs dict to two applies of the same module makes
    their masks identical (an unintended shared-mask regularizer), so
    every distinct forward inside a phase folds its own stream.
    """
    if not isinstance(rngs, dict):
        return rngs
    return {k: jax.random.fold_in(v, i) for k, v in rngs.items()}


def _augmented(inputs: Dict[str, Any], batch: Dict[str, Any], rngs,
               aug_cfg=None) -> Dict[str, Any]:
    """ADA-augment the background fed to the discriminator.

    The reference constructed an AugmentPipe but never applied it
    (SURVEY.md §2.10 dead hook); here 'aug_p' in the batch (set by the
    host ADA controller) activates the on-device pipeline for D inputs.
    ``aug_cfg`` defaults to the conditional-critic-safe group set
    (color/imgfilter/noise/cutout — geometric warps would desynchronize
    the bbox inputs from the background; see augment.CONDITIONAL_SAFE).
    """
    if "aug_p" not in batch or not isinstance(rngs, dict):
        return inputs
    from layoutdetr_tpu.training.augment import CONDITIONAL_SAFE, augment_pipe

    out = dict(inputs)
    out["background"] = augment_pipe(
        inputs["background"], batch["aug_p"],
        rngs.get("aug", jax.random.PRNGKey(0)),
        cfg=aug_cfg if aug_cfg is not None else CONDITIONAL_SAFE)
    return out


def g_main_loss(g_apply: Callable, d_apply: Callable, params_g, params_d,
                batch: Dict[str, Any], z, rngs, w: LossWeights,
                deterministic: bool = False, aug_cfg=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Gmain phase (loss.py:84-116): adversarial + reconstruction terms."""
    inputs = _model_inputs(batch, "text_feat_g")
    valid = batch["mask"]
    rngs_g = _fold_rngs(rngs, 0)
    rngs_d = _fold_rngs(rngs, 1)

    bbox_fake, loss_z, logit_cls, loss_lm, loss_text_len = g_apply(
        params_g, z=z, bbox_real=batch["bboxes"], reconst=True,
        deterministic=deterministic, rngs=rngs_g, **inputs,
    )
    # D params are constants in this phase (grad is taken wrt params_g only).
    d_base = _model_inputs(batch, "text_feat_d")
    d_inputs = _augmented(d_base, batch, rngs_d, aug_cfg)
    gen_logits, gen_logits_uncond = d_apply(
        params_d, bbox=bbox_fake, deterministic=deterministic, rngs=rngs_d, **d_inputs,
    )

    loss_Ggen = jax.nn.softplus(-gen_logits).mean()
    loss_Ggen_uncond = jax.nn.softplus(-gen_logits_uncond).mean()
    loss_bbox_rec = masked_mse(bbox_fake, batch["bboxes"], valid) * w.Ggen_bbox_rec_weight
    loss_giou = generalized_iou_loss(bbox_fake, batch["bboxes"], valid) * w.Ggen_bbox_gIoU_weight
    loss_overlap = compute_overlap(bbox_fake, valid).mean() * w.Ggen_overlapping_weight
    loss_align = compute_alignment(bbox_fake, valid).mean() * w.Ggen_alignment_weight
    loss_z_rec = loss_z * w.Ggen_z_rec_weight
    loss_cls = masked_cross_entropy(logit_cls, batch["labels"], valid) * w.Ggen_bbox_cls_weight
    loss_text = loss_lm * w.Ggen_text_rec_weight
    loss_tlen = loss_text_len * w.Ggen_text_len_rec_weight

    total = (loss_Ggen + loss_Ggen_uncond + loss_bbox_rec + loss_giou + loss_overlap
             + loss_align + loss_z_rec + loss_cls + loss_text + loss_tlen)
    stats = {
        "Loss/scores/fake": gen_logits.mean(),
        "Loss/signs/fake": jnp.sign(gen_logits).mean(),
        "Loss/G/loss_Ggen": loss_Ggen,
        "Loss/G/loss_Ggen_uncond": loss_Ggen_uncond,
        "Loss/G/loss_Ggen_bbox_rec": loss_bbox_rec,
        "Loss/G/loss_Ggen_bbox_gIoU": loss_giou,
        "Loss/G/loss_Ggen_overlapping": loss_overlap,
        "Loss/G/loss_Ggen_alignment": loss_align,
        "Loss/G/loss_Ggen_z_rec": loss_z_rec,
        "Loss/G/loss_Ggen_bbox_cls": loss_cls,
        "Loss/G/loss_Ggen_text_rec": loss_text,
        "Loss/G/loss_Ggen_text_len_rec": loss_tlen,
    }
    return total, stats


def d_main_loss(g_apply: Callable, d_apply: Callable, params_g, params_d,
                batch: Dict[str, Any], z, rngs, w: LossWeights,
                deterministic: bool = False, aug_cfg=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Dmain phase = Dgen (loss.py:146-157) + Dreal (loss.py:161-206)."""
    g_inputs = _model_inputs(batch, "text_feat_g")
    valid = batch["mask"]
    # Independent streams per forward: the reference's fake-pass and
    # real-pass are separate forwards drawing independent dropout masks
    # (loss.py:146-206); sharing one rngs dict across both d_apply calls
    # would make the two passes' masks identical. ADA augmentation draws
    # are likewise independent per D input.
    rngs_g = _fold_rngs(rngs, 0)
    rngs_dfake = _fold_rngs(rngs, 1)
    rngs_dreal = _fold_rngs(rngs, 2)

    # Dgen: fakes from a frozen G.
    bbox_fake = jax.lax.stop_gradient(
        g_apply(params_g, z=z, bbox_real=batch["bboxes"], reconst=False,
                deterministic=deterministic, rngs=rngs_g, **g_inputs)
    )
    d_base = _model_inputs(batch, "text_feat_d")
    d_inputs_fake = _augmented(d_base, batch, rngs_dfake, aug_cfg)
    gen_logits, gen_logits_uncond = d_apply(
        params_d, bbox=bbox_fake, deterministic=deterministic, rngs=rngs_dfake,
        **d_inputs_fake
    )
    loss_Dgen = jax.nn.softplus(gen_logits).mean()
    loss_Dgen_uncond = jax.nn.softplus(gen_logits_uncond).mean()

    # Dreal with reconstruction heads. Note: the bg reconstruction target
    # stays the clean background (augmenting the target would corrupt the
    # reconstruction objective), so only the critic input is augmented.
    d_inputs_real = _augmented(d_base, batch, rngs_dreal, aug_cfg)
    (real_logits, real_logits_uncond, bbox_rec, bbox_cls_logits, loss_lm,
     loss_text_len, bg_rec, bbox_rec_uncond, bbox_cls_logits_uncond) = d_apply(
        params_d, bbox=batch["bboxes"], reconst=True,
        deterministic=deterministic, rngs=rngs_dreal, **d_inputs_real,
    )
    loss_Dreal = jax.nn.softplus(-real_logits).mean()
    loss_Dreal_uncond = jax.nn.softplus(-real_logits_uncond).mean()
    loss_bbox_rec = masked_mse(bbox_rec, batch["bboxes"], valid) * w.Dreal_bbox_rec_weight
    loss_cls = masked_cross_entropy(bbox_cls_logits, batch["labels"], valid) * w.Dreal_bbox_cls_weight
    loss_text = loss_lm * w.Dreal_text_rec_weight
    loss_tlen = loss_text_len * w.Dreal_text_len_rec_weight
    loss_bg = jnp.mean((bg_rec - batch["background"]) ** 2) * w.Dreal_im_rec_weight
    loss_bbox_rec_u = masked_mse(bbox_rec_uncond, batch["bboxes"], valid) * w.Dreal_bbox_rec_weight
    loss_cls_u = masked_cross_entropy(bbox_cls_logits_uncond, batch["labels"], valid) * w.Dreal_bbox_cls_weight

    total = (loss_Dgen + loss_Dgen_uncond + loss_Dreal + loss_Dreal_uncond
             + loss_bbox_rec + loss_cls + loss_text + loss_tlen + loss_bg
             + loss_bbox_rec_u + loss_cls_u)
    stats = {
        "Loss/scores/fake_D": gen_logits.mean(),
        "Loss/scores/real": real_logits.mean(),
        "Loss/signs/real": jnp.sign(real_logits).mean(),
        "Loss/D/loss_Dgen": loss_Dgen,
        "Loss/D/loss_Dgen_uncond": loss_Dgen_uncond,
        "Loss/D/loss_Dreal": loss_Dreal,
        "Loss/D/loss_Dreal_uncond": loss_Dreal_uncond,
        "Loss/D/loss_Dreal_bbox_rec": loss_bbox_rec,
        "Loss/D/loss_Dreal_bbox_cls": loss_cls,
        "Loss/D/loss_Dreal_text_rec": loss_text,
        "Loss/D/loss_Dreal_text_len_rec": loss_tlen,
        "Loss/D/loss_Dreal_bg_rec": loss_bg,
        "Loss/D/loss_Dreal_bbox_rec_uncond": loss_bbox_rec_u,
        "Loss/D/loss_Dreal_bbox_cls_uncond": loss_cls_u,
    }
    return total, stats


def g_pl_loss(g_apply: Callable, params_g, batch, z, rngs, w: LossWeights,
              pl_mean, pl_decay: float = 0.01, pl_batch_shrink: int = 2):
    """Gpl path-length regularization on the z->bbox Jacobian (loss.py:119-142).

    Returns (loss, new_pl_mean, stats). Disabled by default
    (pl_weight=0 -> phase skipped, loss.py:77-78).
    """
    inputs = _model_inputs(batch)
    shrink = max(z.shape[0] // pl_batch_shrink, 1)
    z_s = z[:shrink]
    inputs_s = jax.tree.map(lambda t: t[:shrink], inputs)
    bbox_real_s = batch["bboxes"][:shrink]

    def g_fn(zz):
        return g_apply(params_g, z=zz, bbox_real=bbox_real_s, reconst=False,
                       deterministic=True, **inputs_s)

    bbox_fake, pullback = jax.vjp(g_fn, z_s)
    noise_rng = rngs["pl_noise"] if isinstance(rngs, dict) and "pl_noise" in rngs else jax.random.PRNGKey(0)
    pl_noise = jax.random.normal(noise_rng, bbox_fake.shape) / bbox_fake.shape[2]
    (pl_grads,) = pullback(pl_noise)
    pl_lengths = jnp.sqrt(jnp.square(pl_grads).sum(axis=(1, 2)))
    new_pl_mean = pl_mean + pl_decay * (pl_lengths.mean() - pl_mean)
    pl_penalty = jnp.square(pl_lengths - new_pl_mean)
    loss = (pl_penalty * w.pl_weight).mean()
    return loss, jax.lax.stop_gradient(new_pl_mean), {"Loss/pl_penalty": pl_penalty.mean(), "Loss/G/reg": loss}


def d_r1_loss(d_apply: Callable, params_d, batch, rngs, w: LossWeights):
    """Dr1 gradient penalty on the bbox input (loss.py:209-215).

    Disabled by default (r1_gamma=0).
    """
    inputs = _model_inputs(batch)

    def d_fn(bbox):
        logits, _ = d_apply(params_d, bbox=bbox, deterministic=True, **inputs)
        return logits.sum()

    r1_grads = jax.grad(d_fn)(batch["bboxes"])
    r1_penalty = jnp.square(r1_grads).sum(axis=(1, 2))
    loss = (r1_penalty * (w.r1_gamma / 2)).mean()
    return loss, {"Loss/r1_penalty": r1_penalty.mean(), "Loss/D/reg": loss}
