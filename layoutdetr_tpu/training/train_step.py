"""Jitted GAN training steps: Gmain + Dmain + EMA in one XLA program.

TPU-native reshaping of the reference's phase machinery
(training_loop.py:274-332): instead of per-phase Python loops with
``requires_grad_`` toggling, grad-accum microbatches, a flattened
cross-rank all_reduce, and a separate EMA pass, the whole iteration —
G gradient/update, D gradient/update, EMA lerp — is one jitted function
over a sharded batch. Data parallelism is implicit: params/opt-state are
replicated, the batch is 'data'-sharded, and XLA emits the psum for
gradients (replacing training_loop.py:305-312). The reference's
per-grad ``nan_to_num`` sanitization is reproduced on the gradient
pytrees.

Lazy-regularization phases (Gpl/Greg, Dr1/Dreg) are separate jitted
steps invoked on their intervals by the host loop — off by default
(pl_weight=0, r1_gamma=0), matching loss.py:77-80.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from layoutdetr_tpu.training.loss import (
    LossWeights,
    d_main_loss,
    d_r1_loss,
    g_main_loss,
    g_pl_loss,
)


@flax.struct.dataclass
class GANTrainState:
    params_g: Any
    params_d: Any
    params_gema: Any
    opt_state_g: Any
    opt_state_d: Any
    pl_mean: jnp.ndarray
    step: jnp.ndarray

    @classmethod
    def create(cls, params_g, params_d, tx_g, tx_d):
        return cls(
            params_g=params_g,
            params_d=params_d,
            params_gema=jax.tree.map(jnp.copy, params_g),
            opt_state_g=tx_g.init(params_g),
            opt_state_d=tx_d.init(params_d),
            pl_mean=jnp.zeros(()),
            step=jnp.zeros((), jnp.int32),
        )


def _sanitize(grads):
    """nan_to_num on every grad leaf (training_loop.py:309 parity)."""
    return jax.tree.map(lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), grads)


def ema_beta(batch_size: int, ema_kimg: float, cur_nimg, ema_rampup: Optional[float] = 0.05):
    """EMA half-life schedule (training_loop.py:320-324)."""
    ema_nimg = ema_kimg * 1000.0
    if ema_rampup is not None:
        ema_nimg = jnp.minimum(ema_nimg, cur_nimg * ema_rampup)
    return 0.5 ** (batch_size / jnp.maximum(ema_nimg, 1e-8))


def _accum_phase(loss_fn: Callable, params, batch: Dict[str, Any], rng: jax.Array,
                 grad_accum: int, make_rngs: Callable):
    """Grad-accumulate a phase over ``grad_accum`` microbatches via lax.scan.

    The reference iterates batch_gpu-sized chunks accumulating
    .backward() (training_loop.py:285-298); here the microbatch loop is
    a scan inside the jitted step, so remat/accumulation is fused and
    grads are averaged once. grad_accum=1 short-circuits to a single
    value_and_grad.
    """
    if grad_accum == 1:
        rng_z, rng_m = jax.random.split(rng)
        (_, stats), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng_z, make_rngs(rng_m)), has_aux=True
        )(params)
        return grads, stats

    def split_mb(x):
        return x.reshape((grad_accum, x.shape[0] // grad_accum) + x.shape[1:])

    mbs = {k: split_mb(v) if hasattr(v, "ndim") and v.ndim > 0 else v
           for k, v in batch.items()}
    scalars = {k: v for k, v in batch.items() if not (hasattr(v, "ndim") and v.ndim > 0)}
    arrays = {k: v for k, v in mbs.items() if k not in scalars}
    rngs = jax.random.split(rng, grad_accum)

    def body(acc, xs):
        mb_arrays, step_rng = xs
        mb = dict(mb_arrays, **scalars)
        rng_z, rng_m = jax.random.split(step_rng)
        (_, stats), grads = jax.value_and_grad(
            lambda p: loss_fn(p, mb, rng_z, make_rngs(rng_m)), has_aux=True
        )(params)
        return jax.tree.map(jnp.add, acc, grads), stats

    zero = jax.tree.map(jnp.zeros_like, params)
    total, stats_seq = jax.lax.scan(body, zero, (arrays, rngs))
    grads = jax.tree.map(lambda g: g / grad_accum, total)
    stats = jax.tree.map(lambda s: s.mean(), stats_seq)
    return grads, stats


def make_train_step(
    g_apply: Callable,
    d_apply: Callable,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    weights: LossWeights = LossWeights(),
    batch_size: int = 16,
    ema_kimg: Optional[float] = None,
    ema_rampup: Optional[float] = 0.05,
    z_dim: int = 4,
    max_elements: int = 9,
    deterministic: bool = False,
    grad_accum: int = 1,
    text_feature_fn: Optional[Callable] = None,
    share_text_encoder: bool = False,
    aug_cfg: Any = None,
    ema_freeze_labels: Any = None,
):
    """Returns step(state, batch, rng) -> (state, stats): Gmain+Dmain+EMA.

    ``grad_accum`` > 1 microbatches each phase (the reference's
    batch_gpu); the per-device batch must be divisible by it.

    ``text_feature_fn`` (models.generator.make_text_feature_fn) hoists
    the FROZEN text encoders out of the phase graphs: without it each
    step executes 5 full BERT-encoder passes (G in Gmain, D in Gmain, G
    in Dmain, D on fake, D on real) over identical 9x256-token inputs;
    with it, one pass per model — or a single shared pass when
    ``share_text_encoder`` (default: the two frozen encoders hold
    identical pretrained weights for the whole run). The
    only semantic difference is that encoder dropout is drawn once per
    step instead of per phase — the encoders are frozen, so this affects
    no gradients.

    ``ema_freeze_labels`` (optimizers.freeze_mask over params_g) skips
    the EMA lerp on frozen subtrees. For frozen leaves the lerp is the
    identity — the optimizer masks their updates, so ``p`` never moves
    and ``e`` started equal to ``p`` — but XLA cannot know that and
    sweeps them through HBM every step (the ~110M-param frozen BERT at
    fp32 is ~1.3 GB/step of read+write). Passing the donated ``e``
    buffer through unchanged makes the no-op free. Profiled as part of
    the leading Adam/EMA HBM-sweep cost (docs/BENCH_NOTES.md).
    """
    if ema_kimg is None:
        ema_kimg = batch_size * 10 / 32  # train.py:249

    def step(state: GANTrainState, batch: Dict[str, Any], rng: jax.Array):
        rng_g, rng_d = jax.random.split(rng)

        def make_rngs(key):
            k1, k2, k3 = jax.random.split(key, 3)
            return {"dropout": k1, "noise": k2, "aug": k3}

        if text_feature_fn is not None:
            rng_g, rng_tg = jax.random.split(rng_g)
            rng_d, rng_td = jax.random.split(rng_d)
            tf_g = text_feature_fn(
                state.params_g["params"]["text_encoder"],
                batch["text_ids"], batch["text_mask"], deterministic,
                rngs={"dropout": rng_tg})
            if share_text_encoder:
                # G's and D's text encoders are frozen at the SAME
                # pretrained weights for the whole run (reference
                # training_loop.py:282-283 + identical bert-base init;
                # the 2 resize-added token rows never appear in encoder
                # inputs), so one pass serves both models.
                tf_d = tf_g
            else:
                tf_d = text_feature_fn(
                    state.params_d["params"]["text_encoder"],
                    batch["text_ids"], batch["text_mask"], deterministic,
                    rngs={"dropout": rng_td})
            batch = dict(batch,
                         text_feat_g=jax.lax.stop_gradient(tf_g),
                         text_feat_d=jax.lax.stop_gradient(tf_d))

        def sample_z(key, mb):
            return jax.random.normal(key, (mb["labels"].shape[0], max_elements, z_dim))

        # --- Gmain ---
        def g_loss(p, mb, rng_z, rngs):
            return g_main_loss(g_apply, d_apply, p, state.params_d, mb,
                               sample_z(rng_z, mb), rngs, weights, deterministic,
                               aug_cfg)

        g_grads, g_stats = _accum_phase(g_loss, state.params_g, batch, rng_g,
                                        grad_accum, make_rngs)
        g_grads = _sanitize(g_grads)
        g_updates, opt_state_g = tx_g.update(g_grads, state.opt_state_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, g_updates)

        # --- Dmain (fresh z, matching the reference's per-phase z split) ---
        def d_loss(p, mb, rng_z, rngs):
            return d_main_loss(g_apply, d_apply, params_g, p, mb,
                               sample_z(rng_z, mb), rngs, weights, deterministic,
                               aug_cfg)

        d_grads, d_stats = _accum_phase(d_loss, state.params_d, batch, rng_d,
                                        grad_accum, make_rngs)
        d_grads = _sanitize(d_grads)
        d_updates, opt_state_d = tx_d.update(d_grads, state.opt_state_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, d_updates)

        # --- EMA (training_loop.py:320-328) ---
        cur_nimg = (state.step.astype(jnp.float32) + 1.0) * batch_size
        beta = ema_beta(batch_size, ema_kimg, cur_nimg, ema_rampup)
        if ema_freeze_labels is not None:
            params_gema = jax.tree.map(
                lambda lbl, e, p: e if lbl == "freeze" else p + (e - p) * beta,
                ema_freeze_labels, state.params_gema, params_g,
            )
        else:
            params_gema = jax.tree.map(
                lambda e, p: p + (e - p) * beta, state.params_gema, params_g
            )

        new_state = state.replace(
            params_g=params_g, params_d=params_d, params_gema=params_gema,
            opt_state_g=opt_state_g, opt_state_d=opt_state_d,
            step=state.step + 1,
        )
        stats = dict(g_stats)
        stats.update(d_stats)
        return new_state, stats

    return step


def make_g_reg_step(g_apply: Callable, tx_g: optax.GradientTransformation,
                    weights: LossWeights, z_dim: int = 4, max_elements: int = 9,
                    gain: float = 4.0):
    """Gpl lazy-regularization step (loss.py:119-142), run every
    G_reg_interval batches with loss scaled by the interval (the
    reference's gain=phase.interval, training_loop.py:298)."""

    def step(state: GANTrainState, batch: Dict[str, Any], rng: jax.Array):
        rng_z, rng_n = jax.random.split(rng)
        b = batch["labels"].shape[0]
        z = jax.random.normal(rng_z, (b, max_elements, z_dim))

        def loss_fn(pg):
            loss, new_pl_mean, stats = g_pl_loss(
                g_apply, pg, batch, z, {"pl_noise": rng_n}, weights, state.pl_mean)
            return loss * gain, (new_pl_mean, stats)

        (_, (new_pl_mean, stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params_g)
        grads = _sanitize(grads)
        updates, opt_state_g = tx_g.update(grads, state.opt_state_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates)
        return state.replace(params_g=params_g, opt_state_g=opt_state_g,
                             pl_mean=new_pl_mean), stats

    return step


def make_d_reg_step(d_apply: Callable, tx_d: optax.GradientTransformation,
                    weights: LossWeights, gain: float = 16.0):
    """Dr1 lazy-regularization step (loss.py:209-215)."""

    def step(state: GANTrainState, batch: Dict[str, Any], rng: jax.Array):
        del rng

        def loss_fn(pd):
            loss, stats = d_r1_loss(d_apply, pd, batch, None, weights)
            return loss * gain, stats

        (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params_d)
        grads = _sanitize(grads)
        updates, opt_state_d = tx_d.update(grads, state.opt_state_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates)
        return state.replace(params_d=params_d, opt_state_d=opt_state_d), stats

    return step
