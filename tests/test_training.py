"""End-to-end training tests on tiny configs + the multichip dry run."""

import numpy as np
import pytest

import jax

from test_models import TINY, tiny_batch


def _models_and_state():
    from layoutdetr_tpu.models.discriminator import Discriminator
    from layoutdetr_tpu.models.generator import Generator
    from layoutdetr_tpu.training.optimizers import (
        D_FROZEN_SUBSTRINGS,
        G_FROZEN_SUBSTRINGS,
        build_optimizer,
    )
    from layoutdetr_tpu.training.train_step import GANTrainState

    g = Generator(TINY)
    d = Discriminator(TINY)
    b = tiny_batch()
    key = jax.random.PRNGKey(0)
    params_g = g.init({"params": key, "dropout": key, "noise": key}, **b, reconst=True)
    kwargs = {k: v for k, v in b.items() if k not in ("z", "bbox_real")}
    params_d = d.init({"params": key, "dropout": key, "noise": key},
                      bbox=b["bbox_real"], **kwargs, reconst=True)
    tx_g = build_optimizer(params_g, reg_interval=4, frozen_substrings=G_FROZEN_SUBSTRINGS)
    tx_d = build_optimizer(params_d, reg_interval=16, frozen_substrings=D_FROZEN_SUBSTRINGS)
    state = GANTrainState.create(params_g, params_d, tx_g, tx_d)
    return g, d, tx_g, tx_d, state, b


@pytest.mark.slow
def test_train_step_updates_params_and_freezes():
    from layoutdetr_tpu.training.train_step import make_train_step

    g, d, tx_g, tx_d, state, b = _models_and_state()
    batch = dict(
        bboxes=b["bbox_real"], labels=b["bbox_class"], text_ids=b["text_ids"],
        text_mask=b["text_mask"], text_len=b["text_len"],
        mask=~np.asarray(b["padding_mask"]), background=b["background"],
    )
    step = jax.jit(make_train_step(g.apply, d.apply, tx_g, tx_d, batch_size=2,
                                   z_dim=TINY.z_dim, max_elements=TINY.max_elements))
    new_state, stats = step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    for k, v in stats.items():
        assert np.isfinite(float(v)), k

    flat_old = jax.tree_util.tree_flatten_with_path(state.params_g)[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(new_state.params_g)[0])
    changed = frozen_unchanged = 0
    for path, old in flat_old:
        new = flat_new[path]
        pstr = "/".join(str(getattr(k, "key", k)) for k in path)
        if "text_encoder" in pstr:
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
            frozen_unchanged += 1
        elif not np.array_equal(np.asarray(old), np.asarray(new)):
            changed += 1
    assert changed > 0, "trainable params did not update"
    assert frozen_unchanged > 0, "no frozen text_encoder params found"

    # EMA moved toward new params.
    ema_flat = dict(jax.tree_util.tree_flatten_with_path(new_state.params_gema)[0])
    diffs = [np.abs(np.asarray(ema_flat[p]) - np.asarray(flat_new[p])).max()
             for p, _ in flat_old]
    assert max(diffs) >= 0  # EMA tree structurally aligned


@pytest.mark.slow
def test_ema_freeze_labels_is_pure_noop():
    """ema_freeze_labels skips the EMA lerp on frozen subtrees — an HBM
    optimization only: frozen params never move (optimizer mask), so the
    lerp is the identity there. Same seed with and without the labels
    must produce bitwise-identical states."""
    from layoutdetr_tpu.training.optimizers import (G_FROZEN_SUBSTRINGS,
                                                    freeze_mask)
    from layoutdetr_tpu.training.train_step import make_train_step

    g, d, tx_g, tx_d, state0, b = _models_and_state()
    batch = dict(
        bboxes=b["bbox_real"], labels=b["bbox_class"], text_ids=b["text_ids"],
        text_mask=b["text_mask"], text_len=b["text_len"],
        mask=~np.asarray(b["padding_mask"]), background=b["background"],
    )
    common = dict(batch_size=2, z_dim=TINY.z_dim, max_elements=TINY.max_elements)
    labels = freeze_mask(state0.params_g, G_FROZEN_SUBSTRINGS)
    step_skip = jax.jit(make_train_step(g.apply, d.apply, tx_g, tx_d,
                                        ema_freeze_labels=labels, **common))
    step_full = jax.jit(make_train_step(g.apply, d.apply, tx_g, tx_d, **common))

    s_skip = s_full = state0
    for i in range(2):
        s_skip, _ = step_skip(s_skip, batch, jax.random.PRNGKey(7 + i))
        s_full, _ = step_full(s_full, batch, jax.random.PRNGKey(7 + i))
    for a, c in zip(jax.tree.leaves(s_skip.params_gema),
                    jax.tree.leaves(s_full.params_gema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # Frozen EMA leaves still carry the (unchanged) frozen weights.
    flat0 = jax.tree_util.tree_flatten_with_path(state0.params_gema)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(s_skip.params_gema)[0])
    n_frozen = 0
    for path, old in flat0:
        pstr = "/".join(str(getattr(k, "key", k)) for k in path)
        if "text_encoder" in pstr:
            np.testing.assert_array_equal(np.asarray(old), np.asarray(flat1[path]))
            n_frozen += 1
    assert n_frozen > 0


@pytest.mark.slow
def test_grad_accum_matches_deterministic_terms():
    """grad_accum=2 runs and produces finite stats; the data-dependent
    deterministic loss terms (e.g. Dreal on real boxes) match the
    unaccumulated step when dropout/noise are off."""
    from layoutdetr_tpu.training.train_step import make_train_step

    g, d, tx_g, tx_d, state, b = _models_and_state()
    batch = dict(
        bboxes=b["bbox_real"], labels=b["bbox_class"], text_ids=b["text_ids"],
        text_mask=b["text_mask"], text_len=b["text_len"],
        mask=~np.asarray(b["padding_mask"]), background=b["background"],
    )
    step2 = jax.jit(make_train_step(g.apply, d.apply, tx_g, tx_d, batch_size=2,
                                    z_dim=TINY.z_dim, max_elements=TINY.max_elements,
                                    deterministic=True, grad_accum=2))
    s2, stats2 = step2(state, batch, jax.random.PRNGKey(5))
    assert int(s2.step) == 1
    for k, v in stats2.items():
        assert np.isfinite(float(v)), k

    step1 = jax.jit(make_train_step(g.apply, d.apply, tx_g, tx_d, batch_size=2,
                                    z_dim=TINY.z_dim, max_elements=TINY.max_elements,
                                    deterministic=True, grad_accum=1))
    _, stats1 = step1(state, batch, jax.random.PRNGKey(5))
    # Dreal real-logit scores depend only on (params, batch): the
    # microbatched mean must match the full-batch mean.
    np.testing.assert_allclose(float(stats2["Loss/scores/real"]),
                               float(stats1["Loss/scores/real"]), rtol=1e-4)


@pytest.mark.slow
def test_reg_steps_run_and_update():
    """Gpl and Dr1 lazy-regularization steps execute and move params."""
    from layoutdetr_tpu.training.loss import LossWeights
    from layoutdetr_tpu.training.train_step import make_d_reg_step, make_g_reg_step

    g, d, tx_g, tx_d, state, b = _models_and_state()
    batch = dict(
        bboxes=b["bbox_real"], labels=b["bbox_class"], text_ids=b["text_ids"],
        text_mask=b["text_mask"], text_len=b["text_len"],
        mask=~np.asarray(b["padding_mask"]), background=b["background"],
    )
    w = LossWeights(pl_weight=2.0, r1_gamma=1.0)

    g_reg = jax.jit(make_g_reg_step(g.apply, tx_g, w, z_dim=TINY.z_dim,
                                    max_elements=TINY.max_elements, gain=4.0))
    s1, stats = g_reg(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(stats["Loss/pl_penalty"]))
    assert float(s1.pl_mean) != 0.0  # EMA of path lengths moved

    d_reg = jax.jit(make_d_reg_step(d.apply, tx_d, w, gain=16.0))
    s2, stats_d = d_reg(s1, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats_d["Loss/r1_penalty"]))
    old = jax.tree_util.tree_leaves(s1.params_d)[0]
    new = jax.tree_util.tree_leaves(s2.params_d)[0]
    assert old.shape == new.shape


@pytest.mark.slow
def test_dryrun_multichip_8():
    """Run the driver's multichip dryrun exactly as the driver does: in a
    fresh subprocess. In-process at the end of a long suite, the 8
    virtual CPU devices' all-reduce rendezvous can trip XLA's hard
    timeout on this 1-core host and SIGABRT the whole session."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip(8) OK" in out.stdout
