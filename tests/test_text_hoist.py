"""Hoisted frozen-text-encoder path: precomputed text_feat must be
numerically identical to the inline encoder (the train step relies on
this to drop 3 of 5 per-step BERT passes)."""

import numpy as np
import pytest

import jax

from layoutdetr_tpu.models.generator import (
    Generator,
    GeneratorConfig,
    make_text_feature_fn,
)

TINY = GeneratorConfig(
    hidden_dim=16, bert_f_dim=32, bert_num_heads=2, bert_num_encoder_layers=1,
    bert_num_decoder_layers=1, bert_intermediate_size=64, im_f_dim=16,
    max_text_length=16, vocab_size=64, bos_token_id=62, nhead=2,
    num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=32,
    background_size=32, max_elements=3,
)


def _batch(b=2, n=3, t=8, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        z=rng.normal(size=(b, n, TINY.z_dim)).astype(np.float32),
        bbox_class=rng.integers(0, 8, (b, n)),
        bbox_real=rng.uniform(0.1, 0.9, (b, n, 4)).astype(np.float32),
        text_ids=rng.integers(1, 60, (b, n, t)),
        text_mask=np.ones((b, n, t), np.int32),
        text_len=rng.integers(0, 16, (b, n)),
        padding_mask=np.zeros((b, n), bool),
        background=rng.normal(size=(b, 32, 32, 3)).astype(np.float32),
    )


def test_generator_hoisted_text_feat_matches_inline():
    g = Generator(TINY)
    kw = _batch()
    params = g.init({"params": jax.random.PRNGKey(0)}, **kw)

    inline = g.apply(params, **kw)
    tfn = make_text_feature_fn(TINY)
    tf = tfn(params["params"]["text_encoder"], kw["text_ids"], kw["text_mask"])
    assert tf.shape == (2, 3, TINY.bert_f_dim)
    hoisted = g.apply(params, text_feat=tf, **kw)
    np.testing.assert_array_equal(np.asarray(inline), np.asarray(hoisted))


def test_discriminator_hoisted_text_feat_matches_inline():
    from layoutdetr_tpu.models.discriminator import Discriminator

    d = Discriminator(TINY)
    kw = _batch(seed=1)
    z = kw.pop("z")
    bbox = kw.pop("bbox_real")
    del z
    params = d.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                    bbox=bbox, reconst=True, **kw)
    inline = d.apply(params, bbox=bbox, reconst=True, **kw)
    tfn = make_text_feature_fn(TINY)
    tf = tfn(params["params"]["text_encoder"], kw["text_ids"], kw["text_mask"])
    hoisted = d.apply(params, bbox=bbox, reconst=True, text_feat=tf, **kw)
    for a, b in zip(jax.tree.leaves(inline), jax.tree.leaves(hoisted)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_sharded_flash_text_feature_matches_xla():
    """Multi-device flash path (shard_map over 'data' + Pallas kernel in
    interpret mode) must match the GSPMD XLA attention path — this is
    the production multi-chip configuration (train_loop passes the mesh
    so the fused kernel runs per data shard instead of being disabled)."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    g = Generator(TINY)
    kw = _batch(b=4)
    params = g.init({"params": jax.random.PRNGKey(0)}, **kw)
    te = params["params"]["text_encoder"]

    tfn_xla = make_text_feature_fn(TINY, flash=False)
    tfn_flash = make_text_feature_fn(TINY, flash=True, mesh=mesh,
                                     flash_interpret=True)
    ref = np.asarray(tfn_xla(te, kw["text_ids"], kw["text_mask"]))
    out = np.asarray(tfn_flash(te, kw["text_ids"], kw["text_mask"]))
    assert out.shape == (4, 3, TINY.bert_f_dim)
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-5)

    # Dropout path: per-shard streams are folded from the data-axis
    # index; just assert it executes and stays finite (masks differ
    # from the XLA path's by design).
    noisy = np.asarray(tfn_flash(te, kw["text_ids"], kw["text_mask"],
                                 deterministic=False,
                                 rngs={"dropout": jax.random.PRNGKey(3)}))
    assert np.isfinite(noisy).all()

    # TP meshes fall back to the XLA path (kernel is data-axis-only).
    mesh2 = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "model"))
    tfn_tp = make_text_feature_fn(TINY, flash=True, mesh=mesh2)
    tp_out = np.asarray(tfn_tp(te, kw["text_ids"], kw["text_mask"]))
    np.testing.assert_allclose(tp_out, ref, atol=3e-5, rtol=1e-5)


@pytest.mark.slow
def test_hoisted_train_step_runs_and_updates():
    from layoutdetr_tpu.models.discriminator import Discriminator
    from layoutdetr_tpu.training.optimizers import (
        D_FROZEN_SUBSTRINGS,
        G_FROZEN_SUBSTRINGS,
        build_optimizer,
    )
    from layoutdetr_tpu.training.train_step import GANTrainState, make_train_step

    g, d = Generator(TINY), Discriminator(TINY)
    kw = _batch()
    key = jax.random.PRNGKey(0)
    params_g = g.init({"params": key, "dropout": key, "noise": key},
                      reconst=True, **kw)
    params_d = d.init({"params": key, "dropout": key, "noise": key},
                      bbox=kw["bbox_real"], reconst=True,
                      **{k: v for k, v in kw.items() if k not in ("z", "bbox_real")})
    tx_g = build_optimizer(params_g, reg_interval=4, frozen_substrings=G_FROZEN_SUBSTRINGS)
    tx_d = build_optimizer(params_d, reg_interval=16, frozen_substrings=D_FROZEN_SUBSTRINGS)
    state = GANTrainState.create(params_g, params_d, tx_g, tx_d)
    # Host copies BEFORE the step: donate_argnums donates the state
    # buffers, so the original params_g arrays are invalidated.
    before_text = jax.device_get(params_g["params"]["text_encoder"])
    before_fc_in = jax.device_get(params_g["params"]["fc_in"])

    batch = dict(bboxes=kw["bbox_real"], labels=kw["bbox_class"],
                 text_ids=kw["text_ids"], text_mask=kw["text_mask"],
                 text_len=kw["text_len"], mask=~kw["padding_mask"],
                 background=kw["background"])
    step = jax.jit(make_train_step(
        g.apply, d.apply, tx_g, tx_d, batch_size=2, z_dim=TINY.z_dim,
        max_elements=TINY.max_elements,
        text_feature_fn=make_text_feature_fn(TINY)), donate_argnums=(0,))
    state2, stats = step(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    for k, v in stats.items():
        assert np.isfinite(float(v)), k
    # Frozen text encoder must be untouched; trainable params must move.
    same = jax.tree.map(np.array_equal, before_text,
                        jax.device_get(state2.params_g["params"]["text_encoder"]))
    assert all(jax.tree.leaves(same))
    moved = jax.tree.map(lambda a, b: not np.array_equal(a, b), before_fc_in,
                         jax.device_get(state2.params_g["params"]["fc_in"]))
    assert any(jax.tree.leaves(moved))
