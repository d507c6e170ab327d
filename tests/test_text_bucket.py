"""--max-text-length auto: shrinking the token dimension T is
equivalent up to float reassociation.

The claim (docs/BENCH_NOTES.md "next lever"): with the char-length
embedding table decoupled (GeneratorConfig.text_len_table), any T that
covers every real token is EXACT IN EXACT ARITHMETIC — the additive
-10000.0 key mask (models/bert.py NEG_MASK) underflows to exp(...)=0.0
in fp32, so padded key columns contribute exact zeros to every softmax,
and the per-position FFN never mixes positions. In floating point,
different-T graphs reassociate/tile reductions differently (XLA picks
shape-dependent schedules), so outputs drift slightly (observed ~2e-7
max-abs / ~7e-6 max-rel). These tests run the SAME params through the
T=16 and T=8 graphs and require allclose to a tight tolerance.

Reference tie being decoupled: networks_detr.py:103,149 sizes the
nn.Embedding(max_text_length, ...) char-length table and its clip with
the token length; here text_len_table stays at the reference's value
while T shrinks to the dataset's measured max token length.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from layoutdetr_tpu.data.tokenizer import LayoutTokenizer
from layoutdetr_tpu.models.discriminator import Discriminator
from layoutdetr_tpu.models.generator import Generator

from test_models import TINY, tiny_batch

T_BIG, T_SMALL = 16, 8


def _bucketed_batch():
    """tiny_batch at t=16 whose real tokens all fit in the first 8."""
    batch = tiny_batch(t=T_BIG)
    ids = np.asarray(batch["text_ids"]).copy()
    mask = np.zeros_like(np.asarray(batch["text_mask"]))
    ids[..., T_SMALL:] = 0  # PAD beyond the bucket
    mask[..., :T_SMALL] = 1
    batch["text_ids"] = jnp.asarray(ids)
    batch["text_mask"] = jnp.asarray(mask)
    return batch


def _sliced(batch, t):
    out = dict(batch)
    out["text_ids"] = batch["text_ids"][..., :t]
    out["text_mask"] = batch["text_mask"][..., :t]
    return out


def test_generator_t_bucket_equivalent():
    cfg_big = dataclasses.replace(TINY, max_text_length=T_BIG, text_len_table=T_BIG)
    cfg_small = dataclasses.replace(cfg_big, max_text_length=T_SMALL)
    batch = _bucketed_batch()

    g_big, g_small = Generator(cfg_big), Generator(cfg_small)
    params = g_big.init(jax.random.PRNGKey(0), **batch, reconst=True)
    # Param shapes are T-independent after the decoupling: the small-T
    # graph must accept the big-T tree verbatim.
    out_big = g_big.apply(params, **batch, reconst=True)
    out_small = g_small.apply(params, **_sliced(batch, T_SMALL), reconst=True)

    names = ("bbox", "loss_z", "logit_cls", "loss_lm", "loss_text_len")
    for name, a, b in zip(names, out_big, out_small):
        # Not assert_array_equal: reductions reassociate across T
        # (module docstring) — a few ULP of drift is expected.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"generator {name} diverged")


def test_discriminator_t_bucket_equivalent():
    cfg_big = dataclasses.replace(TINY, max_text_length=T_BIG, text_len_table=T_BIG)
    cfg_small = dataclasses.replace(cfg_big, max_text_length=T_SMALL)
    batch = _bucketed_batch()
    kwargs = {k: v for k, v in batch.items() if k not in ("z", "bbox_real")}
    kwargs["bbox"] = batch["bbox_real"]

    d_big, d_small = Discriminator(cfg_big), Discriminator(cfg_small)
    params = d_big.init(jax.random.PRNGKey(1), **kwargs, reconst=True)
    out_big = d_big.apply(params, **kwargs, reconst=True)
    out_small = d_small.apply(params, **_sliced(kwargs, T_SMALL), reconst=True)

    for i, (a, b) in enumerate(zip(out_big, out_small)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"discriminator output {i} diverged")


def test_tokenizer_length_clip_decoupled():
    tok = LayoutTokenizer(max_length=8, length_clip=256)
    long_text = "x" * 200  # 200 chars, 1 token
    ids, mask, lens = tok.encode_batch([long_text])
    assert ids.shape == (1, 8)
    # Char length must clip at length_clip-1 (=255), NOT max_length-1:
    # the text_len embedding index is what the reference computes at 256.
    assert lens[0] == 200
    tok_ref = LayoutTokenizer(max_length=256)
    _, _, lens_ref = tok_ref.encode_batch([long_text])
    assert lens[0] == lens_ref[0]


def test_legacy_checkpoint_infers_text_len_table(tmp_path):
    """Pre-decoupling orbax checkpoints (sidecar without text_len_table,
    trained with explicit --max-text-length N != 256) must load with the
    table sized from the stored enc_text_len weight, not the 256 default
    (ADVICE r3: a 256-wide config would gather OOB into the (N, f) table
    and mis-size fc_text_len_rec)."""
    import json

    from layoutdetr_tpu.utils.checkpoint import (
        load_generator_checkpoint, save_checkpoint)

    n_table = 32
    cfg = dataclasses.replace(TINY, max_text_length=n_table,
                              text_len_table=n_table)
    batch = tiny_batch(t=8)
    g = Generator(cfg)
    params = g.init(jax.random.PRNGKey(0), **batch, reconst=True)
    assert params["params"]["enc_text_len"].shape[0] == n_table

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params)
    # Legacy sidecar: every field EXCEPT text_len_table.
    sidecar = {k: v for k, v in dataclasses.asdict(cfg).items()
               if k != "text_len_table"}
    with open(path + ".gcfg.json", "w") as f:
        json.dump(sidecar, f)

    loaded, gcfg = load_generator_checkpoint(path)
    assert gcfg.text_len_table == n_table
    assert gcfg.max_text_length == n_table
    # And the loaded params must actually run through the rebuilt config.
    out = Generator(gcfg).apply(loaded, **batch)
    assert np.isfinite(np.asarray(out)).all()


def test_measured_max_text_tokens(tmp_path):
    from layoutdetr_tpu.data.synthetic import make_synthetic_zip
    from layoutdetr_tpu.data.dataset import LayoutDataset

    zp = str(tmp_path / "train.zip")
    make_synthetic_zip(zp, num_samples=4, image_size=32, max_elements=3, seed=0)
    ds = LayoutDataset(zp, background_size=32, max_text_length=256)
    measured = ds.measured_max_text_tokens()
    assert 2 <= measured <= 256
    # Every sample's tokenization at T=measured must not truncate.
    tok = LayoutTokenizer(max_length=measured, length_clip=256)
    for i in range(len(ds)):
        item = ds[i]
        for s in item["texts"]:
            assert tok.token_count(s) <= measured
