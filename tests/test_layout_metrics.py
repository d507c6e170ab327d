"""Golden parity tests: jnp layout math vs the reference torch implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from layoutdetr_tpu.metrics import (
    compute_alignment,
    compute_docsim_weight,
    compute_iou,
    compute_overlap,
    generalized_iou_loss,
    masked_cross_entropy,
    masked_mse,
)

from conftest import import_reference_module

ref_metrics = import_reference_module("metrics.metric_layoutnet")
needs_ref = pytest.mark.skipif(ref_metrics is None, reason="reference/torch unavailable")


def random_layout(rng, b=4, n=9):
    """Random xc/yc/w/h layouts with a realistic validity mask."""
    bbox = rng.uniform(0.05, 0.9, size=(b, n, 4)).astype(np.float32)
    counts = rng.integers(1, n + 1, size=b)
    mask = np.arange(n)[None, :] < counts[:, None]
    bbox = np.where(mask[..., None], bbox, 0.0).astype(np.float32)
    return bbox, mask


@needs_ref
def test_overlap_parity():
    import torch

    rng = np.random.default_rng(0)
    bbox, mask = random_layout(rng)
    ours = np.asarray(compute_overlap(jnp.asarray(bbox), jnp.asarray(mask)))
    theirs = ref_metrics.compute_overlap(torch.from_numpy(bbox), torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@needs_ref
def test_alignment_parity():
    import torch

    rng = np.random.default_rng(1)
    bbox, mask = random_layout(rng)
    ours = np.asarray(compute_alignment(jnp.asarray(bbox), jnp.asarray(mask)))
    theirs = ref_metrics.compute_alignment(torch.from_numpy(bbox), torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@needs_ref
def test_giou_parity():
    import torch

    rng = np.random.default_rng(2)
    bbox1, mask = random_layout(rng)
    bbox2, _ = random_layout(np.random.default_rng(3))
    # Reference operates on gathered [M, 4] rows.
    theirs = ref_metrics.generalized_iou_loss(
        torch.from_numpy(bbox1[mask]), torch.from_numpy(bbox2[mask])
    ).numpy()
    ours_gathered = np.asarray(
        generalized_iou_loss(jnp.asarray(bbox1[mask]), jnp.asarray(bbox2[mask]))
    )
    ours_masked = np.asarray(
        generalized_iou_loss(jnp.asarray(bbox1), jnp.asarray(bbox2), jnp.asarray(mask))
    )
    np.testing.assert_allclose(ours_gathered, theirs, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours_masked, theirs, rtol=1e-5, atol=1e-6)


@needs_ref
def test_iou_docsim_parity():
    import torch

    rng = np.random.default_rng(4)
    b1 = rng.uniform(0.05, 0.9, size=(12, 4)).astype(np.float32)
    b2 = rng.uniform(0.05, 0.9, size=(12, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(compute_iou(jnp.asarray(b1), jnp.asarray(b2))),
        ref_metrics.compute_iou(torch.from_numpy(b1), torch.from_numpy(b2)).numpy(),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(compute_docsim_weight(jnp.asarray(b1), jnp.asarray(b2))),
        ref_metrics.compute_docsim_weight(torch.from_numpy(b1), torch.from_numpy(b2)).numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_masked_mse_matches_gathered_mean():
    rng = np.random.default_rng(5)
    pred = rng.normal(size=(4, 9, 4)).astype(np.float32)
    tgt = rng.normal(size=(4, 9, 4)).astype(np.float32)
    _, mask = random_layout(rng)
    expected = np.mean((pred[mask] - tgt[mask]) ** 2)
    got = np.asarray(masked_mse(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_masked_cross_entropy_matches_gathered_mean():
    rng = np.random.default_rng(6)
    logits = rng.normal(size=(4, 9, 8)).astype(np.float32)
    labels = rng.integers(0, 8, size=(4, 9))
    _, mask = random_layout(rng)
    g = logits[mask]
    lab = labels[mask]
    logz = np.log(np.exp(g).sum(-1))
    expected = np.mean(logz - g[np.arange(len(lab)), lab])
    got = np.asarray(
        masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_numpy_path_matches_jnp():
    """The host-side (xp=np) eval path must agree exactly with the
    jitted jnp math used by the training loss."""
    import numpy as np

    from layoutdetr_tpu.metrics.layout_metrics import (
        compute_alignment,
        compute_docsim_weight,
        compute_iou,
        compute_overlap,
    )

    rng = np.random.RandomState(0)
    bbox = rng.uniform(0.05, 0.9, size=(4, 9, 4)).astype(np.float32)
    mask = rng.rand(4, 9) > 0.3
    mask[:, 0] = True
    for fn in (compute_overlap, compute_alignment):
        np.testing.assert_allclose(np.asarray(fn(bbox, mask)),
                                   fn(bbox, mask, xp=np), rtol=1e-5, atol=1e-6)
    b1 = rng.uniform(0.05, 0.9, size=(7, 4)).astype(np.float32)
    b2 = rng.uniform(0.05, 0.9, size=(7, 4)).astype(np.float32)
    for fn in (compute_iou, compute_docsim_weight):
        np.testing.assert_allclose(np.asarray(fn(b1, b2)),
                                   fn(b1, b2, xp=np), rtol=1e-5, atol=1e-6)
