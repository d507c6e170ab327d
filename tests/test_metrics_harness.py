"""Metric registry + layout-FID/eval-suite over a tiny synthetic dataset."""

import numpy as np
import pytest

import jax

from test_models import TINY


import dataclasses

# The zip loader always pads to 9 elements (dataset layout contract),
# so the model config here must use max_elements=9.
TINY9 = dataclasses.replace(TINY, max_elements=9)


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    from layoutdetr_tpu.data.dataset import LayoutDataset
    from layoutdetr_tpu.data.synthetic import make_synthetic_zip
    from layoutdetr_tpu.models.generator import Generator

    zip_path = make_synthetic_zip(
        str(tmp_path_factory.mktemp("data") / "val.zip"), num_samples=6, image_size=32,
        max_elements=3,
    )
    ds = LayoutDataset(zip_path, background_size=TINY9.background_size,
                       max_text_length=TINY9.max_text_length)
    g = Generator(TINY9)
    b = ds.collate([0])
    params = g.init(
        jax.random.PRNGKey(0),
        z=np.zeros((1, 9, TINY9.z_dim), np.float32),
        bbox_real=b["bboxes"], bbox_class=b["labels"],
        text_ids=np.clip(b["text_ids"], 0, TINY9.vocab_size - 1),
        text_mask=b["text_mask"], text_len=b["text_len"],
        padding_mask=b["padding_mask"], background=b["background"],
    )
    return g, params, ds


class ClippedDataset:
    """Wrap a dataset to clip token ids into a tiny test vocab."""

    def __init__(self, ds, vocab):
        self._ds = ds
        self._vocab = vocab
        self.num_bbox_labels = ds.num_bbox_labels
        self.name = "ads_banner_collection_test"

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, i):
        item = dict(self._ds[i])
        item["text_ids"] = np.clip(item["text_ids"], 0, self._vocab - 1)
        return item

    def collate(self, idxs):
        b = self._ds.collate(idxs)
        b["text_ids"] = np.clip(b["text_ids"], 0, self._vocab - 1)
        return b


def test_registry_lists_reference_metrics():
    from layoutdetr_tpu.metrics import metric_main

    for m in ("layout_fid50k_val", "fid50k_val", "rendering_val",
              "overlap50k_alignment50k_layoutwise_iou50k_layoutwise_docsim50k_val"):
        assert metric_main.is_valid_metric(m)
    assert not metric_main.is_valid_metric("nope")


def test_layout_fid_and_eval_suite(tiny_setup):
    from layoutdetr_tpu.metrics import metric_main

    g, params, ds = tiny_setup
    dataset = ClippedDataset(ds, TINY9.vocab_size)
    common = dict(g_apply=g.apply, params=params, dataset=dataset, gcfg=TINY9,
                  layoutnet_params=None, batch=3, seed=0)

    result = metric_main.calc_metric("layout_fid50k_val", **common)
    fid = result.results["layout_fid50k_val"]
    assert np.isfinite(fid) and fid >= 0

    result2 = metric_main.calc_metric(
        "overlap50k_alignment50k_layoutwise_iou50k_layoutwise_docsim50k_val", **common)
    for key, v in result2.results.items():
        assert np.isfinite(v), key


def test_report_metric_writes_jsonl(tiny_setup, tmp_path):
    import json

    from layoutdetr_tpu.config import EasyDict
    from layoutdetr_tpu.metrics import metric_main

    fake = EasyDict(results=EasyDict(foo=1.0), metric="layout_fid50k_val",
                    total_time=0.1, total_time_str="0s")
    metric_main.report_metric(fake, run_dir=str(tmp_path), snapshot_path="snap")
    line = (tmp_path / "metric-layout_fid50k_val.jsonl").read_text().strip()
    rec = json.loads(line)
    assert rec["results"]["foo"] == 1.0 and rec["snapshot_path"] == "snap"


def test_rendering_val_renders_real_and_fake(tiny_setup, tmp_path):
    """Full rendering metric (VERDICT r1 item 7): both fake and real
    banners rendered, reference filter applied (rendering_utils.py:153-167)."""
    import os

    from layoutdetr_tpu.metrics import metric_main

    g, params, ds = tiny_setup
    dataset = ClippedDataset(ds, TINY9.vocab_size)
    # batch=6 over 6 samples x up-to-3 elements: the pooled valid count
    # (up to 18) exceeds the 9-slot layout, so a post-processor applied
    # batch-wide instead of per-sample (they are batch-1 functions)
    # would IndexError — regression trap for the de_overlap/center-align
    # cross-sample bug.
    result = metric_main.calc_metric(
        "rendering_val", g_apply=g.apply, params=params, dataset=dataset,
        gcfg=TINY9, batch=6, seed=0, render_dir=str(tmp_path))
    r = result.results
    fake_dir, real_dir = r["rendering_fake_dir"], r["rendering_real_dir"]
    assert os.path.isdir(fake_dir) and os.path.isdir(real_dir)
    n_fake = len([f for f in os.listdir(fake_dir) if f.endswith("_vis.png")])
    n_real = len([f for f in os.listdir(real_dir) if f.endswith("_vis.png")])
    assert n_fake == n_real == r["rendering_val"]
    # Skipped pages violate the filter: >4 elements, non-renderable or
    # duplicated types.
    assert r["rendering_val"] <= len(dataset)


def test_layoutnet_label_space_guards():
    """An unknown-name dataset must never feed out-of-range labels into
    the LayoutNet embedding: OOB gathers clamp on XLA:CPU but return
    garbage/NaN on the TPU backend (this poisoned a real eval's cached
    stats with all-NaN and hung scipy sqrtm for hours)."""
    from layoutdetr_tpu.config import EasyDict
    from layoutdetr_tpu.metrics.layout_fid import _layoutnet

    class FakeDS:
        name = ""  # no reference dataset-name match -> 5-label default
        num_bbox_labels = 8

    # Random-feature fallback: embedding widened to the dataset's space.
    feat_fn, num_label = _layoutnet(EasyDict(dataset=FakeDS()))
    assert num_label == 8
    bbox = np.random.RandomState(0).rand(2, 9, 4).astype(np.float32)
    label = np.full((2, 9), 7, np.int64)  # max label id of the dataset
    pad = np.zeros((2, 9), bool)
    f = np.asarray(feat_fn(bbox, label, pad))
    assert np.isfinite(f).all()

    # Pretrained-style params (label space fixed at 5): out-of-range
    # labels must raise, not gather garbage.
    from layoutdetr_tpu.models.layoutnet import LayoutNet

    net5 = LayoutNet(5)
    params5 = net5.init(jax.random.PRNGKey(0), bbox[:1], label[:1] * 0, pad[:1])
    feat5, nl5 = _layoutnet(EasyDict(dataset=FakeDS(), layoutnet_params=params5))
    assert nl5 == 5
    with pytest.raises(ValueError, match="out of range"):
        feat5(bbox, label, pad)

    # Provided weights that DO match the dataset's 8-label space define
    # the label space (not the dataset-name heuristic) and must be
    # accepted — the guard rejecting correct custom-dataset weights
    # would make layout-FID impossible to compute with them.
    net8 = LayoutNet(8)
    params8 = net8.init(jax.random.PRNGKey(0), bbox[:1], label[:1] * 0, pad[:1])
    feat8, nl8 = _layoutnet(EasyDict(dataset=FakeDS(), layoutnet_params=params8))
    assert nl8 == 8
    assert np.isfinite(np.asarray(feat8(bbox, label, pad))).all()


def test_frechet_nan_guard():
    """Non-finite stats must return NaN immediately — LAPACK's sqrtm
    spins forever on NaN input."""
    from layoutdetr_tpu.metrics.frechet import frechet_distance

    mu = np.zeros(4)
    sig = np.eye(4)
    bad = sig.copy()
    bad[0, 0] = np.nan
    assert np.isnan(frechet_distance(mu, bad, mu, sig))
    assert np.isfinite(frechet_distance(mu, sig, mu, sig))
