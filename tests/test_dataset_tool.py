"""Offline preprocessor end-to-end: production-shaped source tree ->
dataset_tool.py zips -> runtime loader (incl. load_patches).

Covers the round-5 two-pass refactor (metadata pass decides the 90/10
split from PNG headers only; the image pass streams pixels straight to
the zip — peak RAM is one page at any dataset size) and the
tools/make_production_source.py rehearsal generator.
Reference semantics: dataset_tool.py:83-243,313-363.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parents[1]
sys.path.insert(0, str(REPO / "tools"))


@pytest.fixture(scope="module")
def source_tree(tmp_path_factory):
    out = tmp_path_factory.mktemp("src")
    import make_production_source as mps

    rng = np.random.default_rng(0)
    gt = out / "png_json_gt"
    bgd = out / "1x_inpainted_background_png"
    gt.mkdir()
    bgd.mkdir()
    import PIL.Image

    for i in range(12):
        w, h = mps.FORMATS[int(rng.integers(0, len(mps.FORMATS)))]
        bg = mps._background(rng, w, h)
        elements = mps._layout(rng, w, h)
        page = mps._render(bg, elements, rng)
        name = f"page{i:06d}"
        PIL.Image.fromarray(page).save(gt / f"{name}.png", compress_level=1)
        (gt / f"{name}.json").write_text(json.dumps(elements))
        PIL.Image.fromarray(bg).save(bgd / f"{name}_inpainted.png", compress_level=1)
    return out


def test_page_metadata_filters_and_sorts(source_tree):
    from dataset_tool import page_metadata

    jfs = sorted((source_tree / "png_json_gt").glob("*.json"))
    metas = [page_metadata(j) for j in jfs]
    metas = [m for m in metas if m is not None]
    assert metas, "every page filtered out"
    for m in metas:
        assert 1 <= len(m["labels"]) <= 9
        bb = np.array(m["bboxes"])
        # Normalized cxcywh inside the page.
        assert (bb > -1e-6).all() and (bb <= 1 + 1e-6).all()
        # Lexicographic (top, left) order.
        tops = bb[:, 1] - bb[:, 3] / 2
        lefts = bb[:, 0] - bb[:, 2] / 2
        keys = list(zip(tops.round(6), lefts.round(6)))
        assert keys == sorted(keys)


def test_convert_and_load_roundtrip(source_tree, tmp_path):
    """CLI conversion -> loader roundtrip with patches; --png-compress
    shrinks the archives without changing loaded pixel SHAPES/semantics."""
    dest = tmp_path / "ds"
    r = subprocess.run(
        [sys.executable, str(REPO / "dataset_tool.py"),
         "--source", str(source_tree), "--dest", str(dest),
         "--png-compress", "3"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    from layoutdetr_tpu.data.dataset import LayoutDataset

    ds = LayoutDataset(str(dest / "train.zip"), background_size=64,
                       max_text_length=16, load_patches=True, cache=False)
    assert len(ds) >= 5  # 90% of the surviving pages
    item = ds[0]
    assert item["background"].shape == (64, 64, 3)
    assert item["patches"].shape == (9, 256, 256, 3)
    assert item["patches_orig"].shape[1:] == (1024, 1024, 3)
    assert item["patch_masks"].shape[1:] == (1024, 1024, 1)
    n = int(item["mask"].sum())
    assert n >= 1 and np.abs(item["patches"][:n]).sum() > 0

    val = LayoutDataset(str(dest / "val.zip"), background_size=64,
                        max_text_length=16, cache=False)
    assert len(val) >= 1
    # Attrs carry real page dims (not a fixed canvas).
    meta = val._samples[0][1]["attr"]
    assert meta["width"] >= 160 and meta["height"] >= 90
