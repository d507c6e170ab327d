"""Offline dataset preprocessor: png+json ad-banner pages -> train/val zips.

CLI parity target: reference dataset_tool.py:289-366 — identical flags
(--source/--dest/--inpaint-aug/--max-samples), identical on-disk output
(non_image.json 'samples' + per-element `_i_patch.png` /
`_i_patch_orig.png` / `_i_patch_mask.png` + `_background_orig.png`,
uncompressed PNG, 90/10 train/val split at dataset_tool.py:319) and
identical semantics:

- 8-label vocabulary (dataset_tool.py:104-113);
- element validity filter (:135-157): known label, 0<len(str)<256,
  bbox inside page, <=1024px sides, aspect survives the 256 resize;
- drop elements >=95% covered by another element (:160-176);
- keep pages with 1-9 elements (:180);
- bbox normalization to [xc/W, yc/H, w/W, h/H] (:197-202);
- per-element crop + 1024^2 centered patch_orig + binary mask (:210-218);
- background from `3x_inpainted…` (train aug) or `1x_inpainted…`
  (:220-226), resized 1024^2 bilinear;
- lexicographic (top, left) sort (:74-79).

Host-pipeline improvement over the reference: a single pass over the
source (each page decoded once) instead of the reference's two full
iterations (dataset_tool.py:315-326).
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from pathlib import Path
from typing import Optional

import click
import numpy as np
import PIL.Image

LABEL_LIST = [
    "header", "pre-header", "post-header", "body text",
    "disclaimer / footnote", "button", "callout", "logo",
]
LABEL2INDEX = {label: i for i, label in enumerate(LABEL_LIST)}
MAX_ELEMENTS = 9


def lexicographic_sort_idx(bboxes):
    """Sort by (top, left) of the box (reference dataset_tool.py:74-79)."""
    arr = np.transpose(np.array(bboxes))
    left = arr[0] - arr[2] / 2
    top = arr[1] - arr[3] / 2
    return [i for i, _ in sorted(enumerate(zip(top, left)), key=lambda c: c[1])]


def element_is_valid(element, w_page, h_page) -> bool:
    if "label" not in element or element["label"] not in LABEL_LIST:
        return False
    if "str" not in element or len(element["str"]) == 0 or len(element["str"]) >= 256:
        return False
    x1, y1, x2, y2 = element["xyxy_word_fit"]
    if x1 < 0 or y1 < 0 or w_page < x2 or h_page < y2:
        return False
    if x2 <= x1 or y2 <= y1:
        return False
    width, height = int(x2) - int(x1), int(y2) - int(y1)
    if width > 1024 or height > 1024:
        return False
    if width > height:
        if int(height / width * 256.0) // 2 * 2 == 0:
            return False
    else:
        if int(width / height * 256.0) // 2 * 2 == 0:
            return False
    return True


def drop_covered_elements(elements):
    """Remove elements whose area is >=95% inside another element."""
    kept = []
    for i, e in enumerate(elements):
        x1, y1, x2, y2 = e["xyxy_word_fit"]
        covered = False
        for j, other in enumerate(elements):
            if i == j:
                continue
            ox1, oy1, ox2, oy2 = other["xyxy_word_fit"]
            ix1, iy1 = max(x1, ox1), max(y1, oy1)
            ix2, iy2 = min(x2, ox2), min(y2, oy2)
            if ix1 < ix2 and iy1 < iy2:
                frac = (ix2 - ix1) * (iy2 - iy1) / ((x2 - x1) * (y2 - y1))
                if frac >= 0.95:
                    covered = True
                    break
        if not covered:
            kept.append(e)
    return kept


def page_metadata(json_path: Path):
    """Metadata-only pass over one png+json page -> sample dict or None
    (reference :122-241 filtering semantics). Reads ONLY the json and
    the PNG header (PIL.Image.open is lazy — no pixel decode), so
    filtering + the 90/10 split scale to thousands of pages without
    holding any pixels. ``xyxy`` (sorted pixel boxes) rides along for
    the image pass and is stripped before writing non_image.json."""
    page_img = PIL.Image.open(str(json_path).replace(".json", ".png"))
    w_page, h_page = page_img.size
    with json_path.open() as f:
        ann = json.load(f)

    elements = [e for e in ann if element_is_valid(e, w_page, h_page)]
    elements = drop_covered_elements(elements)
    filtered = len(ann) != len(elements)
    if len(elements) == 0 or len(elements) > MAX_ELEMENTS:
        return None

    bboxes, labels, texts, xyxy = [], [], [], []
    for e in elements:
        x1, y1, x2, y2 = e["xyxy_word_fit"]
        bboxes.append([
            (x1 + x2) / 2.0 / w_page, (y1 + y2) / 2.0 / h_page,
            (x2 - x1) / w_page, (y2 - y1) / h_page,
        ])
        labels.append(LABEL2INDEX[e["label"]])
        texts.append(e["str"])
        xyxy.append([int(x1), int(y1), int(x2), int(y2)])

    order = lexicographic_sort_idx(bboxes)
    pick = lambda xs: [xs[i] for i in order]
    attr = {"name": json_path.name, "width": w_page, "height": h_page,
            "num_bbox_labels": len(LABEL_LIST), "filtered": filtered,
            "has_canvas_element": False}
    return dict(
        attr=attr, bboxes=pick(bboxes), labels=pick(labels), texts=pick(texts),
        xyxy=pick(xyxy), page_label=None,
    )


def page_images(json_path: Path, meta: dict, inpaint_aug: bool):
    """Pixel pass for one already-filtered page: ONE full page decode ->
    per-element crops + 1024^2 centered originals/masks + background
    (reference :210-226)."""
    page = np.array(PIL.Image.open(str(json_path).replace(".json", ".png")))
    if page.ndim == 2:
        page = np.stack([page] * 3, axis=2)
    elif page.shape[2] == 4:
        page = page[:, :, :3]

    patches, patches_orig, patch_masks = [], [], []
    for x1, y1, x2, y2 in meta["xyxy"]:
        crop = page[y1:y2, x1:x2]
        patches.append(crop)
        h, w = y2 - y1, x2 - x1
        orig = np.zeros((1024, 1024, 3), page.dtype)
        orig[512 - h // 2:512 + h - h // 2, 512 - w // 2:512 + w - w // 2] = crop
        patches_orig.append(orig)
        m = np.zeros((1024, 1024), page.dtype)
        m[512 - h // 2:512 + h - h // 2, 512 - w // 2:512 + w - w // 2] = 255
        patch_masks.append(m)

    sub = "3x_inpainted_background_png" if inpaint_aug else "1x_inpainted_background_png"
    bg_path = str(json_path).replace("png_json_gt", sub).replace(".json", "_inpainted.png")
    assert os.path.isfile(bg_path), f"missing background {bg_path}"
    background = np.array(
        PIL.Image.open(bg_path).resize((1024, 1024), resample=PIL.Image.BILINEAR)
    )
    assert background.ndim == 3 and background.shape[2] == 3
    return dict(patches=patches, patches_orig=patches_orig,
                patch_masks=patch_masks, background_orig=background)


def process_page(json_path: Path, inpaint_aug: bool):
    """One png+json page -> full sample dict or None (metadata + pixels;
    kept for tests/back-compat — convert_dataset streams the two passes
    separately so page pixels never accumulate in RAM)."""
    meta = page_metadata(json_path)
    if meta is None:
        return None
    out = dict(meta)
    out.update(page_images(json_path, meta, inpaint_aug))
    return out


_PNG_COMPRESS = 0  # reference parity (dataset_tool.py:333 compress_level=0)


def _png(arr, mode="RGB") -> bytes:
    buf = io.BytesIO()
    PIL.Image.fromarray(arr, mode).save(buf, format="png",
                                        compress_level=_PNG_COMPRESS, optimize=False)
    return buf.getvalue()


@click.command()
@click.option("--source", required=True, metavar="PATH")
@click.option("--dest", required=True, metavar="PATH")
@click.option("--inpaint-aug", is_flag=True, default=False)
@click.option("--max-samples", type=int, default=None)
@click.option("--png-compress", type=click.IntRange(min=0, max=9), default=0,
              show_default=True,
              help="PNG compress_level for the output zips. 0 = byte-layout "
                   "parity with the reference's uncompressed PNGs "
                   "(dataset_tool.py:333); higher trades encode time for "
                   "~10-50x smaller archives (the 1024^2 patch_orig/mask "
                   "planes are mostly zeros). Loaders read either.")
def convert_dataset(source: str, dest: str, inpaint_aug: bool,
                    max_samples: Optional[int], png_compress: int = 0):
    global _PNG_COMPRESS
    _PNG_COMPRESS = png_compress
    json_files = sorted(Path(source).rglob("png_json_gt/**/*.json")) or sorted(
        Path(source).rglob("*.json"))
    if max_samples is not None:
        json_files = json_files[:max_samples]

    # Pass 1 — metadata + filtering only (json + PNG headers): decides
    # the 90/10 split without decoding a single page. Pass 2 streams
    # each page's pixels straight into the zip, so peak RAM is one page
    # regardless of dataset size (the reference iterates the source
    # twice too, dataset_tool.py:315-326 — but decodes in both passes).
    processed = []
    for jf in json_files:
        meta = page_metadata(jf)
        if meta is not None:
            processed.append((jf, meta))
    split = int(len(processed) * 0.90)
    os.makedirs(dest, exist_ok=True)

    zf_train = zipfile.ZipFile(os.path.join(dest, "train.zip"), "w", zipfile.ZIP_STORED)
    zf_val = zipfile.ZipFile(os.path.join(dest, "val.zip"), "w", zipfile.ZIP_STORED)
    meta_train, meta_val = [], []
    for idx, (jf, sample) in enumerate(processed):
        idx_str = f"{idx:08d}"
        archive_fname = f"{idx_str[:5]}/page{idx_str}"
        zf = zf_train if idx < split else zf_val
        meta = meta_train if idx < split else meta_val
        meta.append([archive_fname, dict(attr=sample["attr"], bboxes=sample["bboxes"],
                                         labels=sample["labels"], texts=sample["texts"],
                                         page_label=sample["page_label"])])
        pix = page_images(jf, sample, inpaint_aug)
        for i, patch in enumerate(pix["patches"]):
            zf.writestr(f"{archive_fname}_{i}_patch.png", _png(patch))
            zf.writestr(f"{archive_fname}_{i}_patch_orig.png", _png(pix["patches_orig"][i]))
            zf.writestr(f"{archive_fname}_{i}_patch_mask.png", _png(pix["patch_masks"][i], "L"))
        zf.writestr(f"{archive_fname}_background_orig.png", _png(pix["background_orig"]))

    zf_train.writestr("non_image.json", json.dumps({"samples": meta_train}))
    zf_val.writestr("non_image.json", json.dumps({"samples": meta_val}))
    zf_train.close()
    zf_val.close()
    print(f"Wrote {len(meta_train)} train / {len(meta_val)} val samples to {dest}")


if __name__ == "__main__":
    convert_dataset()
