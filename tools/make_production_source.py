#!/usr/bin/env python
"""Production-shaped synthetic SOURCE tree for dataset_tool.py rehearsal.

Emits the exact input layout the reference preprocessor consumes
(reference dataset_tool.py:83-243 / README "Data preprocessing"):

    <out>/png_json_gt/<name>.png + <name>.json
    <out>/1x_inpainted_background_png/<name>_inpainted.png

at the REAL ad-banner scale (default 7,672 pages — the reference
dataset's size) with realistic banner dimensions (IAB ad formats up to
1024px), 1-9 elements per page drawn from the banner grammar, rendered
element pixels (so per-element patches carry content), and the
backgrounds as element-free renders (what inpainting produces).

This de-risks the day the real 14.7 GB set appears: dataset_tool.py,
the zip loaders, load_patches, and train.py get exercised at full data
volume without any egress.

Usage: python tools/make_production_source.py --out /path [--pages 7672]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import PIL.Image
import PIL.ImageDraw

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from layoutdetr_tpu.data.synthetic import _POOL, _STACK_ORDER  # noqa: E402

LABELS = list(_POOL)

# Realistic banner formats (w, h): IAB standards + square/social crops,
# all sides <=1024 (dataset_tool validity filter caps element sides at
# 1024, reference dataset_tool.py:135-157).
FORMATS = [
    (300, 250), (336, 280), (728, 90), (970, 250), (160, 600), (300, 600),
    (320, 480), (480, 320), (640, 640), (800, 800), (1024, 512), (512, 1024),
    (1024, 1024), (600, 500), (960, 640),
]


def _background(rng, w, h):
    """Smooth gradient + soft blobs at page resolution (content an
    inpainter would plausibly produce)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        90 + 120 * xx / max(w, 1),
        60 + 110 * yy / max(h, 1),
        140 + 80 * (xx + yy) / max(w + h, 1),
    ], axis=-1)
    for _ in range(int(rng.integers(2, 5))):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        r = rng.uniform(0.15, 0.45) * max(w, h)
        blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r))
        base += blob[..., None] * rng.uniform(-60, 60, 3)
    return np.clip(base, 0, 255).astype(np.uint8)


def _layout(rng, w, h):
    """Grammar layout in PIXELS for a (w, h) page: stacked, in-page,
    non-overlapping; 1-9 elements."""
    elements = []
    margin = 0.04
    y = margin + rng.uniform(0, 0.05)
    order = [l for l in _STACK_ORDER if rng.random() < 0.75]
    if not order:
        order = ["header"]
    if "header" not in order and rng.random() < 0.8:
        order.insert(0, "header")
    logo = rng.random() < 0.5
    for label in order[:8]:
        fw = rng.uniform(0.25, 0.8)
        fh = rng.uniform(0.05, 0.16)
        if y + fh > 1 - margin:
            break
        xc = 0.5 if rng.random() < 0.6 else rng.uniform(fw / 2 + margin, 1 - fw / 2 - margin)
        x1, x2 = (xc - fw / 2) * w, (xc + fw / 2) * w
        y1, y2 = y * h, (y + fh) * h
        # Validity filter needs integer boxes >= ~3 px after the 256
        # resize; clamp tiny pages' boxes to >= 8 px.
        if x2 - x1 < 8 or y2 - y1 < 8:
            continue
        text = str(rng.choice(_POOL[label]))
        elements.append({"xyxy_word_fit": [float(x1), float(y1), float(x2), float(y2)],
                         "label": label, "str": text})
        y += fh + rng.uniform(0.01, 0.04)
    if logo and len(elements) < 9:
        lw, lh = 0.14 * w, 0.10 * h
        if lw >= 8 and lh >= 8:
            elements.append({"xyxy_word_fit": [w - lw - 4, 4, w - 4, lh + 4],
                             "label": "logo", "str": str(rng.choice(_POOL["logo"]))})
    return elements[:9]


def _render(bg_u8, elements, rng):
    """Draw element pixels over the background (text-ish bars + button
    pills) so crops/patches have real content."""
    img = PIL.Image.fromarray(bg_u8.copy())
    draw = PIL.ImageDraw.Draw(img)
    for e in elements:
        x1, y1, x2, y2 = [int(v) for v in e["xyxy_word_fit"]]
        light = rng.random() < 0.5
        fill = (245, 245, 245) if light else (20, 20, 30)
        fg = (20, 20, 30) if light else (245, 245, 245)
        if e["label"] == "button":
            draw.rounded_rectangle([x1, y1, x2, y2], radius=(y2 - y1) // 2, fill=fill)
        else:
            draw.rectangle([x1, y1, x2, y2], fill=fill)
        try:
            draw.text((x1 + 4, y1 + max(0, (y2 - y1) // 4)), e["str"], fill=fg)
        except Exception:
            pass
    return np.asarray(img)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--pages", type=int, default=7672)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--png-compress", type=int, default=3,
                    help="source PNG compress_level (3 keeps 7.7k pages in "
                         "tens of GB instead of hundreds)")
    args = ap.parse_args()

    gt = os.path.join(args.out, "png_json_gt")
    bgd = os.path.join(args.out, "1x_inpainted_background_png")
    os.makedirs(gt, exist_ok=True)
    os.makedirs(bgd, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for i in range(args.pages):
        w, h = FORMATS[int(rng.integers(0, len(FORMATS)))]
        bg = _background(rng, w, h)
        elements = _layout(rng, w, h)
        page = _render(bg, elements, rng)
        name = f"page{i:06d}"
        PIL.Image.fromarray(page).save(os.path.join(gt, name + ".png"),
                                       compress_level=args.png_compress)
        with open(os.path.join(gt, name + ".json"), "w") as f:
            json.dump(elements, f)
        PIL.Image.fromarray(bg).save(os.path.join(bgd, name + "_inpainted.png"),
                                     compress_level=args.png_compress)
        if (i + 1) % 500 == 0:
            dt = time.time() - t0
            print(f"{i + 1}/{args.pages} pages, {dt:.0f}s "
                  f"({(i + 1) / dt:.1f} pages/s)", flush=True)
    print(f"done: {args.pages} pages in {time.time() - t0:.0f}s -> {args.out}")


if __name__ == "__main__":
    main()
