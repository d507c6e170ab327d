"""Synthetic dataset builder for tests/benchmarks.

Writes a zip in the exact on-disk format produced by dataset_tool.py
(reference: dataset_tool.py:313-363 — non_image.json 'samples' list +
per-element patch PNGs + background PNG), so the runtime loader and any
reference-compatible consumer can read it.
"""

from __future__ import annotations

import io
import json
import zipfile

import numpy as np
import PIL.Image

LABELS = [
    "header", "pre-header", "post-header", "body text",
    "disclaimer / footnote", "button", "callout", "logo",
]

_WORDS = ["shop", "now", "sale", "fresh", "deal", "save", "today", "new", "big", "free"]


def _png_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, format="png", compress_level=0)
    return buf.getvalue()


def make_synthetic_zip(path: str, num_samples: int = 4, image_size: int = 64,
                       max_elements: int = 4, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    samples = []
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        for s in range(num_samples):
            n = int(rng.integers(1, max_elements + 1))
            base = f"{s:08d}"
            bboxes = []
            labels = []
            texts = []
            for i in range(n):
                w, h = rng.uniform(0.1, 0.4, 2)
                xc = rng.uniform(w / 2, 1 - w / 2)
                yc = rng.uniform(h / 2, 1 - h / 2)
                bboxes.append([float(xc), float(yc), float(w), float(h)])
                labels.append(int(rng.integers(0, len(LABELS))))
                texts.append(" ".join(rng.choice(_WORDS, rng.integers(1, 5))))
                patch = rng.integers(0, 255, (32, 32, 3), np.uint8)
                zf.writestr(f"{base}_{i}_patch.png", _png_bytes(patch))
                zf.writestr(f"{base}_{i}_patch_orig.png", _png_bytes(patch))
                zf.writestr(f"{base}_{i}_patch_mask.png",
                            _png_bytes(np.full((32, 32), 255, np.uint8)))
            bg = rng.integers(0, 255, (image_size, image_size, 3), np.uint8)
            zf.writestr(f"{base}_background_orig.png", _png_bytes(bg))
            attr = {"name": base, "width": 512, "height": 512,
                    "num_bbox_labels": len(LABELS), "filtered": False,
                    "has_canvas_element": False}
            samples.append([base, {"attr": attr, "bboxes": bboxes, "labels": labels,
                                   "texts": texts, "page_label": None}])
        zf.writestr("non_image.json", json.dumps({"samples": samples}))
    return path
