"""Metric registry + dispatcher.

Parity target: metrics/metric_main.py:32-86 — @register_metric
functions keyed by name, ``calc_metric`` building a shared options
object and timing the run, ``report_metric`` appending to
``metric-<name>.jsonl``. Cross-rank result broadcast is unnecessary
under SPMD (every process computes the same value); multi-host feature
gathering happens inside the feature loops.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Optional

from layoutdetr_tpu.config import EasyDict

_metric_dict: Dict[str, Callable] = {}


def register_metric(fn: Callable) -> Callable:
    assert callable(fn)
    _metric_dict[fn.__name__] = fn
    return fn


def is_valid_metric(metric: str) -> bool:
    return metric in _metric_dict


def list_valid_metrics():
    return list(_metric_dict.keys())


def calc_metric(metric: str, **kwargs) -> EasyDict:
    """Run one metric. kwargs reach the metric fn via ``opts``:
    g_apply/params (EMA generator), dataset, gcfg, layoutnet_params,
    num_items, batch, seed..."""
    assert is_valid_metric(metric), f"unknown metric {metric!r}"
    opts = EasyDict(kwargs)
    if opts.get("params") is not None:
        # Commit the generator params to device ONCE. Callers often hand
        # host numpy pytrees (train.py device_gets the EMA params);
        # without this every jitted generator batch re-uploads the full
        # ~800 MB fp32 tree — ruinous through the tunneled TPU backend.
        import jax

        opts.params = jax.device_put(opts.params)
    start_time = time.time()
    results = _metric_dict[metric](opts)
    total_time = time.time() - start_time
    return EasyDict(
        results=EasyDict(results),
        metric=metric,
        total_time=total_time,
        total_time_str=f"{int(total_time)}s",
    )


def report_metric(result_dict: EasyDict, run_dir: Optional[str] = None,
                  snapshot_path: Optional[str] = None) -> None:
    metric = result_dict["metric"]
    jsonl_line = json.dumps(
        dict(result_dict, snapshot_path=snapshot_path, timestamp=time.time())
    )
    print(jsonl_line, flush=True)
    if run_dir is not None and os.path.isdir(run_dir):
        with open(os.path.join(run_dir, f"metric-{metric}.jsonl"), "a") as f:
            f.write(jsonl_line + "\n")


# ----------------------------------------------------------------------------
# Registered metrics (parity: metrics/metric_main.py:90-136)

@register_metric
def layout_fid50k_val(opts):
    from layoutdetr_tpu.metrics.layout_fid import compute_layout_fid

    fid = compute_layout_fid(opts, max_items=opts.get("max_items") or 50000)
    return {"layout_fid50k_val": fid}


@register_metric
def overlap50k_alignment50k_layoutwise_iou50k_layoutwise_docsim50k_val(opts):
    from layoutdetr_tpu.metrics.eval_metrics import compute_layout_eval_suite

    return compute_layout_eval_suite(opts, max_items=opts.get("max_items") or 50000)


@register_metric
def fid50k_val(opts):
    from layoutdetr_tpu.metrics.image_fid import compute_image_fid

    return {"fid50k_val": compute_image_fid(opts, max_items=opts.get("max_items") or 50000)}


# Per-label HTML element specs (rendering_utils.py:34-118): the template
# only defines specs for header(0), body(3), disclaimer/footnote(4) and
# button(5); pages containing any other label are skipped.
_RENDER_SPECS = {
    0: {"type": "header", "style": {"fontFamily": "Arial", "color": "",
                                    "fontFormat": "bold"}},
    3: {"type": "body", "style": {"fontFamily": "Arial", "color": ""}},
    5: {"type": "button",
        "buttonParams": {"backgroundColor": "", "backgroundImage": "", "radius": 0.5},
        "style": {"fontFamily": "Arial", "color": ""}},
    4: {"type": "disclaimer / footnote", "style": {"fontFamily": "Arial", "color": ""}},
}


@register_metric
def rendering_val(opts):
    """Qualitative rendering pass (parity: rendering_utils.py:99-301):
    renders BOTH generated and real banners side by side into
    ``rendering_fake/`` and ``rendering_real/``, at original page size,
    for val layouts passing the reference filter (<=4 elements, labels
    only from {header, body, disclaimer, button}, each at most once,
    :153-167). Fakes are center-aligned + de-overlapped first
    (:151-152). Reports counts and output dirs."""
    import copy
    import os

    import numpy as np
    import PIL.Image

    from layoutdetr_tpu.config import EasyDict
    from layoutdetr_tpu.data.dataset import LayoutDataset, denormalize_image
    from layoutdetr_tpu.metrics.layout_fid import generate_layouts
    from layoutdetr_tpu.serving.postprocess import de_overlap, horizontal_center_aligned
    from layoutdetr_tpu.serving.render import visualize_banner

    out_root = opts.get("render_dir", "rendered_val")
    fake_dir = os.path.join(out_root, "rendering_fake")
    real_dir = os.path.join(out_root, "rendering_real")
    os.makedirs(fake_dir, exist_ok=True)
    os.makedirs(real_dir, exist_ok=True)

    # Original-resolution backgrounds for rendering (the reference
    # resizes background_orig to page size, rendering_utils.py:173-177).
    ds = opts.dataset
    try:
        bds = LayoutDataset(ds._path, background_size=ds.background_size,
                            load_background_orig=True, tokenizer=ds.tokenizer)
        bds[0]
        opts = EasyDict(dict(opts, dataset=bds))
    except Exception:
        bds = None  # fall back to training-resolution backgrounds

    dataset = opts.dataset
    # Coverage: the reference scans the FULL val set
    # (rendering_utils.py:120-152); --max-items (or the explicit
    # max_render knob) caps the candidate scan, and any cap is logged so
    # truncation never reads as full coverage. When NEITHER knob is
    # given (the in-training snapshot path), default to 64 candidates —
    # an unbounded scan per snapshot tick would stall training on large
    # val sets; evaluate.py --max-items lifts the cap explicitly.
    cap = opts.get("max_render") or opts.get("max_items")
    capped_by = "max_render" if opts.get("max_render") else "max_items"
    if not cap:
        cap, capped_by = 64, "default (pass --max-items to widen)"
    n = min(len(dataset), cap)
    if n < len(dataset):
        print(f"rendering_val: scanning {n} of {len(dataset)} val items "
              f"(capped by {capped_by})")
    rendered = 0
    item_idx = 0
    for bbox_fake, b in generate_layouts(opts, list(range(n)), batch=opts.get("batch", 16)):
        # Post-process fakes exactly as the reference (:151-152). The
        # post-processors are batch-1 functions (they index [0, i] and
        # pool the mask globally — serving calls them on single
        # layouts), so apply them per sample.
        bbox_fake = np.stack([
            de_overlap(horizontal_center_aligned(
                bbox_fake[k:k + 1], b["mask"][k:k + 1]), b["mask"][k:k + 1])[0]
            for k in range(bbox_fake.shape[0])])
        for k in range(bbox_fake.shape[0]):
            mask = b["mask"][k]
            this_idx = item_idx
            item_idx += 1
            labels = b["labels"][k]
            valid_labels = labels[mask].tolist()
            # Filter (:153-167): <=4 elements, only renderable types,
            # each type at most once. Filter BEFORE re-decoding the
            # item — most layouts are rejected, and dataset[i] is a
            # full zip read + PNG decode (incl. the 1024^2 original
            # background when loaded).
            if mask.sum() > 4:
                continue
            if any(l not in _RENDER_SPECS for l in valid_labels):
                continue
            if any(valid_labels.count(l) > 1 for l in set(valid_labels)):
                continue
            item = dataset[this_idx]
            texts = item["texts"]
            if bds is not None:
                bg_arr = denormalize_image(np.asarray(item["background_orig"]))
                bg = PIL.Image.fromarray(bg_arr).resize(
                    (int(item["W_page"]), int(item["H_page"])), PIL.Image.BILINEAR)
            else:
                bg = PIL.Image.fromarray(denormalize_image(np.asarray(b["background"][k])))
            elements = []
            for j in range(len(labels)):
                if mask[j]:
                    spec = copy.deepcopy(_RENDER_SPECS[int(labels[j])])
                    spec["text"] = texts[j]
                    elements.append(spec)
            name = str(item.get("name", f"render_{rendered:04d}")).replace(".json", "")
            visualize_banner(bbox_fake[k][mask], mask[mask], elements, True, bg,
                             None, ["image"], os.path.join(fake_dir, name))
            visualize_banner(b["bboxes"][k][mask], mask[mask], elements, True, bg,
                             None, ["image"], os.path.join(real_dir, name))
            rendered += 1
    return {"rendering_val": rendered,
            "rendering_fake_dir": fake_dir, "rendering_real_dir": real_dir}
