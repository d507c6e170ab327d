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
    print(jsonl_line)
    if run_dir is not None and os.path.isdir(run_dir):
        with open(os.path.join(run_dir, f"metric-{metric}.jsonl"), "a") as f:
            f.write(jsonl_line + "\n")


# ----------------------------------------------------------------------------
# Registered metrics (parity: metrics/metric_main.py:90-136)

@register_metric
def layout_fid50k_val(opts):
    from layoutdetr_tpu.metrics.layout_fid import compute_layout_fid

    fid = compute_layout_fid(opts, max_items=50000)
    return {"layout_fid50k_val": fid}


@register_metric
def overlap50k_alignment50k_layoutwise_iou50k_layoutwise_docsim50k_val(opts):
    from layoutdetr_tpu.metrics.eval_metrics import compute_layout_eval_suite

    return compute_layout_eval_suite(opts, max_items=50000)


@register_metric
def fid50k_val(opts):
    from layoutdetr_tpu.metrics.image_fid import compute_image_fid

    return {"fid50k_val": compute_image_fid(opts, max_items=50000)}


@register_metric
def rendering_val(opts):
    """Qualitative rendering pass: render generated banners for val
    layouts with <=4 uniquely-typed elements (parity:
    metrics/rendering_utils.py:99-301, incl. the :153-167 filter).
    Writes PNG/HTML next to the run dir; reports the rendered count."""
    import numpy as np

    from layoutdetr_tpu.metrics.layout_fid import generate_layouts
    from layoutdetr_tpu.serving.postprocess import LABEL_LIST
    from layoutdetr_tpu.serving.render import visualize_banner
    import os
    import PIL.Image

    from layoutdetr_tpu.data.dataset import denormalize_image

    out_dir = opts.get("render_dir", "rendered_val")
    os.makedirs(out_dir, exist_ok=True)
    n = min(len(opts.dataset), opts.get("max_render", 64))
    rendered = 0
    item_idx = 0
    for bbox_fake, b in generate_layouts(opts, list(range(n)), batch=opts.get("batch", 16)):
        for k in range(bbox_fake.shape[0]):
            mask = b["mask"][k]
            labels = b["labels"][k][mask]
            texts = opts.dataset[item_idx]["texts"]
            item_idx += 1
            # <=4 elements with unique types (rendering_utils.py:153-167).
            if mask.sum() > 4 or len(set(labels.tolist())) != len(labels):
                continue
            bg = PIL.Image.fromarray(denormalize_image(np.asarray(b["background"][k])))
            styles = [{"type": LABEL_LIST[int(l)] if int(l) < len(LABEL_LIST) else "body text",
                       "text": texts[j], "style": {"fontFamily": "Arial", "color": ""}}
                      for j, l in enumerate(labels)]
            stem = os.path.join(out_dir, f"render_{rendered:04d}")
            visualize_banner(bbox_fake[k], mask, styles, True, bg, None, ["image"], stem)
            rendered += 1
    return {"rendering_val": rendered}
