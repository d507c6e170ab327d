"""Val-set layout quality suite: overlap, alignment, layout-wise IoU, DocSim.

Parity target:
metrics/overlap50k_alignment50k_layoutwise_iou50k_layoutwise_docsim50k.py:20-45
+ metric_utils_layout.py:293-339 — one generator pass per val item;
overlap/alignment on generated layouts; IoU and DocSim between
generated and real layouts of the same conditioning; max-IoU/max-DocSim
Hungarian machinery (metric_layoutnet.py:100-150, 229-242) exposed for
completeness.
"""

from __future__ import annotations

import time

import numpy as np
import scipy.optimize

from layoutdetr_tpu.metrics.layout_metrics import (
    compute_alignment,
    compute_docsim_weight,
    compute_iou,
    compute_overlap,
)


def compute_layout_eval_suite(opts, max_items: int = 50000):
    from layoutdetr_tpu.metrics.layout_fid import generate_layouts

    dataset = opts.dataset
    n = min(len(dataset), max_items)
    indices = list(range(n))

    # All layout math runs HOST-SIDE in numpy (xp=np): per-item eager
    # device ops would pay one dispatch round-trip each — thousands of
    # them through a tunneled TPU backend turned this loop into hours.
    overlaps, alignments, ious, docsims = [], [], [], []
    t0, done, last_logged = time.time(), 0, 0
    for bbox_fake, b in generate_layouts(opts, indices, batch=opts.get("batch", 16)):
        mask = np.asarray(b["mask"])
        bbox_fake = np.asarray(bbox_fake, np.float64)
        overlaps.append(compute_overlap(bbox_fake, mask, xp=np))
        alignments.append(compute_alignment(bbox_fake, mask, xp=np))
        real = np.asarray(b["bboxes"], np.float64)
        for k in range(bbox_fake.shape[0]):
            m = mask[k]
            bf, br = bbox_fake[k][m], real[k][m]
            ious.append(float(compute_iou(bf, br, xp=np).mean()))
            docsims.append(float(compute_docsim_weight(bf, br, xp=np).mean()))
        done += bbox_fake.shape[0]
        if done - last_logged >= 128 or done >= n:
            last_logged = done
            print(f"[layout_eval_suite] {done}/{n} items ({time.time() - t0:.0f}s)",
                  flush=True)

    return {
        "overlap50k_val": float(np.concatenate(overlaps).mean()),
        "alignment50k_val": float(np.concatenate(alignments).mean()),
        "layoutwise_iou50k_val": float(np.mean(ious)),
        "layoutwise_docsim50k_val": float(np.mean(docsims)),
    }


def maximum_iou_for_layout(layout_1, layout_2) -> float:
    """Hungarian-matched per-label IoU (metric_layoutnet.py:100-113)."""
    (bi, li), (bj, lj) = layout_1, layout_2
    score = 0.0
    n = len(bi)
    for l in sorted(set(li.tolist())):
        _bi = bi[np.where(li == l)]
        _bj = bj[np.where(lj == l)]
        m = len(_bi)
        if m == 0 or len(_bj) != m:
            continue
        ii, jj = np.meshgrid(range(m), range(m))
        iou = np.asarray(compute_iou(_bi[ii.ravel()], _bj[jj.ravel()],
                                     xp=np)).reshape(m, m)
        rr, cc = scipy.optimize.linear_sum_assignment(iou, maximize=True)
        score += iou[rr, cc].sum()
    return score / n


def maximum_docsim_for_layout(layout_1, layout_2) -> float:
    """Hungarian-matched per-label DocSim (metric_layoutnet.py:229-242)."""
    (bi, li), (bj, lj) = layout_1, layout_2
    score = 0.0
    n = len(bi)
    for l in sorted(set(li.tolist())):
        _bi = bi[np.where(li == l)]
        _bj = bj[np.where(lj == l)]
        m = len(_bi)
        if m == 0 or len(_bj) != m:
            continue
        ii, jj = np.meshgrid(range(m), range(m))
        w = np.asarray(compute_docsim_weight(_bi[ii.ravel()], _bj[jj.ravel()],
                                             xp=np)).reshape(m, m)
        rr, cc = scipy.optimize.linear_sum_assignment(w, maximize=True)
        score += w[rr, cc].sum()
    return score / n
