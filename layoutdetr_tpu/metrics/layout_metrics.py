"""Layout geometry losses/metrics as pure jnp functions.

TPU-native rebuild of the reference's layout math
(reference: metrics/metric_layoutnet.py:153-275, util.py convert_xywh_to_ltrb).
Unlike the reference, which boolean-indexes valid elements (dynamic
shapes — a jit/XLA anti-pattern), every function here takes a fixed
``[B, N]`` validity mask and computes masked reductions over static
shapes, so the same code path serves both the jitted training loss and
on-device evaluation.

Conventions
-----------
- ``bbox``: ``[..., 4]`` as ``[xc, yc, w, h]`` normalized to [0, 1].
- ``mask``: bool, True = **valid** element (the reference's
  ``padding_mask`` uses True = padded; callers invert at the boundary).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def convert_xywh_to_ltrb(bbox):
    """[xc, yc, w, h] (stacked on axis 0) -> (l, t, r, b). Mirrors util.py:25-31."""
    xc, yc, w, h = bbox[0], bbox[1], bbox[2], bbox[3]
    return xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2


def _safe_div(a, b, xp=jnp):
    """a / b with 0 where the quotient is non-finite (torch.nan_to_num parity)."""
    import contextlib

    guard = (np.errstate(divide="ignore", invalid="ignore") if xp is np
             else contextlib.nullcontext())
    with guard:
        out = a / b
    return xp.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)


def compute_overlap(bbox, mask, xp=jnp):
    """Overlapping loss (Attribute-conditioned Layout GAN §3.6.3).

    Parity target: metrics/metric_layoutnet.py:153-179.

    Args:
      bbox: [B, N, 4] xc/yc/w/h.
      mask: [B, N] bool, True = valid.
    Returns:
      [B] mean pairwise (intersection / own-area) per valid element.

    ``xp``: array module — jnp (default; jit-able, used by the training
    loss) or np (host-side eval: keeps the 50k-item metric loops off the
    device dispatch path, which matters through a tunneled TPU backend).
    """
    bbox = xp.where(mask[..., None], bbox, 0.0)
    bbox = xp.moveaxis(bbox, -1, 0)  # [4, B, N]

    l1, t1, r1, b1 = convert_xywh_to_ltrb(bbox[..., None])  # [B, N, 1]
    l2, t2, r2, b2 = convert_xywh_to_ltrb(bbox[:, :, None, :])  # [B, 1, N]
    a1 = (r1 - l1) * (b1 - t1)  # [B, N, 1]

    l_max = xp.maximum(l1, l2)
    r_min = xp.minimum(r1, r2)
    t_max = xp.maximum(t1, t2)
    b_min = xp.minimum(b1, b2)
    cond = (l_max < r_min) & (t_max < b_min)
    ai = xp.where(cond, (r_min - l_max) * (b_min - t_max), 0.0)  # [B, N, N]

    n = ai.shape[-1]
    diag = xp.eye(n, dtype=bool)
    ai = xp.where(diag[None], 0.0, ai)

    ar = _safe_div(ai, a1, xp=xp)  # [B, N, N]
    return ar.sum(axis=(1, 2)) / mask.astype(bbox.dtype).sum(-1)


def compute_alignment(bbox, mask, xp=jnp):
    """Alignment loss (Attribute-conditioned Layout GAN §3.6.4).

    Parity target: metrics/metric_layoutnet.py:182-201, including its
    quirks: padded *columns* are not masked (only rows), the diagonal is
    set to 1, and any exact-1 minimum is zeroed before the -log.

    Args:
      bbox: [B, N, 4]; mask: [B, N] bool, True = valid.
    Returns:
      [B].
    """
    bb = xp.moveaxis(bbox, -1, 0)  # [4, B, N]
    xl, yt, xr, yb = convert_xywh_to_ltrb(bb)
    xc, yc = bb[0], bb[1]
    X = xp.stack([xl, xc, xr, yt, yc, yb], axis=1)  # [B, 6, N]

    X = X[..., None] - X[..., None, :]  # [B, 6, N, N]
    n = X.shape[-1]
    diag = xp.eye(n, dtype=bool)
    X = xp.where(diag[None, None], 1.0, X)
    X = xp.abs(X).transpose(0, 2, 1, 3)  # [B, N, 6, N]
    X = xp.where(mask[:, :, None, None], X, 1.0)
    X = X.min(axis=-1).min(axis=-1)  # [B, N]
    X = xp.where(X == 1.0, 0.0, X)

    X = -xp.log1p(-X)
    return X.sum(-1) / mask.astype(X.dtype).sum(-1)


def generalized_iou_loss(bbox_pred, bbox_tgt, mask=None):
    """Masked mean of (1 - GIoU) over valid elements.

    Parity target: metrics/metric_layoutnet.py:245-275 (which consumes
    pre-gathered ``[M, 4]``; here ``mask=None`` reproduces that exactly
    and a mask makes it a fixed-shape masked mean).
    """
    l1, t1, r1, b1 = convert_xywh_to_ltrb(jnp.moveaxis(bbox_pred, -1, 0))
    l2, t2, r2, b2 = convert_xywh_to_ltrb(jnp.moveaxis(bbox_tgt, -1, 0))
    a1, a2 = (r1 - l1) * (b1 - t1), (r2 - l2) * (b2 - t2)

    l_max = jnp.maximum(l1, l2)
    r_min = jnp.minimum(r1, r2)
    t_max = jnp.maximum(t1, t2)
    b_min = jnp.minimum(b1, b2)
    cond = (l_max < r_min) & (t_max < b_min)
    ai = jnp.where(cond, (r_min - l_max) * (b_min - t_max), 0.0)

    au = a1 + a2 - ai
    iou = ai / au

    l_min = jnp.minimum(l1, l2)
    r_max = jnp.maximum(r1, r2)
    t_min = jnp.minimum(t1, t2)
    b_max = jnp.maximum(b1, b2)
    ah = (r_max - l_min) * (b_max - t_min)

    g_iou = iou - (ah - au) / ah
    per_elem = 1.0 - g_iou
    if mask is None:
        return per_elem.mean()
    m = mask.astype(per_elem.dtype)
    return jnp.sum(jnp.where(mask, per_elem, 0.0)) / jnp.maximum(m.sum(), 1.0)


def compute_iou(box_1, box_2, xp=jnp):
    """Elementwise IoU of paired boxes [N, 4] (metric_layoutnet.py:66-92)."""
    l1, t1, r1, b1 = convert_xywh_to_ltrb(box_1.T)
    l2, t2, r2, b2 = convert_xywh_to_ltrb(box_2.T)
    a1, a2 = (r1 - l1) * (b1 - t1), (r2 - l2) * (b2 - t2)

    l_max = xp.maximum(l1, l2)
    r_min = xp.minimum(r1, r2)
    t_max = xp.maximum(t1, t2)
    b_min = xp.minimum(b1, b2)
    cond = (l_max < r_min) & (t_max < b_min)
    ai = xp.where(cond, (r_min - l_max) * (b_min - t_max), 0.0)

    return _safe_div(ai, a1 + a2 - ai, xp=xp)


def compute_docsim_weight(box_1, box_2, xp=jnp):
    """DocSim pairing weight (metric_layoutnet.py:204-221)."""
    xc1, yc1, w1, h1 = box_1.T
    xc2, yc2, w2, h2 = box_2.T
    location_difference = ((xc1 - xc2) ** 2 + (yc1 - yc2) ** 2) ** 0.5
    shape_difference = xp.abs(w1 - w2) + xp.abs(h1 - h2)
    area_factor = xp.minimum(w1 * h1, w2 * h2) ** 0.5
    return area_factor * 2 ** (-location_difference - 2.0 * shape_difference)


def masked_mse(pred, tgt, mask):
    """mean((pred-tgt)^2) over valid elements — F.mse_loss on gathered rows.

    ``mask`` is broadcast against the leading dims of ``pred``; the mean
    divides by (num valid rows × trailing feature size), matching
    torch's elementwise mean over the gathered [M, ...] tensor.
    """
    err = (pred - tgt) ** 2
    while mask.ndim < err.ndim:
        mask = mask[..., None]
    m = jnp.broadcast_to(mask, err.shape).astype(err.dtype)
    return jnp.sum(err * m) / jnp.maximum(m.sum(), 1.0)


def masked_cross_entropy(logits, labels, mask):
    """mean CE over valid rows — F.cross_entropy on gathered rows.

    logits: [..., L]; labels: [...] int; mask: [...] bool.
    """
    logits = logits.astype(jnp.float32)
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    nll = logz - picked
    m = mask.astype(nll.dtype)
    return jnp.sum(nll * m) / jnp.maximum(m.sum(), 1.0)
