"""Image-FID of layouts composited onto backgrounds.

Parity target: metrics/frechet_inception_distance.py:20-39 +
metric_utils.py:199-299 — the reference composites the *real cropped
element patches* at the (real|generated) box positions onto the
original background (util.py:234-325) and featurizes with the
TF-Inception-2015-12-05 port (2048-dim pool3 features), then computes
the Fréchet distance.

Faithful path here: `metrics/compositing.py` does the real-patch
compositing; `models/inception.py` + ``opts.inception_params`` (a
params pytree, .npz, or torch .pt/.pth state dict in pytorch-fid /
torchvision naming) provide the real detector.

Offline fallbacks (clearly labeled, each independently degradable):
- no Inception weights -> fixed seed-0 random-conv features
  (self-consistent across runs of this framework, NOT reference-scale);
- dataset without patch/orig images -> translucent label-colored box
  compositing at training resolution.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from layoutdetr_tpu.metrics.frechet import frechet_distance, gaussian_stats
from layoutdetr_tpu.serving.postprocess import convert_xywh_to_ltrb, label_palette


def render_layout_batch(bboxes, labels, masks, backgrounds) -> np.ndarray:
    """Fallback compositor: solid label-colored boxes onto [B,S,S,3]
    float backgrounds (used only when the dataset has no patches)."""
    colors = np.asarray(label_palette(13), np.float32) / 255.0
    out = np.array(backgrounds, np.float32, copy=True)
    b, s = out.shape[0], out.shape[1]
    for k in range(b):
        for i in range(bboxes.shape[1]):
            if not masks[k, i]:
                continue
            x1, y1, x2, y2 = convert_xywh_to_ltrb(bboxes[k, i])
            xs, xe = int(np.clip(x1 * s, 0, s)), int(np.clip(x2 * s, 0, s))
            ys, ye = int(np.clip(y1 * s, 0, s)), int(np.clip(y2 * s, 0, s))
            c = colors[int(labels[k, i]) % len(colors)]
            out[k, ys:ye, xs:xe] = 0.6 * out[k, ys:ye, xs:xe] + 0.4 * c
    return out


def _feature_fn(opts):
    """uint8 [B,S,S,3] images -> [B,D] features."""
    params = opts.get("inception_params")
    if params is not None:
        from layoutdetr_tpu.models.inception import load_inception_params, make_feature_fn

        return make_feature_fn(load_inception_params(params))

    print("[image_fid] WARNING: no Inception weights provided "
          "(opts.inception_params); using seed-0 random conv features "
          "(self-consistent, not reference-scale)")
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    w1 = jax.random.normal(k1, (5, 5, 3, 32)) * 0.1
    w2 = jax.random.normal(k2, (3, 3, 32, 64)) * 0.1
    w3 = jax.random.normal(k3, (3, 3, 64, 128)) * 0.1

    @jax.jit
    def features(imgs):
        x = imgs.astype(jnp.float32) / 255.0
        for w, stride in ((w1, 4), (w2, 2), (w3, 2)):
            x = jax.lax.conv_general_dilated(
                x, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x)
        return x.mean(axis=(1, 2))

    return features


def _patch_dataset(opts):
    """A sibling dataset view that also decodes patches_orig /
    background_orig (the training dataset skips them for speed)."""
    ds = opts.dataset
    if getattr(ds, "load_patches", False) and getattr(ds, "load_background_orig", False):
        return ds
    from layoutdetr_tpu.data.dataset import LayoutDataset

    try:
        pds = LayoutDataset(
            ds._path, background_size=ds.background_size,
            load_patches=True, load_background_orig=True,
            tokenizer=ds.tokenizer,
        )
        pds[0]  # probe: patch decoding is lazy, missing entries raise here
        return pds
    except Exception as e:  # zip without patch/orig entries
        print(f"[image_fid] WARNING: dataset has no patch/orig images ({e}); "
              "falling back to label-colored box compositing")
        return None


def compute_image_fid(opts, max_items: int = 50000) -> float:
    from layoutdetr_tpu.config import EasyDict
    from layoutdetr_tpu.metrics.layout_fid import generate_layouts

    max_items = opts.get("max_items", max_items) or max_items
    feat = _feature_fn(opts)
    size_canvas = opts.get("size_canvas", 1024)

    pds = _patch_dataset(opts)
    if pds is not None:
        from layoutdetr_tpu.metrics.compositing import composite_batch

        opts = EasyDict(dict(opts, dataset=pds))
        n = min(len(pds), max_items)
        real_feats, fake_feats = [], []
        for bbox_fake, b in generate_layouts(opts, list(range(n)), batch=opts.get("batch", 16)):
            common = (b["patches_orig"], b["mask"], b["background_orig"],
                      b["W_page"], b["H_page"], size_canvas)
            real_img = composite_batch(b["bboxes"], b["bboxes"], *common)
            fake_img = composite_batch(bbox_fake, b["bboxes"], *common)
            real_feats.append(np.asarray(feat(jnp.asarray(real_img))))
            fake_feats.append(np.asarray(feat(jnp.asarray(fake_img))))
    else:
        from layoutdetr_tpu.data.dataset import denormalize_image

        dataset = opts.dataset
        n = min(len(dataset), max_items)
        real_feats, fake_feats = [], []
        for bbox_fake, b in generate_layouts(opts, list(range(n)), batch=opts.get("batch", 16)):
            real_img = render_layout_batch(b["bboxes"], b["labels"], b["mask"], b["background"])
            fake_img = render_layout_batch(bbox_fake, b["labels"], b["mask"], b["background"])
            real_feats.append(np.asarray(feat(jnp.asarray(denormalize_image(real_img)))))
            fake_feats.append(np.asarray(feat(jnp.asarray(denormalize_image(fake_img)))))

    mu_f, sig_f = gaussian_stats(np.concatenate(fake_feats))
    mu_r, sig_r = gaussian_stats(np.concatenate(real_feats))
    return frechet_distance(mu_f, sig_f, mu_r, sig_r)
