"""Image-FID of rendered layouts composited onto backgrounds.

Parity target: metrics/frechet_inception_distance.py:20-39 +
metric_utils.py:199-299 — the reference renders real/generated layouts
onto backgrounds host-side (util.py:298-325) and featurizes with
NVIDIA's TorchScript InceptionV3 downloaded from a URL.

Offline story: the Inception weights cannot be fetched in this
environment. When ``opts.inception_params`` (a converted checkpoint) is
absent we compute features with a fixed random-weight conv feature
extractor (seed 0) — self-consistent across runs of this framework,
clearly labeled as not reference-scale. The compositing path is the
faithful part: translucent label-colored boxes drawn at page scale.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from layoutdetr_tpu.metrics.frechet import frechet_distance, gaussian_stats
from layoutdetr_tpu.serving.postprocess import convert_xywh_to_ltrb, label_palette


def render_layout_batch(bboxes, labels, masks, backgrounds) -> np.ndarray:
    """Composite solid label-colored boxes onto [B,S,S,3] float backgrounds."""
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
    params = opts.get("inception_params")
    if params is not None:
        raise NotImplementedError(
            "converted Inception weights not yet supported; see utils/torch_convert"
        )
    print("[image_fid] WARNING: no Inception weights available offline; "
          "using seed-0 random conv features (self-consistent, not reference-scale)")
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    w1 = jax.random.normal(k1, (5, 5, 3, 32)) * 0.1
    w2 = jax.random.normal(k2, (3, 3, 32, 64)) * 0.1
    w3 = jax.random.normal(k3, (3, 3, 64, 128)) * 0.1

    @jax.jit
    def features(imgs):
        x = imgs
        for w, stride in ((w1, 4), (w2, 2), (w3, 2)):
            x = jax.lax.conv_general_dilated(
                x, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x)
        return x.mean(axis=(1, 2))

    return features


def compute_image_fid(opts, max_items: int = 50000) -> float:
    from layoutdetr_tpu.metrics.layout_fid import generate_layouts

    dataset = opts.dataset
    n = min(len(dataset), max_items)
    indices = list(range(n))
    feat = _feature_fn(opts)

    real_feats, fake_feats = [], []
    for bbox_fake, b in generate_layouts(opts, indices, batch=opts.get("batch", 16)):
        real_img = render_layout_batch(b["bboxes"], b["labels"], b["mask"], b["background"])
        fake_img = render_layout_batch(bbox_fake, b["labels"], b["mask"], b["background"])
        real_feats.append(np.asarray(feat(jnp.asarray(real_img))))
        fake_feats.append(np.asarray(feat(jnp.asarray(fake_img))))

    mu_f, sig_f = gaussian_stats(np.concatenate(fake_feats))
    mu_r, sig_r = gaussian_stats(np.concatenate(real_feats))
    return frechet_distance(mu_f, sig_f, mu_r, sig_r)
