"""Layout-FID: Fréchet distance on LayoutNet CLS features.

Parity target: metrics/layout_frechet_inception_distance.py:20-39 +
metrics/metric_utils_layout.py:199-289 + metric_layoutnet.py:26-63 —
LayoutNet features of (bbox, label) for real val layouts vs generated
layouts, Gaussian-fit + Fréchet.

Detector weights: converted from the reference's
``pretrained/layoutnet_<dataset>.pth.tar`` via utils/torch_convert when
present (opts.layoutnet_params); otherwise a seed-0 random LayoutNet is
used with a warning — distances remain *internally comparable* across
checkpoints of this framework (random-projection features are a valid
discriminative basis) but are not numerically the reference's scale.
The label remapping for ads/CGL datasets mirrors
networks_layoutnet.py:51-61 (applied when the dataset name matches,
layout_frechet_inception_distance.py:21-22).
"""

from __future__ import annotations

import numpy as np

import jax

from layoutdetr_tpu.metrics.frechet import frechet_distance, gaussian_stats


def _layoutnet(opts):
    from layoutdetr_tpu.models.layoutnet import LayoutNet

    name = getattr(opts.dataset, "name", "")
    num_label = 13 if any(k in name for k in (
        "rico", "enrico", "clay", "ads_banner_collection",
        "AMT_uploaded_ads_banners", "cgl_dataset")) else 5
    params = opts.get("layoutnet_params")
    ds_labels = getattr(opts.dataset, "num_bbox_labels", None)
    if params is not None:
        # Provided (converted-pretrained) weights define the label
        # space, not the dataset-name heuristic — otherwise correct
        # custom-dataset weights would be rejected by the range guard.
        from jax.tree_util import keystr, tree_flatten_with_path

        emb = [leaf for path, leaf in tree_flatten_with_path(params)[0]
               if "emb_label_table" in keystr(path)]
        if emb:
            num_label = int(emb[0].shape[0])
    elif ds_labels and ds_labels > num_label:
        # Random-feature fallback on a dataset outside the reference's
        # named label spaces: size the embedding to the dataset. An
        # out-of-range label would be an OOB gather — XLA:CPU clamps it,
        # but the TPU backend returns garbage/NaN (this silently
        # poisoned a whole eval with all-NaN features once).
        num_label = int(ds_labels)
    net = LayoutNet(num_label)
    if params is None:
        print("[layout_fid] WARNING: no pretrained LayoutNet weights; "
              "using seed-0 random features (self-consistent, not reference-scale)",
              flush=True)
        bbox = np.zeros((1, 9, 4), np.float32)
        label = np.zeros((1, 9), np.int64)
        pad = np.zeros((1, 9), bool)
        params = net.init(jax.random.PRNGKey(0), bbox, label, pad)
    remap = dict(
        label_idx_replace=any(k in name for k in ("ads_banner_collection", "AMT_uploaded_ads_banners")),
        label_idx_replace_2="cgl_dataset" in name,
    )

    jit_features = jax.jit(
        lambda bbox, label, padding_mask: net.apply(
            params, bbox, label, padding_mask, **remap,
            method=net.extract_features))

    def features(bbox, label, padding_mask):
        if not any(remap.values()):
            # Reference-named datasets remap in-graph into the net's
            # label space; everything else must already be in range.
            lmax = int(np.max(label)) if np.size(label) else 0
            if lmax >= num_label:
                raise ValueError(
                    f"dataset label id {lmax} is out of range for a "
                    f"{num_label}-label LayoutNet — pass --layoutnet-ckpt "
                    "weights matching the dataset's label space")
        return jit_features(bbox, label, padding_mask)

    return features, num_label


def generate_layouts(opts, indices, batch: int = 16):
    """Run the EMA generator over dataset items; yields (bbox_fake, batch)."""
    dataset = opts.dataset
    # Callers (train.py/evaluate.py) pass a pre-jitted apply so tracing
    # happens once per process, not once per metric; only wrap raw fns.
    g_apply = opts.g_apply
    if not hasattr(g_apply, "lower"):
        g_apply = jax.jit(g_apply)
    rng = jax.random.PRNGKey(opts.get("seed", 0))
    for i in range(0, len(indices), batch):
        idxs = indices[i:i + batch]
        b = dataset.collate(idxs)
        rng, zk = jax.random.split(rng)
        z = jax.random.normal(zk, (len(idxs), opts.gcfg.max_elements, opts.gcfg.z_dim))
        bbox_fake = g_apply(
            opts.params, z=z, bbox_class=b["labels"], bbox_real=b["bboxes"],
            text_ids=b["text_ids"], text_mask=b["text_mask"], text_len=b["text_len"],
            padding_mask=b["padding_mask"], background=b["background"],
        )
        yield np.asarray(bbox_fake), b


def _real_stats_cache_path(opts, n, num_label):
    """Cache key for real-dataset feature stats (the reference md5-caches
    dataset stats, metric_utils_layout.py:205-222)."""
    import hashlib
    import os

    ds = opts.dataset
    ident = getattr(ds, "_path", None) or getattr(getattr(ds, "_ds", None), "_path", None) \
        or getattr(ds, "name", "ds")
    has_weights = opts.get("layoutnet_params") is not None
    key = hashlib.md5(
        f"{ident}|{n}|{has_weights}|L{num_label}".encode()).hexdigest()[:16]
    cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "layoutdetr_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"layout-fid-real-{key}.npz")


def compute_layout_fid(opts, max_items: int = 50000) -> float:
    dataset = opts.dataset
    feat_fn, num_label = _layoutnet(opts)
    n = min(len(dataset), max_items)
    indices = list(range(n))

    cache_path = _real_stats_cache_path(opts, n, num_label)
    import os

    mu_r = sig_r = None
    if opts.get("cache_real_stats", True) and os.path.exists(cache_path):
        cached = np.load(cache_path)
        if np.isfinite(cached["mu"]).all() and np.isfinite(cached["sigma"]).all():
            mu_r, sig_r = cached["mu"], cached["sigma"]
            real = None
        else:  # poisoned by an earlier non-finite feature pass — recompute
            os.remove(cache_path)
    if mu_r is None:
        real_feats = []
        for i in range(0, n, 64):
            b = dataset.collate(indices[i:i + 64])
            real_feats.append(np.asarray(feat_fn(b["bboxes"], b["labels"], b["padding_mask"])))
        real = np.concatenate(real_feats)

    fake_feats = []
    import time

    t0, done, last_logged = time.time(), 0, 0
    for bbox_fake, b in generate_layouts(opts, indices, batch=opts.get("batch", 16)):
        fake_feats.append(np.asarray(feat_fn(bbox_fake, b["labels"], b["padding_mask"])))
        done += bbox_fake.shape[0]
        if done - last_logged >= 128 or done >= n:
            last_logged = done
            print(f"[layout_fid] generated {done}/{n} ({time.time() - t0:.0f}s)",
                  flush=True)
    fake = np.concatenate(fake_feats)

    mu_f, sig_f = gaussian_stats(fake)
    if real is not None:
        mu_r, sig_r = gaussian_stats(real)
        # Never cache non-finite stats: re-saving them would repeat the
        # full real-feature pass every run while still returning NaN.
        if opts.get("cache_real_stats", True) and \
                np.isfinite(mu_r).all() and np.isfinite(sig_r).all():
            np.savez(cache_path, mu=mu_r, sigma=sig_r)
        elif not (np.isfinite(mu_r).all() and np.isfinite(sig_r).all()):
            print("[layout_fid] WARNING: real-feature stats are non-finite; "
                  "not caching", flush=True)
    return frechet_distance(mu_f, sig_f, mu_r, sig_r)
