"""Fréchet distance between Gaussians fitted to feature sets.

Parity: the pytorch_fid.fid_score.calculate_frechet_distance consumed by
the reference (metric_layoutnet.py:19,63) — standard FID formula with
scipy sqrtm on host (the reference computes it identically).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    diff = mu1 - mu2

    prod = sigma1.dot(sigma2)
    if not (np.isfinite(diff).all() and np.isfinite(prod).all()):
        # LAPACK's Schur iteration SPINS FOREVER on NaN/Inf input (it
        # hung a training run's snapshot eval for hours) — never hand
        # sqrtm a non-finite matrix. FID of non-finite features is
        # undefined; report NaN loudly instead.
        print("[frechet] WARNING: non-finite feature statistics; "
              "returning NaN", flush=True)
        return float("nan")
    covmean = scipy.linalg.sqrtm(prod)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def gaussian_stats(features: np.ndarray):
    return np.mean(features, axis=0), np.cov(features, rowvar=False)
