"""Frechet Video Distance (reference: utils/metrics.py:335-378,625-780).

Feature extraction (I3D logits) runs batched on device; the Frechet moment
math (sqrtm of the covariance product) stays on host in float64 scipy —
mirroring the reference's numerics incl. the NaN-row filtering.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from ipoke_tpu.metrics import i3d


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """(reference: calculate_frechet_distance, utils/metrics.py:625-678)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def _moments(feats: np.ndarray):
    total = feats.shape[0]
    feats = feats[np.isfinite(feats).all(axis=1)]  # NaN filtering parity (:735-741)
    if feats.shape[0] < 2:
        # without this guard a fully-NaN feature set feeds NaN moments into
        # linalg.sqrtm, which spins forever (observed 2026-08-20 on an all-NaN
        # student sample set) — fail loudly instead
        raise ValueError(
            f"FVD: only {feats.shape[0]}/{total} finite feature rows after "
            "NaN filtering; model output is likely non-finite")
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def compute_features(videos, batch_size=16):
    """videos: (N, T, H, W, 3) in [-1,1] (numpy or jax).  Returns (N, 400)."""
    params, pretrained = i3d.load_params()
    feat_fn = jax.jit(lambda v: i3d.features(v, params))
    out = []
    n = videos.shape[0]
    for i in range(0, n, batch_size):
        chunk = jnp.asarray(videos[i : i + batch_size])
        out.append(np.asarray(feat_fn(chunk)))
    return np.concatenate(out, axis=0), pretrained


def compute_fvd(real_videos, fake_videos, batch_size=16):
    """End-to-end FVD between two video sets (N, T, H, W, 3) in [-1,1]."""
    feats_real, pretrained = compute_features(real_videos, batch_size)
    feats_fake, _ = compute_features(fake_videos, batch_size)
    mu_r, s_r = _moments(feats_real)
    mu_f, s_f = _moments(feats_fake)
    return frechet_distance(mu_r, s_r, mu_f, s_f)


class FVDAccumulator:
    """Streaming accumulation across validation batches (reference FVD Metric
    buffers uint8 clips; we buffer features — far smaller)."""

    def __init__(self, n_samples=1000, batch_size=16):
        self.n_samples = n_samples
        self.batch_size = batch_size
        self._real = []
        self._fake = []
        params, self.pretrained = i3d.load_params()
        self._feat_fn = jax.jit(lambda v: i3d.features(v, params))

    def update(self, real, fake):
        if sum(x.shape[0] for x in self._real) >= self.n_samples:
            return
        self._real.append(np.asarray(self._feat_fn(jnp.asarray(real))))
        self._fake.append(np.asarray(self._feat_fn(jnp.asarray(fake))))

    def compute(self):
        r = np.concatenate(self._real)[: self.n_samples]
        f = np.concatenate(self._fake)[: self.n_samples]
        # surface silent NaN-row drops (the reference filters quietly,
        # utils/metrics.py:735-741; callers can log these for honesty)
        self.n_dropped_real = int(np.sum(~np.isfinite(r).all(axis=1)))
        self.n_dropped_fake = int(np.sum(~np.isfinite(f).all(axis=1)))
        return frechet_distance(*_moments(r), *_moments(f))

    def reset(self):
        self._real, self._fake = [], []
