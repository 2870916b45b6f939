"""Diversity scores over N samples per datapoint (reference:
utils/metrics.py:74-144 compute_div_score / _mse / _lpips and
testing/evaluate_diversity.py).

All scores are mean pairwise distances over the N samples of each example:
  vgg   : cosine distance between pooled VGG16 features
  mse   : pixel MSE
  lpips : LPIPS distance
Input: samples (n_ex, n_samples, T, H, W, 3) in [-1,1].
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.metrics import lpips as lpips_mod
from ipoke_tpu.metrics import vgg as vgg_mod


def _pairs(n):
    return list(itertools.combinations(range(n), 2))


def div_score_vgg(samples):
    n_ex, n_s, t = samples.shape[:3]
    flat = samples.reshape((n_ex * n_s * t,) + samples.shape[3:])
    feats = vgg_mod.vgg16_diversity_features(flat).reshape(n_ex, n_s, t, -1)
    dists = []
    for i, j in _pairs(n_s):
        cos = jnp.sum(feats[:, i] * feats[:, j], axis=-1)
        dists.append(1.0 - cos)
    return float(jnp.mean(jnp.stack(dists)))


def div_score_mse(samples):
    dists = []
    for i, j in _pairs(samples.shape[1]):
        dists.append(jnp.mean((samples[:, i] - samples[:, j]) ** 2, axis=(1, 2, 3, 4)))
    return float(jnp.mean(jnp.stack(dists)))


def div_score_lpips(samples):
    n_ex, n_s, t = samples.shape[:3]
    dists = []
    for i, j in _pairs(n_s):
        a = samples[:, i].reshape((n_ex * t,) + samples.shape[3:])
        b = samples[:, j].reshape((n_ex * t,) + samples.shape[3:])
        dists.append(jnp.mean(lpips_mod.lpips(a, b)))
    return float(jnp.mean(jnp.stack(dists)))
