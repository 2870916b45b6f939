"""LPIPS perceptual distance (reference: models/modules/autoencoders/LPIPS.py
and the pip `lpips` net used by utils/metrics.py:418-447).

VGG16 backbone slices (relu1_2..relu5_3), unit-normalized channel features,
squared difference, learned 1x1 linear heads, spatial mean, sum over layers.
Linear-head weights load from $IPOKE_WEIGHTS/lpips_vgg_lins.npz (keys
``lin{i}/w`` shape (C_i,)); uniform 1/C fallback otherwise.
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.metrics import vgg as vgg_mod

_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])

_LIN_CHANNELS = (64, 128, 256, 512, 512)


@lru_cache(maxsize=1)
def _lins():
    path = os.path.join(os.environ.get("IPOKE_WEIGHTS", os.path.join("logs", "weights")),
                        "lpips_vgg_lins.npz")
    # numpy arrays only: lru_cached values must never hold jax tracers
    if os.path.exists(path):
        data = np.load(path)
        return [np.asarray(data[f"lin{i}/w"]) for i in range(5)], True
    return [np.full((c,), 1.0 / c, np.float32) for c in _LIN_CHANNELS], False


def lpips_pretrained():
    """True only when BOTH the VGG16 backbone and the linear heads loaded
    real weights (callers mark outputs UNPRETRAINED otherwise)."""
    _, vgg_ok = vgg_mod._cached("vgg16_features")
    _, lins_ok = _lins()
    return bool(vgg_ok and lins_ok)


def _norm_feat(f, eps=1e-10):
    return f / jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)


def lpips(x, y):
    """x, y: (B, H, W, 3) in [-1, 1].  Returns (B,) distances."""
    params, _ = vgg_mod._cached("vgg16_features")
    xin = (x - _SHIFT) / _SCALE
    yin = (y - _SHIFT) / _SCALE
    fx = vgg_mod.features(params, xin, vgg_mod.VGG16_LAYOUT, vgg_mod.VGG16_LPIPS_TAPS)
    fy = vgg_mod.features(params, yin, vgg_mod.VGG16_LAYOUT, vgg_mod.VGG16_LPIPS_TAPS)
    lins, _ = _lins()
    total = 0.0
    for a, b, w in zip(fx, fy, lins):
        d = (_norm_feat(a) - _norm_feat(b)) ** 2
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def lpips_video(pred, target):
    """(B,T,H,W,3) -> mean LPIPS over all frames."""
    b, t = pred.shape[:2]
    flat_p = pred.reshape((b * t,) + pred.shape[2:])
    flat_t = target.reshape((b * t,) + target.shape[2:])
    return jnp.mean(lpips(flat_p, flat_t))
