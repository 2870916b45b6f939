"""VGG-19/16 feature extractors in JAX, used by the perceptual (VGG) loss
(reference: utils/losses.py:6-88), LPIPS (models/modules/autoencoders/LPIPS.py)
and the VGG-cosine diversity score (utils/metrics.py:20-58).

Pretrained weights: this environment has no network egress and no torchvision
cache, so weights are loaded from a local file when available (searched in
$IPOKE_WEIGHTS or logs/weights): ``vgg19_features.npz`` / ``vgg16_features.npz``
holding torchvision ``features`` conv weights as ``conv{idx}/w`` (OIHW) and
``conv{idx}/b``.  ``ipoke_tpu.ckpt.torch_import.convert_torchvision_vgg``
produces that file from a torchvision checkpoint.  Without weights the
extractor runs with seeded random filters — fine for smoke tests and for
*relative* diversity scores, NOT for reference-parity LPIPS/VGG numbers.
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.nn.core import conv2d

# torchvision `features` layout: (conv_idx, in, out), 'M' = maxpool
VGG19_LAYOUT = [
    (0, 3, 64), (2, 64, 64), "M",
    (5, 64, 128), (7, 128, 128), "M",
    (10, 128, 256), (12, 256, 256), (14, 256, 256), (16, 256, 256), "M",
    (19, 256, 512), (21, 512, 512), (23, 512, 512), (25, 512, 512), "M",
    (28, 512, 512), (30, 512, 512), (32, 512, 512), (34, 512, 512), "M",
]
VGG16_LAYOUT = [
    (0, 3, 64), (2, 64, 64), "M",
    (5, 64, 128), (7, 128, 128), "M",
    (10, 128, 256), (12, 256, 256), (14, 256, 256), "M",
    (17, 256, 512), (19, 512, 512), (21, 512, 512), "M",
    (24, 512, 512), (26, 512, 512), (28, 512, 512), "M",
]

# relu indices (in torchvision ``features`` numbering) after which the
# reference taps its slices
VGG19_SLICE_TAPS = (1, 6, 11, 20, 29)       # utils/losses.py:17-26
VGG16_LPIPS_TAPS = (3, 8, 15, 22, 29)       # lpips vgg16 slices (relu1_2..relu5_3)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _weights_dir():
    return os.environ.get("IPOKE_WEIGHTS", os.path.join("logs", "weights"))


def load_or_init(name, layout, seed=0):
    """Returns {conv_idx: {'w': HWIO, 'b': (O,)}} (NUMPY arrays — cached values
    must never be jax tracers) and a bool 'pretrained'."""
    path = os.path.join(_weights_dir(), f"{name}.npz")
    params = {}
    if os.path.exists(path):
        data = np.load(path)
        for item in layout:
            if item == "M":
                continue
            idx, _, _ = item
            w = data[f"conv{idx}/w"]  # OIHW
            params[idx] = {
                "w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
                "b": np.asarray(data[f"conv{idx}/b"]),
            }
        return params, True
    # numpy RNG: must stay concrete even if first touched inside a jit trace
    # (these are cached; jax tracers must never leak into the cache)
    rng = np.random.default_rng(seed)
    for item in layout:
        if item == "M":
            continue
        idx, c_in, c_out = item
        w = rng.standard_normal((3, 3, c_in, c_out)).astype(np.float32) * np.sqrt(2.0 / (9 * c_in))
        params[idx] = {"w": w, "b": np.zeros((c_out,), np.float32)}
    return params, False


def features(params, x, layout, taps):
    """x: (B,H,W,3) already imagenet-normalized.  Returns list of tapped
    feature maps (after the relu at each tap index)."""
    feats = []
    cur = x
    idx_after = 0
    for item in layout:
        if item == "M":
            cur = jax.lax.reduce_window(
                cur, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            idx_after += 1
            continue
        conv_idx, _, _ = item
        cur = jax.nn.relu(conv2d(cur, params[conv_idx]["w"], params[conv_idx]["b"], padding=1))
        relu_idx = conv_idx + 1
        if relu_idx in taps:
            feats.append(cur)
        if max(taps) <= relu_idx and len(feats) == len(taps):
            break
        idx_after = relu_idx + 1
    return feats


def normalize_m11_to_imagenet(x):
    """[-1,1] RGB -> imagenet-normalized."""
    x01 = (x + 1.0) * 0.5
    return (x01 - IMAGENET_MEAN) / IMAGENET_STD


@lru_cache(maxsize=2)
def _cached(name):
    layout = VGG19_LAYOUT if "19" in name else VGG16_LAYOUT
    return load_or_init(name, layout)


def vgg_loss(x, y, weighted=False):
    """Perceptual L1 loss over VGG19 slices (reference VGGLoss).  x, y in
    [-1,1], (B,H,W,3).  NB the reference does NOT imagenet-normalize its
    inputs (normalize() is defined but unused, losses.py:31) — mirrored."""
    params, _ = _cached("vgg19_features")
    fx = features(params, x, VGG19_LAYOUT, VGG19_SLICE_TAPS)
    fy = features(params, y, VGG19_LAYOUT, VGG19_SLICE_TAPS)
    weights = [1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0]
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        l = jnp.mean(jnp.abs(a - b))
        total += weights[i] * l if weighted else l
    return total if weighted else total / len(fx)


def vgg16_diversity_features(x):
    """Concatenated normalized VGG16 slice features for the diversity cosine
    distance (utils/metrics.py:20-58)."""
    params, _ = _cached("vgg16_features")
    feats = features(params, normalize_m11_to_imagenet(x), VGG16_LAYOUT, VGG16_LPIPS_TAPS)
    pooled = [jnp.mean(f, axis=(1, 2)) for f in feats]
    cat = jnp.concatenate(pooled, axis=-1)
    return cat / (jnp.linalg.norm(cat, axis=-1, keepdims=True) + 1e-8)
