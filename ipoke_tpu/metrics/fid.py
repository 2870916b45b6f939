"""FID for the image-encoder validation (reference: utils/metrics.py:380-403
FID metric + FIDInceptionModel :540-588 over InceptionV3 pool3 features).

InceptionV3 (the torchvision/FID variant) implemented table-driven in NHWC;
BN folded at conversion (ckpt/torch_import.convert_inception_v3).  Weights:
$IPOKE_WEIGHTS/inception_v3_fid.npz; seeded random fallback otherwise
(relative comparisons only).

Reference-quirk parity (utils/metrics.py:575-588): FIDInceptionModel iterates
``self.v3._modules`` and injects ``F.avg_pool2d(k=3, s=2)`` after
Conv2d_2b_3x3 / Conv2d_4a_3x3.  In the torchvision that pytorch 1.7.1
resolves (0.8.x), the stem max pools are FUNCTIONAL calls inside
``Inception3._forward`` — ``maxpool1``/``maxpool2`` only became modules in
torchvision 0.9.0 (pytorch/vision#3059) — so they are absent from
``_modules`` and the injected avg pools REPLACE them: standard stem geometry
(149-147-147-73-73-71-35), Mixed blocks at 35x35, but with avg instead of
max downsampling.  Preprocessing: bilinear 299 resize with
align_corners=False (nn.Upsample default), [-1,1] -> [0,1], then ImageNet
mean/std.
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from ipoke_tpu.nn.core import conv2d


def _pool(x, window, stride, pad, kind="max"):
    pads = ((pad, pad), (pad, pad))
    if kind == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1,) + window + (1,), (1,) + stride + (1,),
            ((0, 0),) + pads + ((0, 0),),
        )
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1,) + window + (1,), (1,) + stride + (1,),
        ((0, 0),) + pads + ((0, 0),),
    )
    return s / (window[0] * window[1])


# unit table: name -> (kh, kw, c_in, c_out, stride, pad)
# AVGPOOL entries are the reference's injected F.avg_pool2d calls, which
# REPLACE torchvision 0.8.x's functional stem max pools (see module
# docstring — maxpool1/maxpool2 are not modules there, so the reference's
# _modules loop never runs them).
def _stem():
    return [
        ("Conv2d_1a_3x3", 3, 3, 3, 32, 2, 0),
        ("Conv2d_2a_3x3", 3, 3, 32, 32, 1, 0),
        ("Conv2d_2b_3x3", 3, 3, 32, 64, 1, 1),
        ("AVGPOOL", 3, 3, 0, 0, 2, 0),
        ("Conv2d_3b_1x1", 1, 1, 64, 80, 1, 0),
        ("Conv2d_4a_3x3", 3, 3, 80, 192, 1, 0),
        ("AVGPOOL", 3, 3, 0, 0, 2, 0),
    ]


def _inception_a(cin, pool_feat):
    return {
        "b1x1": [(1, 1, cin, 64, 1, 0)],
        "b5x5": [(1, 1, cin, 48, 1, 0), (5, 5, 48, 64, 1, 2)],
        "b3x3dbl": [(1, 1, cin, 64, 1, 0), (3, 3, 64, 96, 1, 1), (3, 3, 96, 96, 1, 1)],
        "bpool": [(1, 1, cin, pool_feat, 1, 0)],
    }


def _inception_b(cin):  # reduction
    return {
        "b3x3": [(3, 3, cin, 384, 2, 0)],
        "b3x3dbl": [(1, 1, cin, 64, 1, 0), (3, 3, 64, 96, 1, 1), (3, 3, 96, 96, 2, 0)],
    }


def _inception_c(cin, c7):
    return {
        "b1x1": [(1, 1, cin, 192, 1, 0)],
        "b7x7": [(1, 1, cin, c7, 1, 0), (1, 7, c7, c7, 1, (0, 3)), (7, 1, c7, 192, 1, (3, 0))],
        "b7x7dbl": [
            (1, 1, cin, c7, 1, 0), (7, 1, c7, c7, 1, (3, 0)), (1, 7, c7, c7, 1, (0, 3)),
            (7, 1, c7, c7, 1, (3, 0)), (1, 7, c7, 192, 1, (0, 3)),
        ],
        "bpool": [(1, 1, cin, 192, 1, 0)],
    }


def _inception_d(cin):  # reduction
    return {
        "b3x3": [(1, 1, cin, 192, 1, 0), (3, 3, 192, 320, 2, 0)],
        "b7x7x3": [
            (1, 1, cin, 192, 1, 0), (1, 7, 192, 192, 1, (0, 3)),
            (7, 1, 192, 192, 1, (3, 0)), (3, 3, 192, 192, 2, 0),
        ],
    }


def _inception_e(cin):
    return {
        "b1x1": [(1, 1, cin, 320, 1, 0)],
        "b3x3_1": [(1, 1, cin, 384, 1, 0)],
        "b3x3_2a": [(1, 3, 384, 384, 1, (0, 1))],
        "b3x3_2b": [(3, 1, 384, 384, 1, (1, 0))],
        "b3x3dbl_1": [(1, 1, cin, 448, 1, 0), (3, 3, 448, 384, 1, 1)],
        "b3x3dbl_2a": [(1, 3, 384, 384, 1, (0, 1))],
        "b3x3dbl_2b": [(3, 1, 384, 384, 1, (1, 0))],
        "bpool": [(1, 1, cin, 192, 1, 0)],
    }


BLOCKS = [
    ("Mixed_5b", "A", 192, 32), ("Mixed_5c", "A", 256, 64), ("Mixed_5d", "A", 288, 64),
    ("Mixed_6a", "B", 288, 0),
    ("Mixed_6b", "C", 768, 128), ("Mixed_6c", "C", 768, 160),
    ("Mixed_6d", "C", 768, 160), ("Mixed_6e", "C", 768, 192),
    ("Mixed_7a", "D", 768, 0), ("Mixed_7b", "E", 1280, 0), ("Mixed_7c", "E", 2048, 0),
]


def _all_units():
    units = []
    for item in _stem():
        if item[0] not in ("MAXPOOL", "AVGPOOL"):
            name, kh, kw, ci, co, s, p = item
            units.append((name, kh, kw, ci, co))
    for bname, kind, cin, extra in BLOCKS:
        spec = {"A": lambda: _inception_a(cin, extra), "B": lambda: _inception_b(cin),
                "C": lambda: _inception_c(cin, extra), "D": lambda: _inception_d(cin),
                "E": lambda: _inception_e(cin)}[kind]()
        for branch, convs in spec.items():
            for i, cv in enumerate(convs):
                kh, kw, ci, co = cv[0], cv[1], cv[2], cv[3]
                units.append((f"{bname}.{branch}.{i}", kh, kw, ci, co))
    return units


@lru_cache(maxsize=1)
def load_params():
    path = os.path.join(os.environ.get("IPOKE_WEIGHTS", os.path.join("logs", "weights")),
                        "inception_v3_fid.npz")
    params = {}
    if os.path.exists(path):
        data = np.load(path)
        for name, kh, kw, ci, co in _all_units():
            params[name] = {"w": np.asarray(data[f"{name}.w"]), "b": np.asarray(data[f"{name}.b"])}
        return params, True
    rng = np.random.default_rng(0)
    for name, kh, kw, ci, co in _all_units():
        fan = kh * kw * ci
        params[name] = {
            "w": (rng.standard_normal((kh, kw, ci, co)) * np.sqrt(2.0 / fan)).astype(np.float32),
            "b": np.zeros((co,), np.float32),
        }
    return params, False


def _unit(p, name, x, stride=1, pad=0):
    if isinstance(pad, int):
        pad = (pad, pad)
    y = conv2d(x, p[name]["w"], p[name]["b"], stride=stride,
               padding=((pad[0], pad[0]), (pad[1], pad[1])))
    return jax.nn.relu(y)


def _run_branch(p, prefix, convs, x):
    for i, cv in enumerate(convs):
        stride, pad = cv[4], cv[5]
        x = _unit(p, f"{prefix}.{i}", x, stride=stride, pad=pad)
    return x


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def pool3_features(images):
    """images: (B,H,W,3) in [-1,1] -> (B, 2048) pool3 features.

    Preprocessing per FIDInceptionModel (utils/metrics.py:566-575): bilinear
    299 resize with align_corners=False, denorm to [0,1], ImageNet mean/std."""
    p, _ = load_params()
    x = images
    if x.shape[1:3] != (299, 299):
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[-1]), method="linear")
    x = (x + 1.0) * 0.5
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    for item in _stem():
        if item[0] == "MAXPOOL":
            x = _pool(x, (3, 3), (2, 2), 0, "max")
        elif item[0] == "AVGPOOL":
            x = _pool(x, (3, 3), (2, 2), 0, "avg")
        else:
            name, kh, kw, ci, co, s, pad = item
            x = _unit(p, name, x, stride=s, pad=pad)
    for bname, kind, cin, extra in BLOCKS:
        spec = {"A": lambda: _inception_a(cin, extra), "B": lambda: _inception_b(cin),
                "C": lambda: _inception_c(cin, extra), "D": lambda: _inception_d(cin),
                "E": lambda: _inception_e(cin)}[kind]()
        outs = []
        if kind in ("A", "C"):
            for branch, convs in spec.items():
                src = _pool(x, (3, 3), (1, 1), 1, "avg") if branch == "bpool" else x
                outs.append(_run_branch(p, f"{bname}.{branch}", convs, src))
        elif kind in ("B", "D"):
            for branch, convs in spec.items():
                outs.append(_run_branch(p, f"{bname}.{branch}", convs, x))
            outs.append(_pool(x, (3, 3), (2, 2), 0, "max"))
        else:  # E
            b1 = _run_branch(p, f"{bname}.b1x1", spec["b1x1"], x)
            s3 = _run_branch(p, f"{bname}.b3x3_1", spec["b3x3_1"], x)
            s3 = jnp.concatenate([
                _run_branch(p, f"{bname}.b3x3_2a", spec["b3x3_2a"], s3),
                _run_branch(p, f"{bname}.b3x3_2b", spec["b3x3_2b"], s3),
            ], -1)
            d3 = _run_branch(p, f"{bname}.b3x3dbl_1", spec["b3x3dbl_1"], x)
            d3 = jnp.concatenate([
                _run_branch(p, f"{bname}.b3x3dbl_2a", spec["b3x3dbl_2a"], d3),
                _run_branch(p, f"{bname}.b3x3dbl_2b", spec["b3x3dbl_2b"], d3),
            ], -1)
            bp = _run_branch(p, f"{bname}.bpool", spec["bpool"],
                             _pool(x, (3, 3), (1, 1), 1, "avg"))
            outs = [b1, s3, d3, bp]
        x = jnp.concatenate(outs, axis=-1)
    return jnp.mean(x, axis=(1, 2))


def compute_fid(real_images, fake_images, batch_size=32):
    """FID over two image sets (N,H,W,3) in [-1,1] (NaN-filtered moments as
    in the reference's compute_fid, utils/metrics.py:489-538)."""
    feat_fn = jax.jit(pool3_features)

    def feats(imgs):
        out = []
        for i in range(0, imgs.shape[0], batch_size):
            out.append(np.asarray(feat_fn(jnp.asarray(imgs[i : i + batch_size]))))
        f = np.concatenate(out)
        return f[np.isfinite(f).all(axis=1)]

    fr, ff = feats(real_images), feats(fake_images)
    from ipoke_tpu.metrics.fvd import frechet_distance

    return frechet_distance(fr.mean(0), np.cov(fr, rowvar=False),
                            ff.mean(0), np.cov(ff, rowvar=False))
