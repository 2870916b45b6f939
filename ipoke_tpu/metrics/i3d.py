"""I3D (Inflated Inception-V1, Kinetics-400) in JAX for FVD feature
extraction (reference: utils/metrics.py:999-1105 PyTorch I3D used as the
training monitor; testing/frechet_video_distance.py tfhub graph for official
numbers — both are this same architecture).

Weights: loaded from $IPOKE_WEIGHTS/i3d_kinetics_rgb.npz when present
(produced by ckpt/torch_import.convert_i3d from the reference's
``logs/I3D/i3d_kinetics_rgb.pth``); seeded random filters otherwise (relative
FVD comparisons only — NOT reference-parity).

Layout: videos (B, T, H, W, 3); convs NDHWC/DHWIO; BN folded into scale/bias
at conversion time (inference-only network).
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.nn.core import conv3d, resize_bilinear_align_corners

# GoogLeNet inception channel table: name -> (out1x1, red3x3, out3x3, red5x5(->3x3 in i3d), out5x5, pool_proj)
INCEPTION = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}

MIXED_IN = {
    "Mixed_3b": 192, "Mixed_3c": 256,
    "Mixed_4b": 480, "Mixed_4c": 512, "Mixed_4d": 512, "Mixed_4e": 512, "Mixed_4f": 528,
    "Mixed_5b": 832, "Mixed_5c": 832,
}


def _unit_names():
    names = [("Conv3d_1a_7x7", 3, 64, (7, 7, 7)), ("Conv3d_2b_1x1", 64, 64, (1, 1, 1)),
             ("Conv3d_2c_3x3", 64, 192, (3, 3, 3))]
    for blk, (o1, r3, o3, r5, o5, pp) in INCEPTION.items():
        cin = MIXED_IN[blk]
        names += [
            (f"{blk}/b0", cin, o1, (1, 1, 1)),
            (f"{blk}/b1a", cin, r3, (1, 1, 1)),
            (f"{blk}/b1b", r3, o3, (3, 3, 3)),
            (f"{blk}/b2a", cin, r5, (1, 1, 1)),
            (f"{blk}/b2b", r5, o5, (3, 3, 3)),
            (f"{blk}/b3", cin, pp, (1, 1, 1)),
        ]
    names.append(("logits", 1024, 400, (1, 1, 1)))
    return names


def _weights_path():
    d = os.environ.get("IPOKE_WEIGHTS", os.path.join("logs", "weights"))
    return os.path.join(d, "i3d_kinetics_rgb.npz")


@lru_cache(maxsize=1)
def load_params():
    """Returns ({name: {'w','b'}}, pretrained: bool).  BN is pre-folded:
    b = beta - mean * gamma / sqrt(var+eps); w scaled by gamma/sqrt(var+eps)."""
    path = _weights_path()
    params = {}
    if os.path.exists(path):
        data = np.load(path)
        for name, ci, co, k in _unit_names():
            key = name.replace("/", ".")
            params[name] = {
                "w": np.asarray(data[f"{key}.w"]),  # stored DHWIO
                "b": np.asarray(data[f"{key}.b"]),
            }
        return params, True
    # numpy arrays only: this is lru_cached and must never hold jax tracers
    rng = np.random.default_rng(0)
    for name, ci, co, k in _unit_names():
        fan_in = ci * k[0] * k[1] * k[2]
        params[name] = {
            "w": (rng.standard_normal(k + (ci, co)) * np.sqrt(2.0 / fan_in)).astype(np.float32),
            "b": np.zeros((co,), np.float32),
        }
    return params, False


def _tf_same_pads(in_sizes, window, strides):
    """TF "SAME" padding (stride- and shape-aware): for size n, kernel k,
    stride s the total pad is max((ceil(n/s)-1)*s + k - n, 0), split low//2.

    The reference implements this with runtime mod handling on the time axis
    (utils/metrics.py:814-843 get_padding_shape) and the divisible-case
    formula max(k-s, 0) on H/W — identical to the full TF formula on every
    shape the pipeline produces (224-input spatial sizes stay divisible).
    Shapes are static under jit, so this is compile-time arithmetic."""
    pads = []
    for n, k, s in zip(in_sizes, window, strides):
        total = max((-(-n // s) - 1) * s + k - n, 0)
        pads.append((total // 2, total - total // 2))
    return tuple(pads)


def _unit(p, x, stride=1, padding="SAME", relu=True):
    if isinstance(stride, int):
        stride = (stride, stride, stride)
    window = p["w"].shape[:3]
    if padding == "SAME":
        pads = _tf_same_pads(x.shape[1:4], window, stride)
    else:
        pads = ((0, 0),) * 3
    y = conv3d(x, p["w"], p["b"], stride=stride, padding=pads)
    return jax.nn.relu(y) if relu else y


def _maxpool(x, window, strides):
    pads = _tf_same_pads(x.shape[1:4], window, strides)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1,) + window + (1,), (1,) + strides + (1,),
        ((0, 0),) + pads + ((0, 0),),
    )


def _inception(params, name, x):
    b0 = _unit(params[f"{name}/b0"], x)
    b1 = _unit(params[f"{name}/b1b"], _unit(params[f"{name}/b1a"], x))
    b2 = _unit(params[f"{name}/b2b"], _unit(params[f"{name}/b2a"], x))
    b3 = _unit(params[f"{name}/b3"], _maxpool(x, (3, 3, 3), (1, 1, 1)))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def features(video, params=None):
    """video: (B, T, H, W, 3) in [-1, 1].  Returns 400-dim logits features —
    the reference's FVD uses logits as features (utils/metrics.py:726-733).

    Preprocessing parity (utils/metrics.py:786-802): bilinear align-corners
    resize to 224x224, then denorm [-1,1] -> [0,1] — the reference feeds the
    torch I3D in [0,1]."""
    if params is None:
        params, _ = load_params()
    b, t, h, w, c = video.shape
    if (h, w) != (224, 224):
        video = jax.vmap(lambda v: resize_bilinear_align_corners(v, (224, 224)))(video)
    x = (video + 1.0) * 0.5
    x = _unit(params["Conv3d_1a_7x7"], x, stride=2)
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    x = _unit(params["Conv3d_2b_1x1"], x)
    x = _unit(params["Conv3d_2c_3x3"], x)
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    x = _inception(params, "Mixed_3b", x)
    x = _inception(params, "Mixed_3c", x)
    x = _maxpool(x, (3, 3, 3), (2, 2, 2))
    for blk in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _inception(params, blk, x)
    x = _maxpool(x, (2, 2, 2), (2, 2, 2))
    x = _inception(params, "Mixed_5b", x)
    x = _inception(params, "Mixed_5c", x)
    # reference head (utils/metrics.py:1066-1105): AvgPool3d((2,7,7), stride 1,
    # VALID) -> 1x1x1 logits conv -> mean over the remaining time steps.
    # (kd=2 sliding window != plain temporal mean for >2 final frames.)
    kd = min(2, x.shape[1])
    window = (1, kd, x.shape[2], x.shape[3], 1)
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window, (1,) * 5, "VALID"
    ) / float(kd * x.shape[2] * x.shape[3])
    x = _unit(params["logits"], x, padding="VALID", relu=False)
    return jnp.mean(x, axis=(1, 2, 3))  # (B, 400)
