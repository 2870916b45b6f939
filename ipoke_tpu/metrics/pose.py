"""Pose estimation for keypoint metrics (reference: utils/posenet_wrapper.py
PoseNetWrapper around pose_resnet-152; heatmap peak extraction get_max_preds).

pose_resnet = ResNet backbone + 3 deconv stages + 1x1 heatmap head.  Inference
is plain convs -> jitted JAX; the reference's native NMS extension is only
needed for training the pose net and is not used here (SURVEY §2.9).

Weights: $IPOKE_WEIGHTS/pose_resnet_152.npz (converted from the reference
submodule's checkpoint).  Without weights, a seeded random-filter depth-50
backbone stands in so the full KPS PROTOCOL (global NN-over-samples
selection, per-frame stats — utils/metrics.py:259-331) still runs; outputs
are then marked UNPRETRAINED by the callers (VERDICT r2 items 4/6/10).
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.nn.core import conv2d, conv_transpose2d

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

BOTTLENECK_LAYERS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def _weights_path():
    return os.path.join(
        os.environ.get("IPOKE_WEIGHTS", os.path.join("logs", "weights")), "pose_resnet_152.npz"
    )


def pose_weights_available():
    return os.path.exists(_weights_path())


_FALLBACK_DEPTH = 50  # random-filter stand-in backbone (protocol-only runs)


def default_depth():
    return 152 if pose_weights_available() else _FALLBACK_DEPTH


@lru_cache(maxsize=1)
def load_params():
    """Flat dict {name: np.ndarray} with BN folded (inference only).

    Without the weights file: seeded He-init random filters for a depth-50
    pose_resnet, so keypoint code paths execute end to end (outputs are
    meaningless as poses; callers mark them UNPRETRAINED)."""
    if pose_weights_available():
        data = np.load(_weights_path())
        return {k: np.asarray(v) for k, v in data.items()}
    rng = np.random.default_rng(7)

    def conv(ci, co, k):
        fan = k * k * ci
        return (rng.standard_normal((k, k, ci, co)) * np.sqrt(2.0 / fan)).astype(np.float32)

    p = {"stem.w": conv(3, 64, 7)}
    cin = 64
    widths = (64, 128, 256, 512)
    for li, n_blocks in enumerate(BOTTLENECK_LAYERS[_FALLBACK_DEPTH]):
        w = widths[li]
        for bi in range(n_blocks):
            pre = f"layer{li+1}.{bi}"
            p[f"{pre}.conv1.w"] = conv(cin, w, 1)
            p[f"{pre}.conv2.w"] = conv(w, w, 3)
            p[f"{pre}.conv3.w"] = conv(w, w * 4, 1)
            if bi == 0:
                p[f"{pre}.down.w"] = conv(cin, w * 4, 1)
            cin = w * 4
    for di in range(3):
        # conv_transpose kernels stored (k,k,ci,co) like the converter emits
        p[f"deconv{di}.w"] = conv(cin, 256, 4)
        cin = 256
    p["head.w"] = conv(256, 17, 1)
    return p


def _bottleneck(p, prefix, x, stride=1):
    def unit(name, y, s=1, pad=0):
        return conv2d(y, p[f"{prefix}.{name}.w"], p.get(f"{prefix}.{name}.b"), stride=s, padding=pad)

    out = jax.nn.relu(unit("conv1", x))
    out = jax.nn.relu(unit("conv2", out, s=stride, pad=1))
    out = unit("conv3", out)
    res = x
    if f"{prefix}.down.w" in p:
        res = conv2d(x, p[f"{prefix}.down.w"], p.get(f"{prefix}.down.b"), stride=stride)
    return jax.nn.relu(out + res)


def heatmaps(images, depth=None):
    """images: (B,H,W,3) in [-1,1] -> (B, H/4*?, W/4*?, 17) COCO heatmaps.
    Resized to 256x256 + imagenet-normalized (posenet_wrapper.py:24-37;
    torchvision Resize = bilinear half-pixel, NOT align_corners)."""
    if depth is None:
        depth = default_depth()
    p = load_params()
    x = images
    if x.shape[1:3] != (256, 256):
        x = jax.image.resize(x, (x.shape[0], 256, 256, x.shape[-1]), method="linear")
    x = ((x + 1) * 0.5 - IMAGENET_MEAN) / IMAGENET_STD
    x = jax.nn.relu(conv2d(x, p["stem.w"], p.get("stem.b"), stride=2, padding=3))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    layers = BOTTLENECK_LAYERS[depth]
    for li, n_blocks in enumerate(layers):
        stride = 1 if li == 0 else 2
        for bi in range(n_blocks):
            x = _bottleneck(p, f"layer{li+1}.{bi}", x, stride=stride if bi == 0 else 1)
    # pose_resnet deconv stages: ConvTranspose2d(k=4, s=2, p=1, output_padding=0)
    for di in range(3):
        x = jax.nn.relu(
            conv_transpose2d(x, p[f"deconv{di}.w"], p.get(f"deconv{di}.b"),
                             stride=2, padding=1, output_padding=0)
        )
    return conv2d(x, p["head.w"], p.get("head.b"))


def get_max_preds(hm):
    """Heatmap peak extraction (reference imports it from the pose submodule;
    reimplemented as a pure argmax — utils/posenet_wrapper.py:10,44-58).

    hm: (B, H, W, K) -> (coords (B,K,2) [x,y], confidences (B,K))."""
    b, h, w, k = hm.shape
    flat = hm.reshape(b, h * w, k)
    idx = jnp.argmax(flat, axis=1)
    conf = jnp.max(flat, axis=1)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    coords = jnp.stack([xs, ys], axis=-1)
    return jnp.where(conf[..., None] > 0, coords, -1.0), conf


def keypoints_abs(images, input_size=None):
    """Absolute keypoints in input-pixel space (x scale input/heatmap)."""
    hm = heatmaps(images)
    coords, conf = get_max_preds(hm)
    scale = (input_size or images.shape[1]) / hm.shape[1]
    return coords * scale, conf


def keypoints_rel(images):
    hm = heatmaps(images)
    coords, conf = get_max_preds(hm)
    return coords / hm.shape[1], conf


def kps_nn_protocol(kps_pred, kps_target):
    """Exact KPSMetric.update math (utils/metrics.py:285-307), weights-free.

    kps_pred: (B, N, T, K, 2) predicted keypoints of N samples;
    kps_target: (B, 1, T, K, 2) ground truth.  The NN sample is selected
    GLOBALLY per example (argmin over N of the (T,K,2)-mean MSE); per-frame
    stats are reported for that sample plus mean/std across samples.

    Returns dict of np arrays: nn_err_per_frame (B,T), mean_per_frame (B,T),
    std_per_frame (B,T), nn_err (B,)."""
    kps_pred = np.asarray(kps_pred, np.float32)
    kps_target = np.asarray(kps_target, np.float32)
    mse = (kps_pred - kps_target) ** 2                  # (B,N,T,K,2)
    mse_global = mse.mean(axis=(2, 3, 4))               # (B,N)
    min_ids = mse_global.argmin(axis=1)                 # (B,)
    mse_per_frame = mse.mean(axis=(3, 4))               # (B,N,T)
    b = mse.shape[0]
    nns_per_frame = mse_per_frame[np.arange(b), min_ids]  # (B,T)
    # torch .std() is the sample std (ddof=1)
    std_per_frame = mse_per_frame.std(axis=1, ddof=1) if mse.shape[1] > 1 \
        else np.zeros_like(nns_per_frame)
    return {
        "nn_err_per_frame": nns_per_frame,
        "mean_per_frame": mse_per_frame.mean(axis=1),
        "std_per_frame": std_per_frame,
        "nn_err": nns_per_frame.mean(axis=1),
    }


def keypoint_mse(params, spec, config, datamod, n_batches=8):
    """Best-of-N keypoint MSE in relative space (reference KPSMetric,
    utils/metrics.py:259-331)."""
    from ipoke_tpu.models import second_stage as model_ss

    tcfg = config.get("testing", {})
    n_samples = int(tcfg.get("n_samples_per_data_point", 5))
    rng = jax.random.PRNGKey(0)

    @jax.jit
    def sample(batch, key):
        return model_ss.forward_sample(params, spec, batch, key, n_samples=n_samples)

    nn_errs, nn_frames = [], []
    for bi, raw in enumerate(datamod.loader("test")):
        if bi >= n_batches:
            break
        batch = {k: jnp.asarray(v) for k, v in raw.items() if k in ("images", "poke", "flow")}
        if "keypoint_poke" in raw:
            # targeted keypoint pokes (reference kps_acc mode, :761-783)
            batch["poke"] = jnp.asarray(raw["keypoint_poke"])
        rng, sub = jax.random.split(rng)
        vids = sample(batch, sub)  # (N,B,T,H,W,3)
        tgt = batch["images"][:, 1:]
        n, b = vids.shape[0], tgt.shape[0]
        t = tgt.shape[1]
        kp_t, _ = keypoints_rel(tgt.reshape((b * t,) + tgt.shape[2:]))
        kp_gt = np.asarray(kp_t).reshape(b, 1, t, -1, 2)
        kp_pred = np.stack([
            np.asarray(keypoints_rel(vids[si].reshape((b * t,) + tgt.shape[2:]))[0])
            .reshape(b, t, -1, 2)
            for si in range(n)
        ], axis=1)
        stats = kps_nn_protocol(kp_pred, kp_gt)
        nn_errs.append(stats["nn_err"])
        nn_frames.append(stats["nn_err_per_frame"])
    key = "KPS_mse" if pose_weights_available() else "KPS_mse_UNPRETRAINED"
    return {
        key: float(np.concatenate(nn_errs).mean()),
        f"{key}_per_frame": np.concatenate(nn_frames).mean(0).tolist(),
        "pose_pretrained": pose_weights_available(),
    }
