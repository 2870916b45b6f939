"""Image quality metrics: SSIM and PSNR (reference: utils/metrics.py:450-482
wraps pytorch-lightning functional ssim/psnr on [0,1]-denormalized frames).

Both are pure-JAX, batched, jittable.  Inputs are [-1,1] videos/frames; we
denormalize to [0,1] as the reference does.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _denorm(x):
    return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)


def psnr(pred, target, data_range=1.0):
    """Mean PSNR over the batch.  pred/target: (..., H, W, C) in [-1,1]."""
    p = _denorm(pred)
    t = _denorm(target)
    axes = tuple(range(1, p.ndim))
    mse = jnp.mean((p - t) ** 2, axis=axes)
    return jnp.mean(10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12)))


def _gaussian_kernel(size=11, sigma=1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred, target, kernel_size=11, sigma=1.5, data_range=1.0, k1=0.01, k2=0.03):
    """Mean SSIM (gaussian-windowed, matching pytorch-lightning defaults).

    pred/target: (B, H, W, C) in [-1,1]."""
    p = _denorm(pred).astype(jnp.float32)
    t = _denorm(target).astype(jnp.float32)
    c = p.shape[-1]
    win = _gaussian_kernel(kernel_size, sigma)[..., None, None]  # (k,k,1,1)
    win = jnp.tile(win, (1, 1, 1, c))  # depthwise

    def filt(x):
        dn = lax.conv_dimension_numbers(x.shape, win.shape, ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, win, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
        )

    mu_p = filt(p)
    mu_t = filt(t)
    mu_pp = filt(p * p) - mu_p**2
    mu_tt = filt(t * t) - mu_t**2
    mu_pt = filt(p * t) - mu_p * mu_t
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (mu_pp + mu_tt + c2)
    )
    return jnp.mean(ssim_map)


def ssim_video(pred, target, **kw):
    """(B,T,H,W,C) convenience: mean over frames."""
    b, t = pred.shape[:2]
    return ssim(pred.reshape((b * t,) + pred.shape[2:]), target.reshape((b * t,) + target.shape[2:]), **kw)


def best_of_n_metric(metric_fn, samples, target):
    """Best-of-N-samples protocol (reference SampleMetric, utils/metrics.py:
    149-217): per example, evaluate the metric per frame for each of N samples
    and keep the best sample (min for LPIPS-style, handled by caller sign).

    samples: (N, B, T, H, W, C); target: (B, T, H, W, C).
    metric_fn: (frames_a, frames_b) -> (B*T,) per-frame values (lower=better).
    Returns (per_frame_mean (T,), per_frame_std (T,)).
    """
    n, b, t = samples.shape[:3]
    flat_t = target.reshape((b * t,) + target.shape[2:])

    def per_sample(s):
        flat_s = s.reshape((b * t,) + s.shape[2:])
        return metric_fn(flat_s, flat_t).reshape(b, t)

    vals = jnp.stack([per_sample(samples[i]) for i in range(n)])  # (N, B, T)
    seq_means = vals.mean(axis=2)  # (N, B)
    best = jnp.argmin(seq_means, axis=0)  # (B,)
    chosen = jnp.take_along_axis(vals, best[None, :, None], axis=0)[0]  # (B, T)
    return chosen.mean(axis=0), chosen.std(axis=0)
