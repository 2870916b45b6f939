"""Optical-flow building blocks — the TPU-native equivalents of FlowNet2's
custom CUDA ops (reference submodule models/flownet2: correlation,
resample2d, channelnorm — SURVEY §2.9):

  correlation_cost_volume : correlation layer (the only truly custom kernel)
  warp_bilinear           : resample2d (bilinear gather by flow)
  channel_norm            : L2 over channels

The cost volume is expressed as shifted elementwise products + channel
reduction — XLA fuses this into a handful of vectorized ops.  The learned
coarse-to-fine estimator built on these ops lives in ops/pwc.py (PWC-lite);
the weight-free Horn-Schunck solver below remains as the zero-setup fallback.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def channel_norm(x, eps=1e-8):
    """(B,H,W,C) -> (B,H,W,1) L2 norm over channels."""
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def correlation_cost_volume(f1, f2, max_disp=4, stride=1):
    """f1, f2: (B,H,W,C).  Output (B,H,W,D^2) with D = 2*max_disp//stride+1;
    channel (dy,dx) = mean_c f1[x] * f2[x + (dy,dx)] (FlowNet-C correlation,
    zero-padded at borders)."""
    b, h, w, c = f1.shape
    disps = range(-max_disp, max_disp + 1, stride)
    out = []
    f2p = jnp.pad(f2, ((0, 0), (max_disp, max_disp), (max_disp, max_disp), (0, 0)))
    for dy in disps:
        for dx in disps:
            shifted = jax.lax.dynamic_slice(
                f2p, (0, max_disp + dy, max_disp + dx, 0), (b, h, w, c)
            )
            out.append(jnp.mean(f1 * shifted, axis=-1))
    return jnp.stack(out, axis=-1)


def warp_bilinear(x, flow):
    """resample2d parity: sample x at (i + flow_y, j + flow_x).

    x: (B,H,W,C); flow: (B,H,W,2) with channels (dy, dx) in pixels.
    Implemented with one-hot-free gathers + bilinear mixing; out-of-range
    samples clamp to the border (FlowNet2 resample2d semantics)."""
    b, h, w, c = x.shape
    yy = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    xx = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    sy = jnp.clip(yy + flow[..., 0], 0.0, h - 1.0)
    sx = jnp.clip(xx + flow[..., 1], 0.0, w - 1.0)
    y0 = jnp.clip(jnp.floor(sy), 0, h - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(sx), 0, w - 2).astype(jnp.int32)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]

    def gather(yi, xi):
        flat = x.reshape(b, h * w, c)
        idx = yi * w + xi  # (B,H,W)
        return jnp.take_along_axis(flat, idx.reshape(b, h * w, 1), axis=1).reshape(b, h, w, c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


# ---------------------------------------------------------------------------
# pyramid flow solver: a pretrained-weight-free flow estimator so the data
# preparation pipeline runs end to end in this environment.  Coarse-to-fine
# Horn-Schunck-style iterations, fully jittable, batched on TPU.
# ---------------------------------------------------------------------------

def _gray(x):
    return jnp.mean(x, axis=-1, keepdims=True)


def _resize(x, size):
    from ipoke_tpu.nn.core import resize_bilinear_align_corners

    return resize_bilinear_align_corners(x, size)


def _gradients(img):
    dy = jnp.gradient(img, axis=1)
    dx = jnp.gradient(img, axis=2)
    return dy, dx


def _avg(f):
    k = jnp.array([[1, 2, 1], [2, 0, 2], [1, 2, 1]], f.dtype) / 12.0
    from ipoke_tpu.nn.core import conv2d

    w = jnp.zeros((3, 3, 2, 2), f.dtype)
    w = w.at[:, :, 0, 0].set(k).at[:, :, 1, 1].set(k)
    return conv2d(f, w, padding=1)


def horn_schunck_level(img1, img2, flow, n_iters=30, alpha=0.5):
    """One pyramid level of Horn-Schunck with warping linearization."""

    def body(flow, _):
        warped = warp_bilinear(img2, flow)
        it = warped - img1
        iy, ix = _gradients(warped)
        iy, ix, it = iy[..., 0], ix[..., 0], it[..., 0]
        fbar = _avg(flow)
        num = iy * fbar[..., 0] + ix * fbar[..., 1] + it
        den = alpha**2 + iy * iy + ix * ix
        upd = num / den
        new = jnp.stack([fbar[..., 0] - iy * upd, fbar[..., 1] - ix * upd], axis=-1)
        return new, None

    flow, _ = jax.lax.scan(body, flow, None, length=n_iters)
    return flow


def estimate_flow(frame1, frame2, n_levels=4, n_iters=60, alpha=0.5):
    """Dense flow frame1 -> frame2.  frames: (B,H,W,3) in [-1,1].
    Returns (B,H,W,2) flow in pixels (dy, dx).

    NB: this weight-free solver recovers flow direction faithfully but
    underestimates magnitudes on large displacements (classic HS bias) —
    sufficient for poke simulation (direction + relative magnitude); for
    reference-parity flow use a converted FlowNet2/PWC checkpoint with the
    correlation ops above."""
    g1, g2 = _gray(frame1), _gray(frame2)
    b, h, w, _ = g1.shape
    sizes = [(max(h >> l, 8), max(w >> l, 8)) for l in range(n_levels)][::-1]
    flow = jnp.zeros((b,) + sizes[0] + (2,), frame1.dtype)
    for li, size in enumerate(sizes):
        p1 = _resize(g1, size)
        p2 = _resize(g2, size)
        if flow.shape[1:3] != size:
            scale_y = size[0] / flow.shape[1]
            scale_x = size[1] / flow.shape[2]
            flow = _resize(flow, size) * jnp.asarray([scale_y, scale_x], flow.dtype)
        flow = horn_schunck_level(p1, p2, flow, n_iters=n_iters, alpha=alpha)
    return flow
