"""Legacy 3D-conv SPADE+ADAIN video generator (reference:
models/modules/motion_models/motion_generator.py) — the pre-GRU decoder used
by MotionModel.forward; the released first stage uses the per-frame SPADE
decoder instead (models/decoder.py).  Provided for component parity.

Layout: NDHWC.  generator_block: SPADE(start frame) -> lrelu -> conv3d ->
ADAIN(motion) -> lrelu -> conv3d, residual with Norm3D'd learned shortcut.
NB the reference's 3D Spade broadcasts its 2D gamma/beta over time only when
C == T (bitrot); we broadcast over the time axis explicitly (the intended
semantics, per the commented repeat_interleave at autoencoders/util.py:497).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ipoke_tpu.nn import core
from ipoke_tpu.nn.core import conv2d, conv3d, group_norm, resize_bilinear_align_corners


@dataclass(frozen=True)
class GeneratorSpec:
    img_size: int
    z_dim: int
    decoder_factor: int = 4
    spectral_norm: bool = True

    @property
    def nf(self):
        return self.decoder_factor


def _conv3d_p(key, k, ci, co, bias=True):
    p = {"w": core.kaiming_uniform_torch_default(key, (k, k, k, ci, co))}
    if bias:
        p["b"] = jnp.zeros((co,))
    return p


def _spade3d_init(key, num_features):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv": {"w": core.kaiming_uniform_torch_default(k1, (3, 3, 3, 128)),
                 "b": jnp.zeros((128,))},
        "conv_gamma": {"w": core.kaiming_uniform_torch_default(k2, (3, 3, 128, num_features)),
                       "b": jnp.zeros((num_features,))},
        "conv_beta": {"w": core.kaiming_uniform_torch_default(k3, (3, 3, 128, num_features)),
                      "b": jnp.zeros((num_features,))},
    }


def _spade3d_apply(p, x, frame):
    """x: (B,T,H,W,C); frame: (B,Hf,Wf,3).  GroupNorm (no affine) + 2D SPADE
    features broadcast over time."""
    from ipoke_tpu.nn.blocks import spade_num_groups

    ng = spade_num_groups(x.shape[-1])
    normalized = group_norm(x, None, None, num_groups=ng)
    y = resize_bilinear_align_corners(frame, x.shape[2:4])
    y = jax.nn.leaky_relu(conv2d(y, p["conv"]["w"], p["conv"]["b"], padding=1), 0.2)
    gamma = conv2d(y, p["conv_gamma"]["w"], p["conv_gamma"]["b"], padding=1)[:, None]
    beta = conv2d(y, p["conv_beta"]["w"], p["conv_beta"]["b"], padding=1)[:, None]
    return normalized * (1.0 + gamma) + beta


def _adain3d_init(key, z_dim, num_features):
    return {
        "w": core.kaiming_uniform_torch_default(key, (z_dim, 2 * num_features)),
        "b": jnp.zeros((2 * num_features,)),
    }


def _adain3d_apply(p, x, z):
    """Instance-norm (per sample/channel over T,H,W) + linear(z) gamma/beta
    (autoencoders/util.py ADAIN)."""
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    normalized = (x - mean) / jnp.sqrt(var + 1e-5)
    gb = z @ p["w"] + p["b"]
    gamma, beta = jnp.split(gb, 2, axis=-1)
    gamma = gamma[:, None, None, None, :]
    beta = beta[:, None, None, None, :]
    return (1.0 + gamma) * normalized + beta


def _norm3d_apply(x, gamma, beta):
    from ipoke_tpu.nn.blocks import spade_num_groups

    return group_norm(x, gamma, beta, num_groups=spade_num_groups(x.shape[-1]))


def _block_init(key, n_in, n_out, z_dim):
    n_mid = min(n_in, n_out)
    ks = jax.random.split(key, 6)
    p = {
        "spade": _spade3d_init(ks[0], n_in),
        "conv0": _conv3d_p(ks[1], 3, n_in, n_mid),
        "adain": _adain3d_init(ks[2], z_dim, n_mid),
        "conv1": _conv3d_p(ks[3], 3, n_mid, n_out),
    }
    if n_in != n_out:
        p["conv_s"] = _conv3d_p(ks[4], 1, n_in, n_out, bias=False)
        p["norm_s"] = {"gamma": jnp.ones((n_in,)), "beta": jnp.zeros((n_in,))}
    return p


def _block_apply(p, x, motion, frame):
    lrelu = lambda a: jax.nn.leaky_relu(a, 0.2)
    if "conv_s" in p:
        x_s = conv3d(_norm3d_apply(x, p["norm_s"]["gamma"], p["norm_s"]["beta"]),
                     p["conv_s"]["w"], padding=0)
    else:
        x_s = x
    dx = conv3d(lrelu(_spade3d_apply(p["spade"], x, frame)),
                p["conv0"]["w"], p["conv0"]["b"], padding=1)
    dx = conv3d(lrelu(_adain3d_apply(p["adain"], dx, motion)),
                p["conv1"]["w"], p["conv1"]["b"], padding=1)
    return x_s + dx


def _upsample(x, factors: Tuple[int, int, int]):
    ft, fh, fw = factors
    b, t, h, w, c = x.shape
    x = jnp.repeat(x, ft, axis=1) if ft > 1 else x
    if fh > 1 or fw > 1:
        x = x.reshape(b * x.shape[1], h, w, c)
        x = jax.image.resize(x, (x.shape[0], h * fh, w * fw, c), method="nearest")
        x = x.reshape(b, -1, h * fh, w * fw, c)
    return x


def init(key, spec: GeneratorSpec):
    nf = spec.nf
    ks = jax.random.split(key, 9)
    p = {
        "fc": {"w": core.kaiming_uniform_torch_default(ks[0], (spec.z_dim, 4 * 4 * 16 * nf)),
               "b": jnp.zeros((4 * 4 * 16 * nf,))},
        "head_0": _block_init(ks[1], 16 * nf, 16 * nf, spec.z_dim),
        "g_0": _block_init(ks[2], 16 * nf, 16 * nf, spec.z_dim),
        "g_1": _block_init(ks[3], 16 * nf, 8 * nf, spec.z_dim),
        "g_2": _block_init(ks[4], 8 * nf, 4 * nf, spec.z_dim),
        "g_3": _block_init(ks[5], 4 * nf, 2 * nf, spec.z_dim),
        "g_4": _block_init(ks[6], 2 * nf, nf, spec.z_dim),
        "conv_img": _conv3d_p(ks[7], 3, nf, 3),
    }
    return p


def apply(params, img, motion, spec: GeneratorSpec):
    """img: (B,H,W,3) start frame; motion: (B,z) latent vector.
    Returns video (B,T,H',W',3) in [-1,1] (reference Generator.forward,
    motion_generator.py:90-115: T grows 1 -> 2 via the (2,2,2) upsample)."""
    b = img.shape[0]
    nf = spec.nf
    x = (motion @ params["fc"]["w"] + params["fc"]["b"]).reshape(b, 1, 4, 4, 16 * nf)
    x = _block_apply(params["head_0"], x, motion, img)
    for name, factors in (("g_0", (1, 2, 2)), ("g_1", (1, 2, 2)), ("g_2", (1, 2, 2)),
                          ("g_3", (2, 2, 2))):
        x = _upsample(x, factors)
        x = _block_apply(params[name], x, motion, img)
    if spec.img_size > 64:
        x = _upsample(x, (1, 2, 2))
    x = _block_apply(params["g_4"], x, motion, img)
    x = conv3d(jax.nn.leaky_relu(x, 0.2), params["conv_img"]["w"],
               params["conv_img"]["b"], padding=1)
    return jnp.tanh(x)
