"""GAN discriminators for first-stage training.

PatchDiscriminator   (reference: discriminators/patchgan.py:368-458)
Temporal3DDiscriminator (reference: discriminators/patchgan_3d.py:170-303,
  resnet-18 layout [2,2,2,2], spectral norm, GroupNorm, per-timestep FC heads)

Spectral norm: every conv stores a power-iteration vector 'u'; the train step
materializes w/sigma via nn.blocks.materialize_spectral_norm.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ipoke_tpu.nn import core
from ipoke_tpu.nn.blocks import init_conv
from ipoke_tpu.nn.core import conv2d, conv3d, group_norm, instance_norm

# ---------------------------------------------------------------------------
# 2D PatchGAN
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PatchDiscSpec:
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    bce_loss: bool = False
    gp_weight: float = 0.0
    fmap_weight: float = 1.0
    gen_weight: float = 1.0


def init_patch_disc(key, spec: PatchDiscSpec):
    ks = jax.random.split(key, spec.n_layers + 2)
    p = {"in_conv": init_conv(ks[0], 4, 4, spec.input_nc, spec.ndf, snorm=True)}
    layers = []
    nf_mult = 1
    for n in range(1, spec.n_layers):
        nf_prev, nf_mult = nf_mult, min(2**n, 8)
        layers.append(init_conv(ks[n], 4, 4, spec.ndf * nf_prev, spec.ndf * nf_mult, snorm=True))
    nf_prev, nf_mult = nf_mult, min(2**spec.n_layers, 8)
    layers.append(
        init_conv(ks[spec.n_layers], 4, 4, spec.ndf * nf_prev, spec.ndf * nf_mult, snorm=True)
    )
    p["layers"] = layers
    p["out_conv"] = init_conv(ks[-1], 4, 4, spec.ndf * nf_mult, 1, snorm=True)
    return p


def patch_disc_apply(p, x, spec: PatchDiscSpec):
    """x: (B,H,W,C) -> (pred (B,h,w,1), fmaps).  InstanceNorm between layers,
    leaky relu 0.2; last inner layer has stride 1 (reference layout)."""
    act = lambda v: jax.nn.leaky_relu(v, 0.2)
    x = act(conv2d(x, p["in_conv"]["w"], p["in_conv"]["b"], stride=2, padding=1))
    fmaps = []
    n = len(p["layers"])
    for i, layer in enumerate(p["layers"]):
        stride = 2 if i < n - 1 else 1
        x = conv2d(x, layer["w"], layer["b"], stride=stride, padding=1)
        x = act(instance_norm(x))
        fmaps.append(x)
    pred = conv2d(x, p["out_conv"]["w"], p["out_conv"]["b"], stride=1, padding=1)
    return pred, fmaps


# ---------------------------------------------------------------------------
# 3D temporal discriminator (resnet18-style)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TempDiscSpec:
    spatial_size: int = 128
    sequence_length: int = 12     # mf_dt
    num_classes: int = 1
    patch_temp: bool = False
    bce_loss: bool = False
    gp_weight: float = 1.0
    fmap_weight: float = 1.0
    gen_weight: float = 1.0
    layers: Tuple[int, int, int, int] = (2, 2, 2, 2)

    @property
    def stride_t(self):
        return 1 if self.patch_temp else 2


def _init_block3d(key, c_in, c_out, stride, stride_t):
    ks = jax.random.split(key, 3)

    def conv(k, ci, co, kk=3):
        w = core.orthogonal(k, (kk, kk, kk, ci, co))
        u = jax.random.normal(jax.random.fold_in(k, 7), (co,))
        return {"w": w, "u": u / (jnp.linalg.norm(u) + 1e-12)}

    p = {
        "conv1": conv(ks[0], c_in, c_out),
        "gn1": {"gamma": jnp.ones((c_out,)), "beta": jnp.zeros((c_out,))},
        "conv2": conv(ks[1], c_out, c_out),
        "gn2": {"gamma": jnp.ones((c_out,)), "beta": jnp.zeros((c_out,))},
    }
    if stride != 1 or stride_t != 1 or c_in != c_out:
        p["down"] = conv(ks[2], c_in, c_out)
        p["down_gn"] = {"gamma": jnp.ones((c_out,)), "beta": jnp.zeros((c_out,))}
    return p


def _block3d_apply(p, x, stride, stride_t):
    s = (stride_t, stride, stride)
    residual = x
    out = conv3d(x, p["conv1"]["w"], stride=s, padding=1)
    out = jax.nn.relu(group_norm(out, p["gn1"]["gamma"], p["gn1"]["beta"], 16))
    out = conv3d(out, p["conv2"]["w"], stride=1, padding=1)
    out = group_norm(out, p["gn2"]["gamma"], p["gn2"]["beta"], 16)
    if "down" in p:
        residual = conv3d(x, p["down"]["w"], stride=s, padding=1)
        residual = group_norm(residual, p["down_gn"]["gamma"], p["down_gn"]["beta"], 16)
    return jax.nn.relu(out + residual)


def init_temp_disc(key, spec: TempDiscSpec):
    ks = jax.random.split(key, 8)
    st = spec.stride_t

    def layer(k, c_in, c_out, n, stride, stride_t):
        blocks = [_init_block3d(jax.random.fold_in(k, 0), c_in, c_out, stride, stride_t)]
        for i in range(1, n):
            blocks.append(_init_block3d(jax.random.fold_in(k, i), c_out, c_out, 1, 1))
        return blocks

    w1 = core.orthogonal(ks[0], (3, 7, 7, 3, 64))
    u1 = jax.random.normal(ks[6], (64,))
    return {
        "conv1": {"w": w1, "u": u1 / (jnp.linalg.norm(u1) + 1e-12)},
        "gn1": {"gamma": jnp.ones((64,)), "beta": jnp.zeros((64,))},
        "layer1": layer(ks[1], 64, 64, spec.layers[0], 1, 1),
        "layer2": layer(ks[2], 64, 128, spec.layers[1], 1, st),
        "layer3": layer(ks[3], 128, 256, spec.layers[2], 2, st),
        "layer4": layer(ks[4], 256, 512, spec.layers[3], 2, st),
        "fc": {"w": 0.02 * jax.random.normal(ks[5], (512, spec.num_classes))},
    }


def temp_disc_apply(p, x, spec: TempDiscSpec):
    """x: (B,T,H,W,3) -> (pred (B, T_last*num_classes), fmaps)."""
    out_maps = []
    y = conv3d(x, p["conv1"]["w"], stride=(1, 2, 2), padding=(1, 3, 3))
    y = jax.nn.relu(group_norm(y, p["gn1"]["gamma"], p["gn1"]["beta"], 16))
    # maxpool3d k3 s(1,2,2) p1
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
    )

    def run_layer(blocks, y, stride, stride_t):
        y = _block3d_apply(blocks[0], y, stride, stride_t)
        for b in blocks[1:]:
            y = _block3d_apply(b, y, 1, 1)
        return y

    st = spec.stride_t
    y = run_layer(p["layer1"], y, 1, 1)
    out_maps.append(y)
    y = run_layer(p["layer2"], y, 1, st)
    out_maps.append(y)
    y = run_layer(p["layer3"], y, 2, st)
    out_maps.append(y)
    y = run_layer(p["layer4"], y, 2, st)
    out_maps.append(y)
    # avg pool over (1, last_size, last_size), then per-timestep FC heads
    y = jnp.mean(y, axis=(2, 3))  # (B, T', 512)
    pred = jnp.einsum("btc,cn->btn", y, p["fc"]["w"]).reshape(y.shape[0], -1)
    return pred, out_maps


# ---------------------------------------------------------------------------
# losses (shared between both discriminators; reference loss()/gp()/fmap_loss)
# ---------------------------------------------------------------------------

def disc_loss(pred, real: bool, bce: bool = False):
    if bce:
        target = jnp.ones_like(pred) if real else jnp.zeros_like(pred)
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    if real:
        return jnp.mean(jax.nn.relu(1.0 - pred))
    return jnp.mean(jax.nn.relu(1.0 + pred))


def gen_loss(pred_fake, bce: bool = False):
    if bce:
        return disc_loss(pred_fake, real=True, bce=True)
    return -jnp.mean(pred_fake)


def fmap_loss(fmaps_a, fmaps_b, kind="l1"):
    total = 0.0
    for a, b in zip(fmaps_a, fmaps_b):
        if kind == "l1":
            total += jnp.mean(jnp.abs(a - b))
        else:
            total += jnp.mean((a - b) ** 2)
    return total / len(fmaps_a)


def gradient_penalty(disc_fn, x):
    """R1-style penalty matching the reference's gp: sum over pixels of
    ||d pred.sum() / dx||^2, mean over batch."""

    def score(xx):
        pred, _ = disc_fn(xx)
        return jnp.sum(pred)

    g = jax.grad(score)(x)
    return jnp.mean(jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1))
