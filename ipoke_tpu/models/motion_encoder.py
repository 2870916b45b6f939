"""3D-ResNet motion encoder (reference: models/modules/motion_models/
motion_encoder.py:150-241, ResNetMotionEncoder / resnet18_alternative).

Video layout: (B, T, H, W, C).  The encoder compresses T x S x S x 3 into a
(B, s, s, z_dim) spatial motion latent (s = min_spatial_size), with temporal
strides chosen exactly as the reference does from (max_frames, full_seq,
spatial_size, min_spatial_size).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ipoke_tpu.nn import core
from ipoke_tpu.nn.core import conv3d, group_norm


@dataclass(frozen=True)
class MotionEncoderSpec:
    channels: Tuple[int, ...]          # ENC_M_channels
    z_dim: int
    spatial_size: int                  # input H (= W)
    max_frames: int
    min_spatial_size: int = 8
    full_seq: bool = True
    deterministic: bool = False
    layers: Tuple[int, int, int, int] = (2, 2, 2, 2)  # resnet18

    def derived(self):
        """Reproduce the reference's stride/layer plumbing
        (motion_encoder.py:166-188)."""
        channels = list(self.channels)
        first_block_down = (
            len(channels) - 1 < int(math.ceil(math.log2(self.max_frames))) or self.full_seq
        )
        stride1 = (2, 1, 1) if first_block_down else (1, 1, 1)
        stride4 = (2, 1, 1) if (self.full_seq and self.max_frames >= 16) else None
        if self.spatial_size // 2**3 > self.min_spatial_size:
            stride4 = (2, 2, 2)
        has_layer4 = stride4 is not None
        if has_layer4 and len(channels) < 5:
            channels.append(channels[-1])
        has_layer5 = self.spatial_size // 2**4 > self.min_spatial_size
        last_channels = channels[3]
        if has_layer4:
            last_channels = channels[4]
        if has_layer5:
            last_channels = channels[5]
        return channels, stride1, stride4, has_layer4, has_layer5, last_channels


def _init_basic_block(key, c_in, c_out, stride):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": {"w": core.kaiming_normal(ks[0], (3, 3, 3, c_in, c_out))},
        "gn1": {"gamma": jnp.ones((c_out,)), "beta": jnp.zeros((c_out,))},
        "conv2": {"w": core.kaiming_normal(ks[1], (3, 3, 3, c_out, c_out))},
        "gn2": {"gamma": jnp.ones((c_out,)), "beta": jnp.zeros((c_out,))},
    }
    if stride != (1, 1, 1) or c_in != c_out:
        p["down"] = {
            "w": core.kaiming_normal(ks[2], (1, 1, 1, c_in, c_out)),
            "gn": {"gamma": jnp.ones((c_out,)), "beta": jnp.zeros((c_out,))},
        }
    return p


def _basic_block_apply(p, x, stride, conv_fn=conv3d, gn_fn=group_norm):
    residual = x
    out = conv_fn(x, p["conv1"]["w"], stride=stride, padding=1)
    out = jax.nn.relu(gn_fn(out, p["gn1"]["gamma"], p["gn1"]["beta"], 16))
    out = conv_fn(out, p["conv2"]["w"], stride=1, padding=1)
    out = gn_fn(out, p["gn2"]["gamma"], p["gn2"]["beta"], 16)
    if "down" in p:
        residual = conv_fn(x, p["down"]["w"], stride=stride, padding=0)
        residual = gn_fn(residual, p["down"]["gn"]["gamma"], p["down"]["gn"]["beta"], 16)
    return jax.nn.relu(out + residual)


def _init_layer(key, c_in, c_out, n_blocks, stride):
    blocks = [_init_basic_block(jax.random.fold_in(key, 0), c_in, c_out, stride)]
    for i in range(1, n_blocks):
        blocks.append(_init_basic_block(jax.random.fold_in(key, i), c_out, c_out, (1, 1, 1)))
    return blocks


def _layer_apply(blocks, x, stride, conv_fn=conv3d, gn_fn=group_norm):
    x = _basic_block_apply(blocks[0], x, stride, conv_fn=conv_fn, gn_fn=gn_fn)
    for b in blocks[1:]:
        x = _basic_block_apply(b, x, (1, 1, 1), conv_fn=conv_fn, gn_fn=gn_fn)
    return x


def init(key, spec: MotionEncoderSpec):
    channels, stride1, stride4, has_l4, has_l5, last_c = spec.derived()
    ks = jax.random.split(key, 8)
    p = {
        "conv1": {"w": core.kaiming_normal(ks[0], (3, 7, 7, 3, channels[0]))},
        "gn1": {"gamma": jnp.ones((channels[0],)), "beta": jnp.zeros((channels[0],))},
        "layer1": _init_layer(ks[1], channels[0], channels[1], spec.layers[0], stride1),
        "layer2": _init_layer(ks[2], channels[1], channels[2], spec.layers[1], (2, 2, 2)),
        "layer3": _init_layer(ks[3], channels[2], channels[3], spec.layers[2], (2, 2, 2)),
        "conv_mu": {
            "w": core.kaiming_uniform_torch_default(ks[6], (3, 3, last_c, spec.z_dim)),
            "b": jnp.zeros((spec.z_dim,)),
        },
        "conv_var": {
            "w": core.kaiming_uniform_torch_default(ks[7], (3, 3, last_c, spec.z_dim)),
            "b": jnp.zeros((spec.z_dim,)),
        },
    }
    if has_l4:
        p["layer4"] = _init_layer(ks[4], channels[3], channels[4], spec.layers[3], stride4)
    if has_l5:
        p["layer5"] = _init_layer(ks[5], channels[4], channels[5], spec.layers[3], (2, 2, 2))
    return p


def apply(
    params,
    x,
    spec: MotionEncoderSpec,
    rng: Optional[jax.Array] = None,
    conv_fn=conv3d,
    gn_fn=group_norm,
    t_reduce=None,
):
    """x: (B, T, H, W, 3) video.  Returns (z, mu, logvar) with z the sampled
    (or deterministic) motion latent, each (B, s, s, z_dim).

    ``conv_fn`` / ``gn_fn`` / ``t_reduce`` let a caller substitute
    communication-aware ops (sequence-parallel halo convs + global-stat
    group norm + cross-shard temporal reduction, parallel/seqpar.py) without
    duplicating the layer plumbing; the defaults are the plain dense ops."""
    channels, stride1, stride4, has_l4, has_l5, _ = spec.derived()
    out = conv_fn(x, params["conv1"]["w"], stride=(2, 2, 2), padding=(1, 3, 3))
    out = jax.nn.relu(gn_fn(out, params["gn1"]["gamma"], params["gn1"]["beta"], 16))
    out = _layer_apply(params["layer1"], out, stride1, conv_fn=conv_fn, gn_fn=gn_fn)
    out = _layer_apply(params["layer2"], out, (2, 2, 2), conv_fn=conv_fn, gn_fn=gn_fn)
    out = _layer_apply(params["layer3"], out, (2, 2, 2), conv_fn=conv_fn, gn_fn=gn_fn)
    if has_l4:
        out = _layer_apply(params["layer4"], out, stride4, conv_fn=conv_fn, gn_fn=gn_fn)
    if has_l5:
        out = _layer_apply(params["layer5"], out, (2, 2, 2), conv_fn=conv_fn, gn_fn=gn_fn)
    # temporal squeeze: (B, 1, s, s, C) -> (B, s, s, C)
    if t_reduce is not None:
        out = t_reduce(out)
    else:
        out = out.squeeze(1) if out.shape[1] == 1 else out.mean(axis=1)
    mu = core.conv2d(out, params["conv_mu"]["w"], params["conv_mu"]["b"], padding=1)
    logvar = core.conv2d(out, params["conv_var"]["w"], params["conv_var"]["b"], padding=1)
    if spec.deterministic or rng is None:
        return mu, mu, logvar
    eps = jax.random.normal(rng, logvar.shape, mu.dtype)
    z = eps * jnp.exp(0.5 * logvar) + mu
    return z, mu, logvar
