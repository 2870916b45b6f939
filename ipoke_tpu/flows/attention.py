"""Attention / gated-conv blocks for the flow subnets (reference:
models/modules/INN/modules.py:814-923 — GatedConv2d, GatedAttentionLayer,
BasicConvAttnBlock; used when ``attention: True`` / ``cond_conv: True``).

ConcatELU doubles channels as concat(elu(x), elu(-x)); Gate is a*sigmoid(b)
over a channel split.  The attention layer is standard MHA over the 8x8
spatial grid with a learned positional embedding and a gated residual.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ipoke_tpu.nn import core
from ipoke_tpu.nn.core import conv2d


def concat_elu(x):
    return jnp.concatenate([jax.nn.elu(x), jax.nn.elu(-x)], axis=-1)


def gate(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


def init_gated_conv(key, dim, dim_out=None, dim_cond=None):
    ks = jax.random.split(key, 4)
    dim_out = dim_out or dim
    p = {
        "conv1": {"w": core.kaiming_uniform_torch_default(ks[0], (3, 3, 2 * dim, dim)),
                  "b": jnp.zeros((dim,))},
        "conv2": {"w": core.kaiming_uniform_torch_default(ks[1], (3, 3, 2 * dim, 2 * dim_out)),
                  "b": jnp.zeros((2 * dim_out,))},
    }
    if dim_out != dim:
        p["conv_sc"] = {"w": core.kaiming_uniform_torch_default(ks[2], (1, 1, dim, dim_out)),
                        "b": jnp.zeros((dim_out,))}
    if dim_cond is not None:
        p["cond_conv"] = {"w": core.kaiming_uniform_torch_default(ks[3], (3, 3, 2 * dim_cond, dim)),
                          "b": jnp.zeros((dim,))}
    return p


def gated_conv_apply(p, x, xc=None):
    c1 = conv2d(concat_elu(x), p["conv1"]["w"], p["conv1"]["b"], padding=1)
    if "conv_sc" in p:
        x = conv2d(x, p["conv_sc"]["w"], p["conv_sc"]["b"])
    if xc is not None and "cond_conv" in p:
        c1 = c1 + conv2d(concat_elu(xc), p["cond_conv"]["w"], p["cond_conv"]["b"], padding=1)
    c2 = conv2d(concat_elu(c1), p["conv2"]["w"], p["conv2"]["b"], padding=1)
    return x + gate(c2)


def init_attn_layer(key, channels):
    k1, k2 = jax.random.split(key)
    return {
        "proj1": {"w": 0.05 * jax.random.normal(k1, (channels, 3 * channels)),
                  "b": jnp.zeros((3 * channels,))},
        "proj2": {"w": 0.05 * jax.random.normal(k2, (channels, 2 * channels)),
                  "b": jnp.zeros((2 * channels,))},
    }


def attn_layer_apply(p, x, pos_emb, heads):
    """x: (B,H,W,C); pos_emb: (H,W,C)."""
    b, h, w, c = x.shape
    d = c // heads
    t = h * w
    qkv = (x + pos_emb[None]) .reshape(b, t, c) @ p["proj1"]["w"] + p["proj1"]["b"]
    qkv = qkv.reshape(b, t, 3, heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    att = jax.nn.softmax(q @ jnp.swapaxes(k, -2, -1) / math.sqrt(d), axis=-1)
    out = (att @ v).transpose(0, 2, 1, 3).reshape(b, t, c)
    gate_in = out @ p["proj2"]["w"] + p["proj2"]["b"]
    return x + gate(gate_in.reshape(b, h, w, 2 * c))


def _layer_norm(x, gamma=None, beta=None, eps=1e-5):
    """torch nn.LayerNorm((C,H,W)) on NCHW == normalize over (H,W,C) of NHWC,
    elementwise affine of shape (H,W,C) (BasicConvAttnBlock.norm)."""
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma[None] + beta[None]
    return y


def init_conv_attn_block(key, channels, spatial_size=None):
    k1, k2 = jax.random.split(key)
    p = {
        "gated": init_gated_conv(k1, channels),
        "attn": init_attn_layer(k2, channels),
    }
    if spatial_size is not None:
        shape = (spatial_size, spatial_size, channels)
        p["ln"] = {"gamma": jnp.ones(shape), "beta": jnp.zeros(shape)}
    return p


def conv_attn_block_apply(p, x, pos_emb, heads):
    ln = p.get("ln")
    g, b = (ln["gamma"], ln["beta"]) if ln else (None, None)
    x = gated_conv_apply(p["gated"], x)
    x = _layer_norm(x, g, b)
    x = attn_layer_apply(p["attn"], x, pos_emb, heads)
    return _layer_norm(x, g, b)
