"""BigGAN decoder stack (reference: models/modules/autoencoders/biggan.py,
big_ae.py) — dead code in the reference (imported nowhere outside itself),
provided for component parity.  Inference-layout port: spectral norm is
folded into weights at conversion (ckpt/torch_import.sn_conv semantics);
ConditionalBatchNorm runs on stored running statistics.

Generator64/128: split the latent into (num_split) chunks; chunk 0 seeds the
4x4 trunk, each remaining chunk conditions one GBlock via
cat([chunk, class_embedding]); SelfAttention at sa_id; BN + relu + colorize
conv + tanh.  VariableDim variants split as (d - (k-1)*10, 10, ..., 10).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.nn import core
from ipoke_tpu.nn.core import conv2d


@dataclass(frozen=True)
class BigGANSpec:
    resolution: int = 64           # 64 | 128
    code_dim: int = 120
    n_class: int = 1000
    chn: int = 96
    n_channels: int = 3

    @property
    def blocks(self) -> Tuple[Tuple[int, int, bool], ...]:
        """(c_in_mult, c_out_mult, upsample) per GBlock + sa_id."""
        if self.resolution == 64:
            return ((16, 16), (16, 8), (8, 4), (4, 1))
        return ((16, 16), (16, 8), (8, 4), (4, 2), (2, 1))

    @property
    def sa_id(self):
        return 4 if self.resolution == 64 else 3  # biggan.py:274, 380

    @property
    def num_split(self):
        return len(self.blocks) + 1

    @property
    def z_per_chunk(self):
        return 20


def _linear(key, ci, co, bias=True):
    p = {"w": core.kaiming_uniform_torch_default(key, (ci, co))}
    if bias:
        p["b"] = jnp.zeros((co,))
    return p


def _conv(key, k, ci, co, bias=True):
    p = {"w": core.kaiming_uniform_torch_default(key, (k, k, ci, co))}
    if bias:
        p["b"] = jnp.zeros((co,))
    return p


def _cbn_init(key, num_features, z_dim):
    k1, k2 = jax.random.split(key)
    return {
        "gamma_embed": _linear(k1, z_dim, num_features, bias=False),
        "beta_embed": _linear(k2, z_dim, num_features, bias=False),
        "running_mean": jnp.zeros((num_features,)),
        "running_var": jnp.ones((num_features,)),
    }


def _cbn_apply(p, x, y):
    out = (x - p["running_mean"]) / jnp.sqrt(p["running_var"] + 1e-4)
    gamma = y @ p["gamma_embed"]["w"] + 1.0
    beta = y @ p["beta_embed"]["w"]
    return gamma[:, None, None, :] * out + beta[:, None, None, :]


def _gblock_init(key, ci, co, z_dim):
    ks = jax.random.split(key, 5)
    return {
        "HyperBN": _cbn_init(ks[0], ci, z_dim),
        "conv0": _conv(ks[1], 3, ci, co),
        "HyperBN_1": _cbn_init(ks[2], co, z_dim),
        "conv1": _conv(ks[3], 3, co, co),
        "conv_sc": _conv(ks[4], 1, ci, co),
    }


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


def _gblock_apply(p, x, cond):
    out = jax.nn.relu(_cbn_apply(p["HyperBN"], x, cond))
    out = _up2(out)
    out = conv2d(out, p["conv0"]["w"], p["conv0"]["b"], padding=1)
    out = jax.nn.relu(_cbn_apply(p["HyperBN_1"], out, cond))
    out = conv2d(out, p["conv1"]["w"], p["conv1"]["b"], padding=1)
    skip = conv2d(_up2(x), p["conv_sc"]["w"], p["conv_sc"]["b"], padding=0)
    return out + skip


def _attn_init(key, c):
    ks = jax.random.split(key, 4)
    return {
        "theta": _conv(ks[0], 1, c, c // 8, bias=False),
        "phi": _conv(ks[1], 1, c, c // 8, bias=False),
        "g": _conv(ks[2], 1, c, c // 2, bias=False),
        "o_conv": _conv(ks[3], 1, c // 2, c, bias=False),
        "gamma": jnp.zeros((1,)),
    }


def _pool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _attn_apply(p, x):
    b, h, w, c = x.shape
    n = h * w
    theta = conv2d(x, p["theta"]["w"]).reshape(b, n, -1)
    phi = _pool2(conv2d(x, p["phi"]["w"])).reshape(b, n // 4, -1)
    attn = jax.nn.softmax(jnp.einsum("bnc,bmc->bnm", theta, phi), axis=-1)
    g = _pool2(conv2d(x, p["g"]["w"])).reshape(b, n // 4, -1)
    attn_g = jnp.einsum("bnm,bmc->bnc", attn, g).reshape(b, h, w, -1)
    return p["gamma"] * conv2d(attn_g, p["o_conv"]["w"]) + x


def init(key, spec: BigGANSpec):
    ks = jax.random.split(key, 8 + len(spec.blocks))
    # reference sets z_dim = code_dim + 18 (biggan.py:263) but actually feeds
    # cat([20-dim chunk, 128-dim class emb]) — dims only line up for a 100-dim
    # input; we use the real conditioning width (bitrot fixed)
    z_dim = spec.z_per_chunk + 128
    p = {
        "linear": _linear(ks[0], spec.n_class, 128, bias=False),
        "G_linear": _linear(ks[1], spec.z_per_chunk, 4 * 4 * 16 * spec.chn),
        "GBlock": [
            _gblock_init(ks[2 + i], ci * spec.chn, co * spec.chn, z_dim)
            for i, (ci, co) in enumerate(spec.blocks)
        ],
        "attention": _attn_init(ks[6], 2 * spec.chn),
        "bn": {"running_mean": jnp.zeros((spec.chn,)), "running_var": jnp.ones((spec.chn,)),
               "gamma": jnp.ones((spec.chn,)), "beta": jnp.zeros((spec.chn,))},
        "colorize": _conv(ks[7], 3, spec.chn, spec.n_channels),
    }
    return p


def _splits(spec: BigGANSpec, total_dim, variable_dim):
    if variable_dim:  # VariableDimGenerator: (d-(k-1)*10, 10, ..., 10)
        first = total_dim - (spec.num_split - 1) * 10
        return [first] + [10] * (spec.num_split - 1)
    return [total_dim // spec.num_split] * spec.num_split


def apply(params, z, class_embedding, spec: BigGANSpec, variable_dim=False):
    """z: (B, D); class_embedding: (B, 128) (or one-hot (B, n_class) routed
    through 'linear').  Returns (B, S, S, n_channels) in [-1, 1]."""
    if class_embedding.shape[-1] == spec.n_class:
        class_embedding = class_embedding @ params["linear"]["w"]
    sizes = _splits(spec, z.shape[-1], variable_dim)
    codes = jnp.split(z, np.cumsum(sizes)[:-1].tolist(), axis=-1)
    out = codes[0] @ params["G_linear"]["w"] + params["G_linear"]["b"]
    out = out.reshape(-1, 4, 4, 16 * spec.chn)
    for i, (code, gp) in enumerate(zip(codes[1:], params["GBlock"])):
        if i == spec.sa_id:
            out = _attn_apply(params["attention"], out)
        cond = jnp.concatenate([code, class_embedding], axis=-1)
        out = _gblock_apply(gp, out, cond)
    bn = params["bn"]
    out = (out - bn["running_mean"]) / jnp.sqrt(bn["running_var"] + 1e-4)
    out = bn["gamma"] * out + bn["beta"]
    out = jax.nn.relu(out)
    out = conv2d(out, params["colorize"]["w"], params["colorize"]["b"], padding=1)
    return jnp.tanh(out) if spec.n_channels == 3 else out
