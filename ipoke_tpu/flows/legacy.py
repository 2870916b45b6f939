"""Legacy FC (flat) coupling flows (reference: models/modules/INN/
flow_blocks.py:10-66 ConditionalFlow, :113-277 double vector couplings,
modules.py:165-191 BasicFullyConnectedNet, flow_blocks.py:356-388
InvLeakyRelu/IgnoreLeakyRelu) — the pre-MaCow flow family kept by the
reference for older checkpoints and the SupervisedTransformer wrapper
(INN/INN.py:19-88).  Not used by any released config; provided for
API/component parity.

Functional JAX layout: vectors are (B, C); the reference's trailing
(1, 1) spatial singleton is dropped at the boundary.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ipoke_tpu.flows import permute
from ipoke_tpu.nn import core


@dataclass(frozen=True)
class FCFlowSpec:
    in_channels: int
    embedding_dim: int
    hidden_dim: int
    hidden_depth: int
    n_flows: int
    conditioning_option: str = "none"   # none | parallel | sequential
    activation: str = "lrelu"           # lrelu | none


# -- BasicFullyConnectedNet -------------------------------------------------

def init_fc_net(key, dim, depth, hidden_dim, out_dim, use_tanh):
    ks = jax.random.split(key, depth + 2)
    sizes = [(dim, hidden_dim)] + [(hidden_dim, hidden_dim)] * depth + [(hidden_dim, out_dim)]
    layers = []
    for k, (ci, co) in zip(ks, sizes):
        layers.append({
            "w": core.kaiming_uniform_torch_default(k, (ci, co)),
            "b": core.conv_bias_torch_default(jax.random.fold_in(k, 1), (ci, co), co),
        })
    return {"layers": layers, "use_tanh": use_tanh}


def fc_net_apply(p, x):
    h = x
    for i, layer in enumerate(p["layers"]):
        h = h @ layer["w"] + layer["b"]
        if i < len(p["layers"]) - 1:
            h = jax.nn.leaky_relu(h, 0.01)  # torch nn.LeakyReLU() default
    if p["use_tanh"]:
        h = jnp.tanh(h)
    return h


# -- vector ActNorm (flow_blocks ActNorm with logdet) -----------------------

def init_vec_actnorm(channels):
    return {"loc": jnp.zeros((channels,)), "scale": jnp.ones((channels,))}


def vec_actnorm_forward(p, x):
    y = p["scale"] * (x + p["loc"])
    logdet = jnp.full((x.shape[0],), jnp.sum(jnp.log(jnp.abs(p["scale"]))), jnp.float32)
    return y, logdet


def vec_actnorm_inverse(p, y):
    return y / p["scale"] - p["loc"]


def vec_actnorm_data_init(p, x):
    """Reference ActNorm.initialize: loc = -mean, scale = 1/(std+1e-6)."""
    mean = jnp.mean(x, axis=0)
    std = jnp.std(x, axis=0)
    return {"loc": -mean, "scale": 1.0 / (std + 1e-6)}


# -- invertible leaky relu --------------------------------------------------

def inv_leaky_relu_forward(x, alpha=0.9):
    scaling = jnp.where(x >= 0, 1.0, alpha)
    return x * scaling, jnp.zeros((x.shape[0],), jnp.float32)


def inv_leaky_relu_inverse(y, alpha=0.9):
    scaling = jnp.where(y >= 0, 1.0, alpha)
    return y / scaling


# -- double vector coupling -------------------------------------------------

def init_double_coupling(key, in_channels, cond_channels, hidden_dim, depth, mode):
    """mode 'normal': conditioner sees cat([x_half, cond]); 'cond': cond only
    (ConditionalDoubleVectorCouplingBlock[_cond])."""
    half = in_channels // 2
    in_dim = (cond_channels if mode == "cond" else half + cond_channels)
    ks = jax.random.split(key, 4)
    return {
        "s": [init_fc_net(ks[0], in_dim, depth, hidden_dim, half, True),
              init_fc_net(ks[1], in_dim, depth, hidden_dim, half, True)],
        "t": [init_fc_net(ks[2], in_dim, depth, hidden_dim, half, False),
              init_fc_net(ks[3], in_dim, depth, hidden_dim, half, False)],
    }


def _coupling_in(x_apply, xc, mode):
    return xc if mode == "cond" else jnp.concatenate([x_apply, xc], axis=1)


def double_coupling_forward(p, x, xc, mode="normal"):
    logdet = jnp.zeros((x.shape[0],), jnp.float32)
    for i in range(2):
        if i % 2 != 0:
            a, b = jnp.split(x, 2, axis=1)
            x = jnp.concatenate([b, a], axis=1)
        xa, xk = jnp.split(x, 2, axis=1)
        ci = _coupling_in(xa, xc, mode)
        scale = fc_net_apply(p["s"][i], ci)
        xk = xk * jnp.exp(scale) + fc_net_apply(p["t"][i], ci)
        x = jnp.concatenate([xa, xk], axis=1)
        logdet = logdet + jnp.sum(scale.astype(jnp.float32), axis=1)
    return x, logdet


def double_coupling_inverse(p, y, xc, mode="normal"):
    x = y
    for i in reversed(range(2)):
        if i % 2 == 0:
            a, b = jnp.split(x, 2, axis=1)
            x = jnp.concatenate([b, a], axis=1)
        xa, xk = jnp.split(x, 2, axis=1)
        ci = _coupling_in(xa, xc, mode)
        xk = (xk - fc_net_apply(p["t"][i], ci)) * jnp.exp(-fc_net_apply(p["s"][i], ci))
        x = jnp.concatenate([xa, xk], axis=1)
    return x


# -- flow block + stack -----------------------------------------------------

def init_fc_flow(key, spec: FCFlowSpec):
    blocks = []
    for i in range(spec.n_flows):
        kk = jax.random.fold_in(key, i)
        mode = "cond" if i % 2 == 0 else "normal"  # ConditionalFlow:28
        blocks.append({
            "actnorm": init_vec_actnorm(spec.in_channels),
            "coupling": init_double_coupling(
                jax.random.fold_in(kk, 1), spec.in_channels, spec.embedding_dim,
                spec.hidden_dim, spec.hidden_depth, mode,
            ),
            "shuffle": permute.init_shuffle(jax.random.fold_in(kk, 2), spec.in_channels),
        })
    p = {"blocks": blocks}
    if spec.conditioning_option != "none":
        p["cond_layers"] = [
            {"w": core.kaiming_uniform_torch_default(
                jax.random.fold_in(key, 1000 + i), (1, 1, spec.embedding_dim, spec.embedding_dim)),
             "b": jnp.zeros((spec.embedding_dim,))}
            for i in range(spec.n_flows)
        ]
    return p


def _hconds(p, spec: FCFlowSpec, embedding):
    """Per-block conditioning embeddings (parallel/sequential 1x1-conv
    transforms; embeddings are vectors here so the conv is a matmul)."""
    hconds = []
    h = embedding
    for i in range(spec.n_flows):
        if spec.conditioning_option == "parallel":
            cl = p["cond_layers"][i]
            h = embedding @ cl["w"][0, 0] + cl["b"]
        elif spec.conditioning_option == "sequential":
            cl = p["cond_layers"][i]
            h = h @ cl["w"][0, 0] + cl["b"]
        hconds.append(h)
    return hconds


def fc_flow_forward(p, spec: FCFlowSpec, x, embedding):
    """x: (B, C); embedding: (B, E).  Returns (z, logdet)."""
    hconds = _hconds(p, spec, embedding)
    logdet = jnp.zeros((x.shape[0],), jnp.float32)
    h = x
    for i, blk in enumerate(p["blocks"]):
        mode = "cond" if i % 2 == 0 else "normal"
        h, ld = vec_actnorm_forward(blk["actnorm"], h)
        logdet = logdet + ld
        if spec.activation == "lrelu":
            h, ld = inv_leaky_relu_forward(h)
            logdet = logdet + ld
        h, ld = double_coupling_forward(blk["coupling"], h, hconds[i], mode)
        logdet = logdet + ld
        h, _ = permute.shuffle_forward(blk["shuffle"], h[..., None, None, :])
        h = h[..., 0, 0, :]
    return h, logdet


def fc_flow_inverse(p, spec: FCFlowSpec, z, embedding):
    hconds = _hconds(p, spec, embedding)
    h = z
    for i in reversed(range(spec.n_flows)):
        blk = p["blocks"][i]
        mode = "cond" if i % 2 == 0 else "normal"
        h = permute.shuffle_inverse(blk["shuffle"], h[..., None, None, :])[..., 0, 0, :]
        h = double_coupling_inverse(blk["coupling"], h, hconds[i], mode)
        if spec.activation == "lrelu":
            h = inv_leaky_relu_inverse(h)
        h = vec_actnorm_inverse(blk["actnorm"], h)
    return h


def fc_flow_sample(p, spec: FCFlowSpec, key, embedding):
    """SupervisedTransformer.sample (INN.py:60-66): z ~ N(0,I) -> reverse."""
    z = jax.random.normal(key, (embedding.shape[0], spec.in_channels))
    return fc_flow_inverse(p, spec, z, embedding)
