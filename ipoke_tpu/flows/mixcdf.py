"""Mixture-of-logistics CDF coupling flow (reference: models/modules/INN/
modules.py:1037-1110 MixLogCDF/MixLogPDF/inv_mixlogcdf; flow_blocks.py:761-960
UnconditionalMixCDFConvFlow / ...CouplingFlowBlock / ...CouplingBlock).

Experimental alternative flow family in the reference (unused by released
configs); provided for component parity.  Channel-last layout: params carry a
trailing component axis K.

Transform per coupling (Flow++-style): x2 -> logit(MixLogCDF(x2)) * e^s + t,
with logdet = log MixLogPDF(x2) + s + logit'(.); the inverse runs a fixed
bisection (reference inv_mixlogcdf) expressed as a lax.fori_loop.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ipoke_tpu.flows import actnorm, permute
from ipoke_tpu.flows.legacy import (
    inv_leaky_relu_forward,
    inv_leaky_relu_inverse,
)
from ipoke_tpu.nn import core
from ipoke_tpu.nn.core import conv2d


# -- logistic mixture math --------------------------------------------------

def _logistic_log_cdf(x, means, logscales):
    return jax.nn.log_sigmoid((x - means) * jnp.exp(-logscales))


def _logistic_log_pdf(x, means, logscales):
    z = (x - means) * jnp.exp(-logscales)
    return z - logscales - 2.0 * jax.nn.softplus(z)


def mix_log_cdf(x, prior_logits, means, logscales):
    """x: (..., C); params: (..., C, K).  Returns log CDF (..., C)."""
    prior = jax.nn.log_softmax(prior_logits, axis=-1)
    return jax.nn.logsumexp(
        prior + _logistic_log_cdf(x[..., None], means, logscales), axis=-1
    )


def mix_log_pdf(x, prior_logits, means, logscales):
    prior = jax.nn.log_softmax(prior_logits, axis=-1)
    return jax.nn.logsumexp(
        prior + _logistic_log_pdf(x[..., None], means, logscales), axis=-1
    )


def inv_mixlogcdf(y, prior_logits, means, logscales, n_iter=60):
    """Bisection inverse of exp(mix_log_cdf) (reference inv_mixlogcdf,
    modules.py:1070-1108), jit-compatible fixed iteration count.
    y must be in (0, 1)."""
    maxscale = jnp.sum(jnp.exp(logscales), axis=-1)
    lb0 = jnp.min(means, axis=-1) - 50.0 * maxscale
    ub0 = jnp.max(means, axis=-1) + 50.0 * maxscale
    x0 = jnp.zeros_like(y)

    def body(_, carry):
        x, lb, ub = carry
        cur = jnp.exp(mix_log_cdf(x, prior_logits, means, logscales))
        gt = cur > y
        new_x = jnp.where(gt, (x + lb) * 0.5, (x + ub) * 0.5)
        new_lb = jnp.where(gt, lb, x)
        new_ub = jnp.where(gt, x, ub)
        return new_x, new_lb, new_ub

    x, _, _ = jax.lax.fori_loop(0, n_iter, body, (x0, lb0, ub0))
    return x


# -- FLowSigmoid / its inverse (the 'scale' op, flow_blocks FLowSigmoid) ----

def logit_forward(y, eps=0.0):
    """Inverse(FLowSigmoid): x = log(y/(1-y)), logdet = sum -log(y(1-y))."""
    x = jnp.log(y) - jnp.log1p(-y)
    logdet = -jnp.log(y) - jnp.log1p(-y)
    return x, jnp.sum(logdet.reshape(y.shape[0], -1).astype(jnp.float32), axis=1)


def logit_inverse(x):
    return jax.nn.sigmoid(x)


# -- parameter net (MixCDFParameterTemplate stand-in: conv stack, zero-init
#    head -> identity-at-init flow) -----------------------------------------

@dataclass(frozen=True)
class MixCDFSpec:
    channels: int            # full block channels (split in half)
    hidden_dim: int
    components: int = 4
    n_flows: int = 2


def _init_param_net(key, c_in, hidden, c_out):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": {"w": core.kaiming_uniform_torch_default(k1, (3, 3, c_in, hidden)),
                  "b": jnp.zeros((hidden,))},
        "conv2": {"w": core.kaiming_uniform_torch_default(k2, (1, 1, hidden, hidden)),
                  "b": jnp.zeros((hidden,))},
        "out": {"w": jnp.zeros((3, 3, hidden, c_out)), "b": jnp.zeros((c_out,))},
    }


def _param_net_apply(p, x):
    h = jax.nn.leaky_relu(conv2d(x, p["conv1"]["w"], p["conv1"]["b"], padding=1), 0.01)
    h = jax.nn.leaky_relu(conv2d(h, p["conv2"]["w"], p["conv2"]["b"], padding=0), 0.01)
    return conv2d(h, p["out"]["w"], p["out"]["b"], padding=1)


def _split_params(raw, half, k):
    s = raw[..., :half]
    t = raw[..., half : 2 * half]
    rest = raw[..., 2 * half :].reshape(raw.shape[:-1] + (half, 3 * k))
    logits, means, logscales = jnp.split(rest, 3, axis=-1)
    # tame the transform at init / keep bisection bounded
    s = jnp.tanh(s)
    logscales = jnp.clip(logscales, -7.0, 7.0)
    return s, t, logits, means, logscales


def init_coupling(key, spec: MixCDFSpec):
    half = spec.channels // 2
    c_out = 2 * half + 3 * spec.components * half
    return {"net": _init_param_net(key, half, spec.hidden_dim, c_out)}


def coupling_forward(p, x, spec: MixCDFSpec):
    half = spec.channels // 2
    x1, x2 = x[..., :half], x[..., half:]
    s, t, logits, means, logscales = _split_params(
        _param_net_apply(p["net"], x1), half, spec.components
    )
    y2 = jnp.exp(mix_log_cdf(x2, logits, means, logscales))
    y2 = jnp.clip(y2, 1e-5, 1.0 - 1e-5)
    y2, scale_ld = logit_forward(y2)
    y2 = y2 * jnp.exp(s) + t
    logdet = mix_log_pdf(x2, logits, means, logscales) + s
    logdet = jnp.sum(logdet.reshape(x.shape[0], -1).astype(jnp.float32), axis=1) + scale_ld
    return jnp.concatenate([x1, y2], axis=-1), logdet


def coupling_inverse(p, y, spec: MixCDFSpec):
    half = spec.channels // 2
    x1, y2 = y[..., :half], y[..., half:]
    s, t, logits, means, logscales = _split_params(
        _param_net_apply(p["net"], x1), half, spec.components
    )
    x2 = jnp.exp(-s) * (y2 - t)
    x2 = logit_inverse(x2)
    x2 = jnp.clip(x2, 1e-5, 0.9999)
    x2 = inv_mixlogcdf(x2, logits, means, logscales)
    return jnp.concatenate([x1, x2], axis=-1)


# -- flow block (ActNorm -> InvLeakyRelu -> coupling -> Shuffle) ------------

def init_flow(key, spec: MixCDFSpec):
    blocks = []
    for i in range(spec.n_flows):
        kk = jax.random.fold_in(key, i)
        blocks.append({
            "actnorm": actnorm.init_actnorm(jax.random.fold_in(kk, 0), spec.channels),
            "coupling": init_coupling(jax.random.fold_in(kk, 1), spec),
            "shuffle": permute.init_shuffle(jax.random.fold_in(kk, 2), spec.channels),
        })
    return {"blocks": blocks}


def flow_forward(p, x, spec: MixCDFSpec):
    """x: (B,H,W,C).  Returns (z, logdet)."""
    logdet = jnp.zeros((x.shape[0],), jnp.float32)
    h = x
    for blk in p["blocks"]:
        h, ld = actnorm.forward(blk["actnorm"], h)
        logdet = logdet + ld
        h, ld = inv_leaky_relu_forward(h)
        logdet = logdet + ld
        h, ld = coupling_forward(blk["coupling"], h, spec)
        logdet = logdet + ld
        h, _ = permute.shuffle_forward(blk["shuffle"], h)
    return h, logdet


def flow_inverse(p, z, spec: MixCDFSpec):
    h = z
    for blk in reversed(p["blocks"]):
        h = permute.shuffle_inverse(blk["shuffle"], h)
        h = coupling_inverse(blk["coupling"], h, spec)
        h = inv_leaky_relu_inverse(h)
        h = actnorm.inverse(blk["actnorm"], h)
    return h
