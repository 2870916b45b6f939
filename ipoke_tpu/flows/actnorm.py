"""ActNorm for 2D flows (reference: macow2.py:476-540).

fwd:  y = x * exp(log_scale) + bias,   logdet = H*W * sum(log_scale)
inv:  x = (y - bias) / (exp(log_scale) + 1e-8)          [reference's epsilon]

Data-dependent init is an *explicit* pass (`data_init`) rather than a mutable
first-forward hack: call it once on a representative batch before training a
fresh flow.  Converted checkpoints are already initialized.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_actnorm(key, channels):
    return {
        "log_scale": 0.05 * jax.random.normal(key, (channels,)),
        "bias": jnp.zeros((channels,)),
    }


def forward(p, x):
    b, h, w, c = x.shape
    log_scale = p["log_scale"].astype(x.dtype)
    out = x * jnp.exp(log_scale) + p["bias"].astype(x.dtype)
    logdet = jnp.full((b,), float(h * w), jnp.float32) * jnp.sum(
        p["log_scale"].astype(jnp.float32)
    )
    return out, logdet


def inverse(p, y):
    log_scale = p["log_scale"].astype(y.dtype)
    return (y - p["bias"].astype(y.dtype)) / (jnp.exp(log_scale) + 1e-8)


def data_init(p, x, init_scale=1.0):
    """Re-initialize so the post-actnorm activations have zero mean / unit std
    (per channel) on the given batch.

    NB: the reference (ActNorm2dFlow.init, macow2.py:526-539) copies
    ``log(1/std_of_scaled_output)`` directly, which normalizes only
    approximately when the random initial scale != 1.  We compose with the
    current params instead, which is exact; converted checkpoints never hit
    this path.
    """
    out = x * jnp.exp(p["log_scale"]) + p["bias"]
    flat = out.reshape(-1, out.shape[-1])
    mean = jnp.mean(flat, axis=0)
    std = jnp.std(flat, axis=0, ddof=1)
    inv_stdv = init_scale / (std + 1e-6)
    return {
        "log_scale": p["log_scale"] + jnp.log(inv_stdv),
        "bias": (p["bias"] - mean) * inv_stdv,
    }
