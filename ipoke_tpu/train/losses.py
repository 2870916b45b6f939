"""Shared training losses (reference: utils/losses.py)."""
from __future__ import annotations

import jax.numpy as jnp


def kl_divergence(mu, logvar):
    """KL(N(mu, exp(logvar)) || N(0,1)), summed over channel axis, mean over
    the rest (reference utils/losses.py:47-48; channel axis=1 on NCHW == last
    axis here)."""
    term = 1 + logvar - mu**2 - jnp.exp(logvar)
    return -0.5 * jnp.mean(jnp.sum(term, axis=-1))


def l1(a, b):
    return jnp.mean(jnp.abs(a - b))
