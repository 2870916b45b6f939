"""Flow (NLL + logdet) losses (reference: models/modules/INN/loss.py:6-100).

All reductions in f32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def nll(sample, spatial_mean=False):
    s = sample.astype(jnp.float32)
    if spatial_mean:
        # mean over H,W then sum over channels
        return 0.5 * jnp.sum(jnp.mean(s * s, axis=(1, 2)), axis=-1)
    return 0.5 * jnp.sum(s.reshape(s.shape[0], -1) ** 2, axis=1)


def flow_loss(sample, logdet, key=None, spatial_mean=False, logdet_weight=1.0):
    """Returns (loss, dict).  If ``key`` is given, also logs the calibration
    reference NLL on a standard-normal tensor of the same shape."""
    nll_loss = jnp.mean(nll(sample, spatial_mean))
    if spatial_mean:
        h, w = sample.shape[1:3]
        nlogdet_loss = -jnp.mean(logdet.astype(jnp.float32)) / (h * w)
    else:
        nlogdet_loss = -jnp.mean(logdet.astype(jnp.float32))
    loss = nll_loss + logdet_weight * nlogdet_loss
    log = {
        "flow_loss": loss,
        "nlogdet_loss": nlogdet_loss,
        "nll_loss": nll_loss,
        "logdet_weight": jnp.asarray(logdet_weight, jnp.float32),
    }
    if key is not None:
        ref = jax.random.normal(key, sample.shape, jnp.float32)
        log["reference_nll_loss"] = jnp.mean(nll(ref, spatial_mean))
    return loss, log


def gaussian_logp_loss(sample, logdet):
    """GaussianLogP variant (loss.py:82-100)."""
    s = sample.astype(jnp.float32)
    log_prob = -0.5 * (s * s) - 0.5 * jnp.log(2 * jnp.pi)
    nll_log_loss = jnp.sum(log_prob) / s.shape[0]
    nlogdet = jnp.mean(logdet.astype(jnp.float32))
    loss = -(nll_log_loss + nlogdet)
    return loss, {"flow_loss": loss, "nll_log_loss": -nll_log_loss, "nlogdet_loss": -nlogdet}
