"""Leapfrog / HMC-style augmented flows (reference: models/modules/INN/
flow_blocks.py:1108-1416 UnconditionalLeapFlow / ...ExtendedLeapFlow /
LeapFrogCouplingBlock) — experimental dead code in the reference; provided
for component parity.

A leapfrog coupling evolves (x, v) by one symplectic integrator step:
    v' = v - dt/2 * grad_u(x)        (momentum half-kick: shear in v)
    x' = x + dt   * p(v')            (drift: shear in x)
    v''= v' - dt/2 * grad_u(x')      (second half-kick)
Each sub-update is a shear map, so the coupling is volume-preserving
(logdet 0) and exactly invertible by reversing the three shears.  Blocks
wrap the coupling with per-variable ActNorm + Shuffle like the FC family.

NB the reference's reverse pass (flow_blocks.py:1302-1316) recovers x with
the not-yet-recovered x inside grad_u and zeroes its logdet accumulator
(:1299) — bitrot that makes it non-invertible as written; this port
implements the intended symplectic semantics (round-trip tested).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ipoke_tpu.flows import permute
from ipoke_tpu.flows.legacy import (
    fc_net_apply,
    init_fc_net,
    init_vec_actnorm,
    vec_actnorm_forward,
    vec_actnorm_inverse,
)


@dataclass(frozen=True)
class LeapFlowSpec:
    in_channels: int
    hidden_dim: int
    hidden_depth: int = 2
    n_flows: int = 2
    delta_t: float = 1.0
    n_leap_steps: int = 2   # grad_u/scale_p pairs per coupling (reference: 2)


def init_coupling(key, spec: LeapFlowSpec):
    c = spec.in_channels
    return {
        "grad_u": [init_fc_net(jax.random.fold_in(key, i), c, spec.hidden_depth,
                               spec.hidden_dim, c, use_tanh=True)
                   for i in range(spec.n_leap_steps)],
        "scale_p": [init_fc_net(jax.random.fold_in(key, 100 + i), c, spec.hidden_depth,
                                spec.hidden_dim, c, use_tanh=False)
                    for i in range(spec.n_leap_steps)],
    }


def coupling_forward(p, x, v, spec: LeapFlowSpec):
    dt = spec.delta_t
    for i in range(spec.n_leap_steps):
        v = v - 0.5 * dt * fc_net_apply(p["grad_u"][i], x)
        x = x + dt * fc_net_apply(p["scale_p"][i], v)
        v = v - 0.5 * dt * fc_net_apply(p["grad_u"][i], x)
    return x, v, jnp.zeros((x.shape[0],), jnp.float32)  # shears: logdet 0


def coupling_inverse(p, x, v, spec: LeapFlowSpec):
    dt = spec.delta_t
    for i in reversed(range(spec.n_leap_steps)):
        v = v + 0.5 * dt * fc_net_apply(p["grad_u"][i], x)
        x = x - dt * fc_net_apply(p["scale_p"][i], v)
        v = v + 0.5 * dt * fc_net_apply(p["grad_u"][i], x)
    return x, v


def init_leap_flow(key, spec: LeapFlowSpec):
    blocks = []
    for i in range(spec.n_flows):
        kk = jax.random.fold_in(key, i)
        blocks.append({
            "actnorm_x": init_vec_actnorm(spec.in_channels),
            "actnorm_v": init_vec_actnorm(spec.in_channels),
            "coupling": init_coupling(jax.random.fold_in(kk, 1), spec),
            "shuffle_x": permute.init_shuffle(jax.random.fold_in(kk, 2), spec.in_channels),
            "shuffle_v": permute.init_shuffle(jax.random.fold_in(kk, 3), spec.in_channels),
        })
    return {"blocks": blocks}


def _shuffle_vec(p, h, inverse=False):
    h4 = h[..., None, None, :]
    h4 = permute.shuffle_inverse(p, h4) if inverse else permute.shuffle_forward(p, h4)[0]
    return h4[..., 0, 0, :]


def leap_flow_forward(p, spec: LeapFlowSpec, x, v):
    """x, v: (B, C).  Returns (x', v', logdet)."""
    logdet = jnp.zeros((x.shape[0],), jnp.float32)
    for blk in p["blocks"]:
        x, ld = vec_actnorm_forward(blk["actnorm_x"], x)
        logdet = logdet + ld
        v, ld = vec_actnorm_forward(blk["actnorm_v"], v)
        logdet = logdet + ld
        x, v, ld = coupling_forward(blk["coupling"], x, v, spec)
        logdet = logdet + ld
        x = _shuffle_vec(blk["shuffle_x"], x)
        v = _shuffle_vec(blk["shuffle_v"], v)
    return x, v, logdet


def leap_flow_inverse(p, spec: LeapFlowSpec, x, v):
    for blk in reversed(p["blocks"]):
        x = _shuffle_vec(blk["shuffle_x"], x, inverse=True)
        v = _shuffle_vec(blk["shuffle_v"], v, inverse=True)
        x, v = coupling_inverse(blk["coupling"], x, v, spec)
        x = vec_actnorm_inverse(blk["actnorm_x"], x)
        v = vec_actnorm_inverse(blk["actnorm_v"], v)
    return x, v


def hmc_sample(p, spec: LeapFlowSpec, key, x0):
    """HMC-flavoured sampling: draw momenta ~ N(0, I), run the flow forward
    (the learned leapfrog dynamics), return the evolved positions — the use
    the reference's leapfrog transformers were built for (INN.py:515-592)."""
    v0 = jax.random.normal(key, x0.shape)
    x1, v1, _ = leap_flow_forward(p, spec, x0, v0)
    return x1, v1
