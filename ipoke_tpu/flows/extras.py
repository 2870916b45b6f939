"""Remaining modules.py grab-bag pieces (reference: models/modules/INN/
modules.py) not already ported elsewhere: GIN (volume-preserving) ActNorm,
the MADE-style masked autoregressive FC net, and NIN (1x1 channel linear
with data init).  All unused by released configs; component parity only.

Already ported elsewhere: SpaceToDepth/DepthToSpace (nn/core), ActNorm
(flows/legacy vec_actnorm), BasicFullyConnectedNet (flows/legacy),
GatedConv2d / attention blocks (flows/attention), MixLogCDF family
(flows/mixcdf), NICEConvBlock v1/v2 + Conv2dWeightNorm + ShiftedConv2d
(flows/convnets, flows/macow_v1), NormConv2d (nn/blocks).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.nn import core


# -- GIN ActNorm (modules.py:324-404): last channel's scale is the inverse
#    product of the others -> det == 1, logdet identically zero ------------

def init_gin_actnorm(channels):
    return {"loc": jnp.zeros((channels,)), "scale": jnp.ones((channels,))}


def _gin_scale(p):
    scale = p["scale"][:-1]
    last = 1.0 / (jnp.prod(scale) + 1e-6)
    return jnp.concatenate([scale, last[None]])


def gin_actnorm_forward(p, x):
    """x: (..., C).  Volume-preserving: logdet = 0 by construction."""
    h = _gin_scale(p) * (x + p["loc"])
    return h, jnp.zeros((x.shape[0],), jnp.float32)


def gin_actnorm_inverse(p, y):
    return y / _gin_scale(p) - p["loc"]


def gin_actnorm_data_init(p, x, alpha=1.0):
    flat = x.reshape(-1, x.shape[-1])
    mean = jnp.mean(flat, axis=0)
    std = jnp.std(flat, axis=0)
    return {"loc": -mean, "scale": alpha / (std + 1e-6)}


# -- MADE masked autoregressive FC net (modules.py:488-598) -----------------

def made_masks(nin, hidden_sizes, nout, seed=0, natural_ordering=True):
    """Connectivity masks for an autoregressive MLP (Germain et al. MADE;
    reference ARFullyConnectedNet.update_masks)."""
    rng = np.random.default_rng(seed)
    degrees = [np.arange(nin) if natural_ordering else rng.permutation(nin)]
    for h in hidden_sizes:
        low = degrees[-1].min()
        degrees.append(rng.integers(low, nin - 1, size=h) if nin > 1
                       else np.zeros(h, np.int64))
    masks = [degrees[l + 1][:, None] >= degrees[l][None, :]
             for l in range(len(hidden_sizes))]
    out_deg = np.concatenate([degrees[0]] * (nout // nin))
    masks.append(out_deg[:, None] > degrees[-1][None, :])
    return [m.T.astype(np.float32) for m in masks]  # (in, out) layout


def init_ar_fc_net(key, nin, hidden_sizes, nout, seed=0):
    sizes = [nin] + list(hidden_sizes) + [nout]
    masks = made_masks(nin, list(hidden_sizes), nout, seed=seed)
    layers = []
    for i, (ci, co) in enumerate(zip(sizes, sizes[1:])):
        k = jax.random.fold_in(key, i)
        layers.append({
            "w": core.kaiming_uniform_torch_default(k, (ci, co)),
            "b": jnp.zeros((co,)),
            "mask": jnp.asarray(masks[i]),
        })
    return {"layers": layers}


def ar_fc_net_apply(p, x):
    h = x
    for i, layer in enumerate(p["layers"]):
        h = h @ (layer["w"] * layer["mask"]) + layer["b"]
        if i < len(p["layers"]) - 1:
            h = jax.nn.relu(h)
    return h


def ar_jacobian_is_triangular(p, x):
    """Diagnostic: output i must not depend on inputs >= i (per nout/nin
    chunk) — the autoregressive property the masks guarantee."""
    jac = jax.jacobian(lambda v: ar_fc_net_apply(p, v[None])[0])(x)
    nin = x.shape[0]
    nout = jac.shape[0]
    ok = True
    for chunk in range(nout // nin):
        block = jac[chunk * nin : (chunk + 1) * nin]
        ok = ok and bool(np.allclose(np.triu(np.asarray(block)), 0))
    return ok


# -- NIN: 1x1 channel linear with data-dependent init (modules.py:719-756) --

def init_nin(key, in_units, out_units, initializer="xavier"):
    if initializer == "zeros":
        w = jnp.zeros((in_units, out_units))
    elif initializer == "xavier":
        std = float(np.sqrt(2.0 / (in_units + out_units)))
        w = std * jax.random.normal(key, (in_units, out_units))
    else:  # 'data': random, call nin_data_init on the first batch
        w = jax.random.normal(key, (in_units, out_units))
    return {"w": w, "b": jnp.zeros((out_units,))}


def nin_apply(p, x):
    """x: (B, H, W, C_in) -> (B, H, W, C_out)."""
    return x @ p["w"] + p["b"]


def nin_data_init(p, x):
    flat = x.reshape(-1, x.shape[-1])
    y = flat @ p["w"]
    var = jnp.var(y, axis=0)
    mean = jnp.mean(y, axis=0)
    scale = 1.0 / jnp.sqrt(var + 1e-8)
    return {"w": p["w"] * scale[None], "b": -mean * scale}
