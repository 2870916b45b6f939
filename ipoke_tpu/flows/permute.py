"""Invertible channel permutations.

Shuffle (reference: flow_blocks.py:314-326): fixed random permutation stored as
a parameter buffer (must come from the checkpoint for converted models — never
regenerate).  logdet = 0.

InvertibleConvLU1d (reference: macow2.py:596-649): LU-parameterized invertible
1x1 conv.  Opt-in via use1x1 (unused by released configs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_shuffle(key, channels):
    idx = jax.random.permutation(key, channels)
    return {"fwd_idx": idx, "inv_idx": jnp.argsort(idx)}


def shuffle_forward(p, x):
    return jnp.take(x, p["fwd_idx"], axis=-1), jnp.zeros((x.shape[0],), jnp.float32)


def shuffle_inverse(p, y):
    return jnp.take(y, p["inv_idx"], axis=-1)


def init_conv_lu(key, nf):
    w_init = np.linalg.qr(np.asarray(jax.random.normal(key, (nf, nf))))[0].astype(np.float32)
    import scipy.linalg as alg

    perm, l, u = alg.lu(w_init)
    s = np.diag(u)
    u = np.triu(u, k=1)
    lmask = np.tril(np.ones_like(w_init), -1)
    return {
        "permutated": jnp.asarray(perm),
        "sign_s": jnp.asarray(np.sign(s)),
        "lmask": jnp.asarray(lmask),
        "l": jnp.asarray(l),
        "u": jnp.asarray(u),
        "log_s": jnp.asarray(np.log(np.abs(s))),
    }


def _lu_weight(p):
    nf = p["l"].shape[0]
    eye = jnp.eye(nf, dtype=p["l"].dtype)
    wl = p["l"] * p["lmask"] + eye
    wu = p["u"] * p["lmask"].T + jnp.diag(p["sign_s"] * jnp.exp(p["log_s"]))
    return p["permutated"] @ wl @ wu  # (out, in) on channel vectors


def conv_lu_forward(p, x):
    b, h, w, c = x.shape
    weight = _lu_weight(p)
    y = jnp.einsum("bhwc,oc->bhwo", x, weight.astype(x.dtype))
    logdet = jnp.full((b,), float(h * w), jnp.float32) * jnp.sum(p["log_s"].astype(jnp.float32))
    return y, logdet


def conv_lu_inverse(p, y):
    weight = _lu_weight(p)
    w_inv = jnp.linalg.inv(weight.astype(jnp.float32))
    return jnp.einsum("bhwc,oc->bhwo", y, w_inv.astype(y.dtype))
