"""Fused Pallas kernel for the MaskedConvFlow sequential inverse
(the dominant sampling cost — SURVEY §7 "hard parts"; reference loop:
macow2.py:174-288 backward_height/backward_width).

The inverse is autoregressive over rows (canonical order-A after the flips /
transposes done by flows.mcf._canonicalize).  The XLA fallback is a lax.scan
whose every step dispatches a small conv; this kernel instead runs the WHOLE
row recurrence inside one Pallas program with all operands VMEM-resident:

  for each row i (static unroll, H is small):
    ctx  = sum_{r,s} win[:, r, s:s+W, :] @ w_shift[r, s]      (kh*kw matmuls)
    ctx  = concat(ctx, h[:, i])                               (conditioning)
    raw  = elu(ctx) @ w1x1 + b
    mu, logs = split(raw); scale = 1 + alpha*tanh(0.5*logs)
    row  = (z[:, i] - mu) / (scale + 1e-12)                   (affine inverse)
    out[:, i] = row; win rolls up by one row

Affine transform only (the released configs); other transforms route to the
scan backend.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ipoke_tpu.nn.core import weight_norm_materialize


def _kernel(z_ref, h_ref, w_ref, w1_ref, b1_ref, out_ref, win_ref, *, alpha, act, height, kw_w):
    b, height_, width, c = z_ref.shape
    kh = w_ref.shape[0]
    cw = (kw_w - 1) // 2
    win_ref[...] = jnp.zeros_like(win_ref)

    def act_fn(x):
        if act == "elu":
            # manual elu: Mosaic has no expm1 lowering
            return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)
        if act == "relu":
            return jnp.maximum(x, 0)
        return jax.nn.leaky_relu(x, 0.1)

    for i in range(height):
        ctx = None
        for r in range(kh):
            for s in range(kw_w):
                piece = win_ref[:, r, s : s + width, :]  # (B, W, C)
                term = jax.lax.dot_general(
                    piece,
                    w_ref[r, s],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ctx = term if ctx is None else ctx + term
        if h_ref is not None:
            ctx = jnp.concatenate([ctx, h_ref[:, i]], axis=-1)
        raw = jax.lax.dot_general(
            act_fn(ctx), w1_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...]
        mu = raw[..., :c]
        logs = raw[..., c:]
        scale = jnp.tanh(logs * 0.5) * alpha + 1.0
        row = (z_ref[:, i] - mu) / (scale + 1e-12)
        out_ref[:, i] = row
        # roll the context window up one row; keep zero side-padding intact
        # (ref-slice stores only — .at[].set lowers to scatter, unsupported)
        if kh > 1:
            win_ref[:, : kh - 1] = win_ref[:, 1:]
        win_ref[:, kh - 1] = jnp.zeros((b, width + 2 * cw, c), row.dtype)
        win_ref[:, kh - 1, cw : cw + width] = row


@functools.partial(jax.jit, static_argnames=("alpha", "act"))
def _call(z, h, w_shift, w1x1, b1x1, alpha, act):
    b, height, width, c = z.shape
    kh, kw_w = w_shift.shape[0], w_shift.shape[1]
    cw = (kw_w - 1) // 2
    kernel = functools.partial(_kernel, alpha=alpha, act=act, height=height, kw_w=kw_w)
    if h is None:
        def kernel_nh(z_ref, w_ref, w1_ref, b1_ref, out_ref, win_ref):
            kernel(z_ref, None, w_ref, w1_ref, b1_ref, out_ref, win_ref)

        return pl.pallas_call(
            kernel_nh,
            out_shape=jax.ShapeDtypeStruct(z.shape, z.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((b, kh, width + 2 * cw, c), z.dtype)],
        )(z, w_shift, w1x1, b1x1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(z.shape, z.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, kh, width + 2 * cw, c), z.dtype)],
    )(z, h, w_shift, w1x1, b1x1)


def mcf_inverse_pallas(p, w_canon, z, h, transform, alpha, act):
    """Entry point used by flows.mcf.inverse(backend='pallas').  Falls back to
    the scan implementation for non-affine transforms."""
    if transform != "affine":
        from ipoke_tpu.flows.mcf import _row_scan_inverse

        return _row_scan_inverse(p, w_canon, z, h, transform, alpha, act)
    conv1x1 = p["net"]["conv1x1"]
    w1 = weight_norm_materialize(conv1x1["v"], conv1x1["g"])[0, 0]  # (c2_in, 2C)
    b1 = conv1x1["b"]
    return _call(z, h, w_canon, w1, b1, float(alpha), act)
