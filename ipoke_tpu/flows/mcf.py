"""Masked Convolutional Flow (reference: macow2.py:25-288).

Forward (density) direction is a single shifted-conv pass — fully parallel.
The inverse is autoregressive along one spatial axis; we reduce all four
orders to ONE canonical row-scan ("order A": output row i depends on output
rows i-kH..i-1) via flips / transposes:

  order A:  scan as-is
  order B:  flip H on inputs, flip kernel along H, scan, flip back
  order C:  transpose H<->W, transpose kernel, scan, transpose back
  order D:  transpose + flip

The scan carries a (B, kH, W+2cW, C) context window in registers/VMEM;
each step is one small VALID conv (MXU) + the analytic affine inverse.
``backend='pallas'`` routes to the fused Pallas kernel in
ops/pallas/mcf_inverse.py (single kernel for the whole scan — no per-row
dispatch, weights stay resident in VMEM).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ipoke_tpu.flows import convnets
from ipoke_tpu.flows.transforms import get_transform


def default_hidden(in_channels):
    if in_channels <= 96:
        return 4 * in_channels
    return min(2 * in_channels, 512)


def init_mcf(key, in_channels, kernel_size, h_channels=None, transform="affine", hidden=None):
    T = get_transform(transform)
    hidden = hidden or default_hidden(in_channels)
    out_channels = in_channels * T.n_params
    return {
        "net": convnets.init_mcf_block(
            key, in_channels, out_channels, kernel_size, hidden, h_channels=h_channels
        )
    }


def forward(p, x, h=None, order="A", transform="affine", alpha=1.0, act="elu"):
    T = get_transform(transform)
    raw = convnets.mcf_block_apply(p["net"], x, order, h=h, act=act)
    params = T.calc_params(raw, alpha)
    out, logdet = T.fwd(x, params)
    return out, logdet


# ---------------------------------------------------------------------------
# inverse
# ---------------------------------------------------------------------------

def _canonicalize(p, z, h, order):
    """Return (w, z, h, undo) with the problem mapped to canonical order-A."""
    w = p["net"]["shift_conv"]["w"]
    if order == "A":
        return w, z, h, lambda x: x
    if order == "B":
        return (
            jnp.flip(w, axis=0),
            jnp.flip(z, axis=1),
            None if h is None else jnp.flip(h, axis=1),
            lambda x: jnp.flip(x, axis=1),
        )
    if order == "C":
        return (
            jnp.swapaxes(w, 0, 1),
            jnp.swapaxes(z, 1, 2),
            None if h is None else jnp.swapaxes(h, 1, 2),
            lambda x: jnp.swapaxes(x, 1, 2),
        )
    if order == "D":
        wt = jnp.flip(jnp.swapaxes(w, 0, 1), axis=0)
        return (
            wt,
            jnp.flip(jnp.swapaxes(z, 1, 2), axis=1),
            None if h is None else jnp.flip(jnp.swapaxes(h, 1, 2), axis=1),
            lambda x: jnp.swapaxes(jnp.flip(x, axis=1), 1, 2),
        )
    raise ValueError(order)


def _row_scan_inverse(p, w_canon, z, h, transform, alpha, act):
    """Canonical order-A sequential inverse via lax.scan."""
    T = get_transform(transform)
    b, height, width, c = z.shape
    kh, kw = w_canon.shape[0], w_canon.shape[1]
    cw = (kw - 1) // 2
    conv1x1 = p["net"]["conv1x1"]
    from ipoke_tpu.nn.core import activation as _act_fn
    from ipoke_tpu.nn.core import weight_norm_materialize

    w1x1 = weight_norm_materialize(conv1x1["v"], conv1x1["g"])[0, 0]  # (c2_in, c_out)
    b1x1 = conv1x1["b"]
    f = _act_fn(act)

    dn = lax.conv_dimension_numbers(
        (b, kh, width + 2 * cw, c), w_canon.shape, ("NHWC", "HWIO", "NHWC")
    )

    def step(win, xs):
        z_row, h_row = xs
        ctx = lax.conv_general_dilated(
            win, w_canon.astype(win.dtype), (1, 1), "VALID", dimension_numbers=dn
        )[:, 0]  # (B, W, hidden)
        if h_row is not None:
            ctx = jnp.concatenate([ctx, h_row.astype(ctx.dtype)], axis=-1)
        raw = f(ctx) @ w1x1.astype(ctx.dtype) + b1x1.astype(ctx.dtype)
        params = T.calc_params(raw, alpha)
        new_row, _ = T.bwd(z_row, params)
        padded = jnp.pad(new_row, ((0, 0), (cw, cw), (0, 0)))
        win = jnp.concatenate([win[:, 1:], padded[:, None]], axis=1)
        return win, new_row

    win0 = jnp.zeros((b, kh, width + 2 * cw, c), z.dtype)
    z_rows = jnp.moveaxis(z, 1, 0)
    if h is not None:
        h_rows = jnp.moveaxis(h, 1, 0)
        _, out_rows = lax.scan(step, win0, (z_rows, h_rows))
    else:
        _, out_rows = lax.scan(step, win0, (z_rows, None))
    return jnp.moveaxis(out_rows, 0, 1)


def inverse(p, z, h=None, order="A", transform="affine", alpha=1.0, act="elu", backend="scan"):
    w_canon, z_c, h_c, undo = _canonicalize(p, z, h, order)
    if backend == "pallas":
        from ipoke_tpu.ops.pallas import mcf_inverse as pk

        out = pk.mcf_inverse_pallas(p, w_canon, z_c, h_c, transform, alpha, act)
    else:
        out = _row_scan_inverse(p, w_canon, z_c, h_c, transform, alpha, act)
    return undo(out)
