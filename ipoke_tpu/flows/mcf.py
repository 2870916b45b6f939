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


def _row_scan_inverse(p, w_canon, z, h, transform, alpha, act, unroll=1):
    """Canonical order-A sequential inverse via lax.scan.

    Two op-count reductions over the naive body (the sequential inverse is
    per-step-overhead-bound, not FLOP-bound — NOTES.md):

    * the conditioning branch of the 1x1 conv is hoisted out of the scan:
      ``f(concat(ctx, h)) @ W == f(ctx) @ W_top + f(h) @ W_bot`` because the
      activation is elementwise and the matmul splits over input rows, and
      ``f(h) @ W_bot`` has no dependence on previously inverted rows — so it
      is computed for ALL rows in one batched (parallel, MXU-friendly)
      matmul, removing the per-step concat and shrinking the per-step matmul
      to the autoregressive half.  (Accumulation order changes: bitwise-
      different at the ~1 ulp level, same math.)

    * ``unroll`` is forwarded to ``lax.scan`` — full unroll over the
      (typically 8) rows removes the while-loop bookkeeping and the dynamic
      xs-slicing per row.
    """
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

    hid_c = w_canon.shape[3]

    if h is not None:
        hidden = w1x1.shape[0] - h.shape[-1]
        w_top = w1x1[:hidden]
        # conditioning contribution for every row at once (row-parallel)
        h_contrib = f(h.astype(z.dtype)) @ w1x1[hidden:].astype(z.dtype)
    else:
        w_top = w1x1

    # Decompose the (kh, kw) context conv into per-kernel-row 1D convs:
    # ctx_i = sum_j conv1d(row_{i-kh+j}, w[j]) — exact by linearity of conv.
    # Each produced row is convolved ONCE against all kh kernel rows stacked
    # on the output axis, and its kh contributions are accumulated into a
    # tuple of pending-context carries (a Python-level ring shift — zero
    # slice/concat ops on conv inputs).  The previous carried-window
    # formulation (slice + concat feeding a 2D conv) was both an extra op
    # per step and a TPU fusion-emitter crash under scan unroll ("Check
    # failed: window.pad_low[i] == 0").
    w_rows = jnp.concatenate([w_canon[j] for j in range(kh)], axis=-1)
    dn1 = lax.conv_dimension_numbers(
        (b, width, c), (kw, c, kh * hid_c), ("NWC", "WIO", "NWC")
    )

    def step(pend, xs):
        z_row, hc_row = xs
        ctx = pend[0]  # (B, W, hidden)
        raw = f(ctx) @ w_top.astype(ctx.dtype) + b1x1.astype(ctx.dtype)
        if hc_row is not None:
            raw = raw + hc_row.astype(raw.dtype)
        params = T.calc_params(raw, alpha)
        new_row, _ = T.bwd(z_row, params)
        allc = lax.conv_general_dilated(
            new_row, w_rows.astype(new_row.dtype), (1,), ((cw, cw),),
            dimension_numbers=dn1,
        )  # (B, W, kh*hidden): chunk j = this row seen through kernel row j
        # row r reaches ctx_{r+kh-j} through kernel row j
        new_pend = tuple(
            (pend[e + 1] if e + 1 < kh else 0.0)
            + allc[..., (kh - 1 - e) * hid_c: (kh - e) * hid_c]
            for e in range(kh)
        )
        return new_pend, new_row

    pend0 = tuple(jnp.zeros((b, width, hid_c), z.dtype) for _ in range(kh))
    z_rows = jnp.moveaxis(z, 1, 0)
    if h is not None:
        hc_rows = jnp.moveaxis(h_contrib, 1, 0)
        _, out_rows = lax.scan(step, pend0, (z_rows, hc_rows), unroll=unroll)
    else:
        _, out_rows = lax.scan(step, pend0, (z_rows, None), unroll=unroll)
    return jnp.moveaxis(out_rows, 0, 1)


def inverse(p, z, h=None, order="A", transform="affine", alpha=1.0, act="elu",
            backend="scan", unroll=1):
    w_canon, z_c, h_c, undo = _canonicalize(p, z, h, order)
    if backend == "pallas":
        from ipoke_tpu.ops.pallas import mcf_inverse as pk

        out = pk.mcf_inverse_pallas(p, w_canon, z_c, h_c, transform, alpha, act)
    else:
        out = _row_scan_inverse(p, w_canon, z_c, h_c, transform, alpha, act,
                                unroll=unroll)
    return undo(out)
