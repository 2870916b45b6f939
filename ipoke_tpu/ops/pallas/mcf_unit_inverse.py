"""Fused Pallas kernel for a FULL MaCowUnit inverse:

    actnorm2^-1 -> MCF(D)^-1 -> MCF(C)^-1 -> actnorm1^-1 -> MCF(B)^-1 -> MCF(A)^-1

(reference unit: macow2.py:925-995; sequential loops :174-288).  One kernel
per unit instead of four per-MCF kernels — 4x fewer Mosaic compilations and
zero HBM round-trips between the six stages; every recurrence runs in its
NATIVE orientation (row scans for A/B, column scans for C/D, forward and
backward directions handled by index arithmetic) so no transposes/flips are
lowered.

Affine transform only; other transforms use the lax.scan path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ipoke_tpu.nn.core import weight_norm_materialize


def _elu(x):
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _act(name):
    if name == "elu":
        return _elu
    if name == "relu":
        return lambda x: jnp.maximum(x, 0)
    return lambda x: jax.nn.leaky_relu(x, 0.1)


def _affine_inv(z_row, raw, c, alpha):
    mu = raw[..., :c]
    scale = jnp.tanh(raw[..., c:] * 0.5) * alpha + 1.0
    return (z_row - mu) / (scale + 1e-12)


def _make_kernel(alpha, act, height, width, kh, kw_sym, cond):
    """kh: sequential-axis kernel extent (2); kw_sym: symmetric extent (3)."""
    f = _act(act)
    cw = (kw_sym - 1) // 2

    def row_scan(z_get, h_get, out_set, w_ref, w1_ref, b1_ref, win_ref, c, reverse):
        """Row-sequential MCF inverse (orders A forward / B reverse).
        z_get(i)->(B,W,C); h_get(i)->(B,W,HC)|None; out_set(i,row)."""
        win_ref[...] = jnp.zeros_like(win_ref)
        rows = range(height - 1, -1, -1) if reverse else range(height)
        for i in rows:
            ctx = None
            for r in range(kh):
                for s in range(kw_sym):
                    piece = win_ref[:, r, s : s + width, :]
                    term = jax.lax.dot_general(
                        piece, w_ref[r, s], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    ctx = term if ctx is None else ctx + term
            if cond:
                ctx = jnp.concatenate([ctx, h_get(i)], axis=-1)
            raw = jax.lax.dot_general(
                f(ctx), w1_ref[...], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1_ref[...]
            row = _affine_inv(z_get(i), raw, c, alpha)
            out_set(i, row)
            if reverse:
                # order B: context rows i+1..i+kh; new window = rows i..i+kh-1
                if kh > 1:
                    win_ref[:, 1:] = win_ref[:, : kh - 1]
                win_ref[:, 0] = jnp.zeros_like(win_ref[:, 0])
                win_ref[:, 0, cw : cw + width] = row
            else:
                # order A: context rows i-kh..i-1
                if kh > 1:
                    win_ref[:, : kh - 1] = win_ref[:, 1:]
                win_ref[:, kh - 1] = jnp.zeros_like(win_ref[:, kh - 1])
                win_ref[:, kh - 1, cw : cw + width] = row

    def col_scan(z_get, h_get, out_set, w_ref, w1_ref, b1_ref, win_ref, c, reverse):
        """Column-sequential MCF inverse (orders C forward / D reverse).
        Kernel is (kw_sym, kh) = (sym height, seq width); window
        (B, H+2cw, kh, C); z_get(j)->(B,H,C)."""
        win_ref[...] = jnp.zeros_like(win_ref)
        cols = range(width - 1, -1, -1) if reverse else range(width)
        for j in cols:
            ctx = None
            for r in range(kw_sym):
                for s in range(kh):
                    piece = win_ref[:, r : r + height, s, :]
                    term = jax.lax.dot_general(
                        piece, w_ref[r, s], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    ctx = term if ctx is None else ctx + term
            if cond:
                ctx = jnp.concatenate([ctx, h_get(j)], axis=-1)
            raw = jax.lax.dot_general(
                f(ctx), w1_ref[...], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1_ref[...]
            col = _affine_inv(z_get(j), raw, c, alpha)
            out_set(j, col)
            if reverse:
                if kh > 1:
                    win_ref[:, :, 1:] = win_ref[:, :, : kh - 1]
                win_ref[:, :, 0] = jnp.zeros_like(win_ref[:, :, 0])
                win_ref[:, cw : cw + height, 0] = col
            else:
                if kh > 1:
                    win_ref[:, :, : kh - 1] = win_ref[:, :, 1:]
                win_ref[:, :, kh - 1] = jnp.zeros_like(win_ref[:, :, kh - 1])
                win_ref[:, cw : cw + height, kh - 1] = col

    def kernel(*refs):
        if cond:
            (y_ref, h_ref, wA, w1A, bA, wB, w1B, bB, wC, w1C, bC, wD, w1D, bD,
             an1, an2, out_ref, buf_ref, rwin, cwin) = refs
        else:
            (y_ref, wA, w1A, bA, wB, w1B, bB, wC, w1C, bC, wD, w1D, bD,
             an1, an2, out_ref, buf_ref, rwin, cwin) = refs
            h_ref = None
        c = y_ref.shape[-1]
        # actnorm2 inverse: (y - bias) / (exp(ls) + 1e-8)
        buf_ref[...] = (y_ref[...] - an2[1]) / (jnp.exp(an2[0]) + 1e-8)

        def h_row(i):
            return h_ref[:, i]

        def h_col(j):
            return h_ref[:, :, j]

        # MCF D inverse (column, reverse): buf -> out
        col_scan(lambda j: buf_ref[:, :, j], h_col,
                 lambda j, v: out_ref.__setitem__((slice(None), slice(None), j), v),
                 wD, w1D, bD, cwin, c, reverse=True)
        # MCF C inverse (column, forward): out -> buf
        col_scan(lambda j: out_ref[:, :, j], h_col,
                 lambda j, v: buf_ref.__setitem__((slice(None), slice(None), j), v),
                 wC, w1C, bC, cwin, c, reverse=False)
        # actnorm1 inverse: buf -> buf
        buf_ref[...] = (buf_ref[...] - an1[1]) / (jnp.exp(an1[0]) + 1e-8)
        # MCF B inverse (row, reverse): buf -> out
        row_scan(lambda i: buf_ref[:, i], h_row,
                 lambda i, v: out_ref.__setitem__((slice(None), i), v),
                 wB, w1B, bB, rwin, c, reverse=True)
        # MCF A inverse (row, forward): out -> buf, then copy out
        row_scan(lambda i: out_ref[:, i], h_row,
                 lambda i, v: buf_ref.__setitem__((slice(None), i), v),
                 wA, w1A, bA, rwin, c, reverse=False)
        out_ref[...] = buf_ref[...]

    return kernel


def _unit_weights(unit_p):
    """Extract (w_shift, w1x1, b1x1) per conv from a MaCowUnit param tree."""
    out = []
    for name in ("conv1", "conv2", "conv3", "conv4"):
        net = unit_p[name]["net"]
        w1 = weight_norm_materialize(net["conv1x1"]["v"], net["conv1x1"]["g"])[0, 0]
        out.append((net["shift_conv"]["w"], w1, net["conv1x1"]["b"]))
    return out


@functools.partial(jax.jit, static_argnames=("alpha", "act"))
def _call(y, h, weights, an1, an2, alpha, act):
    b, height, width, c = y.shape
    (wA, w1A, bA), (wB, w1B, bB), (wC, w1C, bC), (wD, w1D, bD) = weights
    kh, kw_sym = wA.shape[0], wA.shape[1]  # (2, 3)
    cw = (kw_sym - 1) // 2
    cond = h is not None
    kernel = _make_kernel(alpha, act, height, width, kh, kw_sym, cond)
    inputs = [y] + ([h] if cond else []) + [
        wA, w1A, bA, wB, w1B, bB, wC, w1C, bC, wD, w1D, bD,
        jnp.stack([an1["log_scale"], an1["bias"]]),
        jnp.stack([an2["log_scale"], an2["bias"]]),
    ]
    n_in = len(inputs)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(y.shape, y.dtype),                      # ping-pong buffer
            pltpu.VMEM((b, kh, width + 2 * cw, c), y.dtype),    # row window
            pltpu.VMEM((b, height + 2 * cw, kh, c), y.dtype),   # col window
        ],
    )(*inputs)


def macow_unit_inverse_pallas(unit_p, y, h, spec):
    """Drop-in for flows.macow.macow_unit_inverse (backend 'pallas_unit')."""
    if spec.transform != "affine":
        from ipoke_tpu.flows.macow import macow_unit_inverse
        from dataclasses import replace

        return macow_unit_inverse(unit_p, y, h, replace(spec, mcf_backend="scan"))
    weights = tuple(_unit_weights(unit_p))
    return _call(
        y, h, weights, unit_p["actnorm1"], unit_p["actnorm2"],
        float(spec.alpha), spec.activation,
    )
