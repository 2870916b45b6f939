"""MaCow v1 — the older unconditional flow family (reference:
models/modules/INN/macow.py:46-470), imported by the reference's
UnconditionalMaCowFLowBlock (flow_blocks.py:838-876).  Dead code for the
released checkpoints; provided for component parity.

Differences from v2 (flows/macow.py):
  * transform: mu + sigmoid(raw_logscale + 2) * z (sigmoid scale, not tanh
    affine);
  * MCFBlock: shifted conv WITH bias, conditioning s is ADDED to the hidden
    (after an s_conv 3x3), not concatenated;
  * MaCowUnit order: ActNorm -> MCF(A) -> MCF(B) -> ActNorm -> MCF(C) -> MCF(D);
  * step = units x N -> GlowStep (ActNorm -> Shuffle -> NICE with sigmoid
    scale, continuous up split).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from ipoke_tpu.flows import actnorm, permute
from ipoke_tpu.flows.convnets import init_wn_conv, shifted_conv_apply, wn_conv_apply
from ipoke_tpu.nn import core
from ipoke_tpu.nn.core import conv2d


@dataclass(frozen=True)
class MaCowV1Spec:
    in_channels: int
    hidden_channels: int
    kernel_size: tuple = (2, 3)
    s_channels: int = 0
    num_units: int = 2
    scale: bool = True


def _sigmoid_scale(raw):
    return jax.nn.sigmoid(raw + 2.0)


# -- v1 MCF -----------------------------------------------------------------

def init_mcf_v1(key, c, kernel, spec: MaCowV1Spec):
    """v1 masked_conv is itself weight-normed WITH bias (modules.py:1463
    ShiftedConv2d subclasses Conv2dWeightNorm — unlike v2's plain conv)."""
    k1, k2, k3 = jax.random.split(key, 3)
    kh, kw = kernel
    out_c = c * (2 if spec.scale else 1)
    p = {
        "shift_conv": init_wn_conv(k1, kh, kw, c, spec.hidden_channels, zero_init=False),
        "conv1x1": init_wn_conv(k2, 1, 1, spec.hidden_channels, out_c, zero_init=False),
    }
    if spec.s_channels > 0:
        p["s_conv"] = init_wn_conv(k3, 3, 3, spec.s_channels, spec.hidden_channels,
                                   zero_init=False)
    return p


def _shift_w(p):
    return core.weight_norm_materialize(p["shift_conv"]["v"], p["shift_conv"]["g"])


def _mcf_v1_params(p, hidden, spec):
    raw = wn_conv_apply(p["conv1x1"], jax.nn.elu(hidden))
    if spec.scale:
        mu, logs = jnp.split(raw, 2, axis=-1)
        return mu, _sigmoid_scale(logs)
    return raw, None


def _s_hidden(p, s):
    return None if s is None or "s_conv" not in p else wn_conv_apply(p["s_conv"], s, padding=1)


def mcf_v1_forward(p, x, s, order, spec: MaCowV1Spec):
    hidden = shifted_conv_apply({"w": _shift_w(p)}, x, order) + p["shift_conv"]["b"]
    sh = _s_hidden(p, s)
    if sh is not None:
        hidden = hidden + sh
    mu, scale = _mcf_v1_params(p, hidden, spec)
    if scale is not None:
        out = x * scale + mu
        logdet = jnp.sum(jnp.log(scale).reshape(x.shape[0], -1).astype(jnp.float32), axis=1)
    else:
        out, logdet = x + mu, jnp.zeros((x.shape[0],), jnp.float32)
    return out, logdet


def _canonicalize_v1(w, z, sh, order):
    if order == "A":
        return w, z, sh, lambda a: a
    if order == "B":
        return (jnp.flip(w, 0), jnp.flip(z, 1),
                None if sh is None else jnp.flip(sh, 1), lambda a: jnp.flip(a, 1))
    if order == "C":
        return (jnp.swapaxes(w, 0, 1), jnp.swapaxes(z, 1, 2),
                None if sh is None else jnp.swapaxes(sh, 1, 2),
                lambda a: jnp.swapaxes(a, 1, 2))
    wt = jnp.flip(jnp.swapaxes(w, 0, 1), 0)
    return (wt, jnp.flip(jnp.swapaxes(z, 1, 2), 1),
            None if sh is None else jnp.flip(jnp.swapaxes(sh, 1, 2), 1),
            lambda a: jnp.swapaxes(jnp.flip(a, 1), 1, 2))


def mcf_v1_inverse(p, z, s, order, spec: MaCowV1Spec):
    """Sequential row-scan inverse (reference backward_height/width,
    macow.py:225-283), canonicalized to order A like flows/mcf.py."""
    sh = _s_hidden(p, s)
    w_canon, z_c, sh_c, undo = _canonicalize_v1(_shift_w(p), z, sh, order)
    b, height, width, c = z_c.shape
    kh, kw = w_canon.shape[0], w_canon.shape[1]
    cw = (kw - 1) // 2
    w1x1 = core.weight_norm_materialize(p["conv1x1"]["v"], p["conv1x1"]["g"])[0, 0]
    b1x1 = p["conv1x1"]["b"]
    bias = p["shift_conv"]["b"]
    dn = lax.conv_dimension_numbers(
        (b, kh, width + 2 * cw, c), w_canon.shape, ("NHWC", "HWIO", "NHWC")
    )

    def step(win, xs):
        z_row, sh_row = xs
        ctx = lax.conv_general_dilated(
            win, w_canon.astype(win.dtype), (1, 1), "VALID", dimension_numbers=dn
        )[:, 0] + bias
        if sh_row is not None:
            ctx = ctx + sh_row
        raw = jax.nn.elu(ctx) @ w1x1 + b1x1
        if spec.scale:
            mu, logs = jnp.split(raw, 2, axis=-1)
            new_row = (z_row - mu) / (_sigmoid_scale(logs) + 1e-12)
        else:
            new_row = z_row - raw
        padded = jnp.pad(new_row, ((0, 0), (cw, cw), (0, 0)))
        win = jnp.concatenate([win[:, 1:], padded[:, None]], axis=1)
        return win, new_row

    win0 = jnp.zeros((b, kh, width + 2 * cw, c), z.dtype)
    z_rows = jnp.moveaxis(z_c, 1, 0)
    sh_rows = None if sh_c is None else jnp.moveaxis(sh_c, 1, 0)
    _, out_rows = lax.scan(step, win0, (z_rows, sh_rows))
    return undo(jnp.moveaxis(out_rows, 0, 1))


# -- v1 MaCowUnit -----------------------------------------------------------

def init_unit_v1(key, spec: MaCowV1Spec):
    ks = jax.random.split(key, 6)
    kh, kw = spec.kernel_size
    c = spec.in_channels
    return {
        "actnorm1": actnorm.init_actnorm(ks[0], c),
        "conv1": init_mcf_v1(ks[1], c, (kh, kw), spec),
        "conv2": init_mcf_v1(ks[2], c, (kh, kw), spec),
        "actnorm2": actnorm.init_actnorm(ks[3], c),
        "conv3": init_mcf_v1(ks[4], c, (kw, kh), spec),
        "conv4": init_mcf_v1(ks[5], c, (kw, kh), spec),
    }


def unit_v1_forward(p, x, s, spec):
    out, ld = actnorm.forward(p["actnorm1"], x)
    for name, order in (("conv1", "A"), ("conv2", "B")):
        out, l = mcf_v1_forward(p[name], out, s, order, spec)
        ld = ld + l
    out, l = actnorm.forward(p["actnorm2"], out)
    ld = ld + l
    for name, order in (("conv3", "C"), ("conv4", "D")):
        out, l = mcf_v1_forward(p[name], out, s, order, spec)
        ld = ld + l
    return out, ld


def unit_v1_inverse(p, y, s, spec):
    out = mcf_v1_inverse(p["conv4"], y, s, "D", spec)
    out = mcf_v1_inverse(p["conv3"], out, s, "C", spec)
    out = actnorm.inverse(p["actnorm2"], out)
    out = mcf_v1_inverse(p["conv2"], out, s, "B", spec)
    out = mcf_v1_inverse(p["conv1"], out, s, "A", spec)
    return actnorm.inverse(p["actnorm1"], out)


# -- GlowStep (ActNorm -> Shuffle -> v1 NICE) -------------------------------

def init_glow_step(key, spec: MaCowV1Spec):
    """v1 NICE subnet = 3 weight-norm convs (modules.py:1112-1142
    NICEConvBlock: WN3x3 -> ELU -> WN1x1 -> ELU -> zero-init WN3x3)."""
    ks = jax.random.split(key, 5)
    c = spec.in_channels
    z1 = c - c // 2
    hid = spec.hidden_channels
    out_c = (c // 2) * (2 if spec.scale else 1)
    return {
        "actnorm": actnorm.init_actnorm(ks[0], c),
        "shuffle": permute.init_shuffle(ks[1], c),
        "nice": {
            "conv1": init_wn_conv(ks[2], 3, 3, z1, hid, zero_init=False),
            "conv2": init_wn_conv(ks[3], 1, 1, hid, hid, zero_init=False),
            # init_zeros=True skips weight_norm entirely in the reference
            # (modules.py:1208-1213): a PLAIN conv with zero weights
            "conv3": {"w": jnp.zeros((3, 3, hid, out_c)), "b": jnp.zeros((out_c,))},
        },
    }


def _nice_v1_params(p, z1, spec):
    h = jax.nn.elu(wn_conv_apply(p["conv1"], z1, padding=1))
    h = jax.nn.elu(wn_conv_apply(p["conv2"], h))
    raw = conv2d(h, p["conv3"]["w"], p["conv3"]["b"], padding=1)
    if spec.scale:
        mu, logs = jnp.split(raw, 2, axis=-1)
        return mu, _sigmoid_scale(logs)
    return raw, None


def glow_step_forward(p, x, spec):
    c = spec.in_channels
    z1c = c - c // 2
    out, ld = actnorm.forward(p["actnorm"], x)
    out, _ = permute.shuffle_forward(p["shuffle"], out)
    z1, z2 = out[..., :z1c], out[..., z1c:]
    mu, scale = _nice_v1_params(p["nice"], z1, spec)
    if scale is not None:
        z2 = z2 * scale
        ld = ld + jnp.sum(jnp.log(scale).reshape(x.shape[0], -1).astype(jnp.float32), axis=1)
    z2 = z2 + mu
    return jnp.concatenate([z1, z2], axis=-1), ld


def glow_step_inverse(p, y, spec):
    c = spec.in_channels
    z1c = c - c // 2
    z1, z2 = y[..., :z1c], y[..., z1c:]
    mu, scale = _nice_v1_params(p["nice"], z1, spec)
    z2 = z2 - mu
    if scale is not None:
        z2 = z2 / (scale + 1e-12)
    out = jnp.concatenate([z1, z2], axis=-1)
    out = permute.shuffle_inverse(p["shuffle"], out)
    return actnorm.inverse(p["actnorm"], out)


# -- v1 MaCowStep -----------------------------------------------------------

def init_step_v1(key, spec: MaCowV1Spec):
    return {
        "units": [init_unit_v1(jax.random.fold_in(key, i), spec)
                  for i in range(spec.num_units)],
        "glow": init_glow_step(jax.random.fold_in(key, 100), spec),
    }


def step_v1_forward(p, x, spec, s=None):
    ld = jnp.zeros((x.shape[0],), jnp.float32)
    out = x
    for u in p["units"]:
        out, l = unit_v1_forward(u, out, s, spec)
        ld = ld + l
    out, l = glow_step_forward(p["glow"], out, spec)
    return out, ld + l


def step_v1_inverse(p, y, spec, s=None):
    out = glow_step_inverse(p["glow"], y, spec)
    for u in reversed(p["units"]):
        out = unit_v1_inverse(u, out, s, spec)
    return out
