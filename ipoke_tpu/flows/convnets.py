"""Conv subnets used by the flow blocks.

Parity map (reference file:line):
  Conv2dWeightNorm   macow_utils.py:211-251  (weight-norm conv, zero-init)
  ShiftedConv2d      macow_utils.py:446-506  (causal shifted conv, orders A-D)
  MCFBlock           macow_utils.py:407-434  (shifted conv -> [cat h] -> act -> 1x1 WN conv)
  NICEConvBlock      macow_utils.py:253-337  (3x3 -> act -> 1x1 -> [cat h] -> act -> 3x3 WN)

The zero-init weight-norm convs mean fresh flows start as identity (affine
params ~ 0 -> scale 1, shift 0), which is how the reference stabilizes early
training; from-scratch init here sets g = 0, b = 0 directly instead of the
reference's lazy first-batch trick.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ipoke_tpu.nn import core
from ipoke_tpu.nn.core import activation, conv2d

# ---------------------------------------------------------------------------
# weight-norm conv (data-init folded at conversion; zero-init for fresh params)
# ---------------------------------------------------------------------------

def init_wn_conv(key, kh, kw, c_in, c_out, zero_init=True):
    v = 0.05 * jax.random.normal(key, (kh, kw, c_in, c_out))
    if zero_init:
        g = jnp.zeros((c_out,))
    else:
        g = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2)))
    return {"v": v, "g": g, "b": jnp.zeros((c_out,))}


def wn_conv_apply(p, x, padding=0):
    w = core.weight_norm_materialize(p["v"], p["g"])
    return conv2d(x, w, p["b"], padding=padding)


# ---------------------------------------------------------------------------
# shifted (causal) conv
# ---------------------------------------------------------------------------
# Orders (matching macow_utils.ShiftedConv2d):
#   'A': output row i sees input rows i-kH .. i-1      (scan top -> bottom)
#   'B': output row i sees input rows i+1 .. i+kH      (scan bottom -> top)
#   'C': output col j sees input cols j-kW .. j-1      (scan left -> right)
#   'D': output col j sees input cols j+1 .. j+kW      (scan right -> left)
# For A/B the kernel is (kH, kW_sym) with symmetric width context; C/D have
# (kH_sym, kW) with symmetric height context.


def init_shifted_conv(key, kernel_size, c_in, c_out):
    kh, kw = kernel_size
    w = core.kaiming_uniform_torch_default(key, (kh, kw, c_in, c_out))
    return {"w": w}  # bias=False in MCFBlock's shift_conv


def shifted_conv_apply(p, x, order):
    """x: (B,H,W,C).  Causal pad + slice + VALID conv."""
    w = p["w"]
    kh, kw = w.shape[0], w.shape[1]
    if order == "A":
        cw = (kw - 1) // 2
        xp = jnp.pad(x, ((0, 0), (kh, 0), (cw, cw), (0, 0)))[:, :-1]
    elif order == "B":
        cw = (kw - 1) // 2
        xp = jnp.pad(x, ((0, 0), (0, kh), (cw, cw), (0, 0)))[:, 1:]
    elif order == "C":
        ch = (kh - 1) // 2
        xp = jnp.pad(x, ((0, 0), (ch, ch), (kw, 0), (0, 0)))[:, :, :-1]
    elif order == "D":
        ch = (kh - 1) // 2
        xp = jnp.pad(x, ((0, 0), (ch, ch), (0, kw), (0, 0)))[:, :, 1:]
    else:
        raise ValueError(order)
    return conv2d(xp, w, None, padding=0)


# ---------------------------------------------------------------------------
# MCFBlock: parameter net of MaskedConvFlow
# ---------------------------------------------------------------------------

def init_mcf_block(key, c_in, c_out, kernel_size, hidden, h_channels=None):
    k1, k2 = jax.random.split(key)
    c2_in = hidden + (h_channels or 0)
    return {
        "shift_conv": init_shifted_conv(k1, kernel_size, c_in, hidden),
        "conv1x1": init_wn_conv(k2, 1, 1, c2_in, c_out, zero_init=True),
    }


def mcf_block_apply(p, x, order, h=None, act="elu"):
    c = shifted_conv_apply(p["shift_conv"], x, order)
    if h is not None:
        c = jnp.concatenate([c, h.astype(c.dtype)], axis=-1)
    c = activation(act)(c)
    return wn_conv_apply(p["conv1x1"], c)


def mcf_block_apply_window(p, window, h_slice=None, act="elu"):
    """Run the MCF subnet on an explicit (B, kH, Wpad, C) context window,
    producing one output row (B, W, c_out) — the inner step of the sequential
    inverse.  The window already contains the causal context (width pre-padded
    by cW); conv is VALID so the kernel consumes all kH rows.
    """
    w = p["shift_conv"]["w"]
    c = conv2d(window, w, None, padding=0)  # (B, 1, W, hidden)
    if h_slice is not None:
        c = jnp.concatenate([c, h_slice.astype(c.dtype)], axis=-1)
    c = activation(act)(c)
    out = wn_conv_apply(p["conv1x1"], c)
    return out[:, 0]  # (B, W, c_out)


# ---------------------------------------------------------------------------
# NICEConvBlock: parameter net of the NICE2d coupling
# ---------------------------------------------------------------------------

def init_nice_conv_block(key, c_in, c_out, hidden, h_channels=0,
                         attention=False, heads=4, spatial_size=8):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    hidden_h = hidden + (h_channels if h_channels else 0)
    if attention:
        from ipoke_tpu.flows import attention as attn

        return {
            "in_resnet": attn.init_gated_conv(k1, c_in, dim_out=hidden),
            "pos_emb": jax.random.normal(k4, (spatial_size, spatial_size, hidden)),
            "conv1": attn.init_conv_attn_block(k1, hidden, spatial_size),
            "conv2": attn.init_conv_attn_block(k2, hidden, spatial_size),
            "conv3": init_wn_conv(k3, 3, 3, hidden_h, c_out, zero_init=True),
        }
    return {
        "conv1": {"w": core.kaiming_uniform_torch_default(k1, (3, 3, c_in, hidden))},
        "conv2": {"w": core.kaiming_uniform_torch_default(k2, (1, 1, hidden, hidden))},
        "conv3": init_wn_conv(k3, 3, 3, hidden_h, c_out, zero_init=True),
    }


def nice_conv_block_apply(p, x, h=None, act="elu", heads=4):
    f = activation(act)
    if "in_resnet" in p:  # attention variant (reference NICEConvBlock attention path)
        from ipoke_tpu.flows import attention as attn

        out = attn.gated_conv_apply(p["in_resnet"], x)
        out = attn.conv_attn_block_apply(p["conv1"], out, p["pos_emb"], heads)
        out = f(out)
        out = attn.conv_attn_block_apply(p["conv2"], out, p["pos_emb"], heads)
    else:
        out = conv2d(x, p["conv1"]["w"], None, padding=1)
        out = f(out)
        out = conv2d(out, p["conv2"]["w"], None, padding=0)
    if h is not None:
        out = jnp.concatenate([out, h.astype(out.dtype)], axis=-1)
    out = f(out)
    return wn_conv_apply(p["conv3"], out, padding=1)
