"""Reusable conv blocks mirroring the reference's autoencoder building blocks
(reference: models/modules/autoencoders/util.py) in functional NHWC form.

Spectral norm handling: blocks whose reference counterpart wraps the conv in
``torch.nn.utils.spectral_norm`` store an extra power-iteration vector ``u``
next to the kernel.  ``apply`` uses ``w`` as-is (inference parity: converted
checkpoints fold sigma in); the training loop calls
:func:`materialize_spectral_norm` on the param tree before ``apply`` and
carries the updated ``u``'s.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ipoke_tpu.nn import core
from ipoke_tpu.nn.core import (
    activation,
    conv2d,
    conv_transpose2d,
    group_norm,
    instance_norm,
    resize_bilinear_align_corners,
)

# ---------------------------------------------------------------------------
# plain conv param init
# ---------------------------------------------------------------------------

def init_conv(key, kh, kw, c_in, c_out, bias=True, snorm=False, init="torch"):
    kw_, kb = jax.random.split(key)
    shape = (kh, kw, c_in, c_out)
    if init == "torch":
        w = core.kaiming_uniform_torch_default(kw_, shape)
    elif init == "orthogonal":
        w = core.orthogonal(kw_, shape)
    elif init == "normal05":
        w = 0.05 * jax.random.normal(kw_, shape)
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        p["b"] = core.conv_bias_torch_default(kb, shape, c_out) if init == "torch" else jnp.zeros((c_out,))
    if snorm:
        p["u"] = jax.random.normal(jax.random.fold_in(key, 7), (c_out,))
        p["u"] = p["u"] / (jnp.linalg.norm(p["u"]) + 1e-12)
    return p


def materialize_spectral_norm(params):
    """Walk a pytree; for every dict node holding both 'w' and 'u', replace w by
    its spectral-normalized version (1 power iteration) and update u.

    Returns the materialized tree (with refreshed ``u``).  Use inside the train
    step; gradients flow through w / sigma as in torch.
    """
    if isinstance(params, dict):
        if "w" in params and "u" in params:
            w_sn, u_new = core.spectral_normalize(params["w"], params["u"])
            out = dict(params)
            out["w"] = w_sn
            out["u"] = u_new
            return out
        return {k: materialize_spectral_norm(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        t = type(params)
        return t(materialize_spectral_norm(v) for v in params)
    return params


def refresh_spectral_u(params):
    """Power-iterate ONLY the 'u' vectors (weights untouched) — run once per
    train step after the optimizer update, mirroring torch's per-forward
    buffer refresh without hard-normalizing the stored weights."""
    if isinstance(params, dict):
        if "w" in params and "u" in params:
            _, u_new = core.spectral_normalize(params["w"], params["u"])
            out = dict(params)
            out["u"] = u_new
            return out
        return {k: refresh_spectral_u(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        t = type(params)
        return t(refresh_spectral_u(v) for v in params)
    return params


# ---------------------------------------------------------------------------
# Conv2dBlock / Conv2dTransposeBlock  (ref: autoencoders/util.py:196-275, 7-75)
# ---------------------------------------------------------------------------

def init_conv2d_block(key, c_in, c_out, ks, norm="none", snorm=False, bias=True):
    k1, k2 = jax.random.split(key)
    p = {"conv": init_conv(k1, ks, ks, c_in, c_out, bias=bias, snorm=snorm)}
    if norm in ("group",):
        p["norm"] = {"gamma": jnp.ones((c_out,)), "beta": jnp.zeros((c_out,))}
    # 'in' (InstanceNorm2d) is affine=False in the reference -> no params
    return p


def conv2d_block_apply(p, x, stride=1, padding=0, norm="none", act="elu"):
    y = conv2d(x, p["conv"]["w"], p["conv"].get("b"), stride=stride, padding=padding)
    if norm == "group":
        y = group_norm(y, p["norm"]["gamma"], p["norm"]["beta"], num_groups=16)
    elif norm == "in":
        y = instance_norm(y)
    y = activation(act)(y)
    return y


def init_convT2d_block(key, c_in, c_out, ks, norm="none", snorm=False, bias=True):
    return init_conv2d_block(key, c_in, c_out, ks, norm=norm, snorm=snorm, bias=bias)


def convT2d_block_apply(p, x, stride=2, padding=1, norm="none", act="elu"):
    """NB reference quirk: Conv2dTransposeBlock maps activation 'elu' to ReLU
    (autoencoders/util.py:41-42); we mirror that."""
    if act == "elu":
        act = "relu"
    y = conv_transpose2d(
        x, p["conv"]["w"], p["conv"].get("b"), stride=stride, padding=padding, output_padding=padding
    )
    if norm == "group":
        y = group_norm(y, p["norm"]["gamma"], p["norm"]["beta"], num_groups=16)
    elif norm == "in":
        y = instance_norm(y)
    y = activation(act)(y)
    return y


# ---------------------------------------------------------------------------
# ResBlock  (ref: autoencoders/util.py:105-191)
# ---------------------------------------------------------------------------

def init_res_block(key, c_in, c_out, norm="in", upsampling=False, stride=1, snorm=False):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": init_conv2d_block(k1, c_in, c_out, 3, norm=norm, snorm=snorm),
        "conv2": init_conv2d_block(k2, c_out, c_out, 3, norm=norm, snorm=snorm),
    }
    if c_in != c_out or upsampling or stride != 1:
        # reference quirk: res_conv always uses InstanceNorm ('in'), with act
        p["res_conv"] = init_conv2d_block(k3, c_in, c_out, 3, norm="none", snorm=snorm)
    return p


def res_block_apply(p, x, norm="in", act="elu", upsampling=False, stride=1):
    residual = x
    if "res_conv" in p and p["res_conv"]["conv"]["w"].shape[:3] == \
            p["conv1"]["conv"]["w"].shape[:3] and \
            (p["res_conv"]["conv"].get("b") is None) == \
            (p["conv1"]["conv"].get("b") is None):
        # MXU fusion (exact): res_conv and conv1 read the SAME input with the
        # same kernel geometry, so one conv with their kernels concatenated
        # on the output-channel axis computes both — each output channel's
        # reduction is untouched (bitwise-equal per channel), but the MXU
        # sees 2x the output channels per pass.  Measured on v5e at the
        # decode stage-3 geometry (bf16, batch 128, 64ch out): two convTs
        # 4.56 ms -> one dual convT 3.30 ms.  Norms/activations then apply
        # to the split halves exactly as the unfused path does.
        rw, cw = p["res_conv"]["conv"]["w"], p["conv1"]["conv"]["w"]
        n_res = rw.shape[-1]
        w = jnp.concatenate([rw, cw], axis=-1)
        rb, cb = p["res_conv"]["conv"].get("b"), p["conv1"]["conv"].get("b")
        b = (jnp.concatenate([rb, cb]) if rb is not None and cb is not None
             else None)
        if upsampling:
            y = conv_transpose2d(x, w, b, stride=2, padding=1, output_padding=1)
        else:
            y = conv2d(x, w, b, stride=stride, padding=1)
        r, o = y[..., :n_res], y[..., n_res:]
        # res_conv branch: InstanceNorm + act (convT maps elu->relu, the
        # reference Conv2dTransposeBlock quirk mirrored above)
        a_res = ("relu" if act == "elu" else act) if upsampling else act
        residual = activation(a_res)(instance_norm(r))
        if norm == "group":
            o = group_norm(o, p["conv1"]["norm"]["gamma"],
                           p["conv1"]["norm"]["beta"], num_groups=16)
        elif norm == "in":
            o = instance_norm(o)
        a1 = ("relu" if act == "elu" else act) if upsampling else act
        out = activation(a1)(o)
    else:
        if "res_conv" in p:
            if upsampling:
                residual = convT2d_block_apply(p["res_conv"], x, stride=2, padding=1, norm="in", act=act)
            else:
                residual = conv2d_block_apply(p["res_conv"], x, stride=stride, padding=1, norm="in", act=act)
        if upsampling:
            out = convT2d_block_apply(p["conv1"], x, stride=2, padding=1, norm=norm, act=act)
        else:
            out = conv2d_block_apply(p["conv1"], x, stride=stride, padding=1, norm=norm, act=act)
    out = conv2d_block_apply(p["conv2"], out, stride=1, padding=1, norm=norm, act="none")
    return out + residual


# ---------------------------------------------------------------------------
# NormConv2d  (ref: autoencoders/util.py:278-302): weight-normalized conv with
# learned per-channel gamma/beta on the output.
# ---------------------------------------------------------------------------

def init_norm_conv2d(key, ks, c_in, c_out):
    k1, _ = jax.random.split(key)
    shape = (ks, ks, c_in, c_out)
    v = core.kaiming_uniform_torch_default(k1, shape)
    g = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2)))  # torch weight_norm init: g=||v||
    return {
        "v": v,
        "g": g,
        "b": core.conv_bias_torch_default(jax.random.fold_in(key, 3), shape, c_out),
        "gamma": jnp.ones((1, 1, 1, c_out)),
        "beta": jnp.zeros((1, 1, 1, c_out)),
    }


def norm_conv2d_apply(p, x, stride=1, padding=0):
    w = core.weight_norm_materialize(p["v"], p["g"])
    y = conv2d(x, w, p["b"], stride=stride, padding=padding)
    return p["gamma"].astype(y.dtype) * y + p["beta"].astype(y.dtype)


# ---------------------------------------------------------------------------
# SPADE (ref: autoencoders/util.py:473-500): group-normalize x (no affine),
# modulate with gamma/beta computed from the bilinearly-resized start frame.
# ---------------------------------------------------------------------------

def spade_num_groups(num_features, num_groups=16):
    while num_features % num_groups != 0:
        num_groups -= 1
    return num_groups


def init_spade(key, num_features):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv": init_conv(k1, 3, 3, 3, 128),
        "conv_gamma": init_conv(k2, 3, 3, 128, num_features),
        "conv_beta": init_conv(k3, 3, 3, 128, num_features),
    }


def spade_apply(p, x, y_frame, shared_feat=None, shared_mod=None):
    """x: (B,H,W,C) feature map; y_frame: (B,Hf,Wf,3) start frame.

    The whole SPADE modulation (3->128 conv AND the gamma/beta convs) depends
    only on the start frame, which is constant across the time unroll — the
    reference recomputes it per frame (fully_conv_models.py:172).  Callers
    can hoist either stage:
      ``shared_feat``: precomputed 128-ch activation at x's resolution;
      ``shared_mod``: precomputed {'gamma','beta'} tensors (spade_modulation)
        — skips ALL SPADE convs in the unrolled step (numerically identical,
        the convs are just computed once instead of T times).
    """
    ng = spade_num_groups(x.shape[-1])
    normalized = group_norm(x, None, None, num_groups=ng)
    if shared_mod is not None:
        return normalized * (1.0 + shared_mod["gamma"]) + shared_mod["beta"]
    if shared_feat is None:
        y = resize_bilinear_align_corners(y_frame, x.shape[1:3])
        y = jax.nn.leaky_relu(conv2d(y, p["conv"]["w"], p["conv"]["b"], padding=1), 0.2)
    else:
        y = shared_feat
    gamma = conv2d(y, p["conv_gamma"]["w"], p["conv_gamma"]["b"], padding=1)
    beta = conv2d(y, p["conv_beta"]["w"], p["conv_beta"]["b"], padding=1)
    return normalized * (1.0 + gamma) + beta


def spade_modulation(p, y_frame, hw):
    """Precompute the full per-stage SPADE modulation {'gamma','beta'} of a
    start frame (hoisted out of the decode time unroll)."""
    y = spade_shared_feat(p, y_frame, hw)
    return {
        "gamma": conv2d(y, p["conv_gamma"]["w"], p["conv_gamma"]["b"], padding=1),
        "beta": conv2d(y, p["conv_beta"]["w"], p["conv_beta"]["b"], padding=1),
    }


def spade_shared_feat(p, y_frame, hw):
    y = resize_bilinear_align_corners(y_frame, hw)
    return jax.nn.leaky_relu(conv2d(y, p["conv"]["w"], p["conv"]["b"], padding=1), 0.2)
