"""Low-level NN primitives (NHWC / NDHWC), parity-faithful to the reference's
torch semantics where checkpoint conversion requires it.

Conventions
-----------
* 2D tensors: (B, H, W, C); 3D (video) tensors: (B, T, H, W, C).
* Conv kernels: HWIO for 2D, DHWIO for 3D (JAX default for these layouts).
* All ``init_*`` functions return plain dicts of ``jnp.ndarray``.

Reference parity targets (for torch-checkpoint import):
  torch Conv2d            -> conv2d (OIHW -> HWIO transpose at import time)
  torch ConvTranspose2d   -> conv_transpose2d (stride/padding/output_padding)
  torch GroupNorm(16)     -> group_norm
  torch InstanceNorm2d    -> instance_norm (affine=False default)
  F.interpolate(bilinear, align_corners=True) -> resize_bilinear_align_corners
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# dtype policy
# ---------------------------------------------------------------------------

class Policy:
    """Simple mixed-precision policy: params in f32, compute in ``compute_dtype``.

    On TPU, bf16 keeps the MXU fed at full rate; logdet and loss accumulation
    stay in f32 (see flows/*).
    """

    def __init__(self, compute_dtype=jnp.float32):
        self.compute_dtype = compute_dtype

    def cast(self, x):
        return jax.tree_util.tree_map(
            lambda a: a.astype(self.compute_dtype)
            if isinstance(a, jnp.ndarray) and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            x,
        )


DEFAULT_POLICY = Policy()

# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def _fan_in_out_conv(shape):
    # HWIO / DHWIO
    rf = 1
    for s in shape[:-2]:
        rf *= s
    fan_in = shape[-2] * rf
    fan_out = shape[-1] * rf
    return fan_in, fan_out


def kaiming_normal(key, shape, dtype=jnp.float32, mode="fan_out"):
    fan_in, fan_out = _fan_in_out_conv(shape)
    fan = fan_out if mode == "fan_out" else fan_in
    std = math.sqrt(2.0 / fan)
    return std * jax.random.normal(key, shape, dtype)


def kaiming_uniform_torch_default(key, shape, dtype=jnp.float32):
    """torch's default Conv init: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ...)*sqrt(3)*gain."""
    fan_in, _ = _fan_in_out_conv(shape)
    gain = math.sqrt(2.0 / (1 + 5.0))  # a = sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_bias_torch_default(key, shape_w, n_out, dtype=jnp.float32):
    fan_in, _ = _fan_in_out_conv(shape_w)
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (n_out,), dtype, -bound, bound)


def orthogonal(key, shape, dtype=jnp.float32):
    """Orthogonal init over a conv kernel (flattened all-but-last-dim x last-dim),
    matching torch.nn.init.orthogonal_ on the OIHW view up to layout."""
    n_rows = shape[-1]
    n_cols = 1
    for s in shape[:-1]:
        n_cols *= s
    flat_shape = (max(n_rows, n_cols), min(n_rows, n_cols))
    a = jax.random.normal(key, flat_shape, dtype)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diag(r))
    if n_rows < n_cols:
        q = q.T
    return q.reshape((n_rows,) + tuple(shape[:-1])).transpose(
        tuple(range(1, len(shape))) + (0,)
    )

# ---------------------------------------------------------------------------
# convolutions
# ---------------------------------------------------------------------------

_DN2 = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def conv2d(x, w, b=None, stride=1, padding=0, dilation=1):
    """2D conv, NHWC x HWIO.  ``padding`` is symmetric int or ((t,b),(l,r))."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), stride, padding, rhs_dilation=dilation, dimension_numbers=dn
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose2d(x, w, b=None, stride=2, padding=1, output_padding=1):
    """torch.nn.ConvTranspose2d parity.  ``w`` is HWIO with I=in, O=out
    (i.e. already transposed from torch's (in,out,kh,kw) at import time).

    Implemented as an input-dilated convolution with a spatially-flipped kernel:
      out = (x dilated by s, padded k-1-p lo / k-1-p+op hi) * flip(w)
    """
    kh, kw = w.shape[0], w.shape[1]
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(output_padding, int):
        output_padding = (output_padding, output_padding)
    pads = (
        (kh - 1 - padding[0], kh - 1 - padding[0] + output_padding[0]),
        (kw - 1 - padding[1], kw - 1 - padding[1] + output_padding[1]),
    )
    w_flip = jnp.flip(w, axis=(0, 1))
    dn = lax.conv_dimension_numbers(x.shape, w_flip.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x,
        w_flip.astype(x.dtype),
        window_strides=(1, 1),
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=dn,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv3d(x, w, b=None, stride=1, padding=0):
    """3D conv, NDHWC x DHWIO."""
    if isinstance(stride, int):
        stride = (stride, stride, stride)
    if isinstance(padding, int):
        padding = ((padding,) * 2,) * 3
    elif isinstance(padding, (tuple, list)) and isinstance(padding[0], int):
        padding = tuple((p, p) for p in padding)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    y = lax.conv_general_dilated(x, w.astype(x.dtype), stride, padding, dimension_numbers=dn)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y

# ---------------------------------------------------------------------------
# normalizations (NHWC; reduce over spatial + within-group channels)
# ---------------------------------------------------------------------------

def group_norm(x, gamma=None, beta=None, num_groups=16, eps=1e-5):
    """GroupNorm over an NHWC or NDHWC tensor (channels last, contiguous groups)."""
    c = x.shape[-1]
    g = num_groups
    assert c % g == 0, f"channels {c} not divisible by groups {g}"
    orig_shape = x.shape
    spatial = x.shape[1:-1]
    xg = x.reshape((x.shape[0],) + spatial + (g, c // g))
    axes = tuple(range(1, len(spatial) + 1)) + (len(xg.shape) - 1,)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    y = xg.reshape(orig_shape)
    if gamma is not None:
        y = y * gamma.astype(y.dtype)
    if beta is not None:
        y = y + beta.astype(y.dtype)
    return y


def instance_norm(x, gamma=None, beta=None, eps=1e-5):
    """InstanceNorm2d parity (affine optional; torch default affine=False)."""
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma.astype(y.dtype)
    if beta is not None:
        y = y + beta.astype(y.dtype)
    return y

# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def activation(name):
    return {
        "relu": jax.nn.relu,
        "elu": jax.nn.elu,
        "lrelu": partial(jax.nn.leaky_relu, negative_slope=0.2),
        "leaky_relu": partial(jax.nn.leaky_relu, negative_slope=0.1),
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        "none": lambda x: x,
        None: lambda x: x,
    }[name]

# ---------------------------------------------------------------------------
# resize (align_corners parity with F.interpolate)
# ---------------------------------------------------------------------------

def _linear_interp_matrix(dst, src, dtype=jnp.float32):
    """(dst, src) row-stochastic matrix for 1-D bilinear, align_corners=True."""
    if dst == 1 or src == 1:
        # align_corners maps everything to index 0
        w = jnp.zeros((dst, src), dtype)
        return w.at[:, 0].set(1.0)
    pos = jnp.arange(dst, dtype=dtype) * (src - 1) / (dst - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, src - 2)
    frac = pos - lo.astype(dtype)
    w = jnp.zeros((dst, src), dtype)
    rows = jnp.arange(dst)
    w = w.at[rows, lo].set(1.0 - frac)
    w = w.at[rows, lo + 1].add(frac)
    return w


def resize_bilinear_align_corners(x, size):
    """F.interpolate(x, size, mode='bilinear', align_corners=True) for NHWC.

    Expressed as two small matmuls (one per spatial axis) — MXU-friendly and
    exactly reproducible, unlike gather-based resizes.
    """
    h_out, w_out = size
    b, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = _linear_interp_matrix(h_out, h_in, x.dtype)
    mw = _linear_interp_matrix(w_out, w_in, x.dtype)
    # contract H: (B,H,W,C) x (h_out,H) -> (B,h_out,W,C)
    y = jnp.einsum("bhwc,oh->bowc", x, mh, preferred_element_type=x.dtype)
    y = jnp.einsum("bhwc,ow->bhoc", y, mw, preferred_element_type=x.dtype)
    return y

# ---------------------------------------------------------------------------
# weight norm / spectral norm
# ---------------------------------------------------------------------------

def weight_norm_materialize(v, g):
    """torch weight_norm: w = g * v / ||v||  with the norm over all dims but O.

    ``v``: HWIO, ``g``: (O,).  (torch stores weight_v (O,I,kh,kw) and
    weight_g (O,1,1,1); converted to HWIO + (O,) at import.)
    """
    norm = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(v.ndim - 1)), keepdims=True) + 0.0)
    return v / jnp.maximum(norm, 1e-12) * g.astype(v.dtype)


def spectral_normalize(w, u, n_iter=1, eps=1e-12):
    """One-step power iteration spectral norm (torch.nn.utils.spectral_norm parity).

    ``w``: HWIO (or any shape; flattened to (O, rest)), ``u``: (O,).
    Returns (w / sigma, u_new).  ``u_new`` must be carried as state by the
    training loop; at inference the converted checkpoint already folds sigma.
    """
    o = w.shape[-1]
    w_mat = w.reshape(-1, o).T  # (O, rest)
    for _ in range(n_iter):
        v = w_mat.T @ u
        v = v / (jnp.linalg.norm(v) + eps)
        u = w_mat @ v
        u = u / (jnp.linalg.norm(u) + eps)
    sigma = u @ (w_mat @ v)
    return w / sigma, lax.stop_gradient(u)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def space_to_depth(x, factor=2):
    """(B,H,W,C) -> (B,H/f,W/f,C*f*f), matching torch SpaceToDepth channel order
    (blocks of channels: [C, f, f] ordering as in pixel_unshuffle)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    # torch pixel_unshuffle output channels ordered (c, fh, fw) on NCHW;
    # our channel-last equivalent: (..., fh, fw, c) -> reorder to (c*f*f) with
    # c slowest to match NCHW semantics after conversion.
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h', w', c, fh, fw
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def depth_to_space(x, factor=2):
    b, h, w, cf = x.shape
    c = cf // (factor * factor)
    x = x.reshape(b, h, w, c, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, fh, w, fw, c
    return x.reshape(b, h * factor, w * factor, c)
