"""Sequence (time-axis) parallelism for the 3D-ResNet motion encoder.

The reference is single-node data-parallel only and handles temporal scale
architecturally (SURVEY §2.10: no SP/CP; temporal stride-2 stages in
models/modules/motion_models/motion_encoder.py:161-188).  This module is the
TPU-native scaling extension SURVEY names for long videos: shard the video's
time axis over a ``seq`` mesh axis and run the encoder under
``jax.shard_map`` with

  * **halo exchange** (``lax.ppermute`` over ICI) of one boundary frame per
    temporal kernel-3 conv — ppermute leaves non-receiving edge devices with
    zeros, which IS the reference's zero padding, so the sharded conv is
    exactly the dense zero-padded conv;
  * **global-statistics GroupNorm** — the encoder's GroupNorm reduces over
    (T, H, W, group-channels), so sharded time needs cross-shard moments:
    two ``psum``s (sum, then sum of squared deviations — same two-pass
    moments as ``jnp.var``);
  * **cross-shard temporal reduction** — the final temporal squeeze/mean
    becomes a psum-mean over the ``seq`` axis.

Everything is exact (up to f32 reduction order) against the dense
:func:`ipoke_tpu.models.motion_encoder.apply`; tests/test_seqpar.py pins
forward and gradient equality on a virtual CPU mesh, composed with a
``data`` axis.

Shape contract: with ``n`` seq shards the local time length must stay even
at every temporal stride-2 conv, i.e. ``T % (n * 2**n_tstrides) == 0``
(:func:`check_plan`).  That is the long-video regime this extension exists
for; short parity-length clips (T=10) just use the dense path.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ipoke_tpu.models import motion_encoder
from ipoke_tpu.models.motion_encoder import MotionEncoderSpec
from ipoke_tpu.nn import core


# ---------------------------------------------------------------------------
# temporal-stride plan
# ---------------------------------------------------------------------------

def temporal_strides(spec: MotionEncoderSpec):
    """Temporal stride of every stage's first conv, in order (stem first)."""
    _, stride1, stride4, has_l4, has_l5, _ = spec.derived()
    st = [2, stride1[0], 2, 2]  # stem, layer1, layer2, layer3
    if has_l4:
        st.append(stride4[0])
    if has_l5:
        st.append(2)
    return st


def check_plan(spec: MotionEncoderSpec, t: int, n_seq: int):
    """Raise with an actionable message unless (t, n_seq) shards cleanly."""
    if t % n_seq:
        raise ValueError(f"T={t} not divisible by n_seq={n_seq}")
    t_local = t // n_seq
    for i, s in enumerate(temporal_strides(spec)):
        if s == 2:
            if t_local < 2 or t_local % 2:
                need = n_seq * 2 ** sum(1 for x in temporal_strides(spec) if x == 2)
                raise ValueError(
                    f"local time length {t_local} at temporal-stride stage {i} "
                    f"is not an even >=2 number; need T to be a multiple of "
                    f"{need} for n_seq={n_seq} (long-video regime), got T={t}"
                )
            t_local //= 2
    return t_local


# ---------------------------------------------------------------------------
# communication-aware ops (used inside shard_map)
# ---------------------------------------------------------------------------

def _from_left(x, axis_name, n):
    """Each shard receives its LEFT neighbour's tensor; shard 0 gets zeros
    (ppermute's non-receiving devices are zero-filled = global zero pad)."""
    return lax.ppermute(x, axis_name, [(i, i + 1) for i in range(n - 1)])


def _from_right(x, axis_name, n):
    return lax.ppermute(x, axis_name, [(i + 1, i) for i in range(n - 1)])


def _halo_conv3d(axis_name, n):
    """conv3d drop-in whose temporal receptive field crosses shard borders.

    kernel-3 / pad-1 temporal convs take a 1-frame halo: both sides at
    stride 1; left only at stride 2 (the last stride-2 window ends on the
    shard's own final frame).  kernel-1 convs need no halo."""

    def conv_fn(x, w, b=None, stride=1, padding=0):
        st = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
        pad = (padding,) * 3 if isinstance(padding, int) else tuple(padding)
        kt = int(w.shape[0])
        if kt == 1:
            assert pad[0] == 0, "kernel-1 temporal conv with temporal pad unsupported"
            return core.conv3d(x, w, b, stride=st, padding=(0, pad[1], pad[2]))
        assert kt == 3 and pad[0] == 1 and st[0] in (1, 2), (kt, pad, st)
        parts = [_from_left(x[:, -1:], axis_name, n), x]
        if st[0] == 1:
            parts.append(_from_right(x[:, :1], axis_name, n))
        else:
            assert x.shape[1] % 2 == 0, f"odd local T {x.shape[1]} at temporal stride 2"
        xh = jnp.concatenate(parts, axis=1)
        return core.conv3d(xh, w, b, stride=st, padding=(0, pad[1], pad[2]))

    return conv_fn


def _seq_group_norm(axis_name, n):
    """GroupNorm with moments psum'd over the sharded time axis (two-pass,
    matching jnp.var's mean-of-squared-deviations)."""

    def gn_fn(x, gamma=None, beta=None, num_groups=16, eps=1e-5):
        c = x.shape[-1]
        g = num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        xg = x.reshape(x.shape[:-1] + (g, c // g))
        axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)  # (T,H,W,c/g)
        cnt = float(np.prod([xg.shape[a] for a in axes])) * n
        mean = lax.psum(jnp.sum(xg, axis=axes, keepdims=True), axis_name) / cnt
        var = lax.psum(jnp.sum((xg - mean) ** 2, axis=axes, keepdims=True), axis_name) / cnt
        y = ((xg - mean) * lax.rsqrt(var + eps)).reshape(x.shape)
        if gamma is not None:
            y = y * gamma.astype(y.dtype)
        if beta is not None:
            y = y + beta.astype(y.dtype)
        return y

    return gn_fn


def _seq_t_reduce(axis_name, n):
    """Temporal mean across all shards (the dense path's squeeze-or-mean)."""

    def t_reduce(out):
        t_local = out.shape[1]
        total = lax.psum(jnp.sum(out, axis=1), axis_name)
        return total / (t_local * n)

    return t_reduce


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def encode(
    params,
    x,
    spec: MotionEncoderSpec,
    mesh: Mesh,
    seq_axis: str = "seq",
    batch_axis: Optional[str] = None,
    rng: Optional[jax.Array] = None,
):
    """Sequence-parallel motion encode: x (B, T, H, W, 3) with T sharded over
    ``seq_axis`` (and optionally B over ``batch_axis``).  Returns
    (z, mu, logvar), batch-sharded, replicated over ``seq_axis`` — exactly
    :func:`ipoke_tpu.models.motion_encoder.apply` up to f32 reduction order.

    Wrap the call in ``jax.jit`` for real use; it traces fine either way.
    """
    n = mesh.shape[seq_axis]
    check_plan(spec, x.shape[1], n)
    x_spec = P(batch_axis, seq_axis)
    out_spec = P(batch_axis)

    def body(params, x, rng):
        if rng is not None and batch_axis is not None:
            # decorrelate sampling eps across batch shards; seq shards must
            # keep the SAME key (mu/logvar are seq-replicated there).
            rng = jax.random.fold_in(rng, lax.axis_index(batch_axis))
        return motion_encoder.apply(
            params,
            x,
            spec,
            rng=rng,
            conv_fn=_halo_conv3d(seq_axis, n),
            gn_fn=_seq_group_norm(seq_axis, n),
            t_reduce=_seq_t_reduce(seq_axis, n),
        )

    shmapped = jax.shard_map(
        partial(body, rng=rng) if rng is None else body,
        mesh=mesh,
        in_specs=(P(), x_spec) if rng is None else (P(), x_spec, P()),
        out_specs=(out_spec, out_spec, out_spec),
    )
    return shmapped(params, x) if rng is None else shmapped(params, x, rng)
