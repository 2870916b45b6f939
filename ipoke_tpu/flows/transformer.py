"""Top-level flow wrappers: config dict -> FlowSpec + params, exposing
``forward(params, x, cond) -> (z, logdet)`` / ``reverse(params, z, cond) -> x``
/ ``sample``.

Mirrors SupervisedMacowTransformer (reference: INN/INN.py:446-481) — the
default for all 8 released checkpoints — and MacowTransformerMultiStep
(INN/INN.py:423-443) for ``multistack`` configs.
"""
from __future__ import annotations

from dataclasses import replace
from typing import Tuple

import jax
import jax.numpy as jnp

from ipoke_tpu.flows import macow
from ipoke_tpu.flows.macow import FlowSpec


def spec_from_config(arch: dict) -> FlowSpec:
    """Build a FlowSpec from the reference's ``architecture:`` config section.

    Expects the derived fields the reference model ctor fills in
    (second_stage_video.py:67,107-108): flow_in_channels, flow_mid_channels,
    h_channels.
    """
    return FlowSpec(
        num_steps=tuple(arch["num_steps"]),
        in_channels=int(arch["flow_in_channels"]),
        hidden_channels=int(arch["flow_mid_channels"]),
        h_channels=int(arch.get("h_channels", 0)),
        factor=int(arch.get("factor", 16)),
        transform=arch.get("transform", "affine"),
        prior_transform=arch.get("prior_transform", "affine"),
        alpha=float(arch.get("alpha", 1.0)),
        kernel_size=tuple(arch.get("kernel_size", (2, 3))),
        activation=arch.get("activation", "elu"),
        use_1x1=bool(arch.get("use1x1", False)),
        condition_nice=bool(arch.get("condition_nice", False)),
        attention=bool(arch.get("attention", False)),
        heads=int(arch.get("flow_attn_heads", 4)),
        spatial_size=int(arch.get("ssize", 8) or 8),
    )


def stack_spec_from_config(arch: dict):
    """MacowTransformerMultiStep path (``multistack: True`` — INN.py:423-443)."""
    from ipoke_tpu.flows.multistack import StackSpec

    return StackSpec(
        levels=tuple(tuple(l) for l in arch["levels"]),
        factors=tuple(arch["factors"]),
        in_channels=int(arch["flow_in_channels"]),
        mid_channels_factor=int(arch["flow_mid_channels_factor"]),
        h_channels=int(arch.get("h_channels", 0)),
        reshape=arch.get("reshape", "none"),
        transform=arch.get("transform", "affine"),
        prior_transform=arch.get("prior_transform", "affine"),
        kernel_size=tuple(arch.get("kernel_size", (2, 3))),
        activation=arch.get("activation", "elu"),
        use_1x1=bool(arch.get("use1x1", False)),
        condition_nice=bool(arch.get("condition_nice", False)),
    )


def _is_stack(spec):
    from ipoke_tpu.flows.multistack import StackSpec

    return isinstance(spec, StackSpec)


def init(key, spec):
    if _is_stack(spec):
        from ipoke_tpu.flows import multistack

        return multistack.init(key, spec)
    return macow.init_multiscale(key, spec)


def forward(params, spec, x, cond):
    """density direction: data -> gaussian. x: (B,s,s,C), cond: (B,s,s,Hc)."""
    if _is_stack(spec):
        from ipoke_tpu.flows import multistack

        return multistack.forward(params, x, cond, spec)
    return macow.multiscale_forward(params, x, cond, spec)


def reverse(params, spec, z, cond):
    if _is_stack(spec):
        from ipoke_tpu.flows import multistack

        return multistack.inverse(params, z, cond, spec)
    return macow.multiscale_inverse(params, z, cond, spec)


def reverse_input_shape(spec, batch: int, spatial: int, channels: int):
    """Shape of the Gaussian z̃ the reverse pass consumes, given the MOTION
    latent geometry (spatial, channels).

    For a MultiscaleStack with a SpaceToDepth/DepthToSpace reshape the
    gaussianized tensor lives at the post-reshape geometry, so sampling must
    draw z̃ there — the reference's ×4/÷4 channel & ÷2/×2 spatial factors in
    make_flow_input (second_stage_video.py:289-300)."""
    if _is_stack(spec) and spec.reshape != "none":
        if spec.reshape == "down":
            return (batch, spatial // 2, spatial // 2, channels * 4)
        return (batch, spatial * 2, spatial * 2, channels // 4)
    return (batch, spatial, spatial, channels)


def sample(params, spec: FlowSpec, key, shape, cond):
    z = jax.random.normal(key, shape)
    return reverse(params, spec, z, cond)
