"""MultiscaleStack: several MultiScaleInternal blocks with an optional
SpaceToDepth/DepthToSpace reshape at the midpoint and per-block conditioning
transforms on h after the reshape (reference: macow2.py:652-729 +
MacowTransformerMultiStep, INN/INN.py:423-443; ``multistack: True`` configs).
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ipoke_tpu.flows import macow
from ipoke_tpu.flows.macow import FlowSpec
from ipoke_tpu.nn import blocks
from ipoke_tpu.nn.core import depth_to_space, space_to_depth


@dataclass(frozen=True)
class StackSpec:
    levels: Tuple[Tuple[int, ...], ...]   # per-block num_steps lists
    factors: Tuple[int, ...]              # per-block multi-scale factor
    in_channels: int
    mid_channels_factor: int
    h_channels: int
    reshape: str = "none"                 # 'none' | 'up' | 'down'
    transform: str = "affine"
    prior_transform: str = "affine"
    kernel_size: Tuple[int, int] = (2, 3)
    activation: str = "elu"
    use_1x1: bool = False
    condition_nice: bool = False
    mcf_backend: str = "scan"
    mcf_unroll: int = 1

    @property
    def reshape_step(self):
        return len(self.levels) // 2

    def block_specs(self) -> List[FlowSpec]:
        specs = []
        c = self.in_channels
        for i, (steps, f) in enumerate(zip(self.levels, self.factors)):
            if self.reshape != "none" and i == self.reshape_step:
                c = c * 4 if self.reshape == "down" else c // 4
            specs.append(
                FlowSpec(
                    num_steps=tuple(steps), in_channels=c,
                    hidden_channels=c * self.mid_channels_factor,
                    h_channels=self.h_channels, factor=f,
                    transform=self.transform, prior_transform=self.prior_transform,
                    kernel_size=self.kernel_size, activation=self.activation,
                    use_1x1=self.use_1x1, condition_nice=self.condition_nice,
                    mcf_backend=self.mcf_backend, mcf_unroll=self.mcf_unroll,
                )
            )
        return specs


def init(key, spec: StackSpec):
    specs = spec.block_specs()
    p = {"blocks": [macow.init_multiscale(jax.random.fold_in(key, i), s)
                    for i, s in enumerate(specs)]}
    if spec.reshape != "none" and spec.h_channels > 0:
        n_transforms = len(spec.levels) - spec.reshape_step
        p["h_transforms"] = [
            blocks.init_conv2d_block(
                jax.random.fold_in(key, 100 + i), spec.h_channels, spec.h_channels, 3, norm="group"
            )
            for i in range(n_transforms)
        ]
    return p


def _h_transform(p_t, h, spec: StackSpec):
    if spec.reshape == "down":
        return blocks.conv2d_block_apply(p_t, h, stride=2, padding=1, norm="group", act="elu")
    return blocks.convT2d_block_apply(p_t, h, stride=2, padding=1, norm="group", act="elu")


def forward(p, x, h, spec: StackSpec):
    specs = spec.block_specs()
    ld = jnp.zeros((x.shape[0],), jnp.float32)
    out = x
    for i, (block, bs) in enumerate(zip(p["blocks"], specs)):
        h_in = h
        if spec.reshape != "none" and i == spec.reshape_step:
            out = space_to_depth(out) if spec.reshape == "down" else depth_to_space(out)
        if spec.reshape != "none" and i >= spec.reshape_step and spec.h_channels > 0:
            h_in = _h_transform(p["h_transforms"][i - spec.reshape_step], h, spec)
        out, l = macow.multiscale_forward(block, out, h_in, bs)
        ld = ld + l
    return out, ld


def inverse(p, y, h, spec: StackSpec):
    specs = spec.block_specs()
    out = y
    n = len(specs)
    for j in range(n):
        i = n - 1 - j  # original block index
        h_in = h
        if spec.reshape != "none" and i >= spec.reshape_step and spec.h_channels > 0:
            h_in = _h_transform(p["h_transforms"][i - spec.reshape_step], h, spec)
        out = macow.multiscale_inverse(p["blocks"][i], out, h_in, specs[i])
        if spec.reshape != "none" and i == spec.reshape_step:
            out = depth_to_space(out) if spec.reshape == "down" else space_to_depth(out)
    return out
