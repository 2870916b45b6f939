"""SPADE-conditioned frame decoder (reference: fully_conv_models.py:135-177
SpadeCondConvDecoder).

Decodes one frame from the GRU hidden state, modulated at every upsampling
stage by SPADE features of the start frame.  The start-frame SPADE towers are
constant across the time unroll, so we precompute them once per video
(``precompute_spade_feats``) — the reference recomputes them every frame.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ipoke_tpu.nn.blocks import (
    conv2d_block_apply,
    init_conv2d_block,
    init_res_block,
    init_spade,
    res_block_apply,
    spade_apply,
    spade_modulation,
)


@dataclass(frozen=True)
class SpadeDecoderSpec:
    z_dim: int
    dec_channels: Tuple[int, ...]
    spatial_size: int
    min_spatial_size: int = 8
    out_channels: int = 3
    n_skip_stages: int = 0
    norm: str = "group"
    spectral_norm: bool = True
    stacked_input: bool = False

    @property
    def n_stages(self):
        return len(self.dec_channels) - 1


def init(key, spec: SpadeDecoderSpec):
    ks = jax.random.split(key, 2 * spec.n_stages + 2)
    nf_in = 2 * spec.z_dim if spec.stacked_input else spec.z_dim
    p = {
        "in_block": init_res_block(
            ks[0], nf_in, spec.dec_channels[0], norm=spec.norm, snorm=spec.spectral_norm
        )
    }
    blocks_p, spade_p = [], []
    for i, nf in enumerate(spec.dec_channels[1:]):
        nf_in_dec = 2 * nf if i < spec.n_skip_stages else spec.dec_channels[i]
        blocks_p.append(
            init_res_block(ks[1 + i], nf_in_dec, nf, norm="none", upsampling=True, snorm=spec.spectral_norm)
        )
        spade_p.append(init_spade(ks[1 + spec.n_stages + i], nf))
    p["blocks"] = blocks_p
    p["spades"] = spade_p
    p["out_conv"] = init_conv2d_block(
        ks[-1], spec.dec_channels[-1], spec.out_channels, 3, norm="none", snorm=False
    )
    return p


def stage_resolutions(spec: SpadeDecoderSpec):
    """Feature-map resolution after each upsampling block."""
    s = spec.min_spatial_size
    return [s * 2 ** (i + 1) for i in range(spec.n_stages)]


def precompute_spade_feats(params, start_frame, spec: SpadeDecoderSpec):
    """Per-stage SPADE modulation {'gamma','beta'} of the start frame —
    the ENTIRE SPADE tower (3->128 conv + gamma/beta convs) depends only on
    the constant start frame, so it is computed once per video instead of
    once per frame (the reference recomputes it every frame)."""
    return [
        spade_modulation(sp, start_frame, (res, res))
        for sp, res in zip(params["spades"], stage_resolutions(spec))
    ]


def apply(params, hidden, start_frame, spec: SpadeDecoderSpec, spade_feats=None):
    """hidden: (B, s, s, z_dim) GRU top-layer state -> frame (B, S, S, 3)."""
    x = res_block_apply(params["in_block"], hidden, norm=spec.norm)
    for n, (b, sp) in enumerate(zip(params["blocks"], params["spades"])):
        x = res_block_apply(b, x, norm="none", upsampling=True)
        mod = spade_feats[n] if spade_feats is not None else None
        x = spade_apply(sp, x, start_frame, shared_mod=mod)
    act = "tanh" if spec.out_channels == 3 else "none"
    return conv2d_block_apply(params["out_conv"], x, stride=1, padding=1, norm="none", act=act)
