"""Conditioning towers: ConvEncoder / ConvDecoder / FirstStageWrapper
(reference: models/modules/autoencoders/fully_conv_models.py:9-133).

Used frozen at stage 2 as the poke embedder (nf_in=2) and the image
conditioner (nf_in=3, nf_max=64); trained standalone by the image/poke AE
trainers.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ipoke_tpu.nn import blocks
from ipoke_tpu.nn.blocks import (
    conv2d_block_apply,
    init_conv2d_block,
    init_norm_conv2d,
    init_res_block,
    norm_conv2d_apply,
    res_block_apply,
)


@dataclass(frozen=True)
class ConvEncoderSpec:
    nf_in: int
    nf_max: int
    n_stages: int
    variational: bool = False
    norm: str = "group"
    spectral_norm: bool = True

    @property
    def depths(self):
        """Per-stage output channels, and the decoder channel list
        (reference ConvEncoder.depths bookkeeping)."""
        nf = 32
        depths = [nf]  # stem output
        for _ in range(self.n_stages - 1):
            nf = min(nf * 2, self.nf_max)
            depths.insert(0, nf)
        return depths


def init_conv_encoder(key, spec: ConvEncoderSpec):
    ks = jax.random.split(key, spec.n_stages + 3)
    nf = 32
    p = {"stem": init_conv2d_block(ks[0], spec.nf_in, nf, 3, norm=spec.norm, snorm=spec.spectral_norm)}
    res = []
    for n in range(spec.n_stages - 1):
        nf_out = min(nf * 2, spec.nf_max)
        res.append(init_res_block(ks[1 + n], nf, nf_out, norm=spec.norm, stride=2, snorm=spec.spectral_norm))
        nf = nf_out
    p["blocks"] = res
    p["bottleneck"] = init_res_block(ks[spec.n_stages], nf, spec.nf_max, norm=spec.norm)
    if spec.variational:
        p["make_mu"] = init_norm_conv2d(ks[spec.n_stages + 1], 3, spec.nf_max, spec.nf_max)
        p["make_sigma"] = init_norm_conv2d(ks[spec.n_stages + 2], 3, spec.nf_max, spec.nf_max)
    return p


def conv_encoder_apply(params, x, spec: ConvEncoderSpec, rng: Optional[jax.Array] = None,
                       sample_prior: bool = False):
    """Returns (out, mean, logstd).

    Deterministic: out is the bottleneck feature (this is what the frozen poke
    embedder exposes); mean is the pre-bottleneck feature; logstd None.
    Variational: mean/logstd from NormConv2d heads (logstd sigmoid-squashed to
    [0,1], reference fully_conv_models.py:81-87); out = reparametrized sample.
    """
    act = "elu"
    out = conv2d_block_apply(params["stem"], x, stride=2, padding=1, norm=spec.norm, act=act)
    for b in params["blocks"]:
        out = res_block_apply(b, out, norm=spec.norm, act=act, stride=2)
    mean = out
    out = res_block_apply(params["bottleneck"], out, norm=spec.norm, act=act)
    logstd = None
    if spec.variational:
        mean = norm_conv2d_apply(params["make_mu"], out, padding=1)
        logstd = jax.nn.sigmoid(norm_conv2d_apply(params["make_sigma"], out, padding=1))
        if sample_prior:
            out = jax.random.normal(rng, mean.shape, mean.dtype)
        elif rng is not None:
            eps = jax.random.normal(rng, mean.shape, mean.dtype)
            out = eps * jnp.exp(logstd) + mean
        else:
            out = mean
    return out, mean, logstd


@dataclass(frozen=True)
class ConvDecoderSpec:
    nf_in: int
    in_channels: Tuple[int, ...]
    out_channels: int = 3
    n_skip_stages: int = 0
    norm: str = "group"
    spectral_norm: bool = True


def init_conv_decoder(key, spec: ConvDecoderSpec):
    ks = jax.random.split(key, len(spec.in_channels) + 2)
    p = {"in_block": init_res_block(ks[0], spec.nf_in, spec.in_channels[0], norm=spec.norm, snorm=spec.spectral_norm)}
    blocks_p = []
    for i, nf in enumerate(spec.in_channels[1:]):
        nf_in_dec = 2 * nf if i < spec.n_skip_stages else spec.in_channels[i]
        blocks_p.append(
            init_res_block(ks[1 + i], nf_in_dec, nf, norm=spec.norm, upsampling=True, snorm=spec.spectral_norm)
        )
    p["blocks"] = blocks_p
    p["out_conv"] = init_conv2d_block(
        ks[-1], spec.in_channels[-1], spec.out_channels, 3, norm="none", snorm=False
    )
    return p


def conv_decoder_apply(params, features, spec: ConvDecoderSpec):
    """features: list of encoder features, last = deepest (as the reference's
    ``shape`` stack).  Returns decoded image in [-1,1] (tanh) for 3 channels."""
    feats = list(features)
    x = res_block_apply(params["in_block"], feats.pop(), norm=spec.norm)
    for n, b in enumerate(params["blocks"]):
        if n < spec.n_skip_stages:
            x = jnp.concatenate([x, feats.pop()], axis=-1)
        x = res_block_apply(b, x, norm=spec.norm, upsampling=True)
    act = "tanh" if spec.out_channels == 3 else "none"
    return conv2d_block_apply(params["out_conv"], x, stride=1, padding=1, norm="none", act=act)


# ---------------------------------------------------------------------------
# FirstStageWrapper: encoder+decoder pair used as poke embedder / conditioner
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class WrapperSpec:
    nf_in: int
    nf_max: int
    spatial_size: int
    min_spatial_size: int
    deterministic: bool
    poke_and_image: bool = False

    @property
    def n_stages(self):
        return int(math.log2(self.spatial_size // self.min_spatial_size))

    @property
    def encoder_spec(self):
        nf_in = self.nf_in + (3 if self.poke_and_image else 0)
        return ConvEncoderSpec(
            nf_in=nf_in, nf_max=self.nf_max, n_stages=self.n_stages,
            variational=not self.deterministic,
        )

    @property
    def decoder_spec(self):
        enc = self.encoder_spec
        return ConvDecoderSpec(
            nf_in=self.nf_max, in_channels=(self.nf_max,) + tuple(enc.depths),
            out_channels=self.nf_in,
        )


def init_wrapper(key, spec: WrapperSpec):
    k1, k2 = jax.random.split(key)
    return {
        "encoder": init_conv_encoder(k1, spec.encoder_spec),
        "decoder": init_conv_decoder(k2, spec.decoder_spec),
    }


def wrapper_encode(params, x, spec: WrapperSpec, rng=None):
    return conv_encoder_apply(params["encoder"], x, spec.encoder_spec, rng=rng)


def wrapper_apply(params, x, spec: WrapperSpec, rng=None):
    enc, *_ = wrapper_encode(params, x, spec, rng)
    return conv_decoder_apply(params["decoder"], [enc], spec.decoder_spec)
