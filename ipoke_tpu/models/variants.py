"""First-stage model variants and the cVAE ablation baseline.

RNNMotionModel (reference: first_stage_motion_model.py:395-443): static-scene
  encoder feeds the GRU input; plain ConvDecoder (no SPADE).
FCBaseline (reference: :549-589 + baseline_fc_models.py): fully-connected
  latent with a dense GRU and an FC->4x4 SPADE generator.
PokeVAE (reference: models/poke_vae.py): poke-conditioned cVAE — poke+image
  encoder drives the GRU input; sampling replaces the motion latent with
  N(0,1).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ipoke_tpu.models import conv_gru, decoder, encoders, motion_encoder
from ipoke_tpu.models.decoder import SpadeDecoderSpec
from ipoke_tpu.models.encoders import ConvDecoderSpec, ConvEncoderSpec
from ipoke_tpu.models.first_stage import FirstStageSpec
from ipoke_tpu.nn import blocks
from ipoke_tpu.nn.core import conv2d

# ---------------------------------------------------------------------------
# RNNMotionModel
# ---------------------------------------------------------------------------

def init_rnn_motion(key, spec: FirstStageSpec):
    ks = jax.random.split(key, 5)
    enc_static_spec = ConvEncoderSpec(
        nf_in=3, nf_max=spec.z_dim,
        n_stages=int(jnp.log2(spec.spatial_size // spec.min_spatial_size)),
    )
    dec_spec = ConvDecoderSpec(nf_in=spec.z_dim, in_channels=tuple(spec.dec_channels))
    return {
        "enc_motion": motion_encoder.init(ks[0], spec.encoder_spec),
        "enc_static": encoders.init_conv_encoder(ks[1], enc_static_spec),
        "rnn": conv_gru.init_stack(ks[2], spec.z_dim, spec.z_dim, spec.n_gru_layers),
        "post_hidden": blocks.init_res_block(ks[3], spec.z_dim, spec.z_dim, norm="group", snorm=True),
        "gen": encoders.init_conv_decoder(ks[4], dec_spec),
    }, enc_static_spec, dec_spec


def rnn_motion_forward(params, x, spec: FirstStageSpec, enc_static_spec, dec_spec, rng=None):
    scene, *_ = encoders.conv_encoder_apply(params["enc_static"], x[:, 0], enc_static_spec)
    x_in = x if spec.full_sequence else x[:, 1:]
    motion, mu, logvar = motion_encoder.apply(params["enc_motion"], x_in, spec.encoder_spec, rng=rng)
    hidden0 = [motion] * spec.n_gru_layers

    def step(carry, _):
        hidden, inp = carry
        hidden = conv_gru.stack_apply(params["rnn"], inp, hidden)
        feat = blocks.res_block_apply(params["post_hidden"], hidden[-1], norm="group")
        frame = encoders.conv_decoder_apply(params["gen"], [feat], dec_spec)
        return (hidden, feat), frame

    (_, _), frames = jax.lax.scan(step, (hidden0, scene), None, length=x.shape[1] - 1)
    return jnp.moveaxis(frames, 0, 1), mu, logvar


# ---------------------------------------------------------------------------
# FCBaseline
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FCBaselineSpec:
    z_dim: int
    spatial_size: int
    max_frames: int
    enc_channels: Tuple[int, ...]
    dec_channels: Tuple[int, ...]
    n_gru_layers: int = 2
    full_sequence: bool = True


def init_fc_baseline(key, spec: FCBaselineSpec):
    ks = jax.random.split(key, 6)
    me_spec = MotionFCSpec = motion_encoder.MotionEncoderSpec(
        channels=tuple(spec.enc_channels), z_dim=spec.z_dim, spatial_size=spec.spatial_size,
        max_frames=spec.max_frames, min_spatial_size=4, full_seq=spec.full_sequence,
    )
    # dense GRU gates
    def gru_cell(k):
        k1, k2, k3 = jax.random.split(k, 3)
        d = spec.z_dim

        def lin(kk):
            return {"w": 0.05 * jax.random.normal(kk, (2 * d, d)), "b": jnp.zeros((d,))}

        return {"reset": lin(k1), "update": lin(k2), "out": lin(k3)}

    p = {
        "enc_motion": motion_encoder.init(ks[0], me_spec),
        "motion_bias": jax.random.normal(ks[1], (1, spec.z_dim)),
        "rnn": [gru_cell(jax.random.fold_in(ks[2], i)) for i in range(spec.n_gru_layers)],
        "start_block": {
            "w": 0.05 * jax.random.normal(ks[3], (spec.z_dim, spec.dec_channels[0] * 16)),
            "b": jnp.zeros((spec.dec_channels[0] * 16,)),
        },
        "blocks": [
            blocks.init_res_block(
                jax.random.fold_in(ks[4], i), spec.dec_channels[i], nf, norm="none",
                upsampling=True, snorm=True,
            )
            for i, nf in enumerate(spec.dec_channels[1:])
        ],
        "spades": [
            blocks.init_spade(jax.random.fold_in(ks[5], i), nf)
            for i, nf in enumerate(spec.dec_channels[1:])
        ],
        "out_conv": blocks.init_conv2d_block(
            jax.random.fold_in(ks[5], 99), spec.dec_channels[-1], 3, 3, norm="none"
        ),
    }
    return p, me_spec


def _dense_gru(cells, x, hidden):
    new = []
    inp = x
    for cell, h in zip(cells, hidden):
        cat = jnp.concatenate([inp, h], -1)
        u = jax.nn.sigmoid(cat @ cell["update"]["w"] + cell["update"]["b"])
        r = jax.nn.sigmoid(cat @ cell["reset"]["w"] + cell["reset"]["b"])
        o = jnp.tanh(jnp.concatenate([inp, h * r], -1) @ cell["out"]["w"] + cell["out"]["b"])
        h_new = h * (1 - u) + o * u
        new.append(h_new)
        inp = h_new
    return new


def fc_baseline_forward(params, x, spec: FCBaselineSpec, me_spec, rng=None):
    """Motion latent pooled to a vector; FC GRU; FC->4x4 SPADE generator."""
    x_in = x if spec.full_sequence else x[:, 1:]
    motion, mu, logvar = motion_encoder.apply(params["enc_motion"], x_in, me_spec, rng=rng)
    motion_vec = jnp.mean(motion, axis=(1, 2))
    b = x.shape[0]
    start_frame = x[:, 0]
    hidden0 = [motion_vec] * spec.n_gru_layers
    in_rnn = jnp.broadcast_to(params["motion_bias"], (b, spec.z_dim))

    def step(hidden, _):
        hidden = _dense_gru(params["rnn"], in_rnn, hidden)
        z = hidden[-1] @ params["start_block"]["w"] + params["start_block"]["b"]
        feat = z.reshape(b, 4, 4, -1)
        for blk, sp in zip(params["blocks"], params["spades"]):
            feat = blocks.res_block_apply(blk, feat, norm="none", upsampling=True)
            feat = blocks.spade_apply(sp, feat, start_frame)
        frame = blocks.conv2d_block_apply(params["out_conv"], feat, padding=1, act="tanh")
        return hidden, frame

    _, frames = jax.lax.scan(step, hidden0, None, length=x.shape[1] - 1)
    return jnp.moveaxis(frames, 0, 1), mu, logvar


# ---------------------------------------------------------------------------
# PokeVAE (cVAE ablation baseline)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PokeVAESpec:
    first_stage: FirstStageSpec
    stack_motion_and_poke: bool = False

    @property
    def poke_enc_spec(self) -> ConvEncoderSpec:
        import math

        fs = self.first_stage
        return ConvEncoderSpec(
            nf_in=5, nf_max=fs.z_dim,
            n_stages=int(math.log2(fs.spatial_size // fs.min_spatial_size)),
        )

    @property
    def decoder_spec(self) -> SpadeDecoderSpec:
        d = self.first_stage.decoder_spec
        from dataclasses import replace

        return replace(d, stacked_input=self.stack_motion_and_poke)


def init_poke_vae(key, spec: PokeVAESpec):
    fs = spec.first_stage
    ks = jax.random.split(key, 5)
    hidden_size = 2 * fs.z_dim if spec.stack_motion_and_poke else fs.z_dim
    return {
        "enc_motion": motion_encoder.init(ks[0], fs.encoder_spec),
        "poke_enc": encoders.init_conv_encoder(ks[1], spec.poke_enc_spec),
        "rnn": conv_gru.init_stack(ks[2], fs.z_dim, hidden_size, fs.n_gru_layers),
        "motion_bias": jax.random.normal(
            ks[3], (1, fs.min_spatial_size, fs.min_spatial_size, fs.z_dim)
        ),
        "gen": decoder.init(ks[4], spec.decoder_spec),
    }


def poke_vae_forward(params, batch, spec: PokeVAESpec, rng: Optional[jax.Array] = None,
                     sample_prior: bool = False):
    fs = spec.first_stage
    x = batch["images"]
    poke = batch["poke"]
    start_frame = x[:, 0]
    x_in = x if fs.full_sequence else x[:, 1:]
    if sample_prior:
        motion = jax.random.normal(
            rng, (x.shape[0], fs.min_spatial_size, fs.min_spatial_size, fs.z_dim), x.dtype
        )
        mu = logvar = None
    else:
        motion, mu, logvar = motion_encoder.apply(
            params["enc_motion"], x_in, fs.encoder_spec, rng=rng
        )
    poke_in = jnp.concatenate([start_frame, poke], axis=-1)
    poke_repr, *_ = encoders.conv_encoder_apply(params["poke_enc"], poke_in, spec.poke_enc_spec)
    if spec.stack_motion_and_poke:
        hidden0 = [jnp.concatenate([motion, poke_repr], -1)] * fs.n_gru_layers
        in_rnn = jnp.zeros_like(poke_repr)
    else:
        hidden0 = [motion] * fs.n_gru_layers
        in_rnn = poke_repr
    dec_spec = spec.decoder_spec
    spade_feats = decoder.precompute_spade_feats(params["gen"], start_frame, dec_spec)

    def step(hidden, _):
        hidden = conv_gru.stack_apply(params["rnn"], in_rnn, hidden)
        frame = decoder.apply(params["gen"], hidden[-1], start_frame, dec_spec, spade_feats)
        return hidden, frame

    _, frames = jax.lax.scan(step, hidden0, None, length=x.shape[1] - 1)
    return jnp.moveaxis(frames, 0, 1), mu, logvar
