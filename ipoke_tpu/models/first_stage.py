"""First-stage video autoencoder: SpadeCondMotionModel
(reference: models/first_stage_motion_model.py:469-546).

encode:  video (B,T,S,S,3) --3D ResNet--> motion latent (B,s,s,z)
decode:  motion latent + start frame --ConvGRU (lax.scan) + SPADE decoder-->
         frames (B,T-1,S,S,3)

TPU-first design choices vs the reference's python loop:
  * the T-frame unroll is one ``lax.scan`` over a single compiled step;
  * the GRU input is the (learned) constant motion_bias -> only the hidden
    state is carried;
  * SPADE start-frame features are computed once, not per frame.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ipoke_tpu.models import conv_gru, decoder, motion_encoder
from ipoke_tpu.models.decoder import SpadeDecoderSpec
from ipoke_tpu.models.motion_encoder import MotionEncoderSpec


@dataclass(frozen=True)
class FirstStageSpec:
    z_dim: int
    spatial_size: int
    max_frames: int
    enc_channels: Tuple[int, ...]
    dec_channels: Tuple[int, ...]
    n_gru_layers: int = 4
    min_spatial_size: int = 8
    motion_bias: bool = True
    full_sequence: bool = True
    deterministic: bool = False
    norm: str = "group"
    spectral_norm: bool = True
    # dtype of the SPADE frame-decode convs ("f32" | "bf16").  The decode is
    # HBM-bound dense conv work (NOTES.md r2 stage profile: 200 of 386 ms at
    # batch 128) — bf16 halves its bytes and doubles MXU rate while the
    # sequential flow inverse and the GRU stay f32.
    decode_dtype: str = "f32"

    @property
    def encoder_spec(self) -> MotionEncoderSpec:
        return MotionEncoderSpec(
            channels=tuple(self.enc_channels),
            z_dim=self.z_dim,
            spatial_size=self.spatial_size,
            max_frames=self.max_frames,
            min_spatial_size=self.min_spatial_size,
            full_seq=self.full_sequence,
            deterministic=self.deterministic,
        )

    @property
    def decoder_spec(self) -> SpadeDecoderSpec:
        return SpadeDecoderSpec(
            z_dim=self.z_dim,
            dec_channels=tuple(self.dec_channels),
            spatial_size=self.spatial_size,
            min_spatial_size=self.min_spatial_size,
            norm=self.norm,
            spectral_norm=self.spectral_norm,
        )

    @classmethod
    def from_config(cls, config: dict) -> "FirstStageSpec":
        arch = config["architecture"]
        data = config["data"]
        tr = config.get("training", {})
        return cls(
            z_dim=arch["z_dim"],
            spatial_size=data["spatial_size"][0],
            max_frames=data["max_frames"],
            enc_channels=tuple(arch["ENC_M_channels"]),
            dec_channels=tuple(arch["dec_channels"]),
            n_gru_layers=arch.get("n_gru_layers", 4),
            min_spatial_size=arch.get("min_spatial_size", 8),
            motion_bias=arch.get("motion_bias", False),
            full_sequence=tr.get("full_sequence", False),
            deterministic=arch.get("deterministic", False),
            norm=arch.get("norm", "group"),
            spectral_norm=arch.get("spectral_norm", True),
        )


def init(key, spec: FirstStageSpec):
    ks = jax.random.split(key, 4)
    p = {
        "enc_motion": motion_encoder.init(ks[0], spec.encoder_spec),
        "rnn": conv_gru.init_stack(ks[1], spec.z_dim, spec.z_dim, spec.n_gru_layers),
        "gen": decoder.init(ks[2], spec.decoder_spec),
    }
    if spec.motion_bias:
        p["motion_bias"] = jax.random.normal(
            ks[3], (1, spec.min_spatial_size, spec.min_spatial_size, spec.z_dim)
        )
    return p


def encode(params, x, spec: FirstStageSpec, rng: Optional[jax.Array] = None):
    """x: (B,T,S,S,3) -> (motion, mu, logvar), each (B,s,s,z).

    Frame-range selection mirrors the reference: full_sequence -> all T
    frames; else frames 1..T-1 (first frame excluded)."""
    x_in = x if spec.full_sequence else x[:, 1:]
    return motion_encoder.apply(params["enc_motion"], x_in, spec.encoder_spec, rng=rng)


def decode(params, motion, start_frame, spec: FirstStageSpec, length: int,
           frame_chunk: int = 1, remat_body: bool = False):
    """Unroll ``length`` frames from a motion latent + start frame.

    motion: (B,s,s,z); start_frame: (B,S,S,3) -> (B,length,S,S,3).

    TPU-first split of the reference's per-frame loop: only the ConvGRU is
    sequential (tiny 8x8 convs), so it runs alone in a lax.scan collecting
    every top hidden state; the SPADE frame decoder can then run
    ``frame_chunk`` frames at a time folded into the batch axis.

    Measured (v5e, batch 128, forced execution): chunk=1 198 ms, chunk=3
    218 ms (the chunk-replicated start-frame/SPADE features cost more HBM
    traffic than the larger convs recover), chunk=9 OOMs — the decode is
    already saturating at large batch, so 1 is the default; >1 may pay only
    at small batches."""
    dec_spec = spec.decoder_spec
    b = start_frame.shape[0]
    out_dtype = motion.dtype
    hidden0 = [motion] * spec.n_gru_layers
    if spec.motion_bias:
        in_rnn = jnp.broadcast_to(
            params["motion_bias"].astype(motion.dtype),
            (b,) + params["motion_bias"].shape[1:],
        )
    else:
        in_rnn = motion
    gen_params = params["gen"]
    if spec.decode_dtype == "bf16":
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
        gen_params = cast(gen_params)
        start_frame = cast(start_frame)
    spade_feats = decoder.precompute_spade_feats(gen_params, start_frame, dec_spec)

    def gru_step(hidden, _):
        hidden = conv_gru.stack_apply(params["rnn"], in_rnn, hidden)
        return hidden, hidden[-1]

    _, tops = jax.lax.scan(gru_step, hidden0, None, length=length)  # (T,B,s,s,z)
    if spec.decode_dtype == "bf16":
        tops = tops.astype(jnp.bfloat16)

    chunk = max(1, min(frame_chunk, length))
    n_chunks = -(-length // chunk)
    pad = n_chunks * chunk - length
    if pad:
        tops = jnp.concatenate([tops, tops[-1:].repeat(pad, axis=0)], axis=0)
    tops = tops.reshape((n_chunks, chunk) + tops.shape[1:])

    def fold(x):  # (chunk, B, ...) -> (chunk*B, ...)
        return x.reshape((chunk * b,) + x.shape[2:])

    start_rep = fold(jnp.broadcast_to(start_frame[None], (chunk,) + start_frame.shape))
    feats_rep = jax.tree_util.tree_map(
        lambda f: fold(jnp.broadcast_to(f[None], (chunk,) + f.shape)), spade_feats
    )

    def decode_chunk(_, tops_c):
        frames = decoder.apply(gen_params, fold(tops_c), start_rep, dec_spec, feats_rep)
        return None, frames.reshape((chunk, b) + frames.shape[1:])

    if remat_body:
        # per-frame remat: without this, grad-of-decode saves EVERY frame's
        # SPADE activations across the scan — (T-1, B, 128, 128, C) residual
        # stacks are the largest buffers in the stage-1 GAN step (measured:
        # the batch-16 step wants 21.7 GB of 15.75 GB HBM, dominated by
        # ~10 GB of these).  checkpointing the body stores only each step's
        # inputs and recomputes one frame's decoder in its backward.
        decode_chunk = jax.checkpoint(decode_chunk)
    _, frames = jax.lax.scan(decode_chunk, None, tops)
    frames = frames.reshape((n_chunks * chunk, b) + frames.shape[3:])[:length]
    return jnp.moveaxis(frames, 0, 1).astype(out_dtype)  # (B, T, S, S, 3)


def forward(params, x, spec: FirstStageSpec, rng: Optional[jax.Array] = None,
            remat_decode: bool = False):
    """Full autoencoding pass (training): returns (x_hat, mu, logvar)."""
    motion, mu, logvar = encode(params, x, spec, rng=rng)
    x_hat = decode(params, motion, x[:, 0], spec, length=x.shape[1] - 1,
                   remat_body=remat_decode)
    return x_hat, mu, logvar
