"""Second stage: poke-conditional invertible model (PokeMotionModel,
reference: models/second_stage_video.py:31-452).

Composition: frozen first stage (motion encoder + GRU/SPADE decoder), frozen
poke embedder + image conditioner towers, trainable MaCow cINN.

  density (train):  z_motion = enc_first_stage(video);
                    cond = [cond_tower(x0), poke_tower(poke)];
                    (gauss, logdet) = flow(z_motion, cond)
  sample:           z~N(0,1) -> flow^{-1}(z, cond) -> first-stage decode
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ipoke_tpu.flows import transformer
from ipoke_tpu.flows.macow import FlowSpec
from ipoke_tpu.models import encoders, first_stage
from ipoke_tpu.models.encoders import WrapperSpec
from ipoke_tpu.models.first_stage import FirstStageSpec
from ipoke_tpu.nn import blocks
from ipoke_tpu.nn.core import conv2d, conv_transpose2d


@dataclass(frozen=True)
class SecondStageSpec:
    flow: FlowSpec
    first_stage: FirstStageSpec
    poke_embedder: WrapperSpec
    conditioner: Optional[WrapperSpec]  # None when conditioner.use == False
    augment_channels: int = 0           # >0 when augmented_input
    scale_augmentation: bool = True
    shift_augmentation: bool = True
    poke_and_image: bool = False
    use_flow_as_poke: bool = False      # poke_key == 'flow' (flow_ae embedder)
    full_seq: bool = True

    @property
    def use_cond(self) -> bool:
        return self.conditioner is not None

    @property
    def flow_in_channels(self) -> int:
        return self.first_stage.z_dim + self.augment_channels

    @property
    def h_channels(self) -> int:
        hc = self.poke_embedder.nf_max
        if self.use_cond:
            hc += self.conditioner.nf_max
        return hc

    @property
    def latent_size(self) -> int:
        return self.first_stage.min_spatial_size

    def validate(self) -> "SecondStageSpec":
        """Catch inconsistent configs with a clear message instead of a shape
        error deep inside the flow: the 3D motion encoder always divides the
        spatial size by at least 8 (conv1 + layer2 + layer3), so the motion
        latent is spatial_size/8 (or /16 with layer4/5) — min_spatial_size
        must equal that, and the conditioning towers must land on the same
        grid."""
        enc = self.first_stage.encoder_spec
        _, _, stride4, has_l4, has_l5, _ = enc.derived()
        div = 8
        if has_l4 and stride4 is not None and stride4[-1] == 2:
            div *= 2
        if has_l5:
            div *= 2
        latent = self.first_stage.spatial_size // div
        if latent != self.first_stage.min_spatial_size:
            raise ValueError(
                f"first_stage.min_spatial_size={self.first_stage.min_spatial_size} "
                f"but the motion encoder produces a {latent}x{latent} latent for "
                f"spatial_size={self.first_stage.spatial_size} (divides by {div}); "
                f"set min_spatial_size={latent} or adjust spatial_size"
            )
        dec = self.first_stage.decoder_spec
        out_spatial = self.first_stage.min_spatial_size * 2 ** dec.n_stages
        if out_spatial != self.first_stage.spatial_size:
            import math

            need = int(math.log2(self.first_stage.spatial_size
                                 // self.first_stage.min_spatial_size)) + 1
            raise ValueError(
                f"dec_channels has {dec.n_stages} upsampling stages -> "
                f"{out_spatial}x{out_spatial} frames, but data spatial_size is "
                f"{self.first_stage.spatial_size}; dec_channels needs {need} "
                f"entries (upsampling stages = len(dec_channels) - 1 = "
                f"log2(spatial/min_spatial))"
            )
        return self

    @classmethod
    def build(
        cls,
        arch: dict,
        first_stage_spec: FirstStageSpec,
        poke_spec: WrapperSpec,
        cond_spec: Optional[WrapperSpec],
        full_seq: bool = True,
    ) -> "SecondStageSpec":
        """Derive the flow dims the way the reference ctor does
        (second_stage_video.py:67,100-110)."""
        augment = int(arch.get("augment_channels", 0)) if arch.get("augmented_input") else 0
        flow_in = first_stage_spec.z_dim + augment
        h_channels = poke_spec.nf_max + (cond_spec.nf_max if cond_spec else 0)
        arch = dict(arch)
        arch["flow_in_channels"] = flow_in
        arch["flow_mid_channels"] = int(arch["flow_mid_channels_factor"] * flow_in)
        arch["h_channels"] = h_channels
        flow_spec = (
            transformer.stack_spec_from_config(arch)
            if arch.get("multistack")
            else transformer.spec_from_config(arch)
        )
        return cls(
            flow=flow_spec,
            first_stage=first_stage_spec,
            poke_embedder=poke_spec,
            conditioner=cond_spec,
            augment_channels=augment,
            scale_augmentation=bool(arch.get("scale_augmentation", False)),
            shift_augmentation=bool(arch.get("shift_augmentation", False)),
            poke_and_image=bool(poke_spec.poke_and_image),
            full_seq=full_seq,
        )


def init(key, spec: SecondStageSpec):
    """Fresh init of ALL components (training normally loads the frozen parts
    from converted/pretrained checkpoints instead)."""
    ks = jax.random.split(key, 6)
    p = {
        "flow": transformer.init(ks[0], spec.flow),
        "first_stage": first_stage.init(ks[1], spec.first_stage),
        "poke_embedder": encoders.init_wrapper(ks[2], spec.poke_embedder),
    }
    if spec.use_cond:
        p["conditioner"] = encoders.init_wrapper(ks[3], spec.conditioner)
    if spec.poke_embedder.min_spatial_size != spec.first_stage.min_spatial_size:
        nf = spec.poke_embedder.nf_max
        p["conv_adapt_poke_emb"] = blocks.init_conv(ks[4], 3, 3, nf, nf)
    if spec.use_cond and spec.conditioner.min_spatial_size != spec.first_stage.min_spatial_size:
        nf = spec.conditioner.nf_max
        p["conv_adapt_cond"] = blocks.init_conv(ks[5], 3, 3, nf, nf)
    if spec.augment_channels:
        p["scale_augment"] = jnp.ones((spec.augment_channels,))
        p["shift_augment"] = jnp.zeros((spec.augment_channels,))
    return p


def _adapt(p_conv, x, src_size, tgt_size, norm_group=False):
    """Spatial-size adapter (second_stage_video.py:114-129): strided conv when
    shrinking, transpose conv (group-norm variant mirrored) when growing."""
    if src_size == tgt_size:
        return x
    if src_size > tgt_size:
        stride = src_size // tgt_size
        return conv2d(x, p_conv["w"], p_conv.get("b"), stride=stride, padding=1)
    stride = tgt_size // src_size
    y = conv_transpose2d(x, p_conv["w"], p_conv.get("b"), stride=stride, padding=1, output_padding=1)
    return y


def embed_cond(params, spec: SecondStageSpec, x0, poke):
    """Frozen conditioning: cond = cat([conditioner(x0), poke_embedder(poke)]).

    Returns (B, s, s, h_channels).  All encoders run without sampling (the
    poke embedder is deterministic; the conditioner contributes its MEAN,
    second_stage_video.py:274-287)."""
    if spec.poke_and_image:
        poke = jnp.concatenate([poke, x0], axis=-1)
    poke_emb, _, _ = encoders.wrapper_encode(params["poke_embedder"], poke, spec.poke_embedder)
    poke_emb = jax.lax.stop_gradient(poke_emb)
    if "conv_adapt_poke_emb" in params:
        poke_emb = _adapt(
            params["conv_adapt_poke_emb"], poke_emb,
            spec.poke_embedder.min_spatial_size, spec.first_stage.min_spatial_size,
        )
    if not spec.use_cond:
        return poke_emb
    out, mean, _ = encoders.wrapper_encode(params["conditioner"], x0, spec.conditioner)
    cond = out if spec.conditioner.deterministic else mean
    cond = jax.lax.stop_gradient(cond)
    if "conv_adapt_cond" in params:
        cond = _adapt(
            params["conv_adapt_cond"], cond,
            spec.conditioner.min_spatial_size, spec.first_stage.min_spatial_size,
        )
    return jnp.concatenate([cond, poke_emb], axis=-1)


def encode_first_stage(params, spec: SecondStageSpec, x):
    """Motion latent of the frozen first stage (no grad).  Mirrors the
    frame-range quirk of second_stage_video.py:352-359."""
    fs = spec.first_stage
    if spec.full_seq:
        x_in = x if (fs.full_sequence or x.shape[1] < 16) else x[:, :-1]
    else:
        x_in = x if fs.full_sequence else x[:, 1:]
    from ipoke_tpu.models import motion_encoder as me

    motion, mu, _ = me.apply(params["first_stage"]["enc_motion"], x_in, fs.encoder_spec, rng=None)
    return jax.lax.stop_gradient(motion), jax.lax.stop_gradient(mu)


def decode_first_stage(params, spec: SecondStageSpec, motion, x0, length: int):
    return first_stage.decode(params["first_stage"], motion, x0, spec.first_stage, length)


def forward_density(params, spec: SecondStageSpec, batch, rng: Optional[jax.Array] = None):
    """Training direction.  batch: {'images': (B,T,S,S,3), 'poke': (B,S,S,2)}.
    Returns (gaussianized, logdet, cond)."""
    x = batch["images"]
    poke = batch["flow"] if spec.use_flow_as_poke else batch["poke"]
    cond = embed_cond(params, spec, x[:, 0], poke)
    flow_input, _ = encode_first_stage(params, spec, x)
    if spec.augment_channels:
        aug = jax.random.normal(
            rng, flow_input.shape[:-1] + (spec.augment_channels,), flow_input.dtype
        )
        aug = aug * params["scale_augment"] + params["shift_augment"]
        flow_input = jnp.concatenate([flow_input, aug], axis=-1)
    out, logdet = transformer.forward(params["flow"], spec.flow, flow_input, cond)
    return out, logdet, cond


def forward_sample(
    params,
    spec: SecondStageSpec,
    batch,
    rng: jax.Array,
    n_samples: int = 1,
    length: Optional[int] = None,
    add_first_frame: bool = False,
    z: Optional[jax.Array] = None,
):
    """Sampling direction: n_samples stochastic videos for each batch element.
    Returns (n_samples, B, T, S, S, 3).

    ``z`` optionally supplies the Gaussian draw(s) instead of sampling them
    from ``rng`` — shape ``reverse_input_shape(...)`` (or with a leading
    n_samples axis).  Because every per-example op in the model is
    batch-elementwise (convs, per-example norms), a caller that fixes z per
    request gets BATCH-COMPOSITION-INVARIANT outputs — the foundation of the
    serving batcher's equality guarantee (serve/batcher.py)."""
    x = batch["images"]
    poke = batch["flow"] if spec.use_flow_as_poke else batch["poke"]
    x0 = x[:, 0]
    cond = embed_cond(params, spec, x0, poke)
    b = x.shape[0]
    s = spec.latent_size
    if length is None:
        length = x.shape[1] - 1

    z_shape = transformer.reverse_input_shape(spec.flow, b, s, spec.flow_in_channels)

    def one(key, z_fixed=None):
        z = (jax.random.normal(key, z_shape, x.dtype)
             if z_fixed is None else z_fixed.astype(x.dtype))
        motion = transformer.reverse(params["flow"], spec.flow, z, cond)
        if spec.augment_channels:
            motion = motion[..., : -spec.augment_channels]
        vid = decode_first_stage(params, spec, motion, x0, length)
        if add_first_frame:
            vid = jnp.concatenate([x0[:, None], vid], axis=1)
        return vid

    if z is not None:
        zs = z if z.ndim == len(z_shape) + 1 else z[None]
        vids = jax.vmap(lambda zz: one(None, zz))(zs)
        return vids
    keys = jax.random.split(rng, n_samples)
    if n_samples == 1:
        return one(keys[0])[None]
    # vmap over samples: the sequential MCF inverses vectorize over the sample
    # axis exactly like over batch, so N samples cost ~one larger batch
    return jax.vmap(one)(keys)
