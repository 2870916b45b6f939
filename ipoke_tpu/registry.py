"""Released-model registry: architecture descriptions of the 8 reference
checkpoints (reference: models/pretrained_models.py + config/pretrained_models/
*.yaml).  Checkpoint paths mirror the reference layout so converted weights
drop into the same directory structure (DATAPATH-style root rewrite supported
by ckpt/io.py).

First-stage encoder channel stacks are the defaults from
config/first_stage.yaml (z_dim from the released model names, bn32/bn64); the
checkpoint converter infers exact shapes from the state_dict, so these serve
as documentation + fresh-training defaults.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

from ipoke_tpu.models.encoders import WrapperSpec
from ipoke_tpu.models.first_stage import FirstStageSpec


@dataclass(frozen=True)
class ModelEntry:
    name: str
    dataset: str
    spatial_size: int
    fs_z_dim: int
    flow_mid_channels_factor: int
    max_frames: int = 10
    nf_max_cond: int = 64
    nf_max_poke: int = 64
    min_spatial_size: int = 8
    num_steps: Tuple[int, ...] = (10, 5, 5, 4, 4, 4, 3, 3, 3, 2, 2, 2, 1, 1, 1)
    factor: int = 16
    fvd_reference: Optional[float] = None  # published FVD (README.md:57-64)


MODELS = {
    "plants_128": ModelEntry("plants_128", "plants", 128, 64, 32, fvd_reference=63.06),
    "plants_64": ModelEntry("plants_64", "plants", 64, 32, 64, fvd_reference=56.59),
    "iper_128": ModelEntry("iper_128", "iper", 128, 32, 64, fvd_reference=74.53),
    "iper_64": ModelEntry("iper_64", "iper", 64, 32, 64, fvd_reference=81.49),
    "h36m_128": ModelEntry("h36m_128", "human36m", 128, 64, 32, fvd_reference=119.77),
    "h36m_64": ModelEntry("h36m_64", "human36m", 64, 64, 32, fvd_reference=111.55),
    "taichi_128": ModelEntry("taichi_128", "taichi", 128, 32, 64, fvd_reference=100.69),
    "taichi_64": ModelEntry("taichi_64", "taichi", 64, 32, 64, fvd_reference=96.09),
}

FLAGSHIP = "iper_128"


def default_enc_channels(spatial_size: int) -> Tuple[int, ...]:
    # config/first_stage.yaml:53 — drop last entry for 64x64 models
    return (64, 128, 256, 256, 256) if spatial_size == 128 else (64, 128, 256, 256)


def default_dec_channels(spatial_size: int) -> Tuple[int, ...]:
    # config/first_stage.yaml:62 — drop first entry for 64x64 models
    return (256, 256, 256, 128, 64) if spatial_size == 128 else (256, 256, 128, 64)


def build_specs(entry: ModelEntry):
    """Returns (SecondStageSpec) with sub-specs wired like the reference ctor."""
    from ipoke_tpu.models.second_stage import SecondStageSpec

    fs = FirstStageSpec(
        z_dim=entry.fs_z_dim,
        spatial_size=entry.spatial_size,
        max_frames=entry.max_frames,
        enc_channels=default_enc_channels(entry.spatial_size),
        dec_channels=default_dec_channels(entry.spatial_size),
        n_gru_layers=4,
        min_spatial_size=entry.min_spatial_size,
        motion_bias=True,
        full_sequence=True,
    )
    poke = WrapperSpec(
        nf_in=2, nf_max=entry.nf_max_poke, spatial_size=entry.spatial_size,
        min_spatial_size=entry.min_spatial_size, deterministic=True,
    )
    cond = WrapperSpec(
        nf_in=3, nf_max=entry.nf_max_cond, spatial_size=entry.spatial_size,
        min_spatial_size=entry.min_spatial_size, deterministic=False,
    )
    arch = {
        "num_steps": list(entry.num_steps),
        "factor": entry.factor,
        "flow_mid_channels_factor": entry.flow_mid_channels_factor,
        "kernel_size": (2, 3),
        "transform": "affine",
        "prior_transform": "affine",
        "activation": "elu",
        "condition_nice": False,
        "augmented_input": False,
    }
    return SecondStageSpec.build(arch, fs, poke, cond, full_seq=True)
