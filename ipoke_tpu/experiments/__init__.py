"""Experiment registry (reference: experiments/__init__.py:8-25)."""
from __future__ import annotations


def select_experiment(config, dirs):
    name = config["general"]["experiment"]
    if name == "second_stage":
        from ipoke_tpu.experiments.second_stage import SecondStageExperiment

        return SecondStageExperiment(config, dirs)
    if name == "first_stage":
        from ipoke_tpu.experiments.first_stage import FirstStageExperiment

        return FirstStageExperiment(config, dirs)
    if name == "img_encoder":
        from ipoke_tpu.experiments.encoders import ImageEncoderExperiment

        return ImageEncoderExperiment(config, dirs)
    if name == "poke_encoder":
        from ipoke_tpu.experiments.encoders import PokeEncoderExperiment

        return PokeEncoderExperiment(config, dirs)
    if name == "distill":
        from ipoke_tpu.experiments.distill import DistillExperiment

        return DistillExperiment(config, dirs)
    raise KeyError(f"unknown experiment {name}")
