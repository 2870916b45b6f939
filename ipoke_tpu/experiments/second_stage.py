"""Second-stage experiment: cINN training over the frozen first stage, FVD-
monitored checkpointing, and the full --test dispatch surface
(reference: experiments/second_stage_video.py + the test modes in
models/second_stage_video.py:661-1171).
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.ckpt import io as ckpt_io
from ipoke_tpu.data.datamodule import StaticDataModule
from ipoke_tpu.experiments.base import Experiment
from ipoke_tpu.models import second_stage as model_ss
from ipoke_tpu.models.encoders import WrapperSpec
from ipoke_tpu.models.first_stage import FirstStageSpec
from ipoke_tpu.models.second_stage import SecondStageSpec
from ipoke_tpu.train import second_stage as train_ss


def build_spec_from_config(config) -> SecondStageSpec:
    """Spec assembly.  Two paths:
    * registry: config names a released model (first_stage.name etc.) ->
      architecture from ipoke_tpu.registry;
    * inline: config carries explicit first_stage/poke_embedder/conditioner
      spec sections (used for fresh training and tests)."""
    arch = dict(config["architecture"])
    data = config["data"]
    ss = data["spatial_size"]
    ss = ss[0] if isinstance(ss, (tuple, list)) else ss

    fs_cfg = config["first_stage"]
    if "spec" in fs_cfg:
        s = fs_cfg["spec"]
        fs_spec = FirstStageSpec(
            z_dim=s["z_dim"], spatial_size=ss, max_frames=data["max_frames"],
            enc_channels=tuple(s["ENC_M_channels"]), dec_channels=tuple(s["dec_channels"]),
            n_gru_layers=s.get("n_gru_layers", 4),
            min_spatial_size=s.get("min_spatial_size", 8),
            motion_bias=s.get("motion_bias", True), full_sequence=s.get("full_seq", True),
        )
    else:
        from ipoke_tpu import registry

        entry = registry.MODELS[fs_cfg.get("registry", config["general"].get("model_name"))]
        base = registry.build_specs(entry)
        fs_spec = base.first_stage

    def wrapper(section, nf_in, deterministic):
        sec = config.get(section, {})
        spec_cfg = sec.get("spec", {})
        return WrapperSpec(
            nf_in=nf_in,
            nf_max=spec_cfg.get("nf_max", 64),
            spatial_size=ss,
            min_spatial_size=spec_cfg.get("min_spatial_size", 8),
            deterministic=deterministic,
            poke_and_image=spec_cfg.get("poke_and_image", False),
        )

    poke_spec = wrapper("poke_embedder", 2, True)
    cond_spec = wrapper("conditioner", 3, False) if config.get("conditioner", {}).get("use", True) else None
    full_seq = config.get("training", {}).get("full_seq", True)
    return SecondStageSpec.build(arch, fs_spec, poke_spec, cond_spec, full_seq=full_seq).validate()


class SecondStageExperiment(Experiment):
    monitor = "FVD-val"
    datakeys = ("images", "poke", "flow", "sample_ids")

    def __init__(self, config, dirs):
        super().__init__(config, dirs)
        self.spec = build_spec_from_config(config)
        self.datamod = StaticDataModule(config["data"], datakeys=self.datakeys)

    # ------------------------------------------------------------------
    def _init_params(self, rng):
        params = model_ss.init(rng, self.spec)
        # frozen components from pretrained checkpoints when configured
        for section, key in (("first_stage", "first_stage"),
                             ("poke_embedder", "poke_embedder"),
                             ("conditioner", "conditioner")):
            path = self.config.get(section, {}).get("ckpt")
            if path and os.path.exists(path):
                tree, _ = ckpt_io.load(ckpt_io.datapath_rewrite(path))
                params[key] = tree.get(key, tree)
                self.console.info(f"loaded frozen {key} from {path}")
        return params

    def train(self):
        cfg_t = self.config["training"]
        rng = jax.random.PRNGKey(self.seed)
        params = self._init_params(rng)
        trainable, frozen = train_ss.split_params(params)
        steps_per_epoch = int(cfg_t.get("max_batches_per_epoch", 2000))
        total = int(cfg_t.get("n_epochs", 100)) * steps_per_epoch
        opt = train_ss.make_optimizer(
            trainable,
            lr=float(cfg_t.get("lr", 1e-3)),
            weight_decay=float(cfg_t.get("weight_decay", 1e-5)),
            warmup_steps=int(cfg_t.get("lr_scaling_max_it", 500)),
            total_steps=total,
            clip_grad_norm=float(cfg_t.get("clip_grad_norm", 0.0)),
            use_adabelief=bool(cfg_t.get("use_adabelief", cfg_t.get("adabelief", False))),
            use_adamw=bool(cfg_t.get("use_adamw", False)),
            amsgrad=bool(cfg_t.get("amsgrad", False)),
        )
        if cfg_t.get("chunked"):
            # compile-bounded per-level trainer (full-depth flows whose single
            # jitted step exceeds the compiler's memory; train/chunked.py)
            from ipoke_tpu.train import chunked

            chunk_params = {"flow": trainable["flow"]}
            opt = train_ss.make_optimizer(
                chunk_params,
                lr=float(cfg_t.get("lr", 1e-3)),
                weight_decay=float(cfg_t.get("weight_decay", 1e-5)),
                warmup_steps=int(cfg_t.get("lr_scaling_max_it", 500)),
                total_steps=total,
            )
            state = self.maybe_resume(chunked.ChunkedTrainState(
                jnp.zeros((), jnp.int32), chunk_params, opt.init(chunk_params)
            ))
            step = chunked.make_chunked_trainer(
                self.spec.flow, self.spec, frozen, opt,
                logdet_weight=float(cfg_t.get("logdet_weight", 1.0)),
                spatial_mean=bool(cfg_t.get("spatial_mean", False)),
            )
            self._frozen = frozen
            return self.fit(
                step, state, self.datamod, rng,
                n_epochs=int(cfg_t.get("n_epochs", 100)),
                validate=self.validate,
                val_every_steps=int(steps_per_epoch * float(cfg_t.get("val_every", 1.0))),
                max_batches_per_epoch=steps_per_epoch,
            )
        state = self.maybe_resume(train_ss.init_state(trainable, opt))
        batch_size = int(self.config["data"].get("batch_size", 8))
        min_acc = int(cfg_t.get("min_acc_batch_size", 0))
        n_micro = max(1, -(-min_acc // batch_size)) if min_acc > batch_size else 1
        step = train_ss.make_train_step(
            self.spec, frozen, opt,
            spatial_mean=bool(cfg_t.get("spatial_mean", False)),
            logdet_weight=float(cfg_t.get("logdet_weight", 1.0)),
            n_microbatches=n_micro,
        )
        self._frozen = frozen
        state = self.fit(
            step, state, self.datamod, rng,
            n_epochs=int(cfg_t.get("n_epochs", 100)),
            validate=self.validate,
            val_every_steps=int(steps_per_epoch * float(cfg_t.get("val_every", 1.0))),
            max_batches_per_epoch=steps_per_epoch,
        )
        return state

    # ------------------------------------------------------------------
    def validate(self, state, datamod):
        """Density loss + sampled-video FVD over the val split
        (second_stage_video.py:490-586)."""
        from ipoke_tpu.flows.loss import flow_loss
        from ipoke_tpu.metrics.fvd import FVDAccumulator

        params = {**self._frozen, **state.params}
        acc = FVDAccumulator(n_samples=int(self.config.get("logging", {}).get("n_fvd_samples", 1000)))
        losses = []
        rng = jax.random.PRNGKey(123)

        @jax.jit
        def density(params, batch):
            out, logdet, _ = model_ss.forward_density(params, self.spec, batch)
            return flow_loss(out, logdet)[0]

        @jax.jit
        def sample(params, batch, key):
            return model_ss.forward_sample(params, self.spec, batch, key, n_samples=1)[0]

        max_batches = int(self.config["training"].get("max_val_batches", 100))
        for bi, batch in enumerate(datamod.loader("val")):
            if bi >= max_batches:
                break
            batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "sample_ids"}
            losses.append(float(density(params, batch)))
            rng, sub = jax.random.split(rng)
            fake = sample(params, batch, sub)
            acc.update(batch["images"][:, 1:], fake)
        fvd_val = acc.compute() if acc._real else float("nan")
        # latent-space scatter (reference UMAP logging, second_stage_video.py:
        # 588-627): posterior means vs flow samples, every validation
        try:
            self._log_latents(params, datamod)
        except Exception as e:  # visualization must never kill training
            self.console.warning(f"latent scatter skipped: {e}")
        return {"FVD-val": fvd_val, "flow_loss-val": float(np.mean(losses)) if losses else float("nan")}

    def _log_latents(self, params, datamod, n_batches=2):
        from ipoke_tpu.flows import transformer
        from ipoke_tpu.utils.logging import latent_scatter

        z_post, z_samp = [], []
        rng = jax.random.PRNGKey(5)
        for bi, batch in enumerate(datamod.loader("val")):
            if bi >= n_batches:
                break
            b = {k: jnp.asarray(v) for k, v in batch.items() if k != "sample_ids"}
            motion, mu = model_ss.encode_first_stage(params, self.spec, b["images"])
            z_post.append(np.asarray(mu).reshape(mu.shape[0], -1))
            cond = model_ss.embed_cond(params, self.spec, b["images"][:, 0], b["poke"])
            rng, sub = jax.random.split(rng)
            z = jax.random.normal(sub, motion.shape[:-1] + (self.spec.flow_in_channels,))
            z_inn = transformer.reverse(params["flow"], self.spec.flow, z, cond)
            z_samp.append(np.asarray(z_inn).reshape(z.shape[0], -1))
        latent_scatter(
            os.path.join(self.dirs["log"], "latents.png"),
            {"posterior_mean": np.concatenate(z_post), "flow_samples": np.concatenate(z_samp)},
        )

    # ------------------------------------------------------------------
    # test dispatch (main.py --test {samples,fvd,accuracy,diversity,
    # control_sensitivity,transfer,kps_acc})
    # ------------------------------------------------------------------
    def test(self, mode: Optional[str] = None):
        mode = mode or self.config["general"].get("test", "samples")
        params = self._load_for_test()
        from ipoke_tpu.eval import test_modes

        fn = {
            "samples": test_modes.run_samples,
            "fvd": test_modes.run_fvd,
            "accuracy": test_modes.run_accuracy,
            "diversity": test_modes.run_diversity,
            "control_sensitivity": test_modes.run_control_sensitivity,
            "transfer": test_modes.run_transfer,
            "kps_acc": test_modes.run_kps_acc,
        }[mode]
        return fn(params, self.spec, self.config, self.datamod, self.dirs)

    def _load_for_test(self):
        best = ckpt_io.CheckpointManager.find_best(self.ckpt_dir)
        rng = jax.random.PRNGKey(self.seed)
        params = self._init_params(rng)
        if best:
            tree, meta = ckpt_io.load(best)
            # checkpoints store the TrainState dict: {step, params, opt_state}
            # with 'params' = the trainable subtree (flow + adapters + augment)
            saved = tree.get("params", tree)
            loaded = {k: v for k, v in saved.items() if k in train_ss.TRAINABLE_KEYS}
            if not loaded:  # full-model checkpoints (converted from torch)
                loaded = {k: v for k, v in saved.items() if k in params}
            params.update(loaded)
            self.console.info(f"loaded checkpoint {best} ({sorted(loaded)})")
        else:
            self.console.warning("no checkpoint found; testing with fresh params")
        return params
