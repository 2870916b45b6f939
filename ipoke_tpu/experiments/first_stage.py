"""First-stage experiment: cVAE-GAN training with FVD-val monitoring
(reference: experiments/first_stage_video.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.data.datamodule import StaticDataModule
from ipoke_tpu.experiments.base import Experiment
from ipoke_tpu.models import first_stage as model_fs
from ipoke_tpu.models.discriminators import PatchDiscSpec, TempDiscSpec
from ipoke_tpu.models.first_stage import FirstStageSpec
from ipoke_tpu.train import first_stage as train_fs


class FirstStageExperiment(Experiment):
    monitor = "FVD-val"

    def __init__(self, config, dirs):
        super().__init__(config, dirs)
        self.spec = FirstStageSpec.from_config(config)
        ss = self.spec.spatial_size
        dt = config.get("d_t", {})
        ds = config.get("d_s", {})
        self.dt_spec = TempDiscSpec(
            spatial_size=ss,
            sequence_length=min(int(dt.get("max_frames", 12)), self.spec.max_frames),
            patch_temp=bool(dt.get("patch_temp_disc", False)),
            bce_loss=bool(dt.get("bce_loss", False)),
            gp_weight=float(dt.get("gp_weight", 1.0)),
            fmap_weight=float(dt.get("fmap_weight", 1.0)),
            gen_weight=float(dt.get("gen_weight", 1.0)),
        )
        self.ds_spec = PatchDiscSpec(
            bce_loss=bool(ds.get("bce_loss", False)),
            gp_weight=float(ds.get("gp_weight", 0.0)),
            fmap_weight=float(ds.get("fmap_weight", 1.0)),
            gen_weight=float(ds.get("gen_weight", 1.0)),
        )
        self.n_spatial = int(ds.get("n_examples", 16))
        # baseline selection (reference experiments/first_stage_video.py picks
        # SpadeCondMotionModel / PokeVAE / FCBaseline from the config)
        self.baseline = config.get("architecture", {}).get("baseline", "spade")
        self.datamod = StaticDataModule(config["data"])

    def train(self):
        cfg_t = self.config["training"]
        rng = jax.random.PRNGKey(self.seed)
        state, opts = train_fs.init_gan_state(
            rng, self.spec, self.ds_spec, self.dt_spec,
            lr=float(cfg_t.get("lr", 2e-4)),
            weight_decay=float(cfg_t.get("weight_decay", 1e-5)),
            gamma=float(cfg_t.get("gamma", 0.98)),
            steps_per_epoch=int(cfg_t.get("max_batches_per_epoch", 2000)),
        )
        forward_fn = None
        if self.baseline == "poke_vae":
            from ipoke_tpu.models import variants
            from ipoke_tpu.models.variants import PokeVAESpec

            pv_spec = PokeVAESpec(
                first_stage=self.spec,
                stack_motion_and_poke=bool(
                    self.config["architecture"].get("stack_motion_and_poke", False)
                ),
            )
            pv_params = variants.init_poke_vae(jax.random.PRNGKey(self.seed + 1), pv_spec)
            state = state._replace(gen_params=pv_params)
            opts["gen"] = train_fs.make_gan_optimizer(
                pv_params, float(cfg_t.get("lr", 2e-4)),
                float(cfg_t.get("weight_decay", 1e-5)), float(cfg_t.get("gamma", 0.98)),
                int(cfg_t.get("max_batches_per_epoch", 2000)),
            )
            state = state._replace(gen_opt=opts["gen"].init(pv_params))

            def forward_fn(p, batch, key):
                return variants.poke_vae_forward(p, batch, pv_spec, rng=key)

        step = train_fs.make_gan_train_step(
            self.spec, self.ds_spec, self.dt_spec, opts,
            w_vgg=float(cfg_t.get("w_vgg", 10.0)),
            w_l1=float(cfg_t.get("w_l1", 10.0)),
            w_kl=float(cfg_t.get("w_kl", 1e-7)),
            n_spatial_examples=self.n_spatial,
            remat=bool(cfg_t.get("remat", False)),
            forward_fn=forward_fn,
        )
        state = self.maybe_resume(state)
        return self.fit(
            step, state, self.datamod, rng,
            n_epochs=int(cfg_t.get("n_epochs", 100)),
            validate=self.validate,
            max_batches_per_epoch=int(cfg_t.get("max_batches_per_epoch", 2000)),
        )

    def validate(self, state, datamod):
        """SSIM/PSNR/LPIPS + FVD on reconstructions
        (first_stage_motion_model.py:304-372)."""
        from ipoke_tpu.metrics.fvd import FVDAccumulator
        from ipoke_tpu.metrics.image import psnr, ssim_video
        from ipoke_tpu.metrics.lpips import lpips_video

        acc = FVDAccumulator(n_samples=int(self.config.get("logging", {}).get("n_samples_fvd", 1000)))
        ssims, psnrs, lps = [], [], []
        rng = jax.random.PRNGKey(7)

        @jax.jit
        def recon(gen_params, batch, key):
            from ipoke_tpu.nn.blocks import materialize_spectral_norm

            sn = materialize_spectral_norm(gen_params)
            if self.baseline == "poke_vae":
                from ipoke_tpu.models import variants
                from ipoke_tpu.models.variants import PokeVAESpec

                pv_spec = PokeVAESpec(
                    first_stage=self.spec,
                    stack_motion_and_poke=bool(
                        self.config["architecture"].get("stack_motion_and_poke", False)
                    ),
                )
                x_hat, *_ = variants.poke_vae_forward(sn, batch, pv_spec, rng=key)
            else:
                x_hat, *_ = model_fs.forward(sn, batch["images"], self.spec, rng=key)
            return x_hat

        max_batches = int(self.config["training"].get("max_val_batches", 100))
        for bi, batch in enumerate(datamod.loader("val")):
            if bi >= max_batches:
                break
            x = jnp.asarray(batch["images"])
            b = {k: jnp.asarray(v) for k, v in batch.items() if k in ("images", "poke")}
            rng, sub = jax.random.split(rng)
            x_hat = recon(state.gen_params, b, sub)
            tgt = x[:, 1:]
            ssims.append(float(ssim_video(x_hat, tgt)))
            psnrs.append(float(psnr(x_hat, tgt)))
            lps.append(float(lpips_video(x_hat, tgt)))
            acc.update(tgt, x_hat)
        return {
            "FVD-val": acc.compute() if acc._real else float("nan"),
            "ssim-val": float(np.mean(ssims)),
            "psnr-val": float(np.mean(psnrs)),
            "lpips-val": float(np.mean(lps)),
        }

    def test(self, mode=None):
        return self.validate(self._load_state(), self.datamod)

    def _load_state(self):
        from ipoke_tpu.ckpt import io as ckpt_io

        best = ckpt_io.CheckpointManager.find_best(self.ckpt_dir)
        rng = jax.random.PRNGKey(self.seed)
        state, _ = train_fs.init_gan_state(rng, self.spec, self.ds_spec, self.dt_spec)
        if best:
            tree, _ = ckpt_io.load(best)
            state = state._replace(gen_params=tree.get("gen_params", state.gen_params))
        return state
