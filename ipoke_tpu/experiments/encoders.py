"""Image-encoder and poke-encoder experiments (reference:
experiments/first_stage_image.py, experiments/poke_encoder.py) — both monitor
lpips-val."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.data.datamodule import StaticDataModule
from ipoke_tpu.experiments.base import Experiment
from ipoke_tpu.models import encoders as model_enc
from ipoke_tpu.models.discriminators import PatchDiscSpec
from ipoke_tpu.models.encoders import WrapperSpec
from ipoke_tpu.nn.blocks import materialize_spectral_norm
from ipoke_tpu.train import encoders as train_enc


def _wrapper_spec(config, nf_in, deterministic):
    arch = config["architecture"]
    data = config["data"]
    ss = data["spatial_size"]
    ss = ss[0] if isinstance(ss, (tuple, list)) else ss
    return WrapperSpec(
        nf_in=nf_in,
        nf_max=int(arch.get("nf_max", 64)),
        spatial_size=int(ss),
        min_spatial_size=int(arch.get("min_spatial_size", 8)),
        deterministic=deterministic,
        poke_and_image=bool(arch.get("poke_and_image", False)),
    )


class ImageEncoderExperiment(Experiment):
    monitor = "lpips-val"

    def __init__(self, config, dirs):
        super().__init__(config, dirs)
        det = bool(config["architecture"].get("deterministic", False))
        self.spec = _wrapper_spec(config, nf_in=3, deterministic=det)
        self.disc_spec = PatchDiscSpec(
            gp_weight=float(config.get("training", {}).get("gp_weight", 0.0))
        )
        self.datamod = StaticDataModule(config["data"], datakeys=("images", "sample_ids"))

    def train(self):
        cfg_t = self.config["training"]
        rng = jax.random.PRNGKey(self.seed)
        state, opts = train_enc.init_image_ae(
            rng, self.spec, self.disc_spec, lr=float(cfg_t.get("lr", 1e-4))
        )
        step = train_enc.make_image_ae_step(
            self.spec, self.disc_spec, opts, kl_weight=float(cfg_t.get("w_kl", 1e-6))
        )
        state = self.maybe_resume(state)
        return self.fit(
            step, state, self.datamod, rng,
            n_epochs=int(cfg_t.get("n_epochs", 100)),
            validate=self.validate,
            max_batches_per_epoch=int(cfg_t.get("max_batches_per_epoch", 2000)),
        )

    def validate(self, state, datamod):
        from ipoke_tpu.metrics.lpips import lpips as lpips_fn

        enc_spec = self.spec.encoder_spec
        dec_spec = self.spec.decoder_spec

        @jax.jit
        def recon(params, x):
            sn = materialize_spectral_norm(params["model"])
            out, mean, _ = model_enc.conv_encoder_apply(sn["encoder"], x, enc_spec)
            in_dec = out if not enc_spec.variational else mean
            return model_enc.conv_decoder_apply(sn["decoder"], [in_dec], dec_spec)

        vals = []
        for bi, batch in enumerate(datamod.loader("val")):
            if bi >= int(self.config["training"].get("max_val_batches", 50)):
                break
            x = jnp.asarray(batch["images"][:, -1])
            rec = recon(state.params, x)
            vals.append(float(jnp.mean(lpips_fn(rec, x))))
        return {"lpips-val": float(np.mean(vals))}

    def test(self, mode=None):
        return self.validate(self._load(), self.datamod)

    def _load(self):
        from ipoke_tpu.ckpt import io as ckpt_io

        best = ckpt_io.CheckpointManager.find_best(self.ckpt_dir)
        rng = jax.random.PRNGKey(self.seed)
        state, _ = train_enc.init_image_ae(rng, self.spec, self.disc_spec)
        if best:
            tree, _ = ckpt_io.load(best)
            state = state._replace(params=tree.get("params", state.params))
        return state


class PokeEncoderExperiment(Experiment):
    monitor = "lpips-val"
    datakeys = ("poke", "flow", "images", "original_flow", "sample_ids")

    def __init__(self, config, dirs):
        super().__init__(config, dirs)
        self.spec = _wrapper_spec(config, nf_in=2, deterministic=True)
        self.flow_ae = bool(config["architecture"].get("flow_ae", False))
        self.datamod = StaticDataModule(config["data"], datakeys=self.datakeys)

    def train(self):
        cfg_t = self.config["training"]
        rng = jax.random.PRNGKey(self.seed)
        state, opt = train_enc.init_poke_ae(rng, self.spec, lr=float(cfg_t.get("lr", 1e-4)))
        step = train_enc.make_poke_ae_step(self.spec, opt, flow_ae=self.flow_ae)
        state = self.maybe_resume(state)
        return self.fit(
            step, state, self.datamod, rng,
            n_epochs=int(cfg_t.get("n_epochs", 100)),
            validate=self.validate,
            max_batches_per_epoch=int(cfg_t.get("max_batches_per_epoch", 2000)),
        )

    def validate(self, state, datamod):
        """LPIPS between reconstructed and target flow maps (2ch zero-padded
        to 3 for the VGG metric, conv_poke_encoder.py val)."""
        from ipoke_tpu.metrics.lpips import lpips as lpips_fn

        @jax.jit
        def recon(params, poke):
            sn = materialize_spectral_norm(params["model"])
            return model_enc.wrapper_apply(sn, poke, self.spec)

        vals = []
        for bi, batch in enumerate(datamod.loader("val")):
            if bi >= int(self.config["training"].get("max_val_batches", 50)):
                break
            poke = jnp.asarray(batch["flow" if self.flow_ae else "poke"])
            flow = jnp.asarray(batch["flow"])
            rec = recon(state.params, poke)
            zeros = jnp.zeros(flow.shape[:-1] + (1,), flow.dtype)
            a = jnp.concatenate([rec, zeros], -1)
            b = jnp.concatenate([flow, zeros], -1)
            vals.append(float(jnp.mean(lpips_fn(a, b))))
        return {"lpips-val": float(np.mean(vals))}

    def test(self, mode=None):
        return self.validate(self._load(), self.datamod)

    def _load(self):
        from ipoke_tpu.ckpt import io as ckpt_io

        best = ckpt_io.CheckpointManager.find_best(self.ckpt_dir)
        rng = jax.random.PRNGKey(self.seed)
        state, _ = train_enc.init_poke_ae(rng, self.spec)
        if best:
            tree, _ = ckpt_io.load(best)
            state = state._replace(params=tree.get("params", state.params))
        return state
