"""Conditioning-tower trainers.

ImageAE (reference: models/first_stage_image_conv.py ConvAEModel): variational
conv AE on single frames with NLL under a learned global logvar, KL, PatchGAN
adversarial term with ADAPTIVE weight (grad-norm ratio at the decoder's last
layer, disc_utils.py:9-21), LPIPS/FID validation.

PokeAE (reference: models/conv_poke_encoder.py ConvPokeAE): deterministic AE
reconstructing the DENSE flow from the sparse poke (or flow->flow when
flow_ae), L1 + VGG (2ch zero-padded to 3) under the same learned-logvar NLL.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ipoke_tpu.metrics import vgg as vgg_mod
from ipoke_tpu.models import discriminators as D
from ipoke_tpu.models import encoders
from ipoke_tpu.models.discriminators import PatchDiscSpec
from ipoke_tpu.models.encoders import WrapperSpec
from ipoke_tpu.nn.blocks import materialize_spectral_norm, refresh_spectral_u
from ipoke_tpu.train.first_stage import _label_tree


class AETrainState(NamedTuple):
    step: jnp.ndarray
    params: dict          # {'model': wrapper params, 'logvar': scalar}
    disc_params: dict
    opt_state: optax.OptState
    disc_opt_state: optax.OptState


def _kl_conv(mu, logvar):
    """kl_conv (utils/losses.py:50-56): sum over flattened dims, mean batch."""
    mu2 = mu.reshape(mu.shape[0], -1)
    lv = logvar.reshape(logvar.shape[0], -1)
    return jnp.mean(0.5 * jnp.sum(mu2**2 + jnp.exp(lv) - 1.0 - lv, axis=-1))


def make_ae_optimizer(params, lr=1e-4, weight_decay=0.0):
    base = optax.adam(lr, b1=0.5, b2=0.9)
    if weight_decay:
        base = optax.chain(optax.add_decayed_weights(weight_decay), base)
    return optax.multi_transform({"train": base, "freeze": optax.set_to_zero()}, _label_tree(params))


def init_image_ae(key, spec: WrapperSpec, disc_spec: PatchDiscSpec, lr=1e-4):
    k1, k2 = jax.random.split(key)
    params = {"model": encoders.init_wrapper(k1, spec), "logvar": jnp.zeros(())}
    disc = D.init_patch_disc(k2, disc_spec)
    opt = make_ae_optimizer(params, lr)
    dopt = make_ae_optimizer(disc, lr)
    state = AETrainState(jnp.zeros((), jnp.int32), params, disc, opt.init(params), dopt.init(disc))
    return state, {"gen": opt, "disc": dopt}


def make_image_ae_step(spec: WrapperSpec, disc_spec: PatchDiscSpec, optimizers,
                       kl_weight=1e-6, disc_active=True):
    enc_spec = spec.encoder_spec
    dec_spec = spec.decoder_spec

    def reconstruct(model_params, x, rng):
        sn = materialize_spectral_norm(model_params)
        out, mean, logstd = encoders.conv_encoder_apply(sn["encoder"], x, enc_spec, rng=rng)
        # deterministic -> bottleneck feature; variational -> the mean
        # (reference forward: p_s if be_deterministic else mu, image_conv.py:73-82)
        in_dec = out if not enc_spec.variational else mean
        rec = encoders.conv_decoder_apply(sn["decoder"], [in_dec], dec_spec)
        return rec, mean, logstd

    def nll_terms(x, rec, logvar):
        rec_l1 = jnp.abs(x - rec)
        p_loss = vgg_mod.vgg_loss(x, rec)
        rec_loss = rec_l1 + p_loss  # perc_weight = 1
        nll = rec_loss / jnp.exp(logvar) + logvar
        return jnp.sum(nll) / nll.shape[0], jnp.mean(rec_loss)

    def disc_loss_fn(disc_params, x, rec):
        sn = materialize_spectral_norm(disc_params)
        pred_true, _ = D.patch_disc_apply(sn, x, disc_spec)
        pred_fake, _ = D.patch_disc_apply(sn, jax.lax.stop_gradient(rec), disc_spec)
        loss = 0.5 * (D.disc_loss(pred_true, True) + D.disc_loss(pred_fake, False))
        if disc_spec.gp_weight > 0:
            loss = loss + disc_spec.gp_weight * D.gradient_penalty(
                lambda xx: D.patch_disc_apply(sn, xx, disc_spec), x
            )
        return loss

    def gen_loss_fn(params, disc_params, x, rng):
        rec, mean, logstd = reconstruct(params["model"], x, rng)
        nll, rec_mean = nll_terms(x, rec, params["logvar"])
        kl = 0.0 if not enc_spec.variational else _kl_conv(mean, logstd)
        dsn = materialize_spectral_norm(disc_params)
        pred_fake, _ = D.patch_disc_apply(dsn, rec, disc_spec)
        g_loss = D.gen_loss(pred_fake)
        # adaptive disc weight: grad-norm ratio at the decoder's last conv
        def by_last(layer_w):
            p2 = jax.tree_util.tree_map(lambda v: v, params)
            p2["model"]["decoder"]["out_conv"]["conv"]["w"] = layer_w
            rec2, mean2, logstd2 = reconstruct(p2["model"], x, rng)
            nll2, _ = nll_terms(x, rec2, p2["logvar"])
            dsn2 = materialize_spectral_norm(disc_params)
            pf2, _ = D.patch_disc_apply(dsn2, rec2, disc_spec)
            return nll2, D.gen_loss(pf2)

        last_w = params["model"]["decoder"]["out_conv"]["conv"]["w"]
        nll_grads = jax.grad(lambda w: by_last(w)[0])(last_w)
        g_grads = jax.grad(lambda w: by_last(w)[1])(last_w)
        d_weight = jnp.linalg.norm(nll_grads.reshape(-1)) / (
            jnp.linalg.norm(g_grads.reshape(-1)) + 1e-4
        )
        d_weight = jax.lax.stop_gradient(jnp.clip(d_weight, 0.0, 1e4))
        if not disc_active:
            d_weight = 0.0
        loss = nll + kl_weight * kl + d_weight * g_loss
        return loss, {
            "loss": loss, "nll_loss": nll, "kl_loss": kl, "rec_loss": rec_mean,
            "g_loss": g_loss, "d_weight": d_weight, "logvar": params["logvar"],
        }

    def train_step(state: AETrainState, batch, rng):
        x = batch["images"][:, -1]  # reference trains on the LAST frame
        r1, r2 = jax.random.split(rng)
        rec, *_ = reconstruct(state.params["model"], x, r1)
        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(state.disc_params, x, rec)
        d_up, d_opt = optimizers["disc"].update(d_grads, state.disc_opt_state, state.disc_params)
        disc_params = refresh_spectral_u(optax.apply_updates(state.disc_params, d_up))

        (loss, logs), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.params, disc_params, x, r1
        )
        g_up, g_opt = optimizers["gen"].update(grads, state.opt_state, state.params)
        params = refresh_spectral_u(optax.apply_updates(state.params, g_up))
        logs["d_loss"] = d_loss
        return AETrainState(state.step + 1, params, disc_params, g_opt, d_opt), logs

    return train_step


# ---------------------------------------------------------------------------
# Poke encoder (poke -> dense flow AE; no discriminator)
# ---------------------------------------------------------------------------

class PokeAEState(NamedTuple):
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState


def init_poke_ae(key, spec: WrapperSpec, lr=1e-4):
    params = {"model": encoders.init_wrapper(key, spec), "logvar": jnp.zeros(())}
    opt = make_ae_optimizer(params, lr)
    return PokeAEState(jnp.zeros((), jnp.int32), params, opt.init(params)), opt


def make_poke_ae_step(spec: WrapperSpec, optimizer, flow_ae=False):
    def loss_fn(params, batch):
        poke = batch["flow"] if flow_ae else batch["poke"]
        if spec.poke_and_image:
            poke = jnp.concatenate([poke, batch["images"][:, 0]], axis=-1)
        flow = batch["flow"]
        sn = materialize_spectral_norm(params["model"])
        rec = encoders.wrapper_apply(sn, poke, spec)
        rec_l1 = jnp.abs(flow - rec)
        zeros = jnp.zeros(flow.shape[:-1] + (1,), flow.dtype)
        p_loss = vgg_mod.vgg_loss(
            jnp.concatenate([flow, zeros], -1), jnp.concatenate([rec, zeros], -1)
        )
        rec_loss = rec_l1 + p_loss
        nll = rec_loss / jnp.exp(params["logvar"]) + params["logvar"]
        nll = jnp.sum(nll) / nll.shape[0]
        return nll, {"nll_loss": nll, "rec_loss": jnp.mean(rec_loss), "logvar": params["logvar"]}

    def train_step(state: PokeAEState, batch, rng=None):
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        up, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = refresh_spectral_u(optax.apply_updates(state.params, up))
        return PokeAEState(state.step + 1, params, opt_state), logs

    return train_step
