"""First-stage cVAE-GAN training: 3 optimizers (generator, spatial disc,
temporal disc), manual update ordering matching the reference
(first_stage_motion_model.py:156-298):

  1. temporal disc on random mf_dt-frame crops (hinge + R1-style gp on real)
  2. spatial disc on random frames
  3. generator: adv (vs the *updated* discs) + fmap + VGG perceptual + L1 + KL

All three updates live in ONE jitted step; gradient-penalty is grad-of-grad
through the 3D disc; spectral norm is materialized inside each grad closure
(gradients flow through w/sigma as in torch) with power-iteration vectors
refreshed once per step and masked out of the optimizers.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ipoke_tpu.metrics import vgg as vgg_mod
from ipoke_tpu.models import discriminators as D
from ipoke_tpu.models import first_stage
from ipoke_tpu.models.discriminators import PatchDiscSpec, TempDiscSpec
from ipoke_tpu.models.first_stage import FirstStageSpec
from ipoke_tpu.nn.blocks import materialize_spectral_norm, refresh_spectral_u
from ipoke_tpu.train.losses import kl_divergence, l1


class GanTrainState(NamedTuple):
    step: jnp.ndarray
    gen_params: dict
    ds_params: dict
    dt_params: dict
    gen_opt: optax.OptState
    ds_opt: optax.OptState
    dt_opt: optax.OptState


def _label_tree(params):
    """Mask spectral-norm 'u' vectors and integer buffers out of the optimizer."""

    def walk(node, name=None):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, name) for v in node)
        if name == "u" or not jnp.issubdtype(jnp.asarray(node).dtype, jnp.floating):
            return "freeze"
        return "train"

    return walk(params)


def make_gan_optimizer(params, lr, weight_decay=1e-5, gamma=0.98, steps_per_epoch=2000):
    """Adam(betas=(0.5, 0.9)) with per-epoch exponential decay (ExponentialLR
    parity, first_stage_motion_model.py:375-392)."""
    schedule = lambda step: lr * gamma ** (step // steps_per_epoch)
    base = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.5, b2=0.9),
        optax.scale_by_learning_rate(schedule),
    )
    return optax.multi_transform({"train": base, "freeze": optax.set_to_zero()}, _label_tree(params))


def init_gan_state(key, fs_spec: FirstStageSpec, ds_spec: PatchDiscSpec, dt_spec: TempDiscSpec,
                   lr=2e-4, weight_decay=1e-5, gamma=0.98, steps_per_epoch=2000):
    k1, k2, k3 = jax.random.split(key, 3)
    gen = first_stage.init(k1, fs_spec)
    ds = D.init_patch_disc(k2, ds_spec)
    dt = D.init_temp_disc(k3, dt_spec)
    opts = {}
    for name, p in (("gen", gen), ("ds", ds), ("dt", dt)):
        opts[name] = make_gan_optimizer(p, lr, weight_decay, gamma, steps_per_epoch)
    state = GanTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen, ds_params=ds, dt_params=dt,
        gen_opt=opts["gen"].init(gen), ds_opt=opts["ds"].init(ds), dt_opt=opts["dt"].init(dt),
    )
    return state, opts


def make_gan_train_step(
    fs_spec: FirstStageSpec,
    ds_spec: PatchDiscSpec,
    dt_spec: TempDiscSpec,
    optimizers,
    w_vgg=10.0, w_l1=10.0, w_kl=1e-7,
    n_spatial_examples=16,
    remat=False,
    forward_fn=None,
    vgg_chunks=1,
    disc_bf16=False,
):
    """``remat`` rematerializes generator activations in the backward pass:
    ``"outer"`` checkpoints the whole forward (one extra forward), ``"decode"``
    checkpoints only the SPADE decode scan body (per-frame recompute; kills
    the dominant (T-1, B, 128, 128, C) residual stacks), ``"both"``/True does
    both, ``"none"``/False neither.

    ``vgg_chunks>1`` computes the VGG19 perceptual loss as a remat-scan over
    equal frame chunks: value and grads are EXACT (mean of equal-size chunk
    means == overall mean; jax.checkpoint recomputes one chunk's VGG
    activations at a time in the backward) while peak HBM drops from all
    2x(B*(T-1)) frames' VGG activations to one chunk's.  This is the lever
    that lifts the single-chip batch ceiling: the VGG19 tower at 128^2 is
    the largest activation block in the generator update.

    ``disc_bf16=True`` runs both discriminators' activations in bfloat16
    (params cast at the call site, losses/penalties reduced in f32) — an
    opt-in memory/speed knob; the gradient penalty's grad-of-grad also
    halves its activation bytes.

    ``forward_fn(gen_params_sn, batch, rng) -> (x_hat, mu, logvar)`` overrides
    the generator forward — used by the PokeVAE baseline (poke-conditioned
    cVAE trained under the same GAN recipe, reference models/poke_vae.py)."""
    mf_dt = dt_spec.sequence_length
    remat = {False: "none", True: "both"}.get(remat, remat)
    assert remat in ("none", "outer", "decode", "both"), remat

    def _bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)

    def temp_disc(params_sn, x):
        if disc_bf16:
            pred, fmap = D.temp_disc_apply(_bf16(params_sn), _bf16(x), dt_spec)
            return pred.astype(jnp.float32), [f.astype(jnp.float32) for f in fmap]
        return D.temp_disc_apply(params_sn, x, dt_spec)

    def patch_disc(params_sn, x):
        if disc_bf16:
            pred, fmap = D.patch_disc_apply(_bf16(params_sn), _bf16(x), ds_spec)
            return pred.astype(jnp.float32), [f.astype(jnp.float32) for f in fmap]
        return D.patch_disc_apply(params_sn, x, ds_spec)

    def vgg_loss_chunked(flat_tgt, flat_hat):
        if vgg_chunks <= 1:
            return vgg_mod.vgg_loss(flat_tgt, flat_hat)
        n = flat_tgt.shape[0]
        k = vgg_chunks
        assert n % k == 0, (
            f"vgg_chunks={k} must divide the {n} flattened frames "
            f"(batch * (frames-1))")
        xt = flat_tgt.reshape(k, n // k, *flat_tgt.shape[1:])
        xh = flat_hat.reshape(k, n // k, *flat_hat.shape[1:])

        @jax.checkpoint
        def body(carry, xy):
            a, b = xy
            return carry + vgg_mod.vgg_loss(a, b), None

        total, _ = jax.lax.scan(body, jnp.zeros((), flat_tgt.dtype), (xt, xh))
        return total / k

    def forward_gen(gen_params, batch, rng):
        gen_sn = materialize_spectral_norm(gen_params)

        def f(p, bb):
            if forward_fn is not None:
                return forward_fn(p, bb, rng)
            # remat_decode: per-frame remat of the SPADE decode scan — the
            # (T-1, B, 128, 128, C) per-frame residual stacks it avoids are
            # the single largest HBM block in this step (see first_stage.decode)
            return first_stage.forward(p, bb["images"], fs_spec, rng=rng,
                                       remat_decode=remat in ("decode", "both"))

        if remat in ("outer", "both"):
            f = jax.checkpoint(f)
        return f(gen_sn, batch)

    def crops(x, x_hat, rng):
        """Random mf_dt-frame temporal crop (shared offset for real/fake) and
        random frame indices for the spatial disc."""
        t = x.shape[1]
        r1, r2, r3 = jax.random.split(rng, 3)
        offset = jax.random.randint(r1, (), 0, max(1, t - mf_dt))
        x_fake_full = jnp.concatenate([x[:, :1], x_hat], axis=1)
        x_true = jax.lax.dynamic_slice_in_dim(x, offset, min(mf_dt, t), axis=1)
        x_fake = jax.lax.dynamic_slice_in_dim(x_fake_full, offset, min(mf_dt, t), axis=1)
        b = x.shape[0]
        flat_true = x.reshape(-1, *x.shape[2:])
        flat_fake = x_hat.reshape(-1, *x_hat.shape[2:])
        i_true = jax.random.randint(r2, (n_spatial_examples,), 0, flat_true.shape[0])
        i_fake = jax.random.randint(r3, (n_spatial_examples,), 0, flat_fake.shape[0])
        return x_true, x_fake, flat_true[i_true], flat_fake[i_fake]

    def dt_loss_fn(dt_params, x_true, x_fake):
        dt_sn = materialize_spectral_norm(dt_params)
        pred_fake, _ = temp_disc(dt_sn, jax.lax.stop_gradient(x_fake))
        pred_true, _ = temp_disc(dt_sn, x_true)
        loss = 0.5 * (
            D.disc_loss(pred_fake, False, dt_spec.bce_loss)
            + D.disc_loss(pred_true, True, dt_spec.bce_loss)
        )
        gp = 0.0
        if dt_spec.gp_weight > 0:
            gp = D.gradient_penalty(lambda xx: temp_disc(dt_sn, xx), x_true)
            loss = loss + dt_spec.gp_weight * gp
        return loss, {"loss_d_dt": loss, "loss_gp_dt": gp}

    def ds_loss_fn(ds_params, f_true, f_fake):
        ds_sn = materialize_spectral_norm(ds_params)
        pred_fake, _ = patch_disc(ds_sn, jax.lax.stop_gradient(f_fake))
        pred_true, _ = patch_disc(ds_sn, f_true)
        loss = 0.5 * (
            D.disc_loss(pred_fake, False, ds_spec.bce_loss)
            + D.disc_loss(pred_true, True, ds_spec.bce_loss)
        )
        if ds_spec.gp_weight > 0:
            loss = loss + ds_spec.gp_weight * D.gradient_penalty(
                lambda xx: patch_disc(ds_sn, xx), f_true
            )
        return loss, {"loss_d_ds": loss}

    def gen_loss_fn(gen_params, dt_params, ds_params, batch, rng, crop_rng):
        x = batch["images"]
        x_hat, mu, logvar = forward_gen(gen_params, batch, rng)
        x_true, x_fake, f_true, f_fake = crops(x, x_hat, crop_rng)
        dt_sn = materialize_spectral_norm(dt_params)
        ds_sn = materialize_spectral_norm(ds_params)
        pred_fake_dt, fmap_fake = temp_disc(dt_sn, x_fake)
        _, fmap_true = temp_disc(dt_sn, x_true)
        loss_gen_dt = D.gen_loss(pred_fake_dt, dt_spec.bce_loss)
        loss_fmap = D.fmap_loss(fmap_fake, fmap_true)
        pred_fake_ds, _ = patch_disc(ds_sn, f_fake)
        loss_gen_ds = D.gen_loss(pred_fake_ds, ds_spec.bce_loss)

        flat_tgt = x[:, 1:].reshape(-1, *x.shape[2:])
        flat_hat = x_hat.reshape(-1, *x_hat.shape[2:])
        loss_vgg = vgg_loss_chunked(flat_tgt, flat_hat)
        loss_l1 = l1(x[:, 1:], x_hat)
        loss_kl = 0.0 if fs_spec.deterministic else kl_divergence(mu, logvar)
        loss = (
            dt_spec.gen_weight * loss_gen_dt
            + dt_spec.fmap_weight * loss_fmap
            + ds_spec.gen_weight * loss_gen_ds
            + w_vgg * loss_vgg + w_l1 * loss_l1 + w_kl * loss_kl
        )
        return loss, {
            "loss": loss, "loss_g_t": loss_gen_dt, "loss_g_s": loss_gen_ds,
            "loss_fmap_t": loss_fmap, "l_vgg": loss_vgg, "l_rec": loss_l1, "l_kl": loss_kl,
        }

    def train_step(state: GanTrainState, batch, rng):
        x = batch["images"]
        r_fwd, r_crop, r_gen = jax.random.split(rng, 3)

        # shared generator forward for the disc updates (stop-gradient)
        x_hat, _, _ = forward_gen(state.gen_params, batch, r_fwd)
        x_hat = jax.lax.stop_gradient(x_hat)
        x_true, x_fake, f_true, f_fake = crops(x, x_hat, r_crop)

        (dt_l, dt_logs), dt_g = jax.value_and_grad(dt_loss_fn, has_aux=True)(
            state.dt_params, x_true, x_fake
        )
        dt_up, dt_opt = optimizers["dt"].update(dt_g, state.dt_opt, state.dt_params)
        dt_params = optax.apply_updates(state.dt_params, dt_up)
        dt_params = refresh_spectral_u(dt_params)

        (ds_l, ds_logs), ds_g = jax.value_and_grad(ds_loss_fn, has_aux=True)(
            state.ds_params, f_true, f_fake
        )
        ds_up, ds_opt = optimizers["ds"].update(ds_g, state.ds_opt, state.ds_params)
        ds_params = optax.apply_updates(state.ds_params, ds_up)
        ds_params = refresh_spectral_u(ds_params)

        (g_l, g_logs), g_g = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params, dt_params, ds_params, batch, r_fwd, r_crop
        )
        g_up, g_opt = optimizers["gen"].update(g_g, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_up)

        metrics = {**dt_logs, **ds_logs, **g_logs}
        new_state = GanTrainState(
            state.step + 1, gen_params, ds_params, dt_params, g_opt, ds_opt, dt_opt
        )
        return new_state, metrics

    return train_step
