"""Second-stage (cINN) training: single optimizer, NLL + logdet loss
(reference: second_stage_video.py:409-452, experiments/second_stage_video.py).

Only the flow (+ augment scale/shift + spatial adapters) trains; first stage
and conditioning towers are frozen (stop_gradient inside the model +
parameter partition here).

Data-parallel: batch sharded over the mesh 'data' axis, params replicated;
jit inserts the gradient psum over ICI.  Gradient accumulation (the
reference's accumulate_grad_batches) is a lax.scan over microbatches inside
the jitted step.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ipoke_tpu.flows.loss import flow_loss
from ipoke_tpu.models import second_stage
from ipoke_tpu.models.second_stage import SecondStageSpec

TRAINABLE_KEYS = ("flow", "scale_augment", "shift_augment", "conv_adapt_poke_emb", "conv_adapt_cond")


def split_params(params):
    trainable = {k: params[k] for k in TRAINABLE_KEYS if k in params}
    frozen = {k: v for k, v in params.items() if k not in TRAINABLE_KEYS}
    return trainable, frozen


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: dict          # trainable subtree
    opt_state: optax.OptState


def _float_labels(params):
    """'train' for float leaves, 'freeze' for integer buffers (Shuffle
    permutation indices live inside the flow tree and must never be touched
    by the optimizer or gradients)."""
    return jax.tree_util.tree_map(
        lambda p: "train" if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating) else "freeze",
        params,
    )


def sanitize_int_grads(grads, params):
    """Replace float0 gradients (from allow_int=True) with integer zeros."""
    return jax.tree_util.tree_map(
        lambda g, p: jnp.zeros_like(p) if jax.dtypes.result_type(g) == jax.dtypes.float0 else g,
        grads,
        params,
    )


def make_optimizer(
    params_trainable,
    lr: float,
    weight_decay: float = 1e-5,
    warmup_steps: int = 500,
    total_steps: int = 200_000,
    clip_grad_norm: float = 0.0,
    use_adabelief: bool = False,
):
    from ipoke_tpu.train.lr import second_stage_schedule

    schedule = second_stage_schedule(lr, warmup_steps, total_steps)
    opt = (
        optax.adabelief(schedule) if use_adabelief
        else optax.adamw(schedule, weight_decay=weight_decay)
    )
    if clip_grad_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(clip_grad_norm), opt)
    return optax.multi_transform(
        {"train": opt, "freeze": optax.set_to_zero()}, _float_labels(params_trainable)
    )


def make_train_step(
    spec: SecondStageSpec,
    frozen_params,
    optimizer,
    spatial_mean: bool = False,
    logdet_weight: float = 1.0,
    n_microbatches: int = 1,
):
    """Returns a jittable ``train_step(state, batch, rng) -> (state, metrics)``.

    batch['images']: (B, T, S, S, 3); batch['poke']: (B, S, S, 2).
    With n_microbatches > 1 the batch is split along axis 0 and gradients are
    averaged by a lax.scan (grad accumulation stays on-device).
    """

    def loss_fn(trainable, micro, rng):
        params = {**frozen_params, **trainable}
        out, logdet, _ = second_stage.forward_density(params, spec, micro, rng=rng)
        loss, logs = flow_loss(
            out, logdet, key=rng, spatial_mean=spatial_mean, logdet_weight=logdet_weight
        )
        return loss, logs

    raw_grad_fn = jax.value_and_grad(loss_fn, has_aux=True, allow_int=True)

    def grad_fn(trainable, micro, rng):
        (loss, logs), grads = raw_grad_fn(trainable, micro, rng)
        return (loss, logs), sanitize_int_grads(grads, trainable)

    def train_step(state: TrainState, batch, rng):
        if n_microbatches > 1:
            micros = jax.tree_util.tree_map(
                lambda x: x.reshape((n_microbatches, x.shape[0] // n_microbatches) + x.shape[1:]),
                batch,
            )
            keys = jax.random.split(rng, n_microbatches)

            def scan_body(carry, xs):
                acc_grads, acc_loss = carry
                micro, key = xs
                (loss, logs), grads = grad_fn(state.params, micro, key)
                acc = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                return (acc, acc_loss + loss), logs

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss_sum), logs = jax.lax.scan(
                scan_body, (zero, jnp.zeros(())), (micros, keys)
            )
            grads = jax.tree_util.tree_map(lambda g: g / n_microbatches, grads)
            logs = jax.tree_util.tree_map(lambda a: a[-1], logs)
            loss = loss_sum / n_microbatches
        else:
            (loss, logs), grads = grad_fn(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(logs)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step


def init_state(params_trainable, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params_trainable,
        opt_state=optimizer.init(params_trainable),
    )
