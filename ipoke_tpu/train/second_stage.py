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


def torch_adam(schedule, weight_decay: float = 0.0, amsgrad: bool = False,
               b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """torch.optim.Adam semantics: COUPLED L2 (wd*param added to the GRADIENT
    before the moment updates), optional amsgrad — the reference's optimizer
    (second_stage_video.py:648-662).  optax.adamw's decoupled decay is a
    silent semantic change; kept available via use_adamw."""
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(
        _scale_by_torch_amsgrad(b1, b2, eps) if amsgrad
        else optax.scale_by_adam(b1=b1, b2=b2, eps=eps)
    )
    steps.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*steps)


def _scale_by_torch_amsgrad(b1, b2, eps):
    """torch.optim.Adam(amsgrad=True) update: the max is over the RAW second
    moment, bias correction divides the max (optax.scale_by_amsgrad maxes the
    bias-corrected moment — different trajectory)."""

    class State(NamedTuple):
        count: jnp.ndarray
        mu: dict
        nu: dict
        nu_max: dict

    def init(params):
        z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return State(jnp.zeros((), jnp.int32), z(), z(), z())

    def update(grads, state, params=None):
        count = state.count + 1
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        nu_max = jax.tree_util.tree_map(jnp.maximum, state.nu_max, nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        upd = jax.tree_util.tree_map(
            lambda m, vm: (m / bc1) / (jnp.sqrt(vm / bc2) + eps), mu, nu_max
        )
        return upd, State(count, mu, nu, nu_max)

    return optax.GradientTransformation(init, update)


def make_optimizer(
    params_trainable,
    lr: float,
    weight_decay: float = 1e-5,
    warmup_steps: int = 500,
    total_steps: int = 200_000,
    clip_grad_norm: float = 0.0,
    use_adabelief: bool = False,
    use_adamw: bool = False,
    amsgrad: bool = False,
):
    from ipoke_tpu.train.lr import second_stage_schedule

    schedule = second_stage_schedule(lr, warmup_steps, total_steps)
    if use_adabelief:
        opt = optax.adabelief(schedule)
    elif use_adamw:
        opt = optax.adamw(schedule, weight_decay=weight_decay)
    else:
        opt = torch_adam(schedule, weight_decay=weight_decay, amsgrad=amsgrad)
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
    compute_dtype=None,
):
    """Returns a jittable ``train_step(state, batch, rng) -> (state, metrics)``.

    batch['images']: (B, T, S, S, 3); batch['poke']: (B, S, S, 2).
    With n_microbatches > 1 the batch is split along axis 0 and gradients are
    averaged by a lax.scan (grad accumulation stays on-device).

    ``compute_dtype`` (e.g. jnp.bfloat16): mixed precision — master params
    stay f32, the forward computes in the given dtype (the cast is inside the
    loss so grads come back f32; logdet/NLL accumulate in f32 regardless,
    flows/transforms.py).
    """
    from ipoke_tpu.nn.core import Policy

    policy = Policy(compute_dtype) if compute_dtype is not None else None

    def loss_fn(trainable, micro, rng):
        params = {**frozen_params, **trainable}
        if policy is not None:
            params = policy.cast(params)
            micro = policy.cast(micro)
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


def shard_train_setup(mesh, state: TrainState, step_fn, param_shardings=None,
                      zero_opt: bool = True, donate: bool = True,
                      zero_min_size: int = 8192, fsdp: bool = False):
    """Place a TrainState on a mesh and jit ``step_fn`` with matching
    shardings.

    params: replicated by default; ``param_shardings`` overrides (tensor
    parallelism); ``fsdp=True`` shards every large param leaf over 'data'
    (ZeRO-3 — GSPMD inserts the just-in-time all-gathers and gradient
    reduce-scatters), composing with any TP ``param_shardings``;
    opt_state: ZeRO-1 sharded over 'data' when ``zero_opt`` (full-depth Adam
    training then fits >=2 chips: params 4.2GB + grads 4.2GB + 8.4/n GB);
    batch: sharded over 'data' (XLA derives it from the loss — we pin it at
    call sites via parallel.mesh.shard_batch).

    Returns (placed_state, jitted_step).
    """
    from ipoke_tpu.parallel import mesh as pmesh
    from ipoke_tpu.parallel import sharding as psh

    repl = pmesh.replicated(mesh)
    if fsdp:
        param_shardings = psh.fsdp_param_shardings(
            mesh, state.params, min_size=zero_min_size, tp_shardings=param_shardings
        )
    elif param_shardings is None:
        param_shardings = jax.tree_util.tree_map(lambda _: repl, state.params)
    opt_sh = (
        psh.zero_opt_state_shardings(mesh, state.opt_state, min_size=zero_min_size)
        if zero_opt
        else jax.tree_util.tree_map(lambda _: repl, state.opt_state)
    )
    state_sh = TrainState(step=repl, params=param_shardings, opt_state=opt_sh)
    placed = TrainState(
        step=jax.device_put(state.step, repl),
        params=psh.apply_shardings(state.params, param_shardings),
        opt_state=psh.apply_shardings(state.opt_state, opt_sh),
    )
    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sh, pmesh.batch_sharding(mesh), repl),
        out_shardings=(state_sh, None),
        donate_argnums=(0,) if donate else (),
    )
    return placed, jitted
