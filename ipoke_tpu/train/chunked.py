"""Compile-bounded full-depth flow training.

One jitted train step over the full 56-step flow produces an XLA graph large
enough to exhaust this environment's compiler; this module instead chains
PER-LEVEL jitted forward and VJP functions (15 modest compiles), exploiting
the multi-scale factorization's analytic loss structure:

  loss = mean_B[ 0.5 * sum(z^2) ] - w * mean_B[ logdet ],
  z    = concat(final, z2_{L-1}, ..., z2_0)

so the cotangent of each factored-out z2_i is z2_i / B, of the final carry is
final / B, and of each level's logdet is -w / B — no global backward pass is
needed: each level's gradient is an independent VJP given the carry cotangent
chained from the deeper level.  Level backwards recompute their forward
(remat at level granularity), bounding live activations to one level.

Grad-accumulation across levels costs 2L small dispatches per step
(negligible vs the ~100ms step).  Conditioning h is a stop-gradient input
(the towers are frozen), so no cotangent flows into it.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ipoke_tpu.flows import macow, permute
from ipoke_tpu.flows.macow import FlowSpec
from ipoke_tpu.flows.nice import nice_channels


def _level_forward(level_params, x, h, spec: FlowSpec, level_idx: int):
    """One multi-scale level: steps -> prior -> shuffle -> split.
    Returns (z1_carry, z2_out, logdet)."""
    chans = spec.level_channels()
    factors = spec.level_factors()
    cs = spec.in_channels // spec.factor
    c = chans[level_idx]
    f = factors[level_idx]
    out, ld = macow._steps_forward(level_params["steps"], x, h, spec)
    out, l = macow.prior_forward(level_params["prior"], out, h, f, spec)
    ld = ld + l
    out, l = macow._perm_fwd(level_params["shuffle"], out, spec)
    ld = ld + l
    z1c = c - cs
    return out[..., :z1c], out[..., z1c:], ld


class _LevelFns:
    """Per-level jitted forward + vjp-backward, cached per (spec, level)."""

    def __init__(self, spec: FlowSpec):
        self.spec = spec
        self._fwd = {}
        self._bwd = {}

    def fwd(self, i):
        if i not in self._fwd:
            spec = self.spec

            @jax.jit
            def f(p, x, h):
                return _level_forward(p, x, h, spec, i)

            self._fwd[i] = f
        return self._fwd[i]

    def bwd(self, i):
        if i not in self._bwd:
            spec = self.spec

            @jax.jit
            def b(p, x, h, cot_z1, cot_z2, cot_ld):
                def f(pp, xx):
                    return _level_forward(pp, xx, h, spec, i)

                _, vjp = jax.vjp(f, p, x)
                gp, gx = vjp((cot_z1, cot_z2, cot_ld))
                from ipoke_tpu.train.second_stage import sanitize_int_grads

                return sanitize_int_grads(gp, p), gx

            self._bwd[i] = b
        return self._bwd[i]


def flow_loss_and_grads(level_fns: _LevelFns, flow_params, x, h,
                        logdet_weight=1.0, spatial_mean=False):
    """Returns (loss, grads_for_flow_params, aux).  x: (B,s,s,C) motion
    latent (stop-grad upstream), h: conditioning (frozen)."""
    spec = level_fns.spec
    n_levels = len(spec.num_steps)
    b = x.shape[0]
    hw = x.shape[1] * x.shape[2]
    nll_scale = 1.0 / (b * (hw if spatial_mean else 1))
    ld_scale = logdet_weight / (b * (hw if spatial_mean else 1))

    # forward chain, saving each level's input
    xs = []
    carry = x
    z2s = []
    lds = []
    for i in range(n_levels):
        xs.append(carry)
        carry, z2, ld = level_fns.fwd(i)(flow_params["levels"][i], carry, h)
        z2s.append(z2)
        lds.append(ld)

    nll = 0.5 * (
        jnp.sum(carry.astype(jnp.float32) ** 2)
        + sum(jnp.sum(z.astype(jnp.float32) ** 2) for z in z2s)
    ) * nll_scale
    logdet_total = sum(jnp.sum(l.astype(jnp.float32)) for l in lds)
    loss = nll - ld_scale * logdet_total

    # backward chain: carry cotangent flows from the deepest level back
    cot_carry = carry * nll_scale
    grads_levels = [None] * n_levels
    for i in reversed(range(n_levels)):
        cot_z2 = z2s[i] * nll_scale
        cot_ld = jnp.full((b,), -ld_scale, jnp.float32)
        gp, gx = level_fns.bwd(i)(flow_params["levels"][i], xs[i], h, cot_carry, cot_z2, cot_ld)
        grads_levels[i] = gp
        cot_carry = gx
    return loss, {"levels": grads_levels}, {"nll": nll, "logdet": logdet_total / b}


class ChunkedTrainState(NamedTuple):
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState


def make_chunked_trainer(spec_flow: FlowSpec, full_spec, frozen_params, optimizer,
                         logdet_weight=1.0, spatial_mean=False):
    """Full train step split into: jitted embed (frozen towers), per-level
    fwd/bwd chain, jitted optimizer update.  ``full_spec``: SecondStageSpec."""
    from ipoke_tpu.models import second_stage as model_ss

    level_fns = _LevelFns(spec_flow)

    @jax.jit
    def embed(frozen, batch):
        params = dict(frozen)
        cond = model_ss.embed_cond(params, full_spec, batch["images"][:, 0], batch["poke"])
        motion, _ = model_ss.encode_first_stage(params, full_spec, batch["images"])
        return motion, cond

    @jax.jit
    def apply_updates(params, grads, opt_state):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def train_step(state: ChunkedTrainState, batch, rng=None):
        motion, cond = embed(frozen_params, batch)
        loss, grads, aux = flow_loss_and_grads(
            level_fns, state.params["flow"], motion, cond,
            logdet_weight=logdet_weight, spatial_mean=spatial_mean,
        )
        full_grads = {"flow": grads}
        params, opt_state = apply_updates(state.params, full_grads, state.opt_state)
        metrics = {"flow_loss": loss, "nll_loss": aux["nll"], "nlogdet_loss": -aux["logdet"]}
        return ChunkedTrainState(state.step + 1, params, opt_state), metrics

    train_step._jitted = True  # already composed of jitted pieces; must NOT be re-jitted whole
    return train_step


# ---------------------------------------------------------------------------
# per-level-optimizer variant: the flagship flow holds 4.2 GB of parameters
# (Adam state 8.4 GB); accumulating grads for ALL levels before one global
# update needs params + opt + grads = 16.9 GB > 15.75 GB HBM.  Updating each
# level immediately after its VJP keeps only ONE level's grads live
# (~13 GB peak).  Adam is element-wise, so per-level updates are exactly
# equivalent to the global update (no global-norm clipping in this mode).
# ---------------------------------------------------------------------------

class PerLevelTrainState(NamedTuple):
    step: jnp.ndarray
    levels: list          # per-level param trees
    opt_states: list      # per-level optax states


def make_per_level_trainer(spec_flow: FlowSpec, full_spec, frozen_params, make_opt,
                           logdet_weight=1.0, spatial_mean=False):
    """``make_opt(level_params) -> optax.GradientTransformation`` (fresh per
    level; schedules advance in lockstep since every level updates each step).
    """
    from ipoke_tpu.models import second_stage as model_ss

    level_fns = _LevelFns(spec_flow)
    n_levels = len(spec_flow.num_steps)
    opts = {}

    @jax.jit
    def embed(frozen, batch):
        params = dict(frozen)
        cond = model_ss.embed_cond(params, full_spec, batch["images"][:, 0], batch["poke"])
        motion, _ = model_ss.encode_first_stage(params, full_spec, batch["images"])
        return motion, cond

    def level_update(i, level_params, grads, opt_state):
        if i not in opts:
            opts[i] = make_opt(level_params)
        if (i, "jit") not in opts:
            opt_i = opts[i]

            @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
            def upd(p, g, s):
                updates, s2 = opt_i.update(g, s, p)
                return optax.apply_updates(p, updates), s2

            opts[(i, "jit")] = upd
        return opts[(i, "jit")](level_params, grads, opt_state)

    def init_state(flow_params):
        levels = list(flow_params["levels"])
        opt_states = []
        for i, lvl in enumerate(levels):
            if i not in opts:
                opts[i] = make_opt(lvl)
            opt_states.append(opts[i].init(lvl))
        return PerLevelTrainState(jnp.zeros((), jnp.int32), levels, opt_states)

    def train_step(state: PerLevelTrainState, batch, rng=None):
        motion, cond = embed(frozen_params, batch)
        b = motion.shape[0]
        hw = motion.shape[1] * motion.shape[2]
        nll_scale = 1.0 / (b * (hw if spatial_mean else 1))
        ld_scale = logdet_weight / (b * (hw if spatial_mean else 1))
        # forward chain
        xs, z2s, lds = [], [], []
        carry = motion
        for i in range(n_levels):
            xs.append(carry)
            carry, z2, ld = level_fns.fwd(i)(state.levels[i], carry, cond)
            z2s.append(z2)
            lds.append(ld)
        nll = 0.5 * (
            jnp.sum(carry.astype(jnp.float32) ** 2)
            + sum(jnp.sum(z.astype(jnp.float32) ** 2) for z in z2s)
        ) * nll_scale
        logdet_total = sum(jnp.sum(l.astype(jnp.float32)) for l in lds)
        loss = nll - ld_scale * logdet_total
        # backward chain with immediate per-level updates
        cot_carry = carry * nll_scale
        new_levels = list(state.levels)
        new_opts = list(state.opt_states)
        for i in reversed(range(n_levels)):
            cot_z2 = z2s[i] * nll_scale
            cot_ld = jnp.full((b,), -ld_scale, jnp.float32)
            gp, gx = level_fns.bwd(i)(state.levels[i], xs[i], cond, cot_carry, cot_z2, cot_ld)
            new_levels[i], new_opts[i] = level_update(i, state.levels[i], gp, state.opt_states[i])
            cot_carry = gx
        metrics = {"flow_loss": loss, "nll_loss": nll, "nlogdet_loss": -logdet_total / b}
        return PerLevelTrainState(state.step + 1, new_levels, new_opts), metrics

    train_step._jitted = True
    train_step.init_state = init_state
    return train_step
