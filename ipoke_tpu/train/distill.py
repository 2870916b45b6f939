"""Sampling-time flow distillation (beyond-reference performance feature).

The sequential MCF inverse dominates sampling latency (NOTES.md: ~170 ms of
the 276 ms batch-128 step; per-row-step overhead-bound — bf16 is a no-win and
Pallas fusion cannot compile via this environment's remote service).  The
remaining lever is algorithmic: fewer (or zero) sequential row scans.  Two
student families, both trained from an already-trained second-stage teacher
with the first stage and conditioning encoders frozen and shared:

* ``kind='flow'`` — a genuine invertible flow with fewer MaCow steps
  (reverse cost scales linearly with total step count).  Trained by maximum
  likelihood on the teacher's *sampling* distribution: draw z, run the
  teacher's reverse once (no gradients), then fit the student with its fully
  parallel forward pass — no backprop ever touches a sequential inverse.
  Keeps exact densities, so test modes that need likelihoods still work.

* ``kind='direct'`` — a feedforward conv sampler ``(z, cond) -> motion``
  trained by MSE against the teacher's reverse output, in the spirit of the
  one-step distillation used for diffusion/consistency models.  Sampling
  becomes one parallel conv stack (no row scans at all: the 170 ms reverse
  collapses into MXU-friendly convs); density evaluation is given up, so
  this student is a serving-path accelerator only.

The reference has no equivalent — it always samples through the full cINN
inverse (second_stage_video.py:418-447 sampling paths).  Quality of a
distilled student must be validated against real teacher weights (FVD delta
vs the teacher's samples) once checkpoints are mounted; the tests here pin
the machinery: losses fall, students are cheaper, the flow student stays a
bijection.
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ipoke_tpu.flows import transformer
from ipoke_tpu.flows.loss import flow_loss
from ipoke_tpu.models import second_stage
from ipoke_tpu.nn import blocks
from ipoke_tpu.nn.core import depth_to_space, space_to_depth


# ---------------------------------------------------------------------------
# Student specs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DirectStudentSpec:
    """Feedforward sampler: conv-in -> N residual blocks -> conv-out."""

    hidden: int = 256
    depth: int = 6
    kind: str = "direct"


def flow_student_spec(teacher_flow, num_steps: Tuple[int, ...]):
    """An invertible student: the teacher's FlowSpec with fewer steps.

    Channels/conditioning stay identical so the student consumes the same
    cond tensor and produces the same motion geometry; only the step count
    (= number of sequential MCF inverses at sample time) shrinks.
    """
    if transformer._is_stack(teacher_flow):
        raise ValueError(
            "flow students of a MultiscaleStack teacher are not supported; "
            "distill each block or use a plain FlowSpec teacher"
        )
    if len(num_steps) != len(teacher_flow.num_steps):
        raise ValueError(
            f"student must keep the teacher's level count "
            f"({len(teacher_flow.num_steps)}), got {len(num_steps)}"
        )
    return replace(teacher_flow, num_steps=tuple(num_steps))


# ---------------------------------------------------------------------------
# Direct student network
# ---------------------------------------------------------------------------

def init_direct(key, spec: second_stage.SecondStageSpec, ds: DirectStudentSpec):
    c_z = spec.flow_in_channels
    c_h = spec.h_channels
    c_out = spec.flow_in_channels
    ks = jax.random.split(key, ds.depth + 2)
    p = {
        "conv_in": blocks.init_conv2d_block(ks[0], c_z + c_h, ds.hidden, 3),
        "res": [
            blocks.init_res_block(ks[i + 1], ds.hidden, ds.hidden, norm="group")
            for i in range(ds.depth)
        ],
        "conv_out": blocks.init_conv2d_block(ks[-1], ds.hidden, c_out, 3),
    }
    return p


def _z_at_motion_geometry(flow_spec, z):
    """Map the Gaussian draw (post-reshape geometry for stack flows —
    transformer.reverse_input_shape) to the motion-latent geometry the
    direct student operates at."""
    if transformer._is_stack(flow_spec) and flow_spec.reshape != "none":
        if flow_spec.reshape == "down":
            return depth_to_space(z, 2)
        return space_to_depth(z, 2)
    return z


def direct_apply(p, ds: DirectStudentSpec, z, cond):
    x = jnp.concatenate([z, cond.astype(z.dtype)], axis=-1)
    x = blocks.conv2d_block_apply(p["conv_in"], x, padding=1, act="elu")
    for rp in p["res"]:
        x = blocks.res_block_apply(rp, x, norm="group")
    return blocks.conv2d_block_apply(p["conv_out"], x, padding=1, act="none")


# ---------------------------------------------------------------------------
# Teacher sampling (frozen)
# ---------------------------------------------------------------------------

def teacher_motion(params, spec: second_stage.SecondStageSpec, z, cond):
    """One frozen teacher reverse pass: the target motion latent."""
    m = transformer.reverse(params["flow"], spec.flow, z, cond)
    return jax.lax.stop_gradient(m)


# ---------------------------------------------------------------------------
# Losses + train steps
# ---------------------------------------------------------------------------

def direct_loss(student_params, ds, params, spec, z, cond):
    m_t = teacher_motion(params, spec, z, cond)
    m_s = direct_apply(student_params, ds, _z_at_motion_geometry(spec.flow, z), cond)
    # A sharply-trained teacher's sequential reverse can blow up on rare
    # N(0,1) draws (observed 2026-08-20: ONE non-finite example in the
    # step-0 batch poisoned Adam state permanently — every later step NaN).
    # Distill on the support where the teacher is defined: mask non-finite
    # teacher examples out of the MSE and report the finite fraction.  The
    # mask is applied to m_t BEFORE the subtraction — a where() on the loss
    # alone still back-propagates 0 * NaN = NaN through the masked branch.
    m_t = m_t.astype(jnp.float32)
    reduce_axes = tuple(range(1, m_t.ndim))
    finite = jnp.isfinite(m_t).all(axis=reduce_axes)  # (B,)
    m_t_safe = jnp.where(jnp.isfinite(m_t), m_t, 0.0)
    per_ex = jnp.mean((m_s.astype(jnp.float32) - m_t_safe) ** 2,
                      axis=reduce_axes)
    n_finite = finite.sum()
    mse = (per_ex * finite).sum() / jnp.maximum(n_finite, 1)
    # an all-NaN teacher batch must still surface, not read as mse=0
    mse = jnp.where(n_finite > 0, mse, jnp.nan)
    return mse, {"distill_mse": mse,
                 "teacher_finite_frac": finite.mean()}


def flow_student_loss(student_params, s_spec, params, spec, z, cond):
    """MLE of the student on teacher samples (parallel forward only)."""
    m_t = teacher_motion(params, spec, z, cond)
    out, logdet = transformer.forward(student_params, s_spec, m_t, cond)
    loss, logs = flow_loss(out, logdet)
    return loss, logs


def make_distill_step(spec, student, optimizer):
    """Returns (init_state, step).
    ``step(state, teacher_params, z, cond) -> (state, logs)``.

    ``student`` is either a DirectStudentSpec or a student FlowSpec (from
    flow_student_spec).  The frozen teacher is an ARGUMENT of step, not a
    closure: closed-over params are baked into the jitted graph as
    constants (4.2 GB for the flagship teacher — bloats lowering, compile
    and HBM); as an argument they stay a donatable device buffer.
    """
    is_direct = isinstance(student, DirectStudentSpec)
    if not is_direct:
        # integer Shuffle permutation buffers in flow students are frozen
        from ipoke_tpu.train.second_stage import _float_labels

        optimizer = optax.multi_transform(
            {"train": optimizer, "freeze": optax.set_to_zero()}, _float_labels
        )

    def loss_fn(sp, teacher_params, z, cond):
        if is_direct:
            return direct_loss(sp, student, teacher_params, spec, z, cond)
        return flow_student_loss(sp, student, teacher_params, spec, z, cond)

    def init_state(key):
        if is_direct:
            sp = init_direct(key, spec, student)
        else:
            sp = transformer.init(key, student)
        return {"params": sp, "opt": optimizer.init(sp), "step": jnp.zeros((), jnp.int32)}

    def step(state, teacher_params, z, cond):
        # allow_int + sanitize: flow students carry integer Shuffle
        # permutation buffers (same handling as train/second_stage.py)
        from ipoke_tpu.train.second_stage import sanitize_int_grads

        (loss, logs), grads = jax.value_and_grad(
            loss_fn, has_aux=True, allow_int=True
        )(state["params"], teacher_params, z, cond)
        grads = sanitize_int_grads(grads, state["params"])
        updates, opt = optimizer.update(grads, state["opt"], state["params"])
        params_new = optax.apply_updates(state["params"], updates)
        return (
            {"params": params_new, "opt": opt, "step": state["step"] + 1},
            {**logs, "loss": loss},
        )

    return init_state, step


# ---------------------------------------------------------------------------
# Student sampling path (mirrors second_stage.forward_sample)
# ---------------------------------------------------------------------------

def forward_sample_student(
    params,
    student_params,
    student,
    spec: second_stage.SecondStageSpec,
    batch,
    rng,
    n_samples: int = 1,
    length: Optional[int] = None,
    add_first_frame: bool = False,
    z: Optional[jax.Array] = None,
):
    """Teacher's embed/decode with the student replacing the flow reverse.
    Returns (n_samples, B, T, S, S, 3), same contract as forward_sample —
    including the optional caller-fixed ``z`` (the serving batcher's
    batch-composition-invariance contract and the AOT artifact exporter's
    input signature, serve/{batcher,artifact}.py)."""
    is_direct = isinstance(student, DirectStudentSpec)
    x = batch["images"]
    poke = batch["flow"] if spec.use_flow_as_poke else batch["poke"]
    x0 = x[:, 0]
    cond = second_stage.embed_cond(params, spec, x0, poke)
    b = x.shape[0]
    s = spec.latent_size
    if length is None:
        length = x.shape[1] - 1
    flow_spec = spec.flow if is_direct else student
    z_shape = transformer.reverse_input_shape(flow_spec, b, s, spec.flow_in_channels)

    def one(key, z_fixed=None):
        z = (jax.random.normal(key, z_shape, x.dtype)
             if z_fixed is None else z_fixed.astype(x.dtype))
        if is_direct:
            motion = direct_apply(
                student_params, student, _z_at_motion_geometry(spec.flow, z), cond
            )
        else:
            motion = transformer.reverse(student_params, student, z, cond)
        if spec.augment_channels:
            motion = motion[..., : -spec.augment_channels]
        vid = second_stage.decode_first_stage(params, spec, motion, x0, length)
        if add_first_frame:
            vid = jnp.concatenate([x0[:, None], vid], axis=1)
        return vid

    if z is not None:
        zs = z if z.ndim == len(z_shape) + 1 else z[None]
        return jax.vmap(lambda zz: one(None, zz))(zs)
    keys = jax.random.split(rng, n_samples)
    if n_samples == 1:
        return one(keys[0])[None]
    return jax.vmap(one)(keys)
