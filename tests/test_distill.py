"""Distillation machinery (train/distill.py): losses fall under training,
the direct student has zero sequential row scans, the flow student keeps an
exact inverse, and the student sampling path matches forward_sample's
contract.  Beyond-reference feature — see the module docstring."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ipoke_tpu.flows import transformer
from ipoke_tpu.flows.macow import FlowSpec
from ipoke_tpu.models import second_stage
from ipoke_tpu.models.encoders import WrapperSpec
from ipoke_tpu.models.first_stage import FirstStageSpec
from ipoke_tpu.models.second_stage import SecondStageSpec
from ipoke_tpu.train import distill

B, T, S = 2, 4, 64

FS_SPEC = FirstStageSpec(
    z_dim=16,
    spatial_size=S,
    max_frames=T,
    enc_channels=(16, 16, 16, 16),
    dec_channels=(16, 16, 16, 16),
    n_gru_layers=2,
    min_spatial_size=8,
    motion_bias=True,
    full_sequence=True,
)
POKE_SPEC = WrapperSpec(nf_in=2, nf_max=16, spatial_size=S, min_spatial_size=8,
                        deterministic=True)
COND_SPEC = WrapperSpec(nf_in=3, nf_max=16, spatial_size=S, min_spatial_size=8,
                        deterministic=False)


def _spec():
    flow = FlowSpec(num_steps=(2, 2), in_channels=16, hidden_channels=32,
                    h_channels=32, factor=16)
    return SecondStageSpec(flow=flow, first_stage=FS_SPEC,
                           poke_embedder=POKE_SPEC, conditioner=COND_SPEC)


@pytest.fixture(scope="module")
def teacher():
    spec = _spec()
    params = second_stage.init(jax.random.PRNGKey(0), spec)
    batch = {
        "images": jax.random.normal(jax.random.PRNGKey(1), (B, T, S, S, 3)),
        "poke": jax.random.normal(jax.random.PRNGKey(2), (B, S, S, 2)),
    }
    cond = second_stage.embed_cond(params, spec, batch["images"][:, 0], batch["poke"])
    return spec, params, batch, cond


def _zs(spec, n, seed=3):
    shape = transformer.reverse_input_shape(spec.flow, B, spec.latent_size,
                                            spec.flow_in_channels)
    return jax.random.normal(jax.random.PRNGKey(seed), (n,) + shape)


def test_direct_student_loss_falls(teacher):
    spec, params, _, cond = teacher
    ds = distill.DirectStudentSpec(hidden=32, depth=2)
    opt = optax.adam(1e-3)
    init_state, step = distill.make_distill_step(spec, ds, opt)
    state = init_state(jax.random.PRNGKey(7))
    jstep = jax.jit(step)
    zs = _zs(spec, 30)
    first = last = None
    for i in range(30):
        state, logs = jstep(state, params, zs[i], cond)
        if first is None:
            first = float(logs["loss"])
        last = float(logs["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < 0.7 * first, (first, last)


def test_flow_student_loss_falls_and_inverts(teacher):
    spec, params, _, cond = teacher
    s_spec = distill.flow_student_spec(spec.flow, (1, 1))
    assert s_spec.num_steps == (1, 1)
    opt = optax.adam(1e-3)
    init_state, step = distill.make_distill_step(spec, s_spec, opt)
    state = init_state(jax.random.PRNGKey(8))
    jstep = jax.jit(step)
    zs = _zs(spec, 25, seed=4)
    losses = []
    for i in range(25):
        state, logs = jstep(state, params, zs[i], cond)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    # the trained student is still an exact bijection
    m = jax.random.normal(jax.random.PRNGKey(9),
                          (B, spec.latent_size, spec.latent_size,
                           spec.flow_in_channels))
    out, _ = transformer.forward(state["params"], s_spec, m, cond)
    m2 = transformer.reverse(state["params"], s_spec, out, cond)
    np.testing.assert_allclose(m, m2, rtol=2e-4, atol=2e-4)


def test_flow_student_spec_guards():
    flow = FlowSpec(num_steps=(2, 2), in_channels=16, hidden_channels=32,
                    h_channels=32)
    with pytest.raises(ValueError):
        distill.flow_student_spec(flow, (1, 1, 1))


def test_direct_sampling_path_contract(teacher):
    spec, params, batch, _ = teacher
    ds = distill.DirectStudentSpec(hidden=32, depth=2)
    sp = distill.init_direct(jax.random.PRNGKey(10), spec, ds)
    vids = distill.forward_sample_student(
        params, sp, ds, spec, batch, jax.random.PRNGKey(11), n_samples=2,
        add_first_frame=True,
    )
    ref = second_stage.forward_sample(params, spec, batch, jax.random.PRNGKey(11),
                                      n_samples=2, add_first_frame=True)
    assert vids.shape == ref.shape
    assert bool(jnp.all(jnp.isfinite(vids)))


def test_direct_student_is_scan_free(teacher):
    """The direct student's sampling jaxpr must contain no while/scan —
    that's the entire point (no sequential row inverses)."""
    spec, params, _, cond = teacher
    ds = distill.DirectStudentSpec(hidden=32, depth=2)
    sp = distill.init_direct(jax.random.PRNGKey(12), spec, ds)
    z = _zs(spec, 1)[0]
    jaxpr = jax.make_jaxpr(
        lambda s, zz, c: distill.direct_apply(s, ds, zz, c)
    )(sp, z, cond)
    prims = {eqn.primitive.name for eqn in jaxpr.jaxpr.eqns}
    assert "while" not in prims and "scan" not in prims, prims


def test_flow_student_sampling_path(teacher):
    spec, params, batch, _ = teacher
    s_spec = distill.flow_student_spec(spec.flow, (1, 1))
    sp = transformer.init(jax.random.PRNGKey(13), s_spec)
    vids = distill.forward_sample_student(
        params, sp, s_spec, spec, batch, jax.random.PRNGKey(14), n_samples=1,
    )
    assert vids.shape == (1, B, T - 1, S, S, 3)
    assert bool(jnp.all(jnp.isfinite(vids)))


def test_direct_loss_masks_nonfinite_teacher(teacher, monkeypatch):
    """A non-finite teacher reverse on SOME batch examples must not poison
    the student: loss and grads stay finite, the bad example is masked out
    of the MSE, and the finite fraction is reported (the 2026-08-20 failure:
    one NaN example at step 0 NaN'd Adam state permanently)."""
    spec, params, _, cond = teacher
    ds = distill.DirectStudentSpec(hidden=32, depth=2)

    real_teacher_motion = distill.teacher_motion

    def poisoned(params, spec_, z, cond_):
        m = real_teacher_motion(params, spec_, z, cond_)
        return m.at[0].set(jnp.nan)  # example 0 blows up

    monkeypatch.setattr(distill, "teacher_motion", poisoned)
    opt = optax.adam(1e-3)
    init_state, step = distill.make_distill_step(spec, ds, opt)
    state = init_state(jax.random.PRNGKey(20))
    zs = _zs(spec, 3, seed=21)
    for i in range(3):
        state, logs = step(state, params, zs[i], cond)
        assert np.isfinite(float(logs["distill_mse"])), i
        assert float(logs["teacher_finite_frac"]) == pytest.approx(1 - 1 / B)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(state["params"]))

    # an ALL-non-finite teacher batch must still surface as NaN, not mse=0
    monkeypatch.setattr(distill, "teacher_motion",
                        lambda *a: jnp.full_like(real_teacher_motion(*a), jnp.nan))
    _, logs = step(state, params, zs[0], cond)
    assert np.isnan(float(logs["distill_mse"]))
