"""Sequence-parallel motion encoder (parallel/seqpar.py): exactness of the
halo-exchange + global-GroupNorm + psum-reduce protocol against the dense
encoder, on the virtual CPU mesh, composed with a data axis.

Reference context: the reference has no SP/CP (SURVEY §2.10); this is the
TPU-native long-video scaling extension, so the contract is equality with
the dense ipoke_tpu.models.motion_encoder.apply.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ipoke_tpu.models import motion_encoder
from ipoke_tpu.models.motion_encoder import MotionEncoderSpec
from ipoke_tpu.parallel import seqpar

SPEC = MotionEncoderSpec(
    channels=(16, 16, 16, 16),
    z_dim=8,
    spatial_size=32,
    max_frames=8,
    min_spatial_size=8,
    full_seq=True,
    deterministic=False,
)
T, B = 64, 2


def _mesh(shape, axes):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, axes)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = motion_encoder.init(key, SPEC)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 32, 32, 3))
    return params, x


def test_plan_check():
    assert seqpar.temporal_strides(SPEC) == [2, 2, 2, 2]
    seqpar.check_plan(SPEC, 64, 4)
    with pytest.raises(ValueError):
        seqpar.check_plan(SPEC, 10, 4)  # not divisible
    with pytest.raises(ValueError):
        seqpar.check_plan(SPEC, 32, 4)  # local T odd mid-ladder


def test_forward_equality_data_x_seq(setup):
    params, x = setup
    mesh = _mesh((2, 4), ("data", "seq"))
    dense = motion_encoder.apply(params, x, SPEC)  # deterministic: (mu, mu, logvar)
    sp = jax.jit(
        lambda p, v: seqpar.encode(p, v, SPEC, mesh, batch_axis="data")
    )(params, x)
    for d, s, name in zip(dense, sp, ("z", "mu", "logvar")):
        assert s.shape == d.shape, name
        np.testing.assert_allclose(np.asarray(s), np.asarray(d), rtol=2e-4, atol=2e-5)


def test_forward_equality_seq_only_with_sampling(setup):
    params, x = setup
    mesh = _mesh((4,), ("seq",))
    rng = jax.random.PRNGKey(7)
    dense = motion_encoder.apply(params, x, SPEC, rng=rng)
    sp = jax.jit(lambda p, v: seqpar.encode(p, v, SPEC, mesh, rng=rng))(params, x)
    # same key + unsharded batch -> identical eps -> identical sampled z
    for d, s in zip(dense, sp):
        np.testing.assert_allclose(np.asarray(s), np.asarray(d), rtol=2e-4, atol=2e-5)


def test_gradient_equality(setup):
    params, x = setup
    mesh = _mesh((2, 4), ("data", "seq"))

    def loss_dense(p):
        _, mu, logvar = motion_encoder.apply(p, x, SPEC)
        return jnp.sum(mu**2) + jnp.sum(jnp.tanh(logvar))

    def loss_sp(p):
        _, mu, logvar = seqpar.encode(p, x, SPEC, mesh, batch_axis="data")
        return jnp.sum(mu**2) + jnp.sum(jnp.tanh(logvar))

    gd = jax.grad(loss_dense)(params)
    gs = jax.jit(jax.grad(loss_sp))(params)
    flat_d, _ = jax.tree_util.tree_flatten(gd)
    flat_s, _ = jax.tree_util.tree_flatten(gs)
    assert len(flat_d) == len(flat_s)
    for a, b in zip(flat_d, flat_s):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-4)
