"""MultiscaleStack round-trip tests (none/down/up reshapes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.flows import multistack
from ipoke_tpu.flows.multistack import StackSpec
from ipoke_tpu.nn.core import depth_to_space, space_to_depth


def _rand(p):
    if isinstance(p, dict):
        if "v" in p and "g" in p:
            q = dict(p)
            q["g"] = 0.2 * jnp.ones_like(p["g"])
            return q
        return {k: _rand(v) for k, v in p.items()}
    if isinstance(p, list):
        return [_rand(v) for v in p]
    return p


def test_space_depth_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    np.testing.assert_allclose(depth_to_space(space_to_depth(x)), x)


@pytest.mark.parametrize("reshape", ["none", "down"])
def test_multistack_roundtrip(reshape):
    spec = StackSpec(
        levels=((1, 1), (1,)),
        factors=(4, 4),
        in_channels=8,
        mid_channels_factor=2,
        h_channels=16,
        reshape=reshape,
    )
    p = _rand(multistack.init(jax.random.PRNGKey(0), spec))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 16))
    y, ld = multistack.forward(p, x, h, spec)
    assert y.shape[0] == 2 and ld.shape == (2,)
    x2 = multistack.inverse(p, y, h, spec)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), rtol=3e-3, atol=3e-3)


def test_second_stage_sampling_with_reshape_stack():
    """forward_sample must draw z̃ at the post-reshape geometry for a
    multistack flow (reference make_flow_input's ×4/÷2 factors,
    second_stage_video.py:289-300)."""
    from ipoke_tpu.flows import transformer
    from ipoke_tpu.models import second_stage
    from ipoke_tpu.models.encoders import WrapperSpec
    from ipoke_tpu.models.first_stage import FirstStageSpec
    from ipoke_tpu.models.second_stage import SecondStageSpec

    fs = FirstStageSpec(
        z_dim=16, spatial_size=64, max_frames=4,
        enc_channels=(16, 16, 16, 16), dec_channels=(16, 16, 16, 16),
        n_gru_layers=2, min_spatial_size=8, motion_bias=True, full_sequence=True,
    )
    poke = WrapperSpec(nf_in=2, nf_max=16, spatial_size=64, min_spatial_size=8,
                       deterministic=True)
    cond = WrapperSpec(nf_in=3, nf_max=16, spatial_size=64, min_spatial_size=8,
                       deterministic=False)
    flow = StackSpec(
        levels=((1, 1), (1,)), factors=(4, 4), in_channels=16,
        mid_channels_factor=2, h_channels=32, reshape="down",
    )
    spec = SecondStageSpec(flow=flow, first_stage=fs, poke_embedder=poke, conditioner=cond)
    assert transformer.reverse_input_shape(flow, 2, 8, 16) == (2, 4, 4, 64)
    params = second_stage.init(jax.random.PRNGKey(0), spec)
    batch = {
        "images": 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, 4, 64, 64, 3)),
        "poke": jnp.zeros((2, 64, 64, 2)),
    }
    out, ld, _ = second_stage.forward_density(params, spec, batch)
    assert out.shape == (2, 4, 4, 64)  # gaussianized at the reshaped geometry
    vid = second_stage.forward_sample(params, spec, batch, jax.random.PRNGKey(2),
                                      n_samples=1, add_first_frame=True)
    assert vid.shape == (1, 2, 4, 64, 64, 3)
    assert bool(jnp.all(jnp.isfinite(vid)))
