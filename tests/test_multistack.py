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
