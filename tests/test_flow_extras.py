"""modules.py grab-bag stragglers (flows/extras.py): GIN actnorm volume
preservation, MADE mask autoregressive property, NIN data init."""
import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.flows import extras


def test_gin_actnorm_volume_preserving_roundtrip():
    p = extras.init_gin_actnorm(6)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 6)) * 2 + 1
    p = extras.gin_actnorm_data_init(p, x)
    # det == 1: product of effective scales is 1
    np.testing.assert_allclose(float(jnp.prod(extras._gin_scale(p))), 1.0, rtol=1e-4)
    y, ld = extras.gin_actnorm_forward(p, x)
    assert float(jnp.abs(ld).max()) == 0.0
    x_rec = extras.gin_actnorm_inverse(p, y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-4)


def test_made_autoregressive_property():
    p = extras.init_ar_fc_net(jax.random.PRNGKey(1), nin=6, hidden_sizes=[24, 24], nout=12)
    x = jax.random.normal(jax.random.PRNGKey(2), (6,))
    assert extras.ar_jacobian_is_triangular(p, x)


def test_nin_data_init_normalizes():
    p = extras.init_nin(jax.random.PRNGKey(3), 8, 5, initializer="data")
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 4, 4, 8)) * 3 + 2
    p = extras.nin_data_init(p, x)
    y = extras.nin_apply(p, x).reshape(-1, 5)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, 0)), 0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.std(y, 0)), 1, atol=1e-2)
