"""Attention-NICE variant round trip (reference ``attention: True`` path)."""
import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.flows import attention as attn
from ipoke_tpu.flows import nice


def test_gated_conv_shapes():
    p = attn.init_gated_conv(jax.random.PRNGKey(0), 16, dim_out=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    y = attn.gated_conv_apply(p, x)
    assert y.shape == (2, 8, 8, 32)


def test_attn_layer_residual():
    p = attn.init_attn_layer(jax.random.PRNGKey(0), 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    pos = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 16))
    y = attn.attn_layer_apply(p, x, pos, heads=4)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_nice_attention_roundtrip():
    C, HC = 8, 16
    p = nice.init_nice(
        jax.random.PRNGKey(0), C, hidden=16, h_channels=HC,
        attention=True, heads=4, spatial_size=8,
    )
    p["net"]["conv3"]["g"] = 0.3 * jnp.ones_like(p["net"]["conv3"]["g"])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, C))
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, HC))
    kw = dict(h=h, in_channels=C, heads=4)
    y, ld = nice.forward(p, x, **kw)
    assert not np.allclose(np.asarray(y), np.asarray(x))
    x2 = nice.inverse(p, y, **kw)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), rtol=3e-4, atol=3e-4)
