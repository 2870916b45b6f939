"""Pallas MCF-inverse kernel vs the lax.scan reference (interpret mode on
CPU; the real kernel path is exercised by `bench.py --mcf-backend pallas` on
TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.flows import mcf

B, S, C, HC = 2, 8, 8, 12


def _setup(order, cond):
    kernel = (2, 3) if order in ("A", "B") else (3, 2)
    p = mcf.init_mcf(jax.random.PRNGKey(0), C, kernel, h_channels=HC if cond else None)
    p["net"]["conv1x1"]["g"] = 0.3 * jnp.ones_like(p["net"]["conv1x1"]["g"])
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, S, C))
    h = jax.random.normal(jax.random.PRNGKey(2), (B, S, S, HC)) if cond else None
    y, _ = mcf.forward(p, x, h=h, order=order)
    return p, x, h, y


@pytest.mark.parametrize("order", ["A", "B", "C", "D"])
@pytest.mark.parametrize("cond", [True, False])
def test_pallas_inverse_matches_scan(order, cond, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    p, x, h, y = _setup(order, cond)
    x_scan = mcf.inverse(p, y, h=h, order=order, backend="scan")
    with pltpu.force_tpu_interpret_mode():
        x_pl = mcf.inverse(p, y, h=h, order=order, backend="pallas")
    np.testing.assert_allclose(np.asarray(x_scan), np.asarray(x_pl), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_pl), rtol=5e-4, atol=5e-4)
