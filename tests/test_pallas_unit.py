"""Fused whole-MaCowUnit Pallas inverse vs the scan path (interpret mode)."""
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.flows.macow import FlowSpec, init_macow_unit, macow_unit_forward, macow_unit_inverse


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


@pytest.mark.parametrize("cond", [True, False])
def test_fused_unit_inverse_matches_scan(cond):
    from jax.experimental.pallas import tpu as pltpu

    hc = 12 if cond else 0
    spec = FlowSpec(num_steps=(1,), in_channels=8, hidden_channels=16, h_channels=hc, factor=4)
    p = _rand(init_macow_unit(jax.random.PRNGKey(0), 8, spec))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, hc)) if cond else None
    y, _ = macow_unit_forward(p, x, h, spec)
    x_scan = macow_unit_inverse(p, y, h, spec)
    with pltpu.force_tpu_interpret_mode():
        x_pl = macow_unit_inverse(p, y, h, replace(spec, mcf_backend="pallas_unit"))
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_scan), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x), rtol=5e-4, atol=5e-4)
