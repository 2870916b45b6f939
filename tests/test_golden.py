"""Golden-value regression: the tiny flow's outputs are pinned to fixtures
generated at round 1 — guards numeric drift across refactors/rounds.
(Real-checkpoint golden parity vs torch is added once reference ckpts are
mounted; SURVEY §4 item (b).)"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.flows import transformer
from ipoke_tpu.flows.macow import FlowSpec, init_multiscale

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "flow_tiny.npz")


def _params():
    spec = FlowSpec(num_steps=(2, 1), in_channels=8, hidden_channels=32, h_channels=12, factor=4)
    p = init_multiscale(jax.random.PRNGKey(42), spec)

    def rand(t):
        if isinstance(t, dict):
            if "v" in t and "g" in t:
                q = dict(t)
                q["g"] = 0.1 * jnp.ones_like(t["g"])
                return q
            return {k: rand(v) for k, v in t.items()}
        if isinstance(t, list):
            return [rand(v) for v in t]
        return t

    return rand(p), spec


def test_flow_matches_golden():
    data = np.load(GOLDEN)
    p, spec = _params()
    y, ld = transformer.forward(p, spec, jnp.asarray(data["x"]), jnp.asarray(data["h"]))
    np.testing.assert_allclose(np.asarray(y), data["y"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld), data["logdet"], rtol=2e-4)
    x_back = transformer.reverse(p, spec, jnp.asarray(data["y"]), jnp.asarray(data["h"]))
    np.testing.assert_allclose(np.asarray(x_back), data["x"], rtol=2e-3, atol=2e-3)
