"""Chunked (compile-bounded) training: per-level VJP chain must match the
monolithic jax.grad of the flow loss."""
import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.flows import macow, transformer
from ipoke_tpu.flows.loss import flow_loss
from ipoke_tpu.flows.macow import FlowSpec
from ipoke_tpu.train import chunked
from ipoke_tpu.train.second_stage import sanitize_int_grads

SPEC = FlowSpec(num_steps=(2, 1), in_channels=8, hidden_channels=32, h_channels=12, factor=4)


def _rand(p):
    if isinstance(p, dict):
        if "v" in p and "g" in p:
            q = dict(p)
            q["g"] = 0.1 * jnp.ones_like(p["g"])
            return q
        return {k: _rand(v) for k, v in p.items()}
    if isinstance(p, list):
        return [_rand(v) for v in p]
    return p


def test_chunked_grads_match_monolithic():
    params = _rand(macow.init_multiscale(jax.random.PRNGKey(0), SPEC))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 12))

    def mono_loss(p):
        out, logdet = transformer.forward(p, SPEC, x, h)
        return flow_loss(out, logdet)[0]

    mono_val, mono_grads = jax.value_and_grad(mono_loss, allow_int=True)(params)
    mono_grads = sanitize_int_grads(mono_grads, params)

    fns = chunked._LevelFns(SPEC)
    loss, grads, aux = chunked.flow_loss_and_grads(fns, params, x, h)
    np.testing.assert_allclose(float(loss), float(mono_val), rtol=1e-5)

    flat_m = jax.tree_util.tree_leaves(mono_grads["levels"])
    flat_c = jax.tree_util.tree_leaves(grads["levels"])
    assert len(flat_m) == len(flat_c)
    for a, b in zip(flat_m, flat_c):
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
