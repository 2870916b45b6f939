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


def test_chunked_trainer_decreases_loss():
    import optax

    from ipoke_tpu.models import second_stage
    from ipoke_tpu.models.encoders import WrapperSpec
    from ipoke_tpu.models.first_stage import FirstStageSpec
    from ipoke_tpu.models.second_stage import SecondStageSpec
    from ipoke_tpu.train import second_stage as train_ss

    fs = FirstStageSpec(
        z_dim=16, spatial_size=64, max_frames=4,
        enc_channels=(16, 16, 16, 16), dec_channels=(16, 16, 16, 16),
        n_gru_layers=2, min_spatial_size=8, motion_bias=True, full_sequence=True,
    )
    poke = WrapperSpec(nf_in=2, nf_max=16, spatial_size=64, min_spatial_size=8, deterministic=True)
    cond = WrapperSpec(nf_in=3, nf_max=16, spatial_size=64, min_spatial_size=8, deterministic=False)
    flow = FlowSpec(num_steps=(1, 1), in_channels=16, hidden_channels=32, h_channels=32, factor=16)
    spec = SecondStageSpec(flow=flow, first_stage=fs, poke_embedder=poke, conditioner=cond)
    params = second_stage.init(jax.random.PRNGKey(0), spec)
    trainable, frozen = train_ss.split_params(params)
    chunk_params = {"flow": trainable["flow"]}
    opt = train_ss.make_optimizer(chunk_params, lr=1e-3, warmup_steps=1, total_steps=100)
    state = chunked.ChunkedTrainState(jnp.zeros((), jnp.int32), chunk_params, opt.init(chunk_params))
    step = chunked.make_chunked_trainer(spec.flow, spec, frozen, opt)
    batch = {
        "images": 0.5 * jax.random.normal(jax.random.PRNGKey(1), (2, 4, 64, 64, 3)),
        "poke": jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 2)),
    }
    losses = []
    for i in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["flow_loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
