"""ZeRO-1 optimizer-state sharding (VERDICT r1 item 5): Adam moments shard
over the 'data' axis, params/grads stay replicated; training must be
bit-equal(ish) to the replicated baseline.

Heavy full-depth iper_128 proof (real Adam on the 8-device CPU mesh) is
gated behind IPOKE_HEAVY=1 — it allocates ~17GB host RAM.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.parallel import mesh as pmesh
from ipoke_tpu.parallel import sharding as psh
from ipoke_tpu.train import second_stage as train_ss


def _tiny_spec(z_dim=16):
    from ipoke_tpu.flows.macow import FlowSpec
    from ipoke_tpu.models.encoders import WrapperSpec
    from ipoke_tpu.models.first_stage import FirstStageSpec
    from ipoke_tpu.models.second_stage import SecondStageSpec

    fs = FirstStageSpec(
        z_dim=z_dim, spatial_size=64, max_frames=4,
        enc_channels=(16, 16, 16, 16), dec_channels=(16, 16, 16, 16),
        n_gru_layers=2, min_spatial_size=8, motion_bias=True, full_sequence=True,
    )
    poke = WrapperSpec(nf_in=2, nf_max=16, spatial_size=64, min_spatial_size=8, deterministic=True)
    cond = WrapperSpec(nf_in=3, nf_max=16, spatial_size=64, min_spatial_size=8, deterministic=False)
    flow = FlowSpec(num_steps=(1, 1), in_channels=z_dim, hidden_channels=32, h_channels=32, factor=16)
    return SecondStageSpec(flow=flow, first_stage=fs, poke_embedder=poke, conditioner=cond)


def _setup(spec, lr=1e-3):
    from ipoke_tpu.models import second_stage

    params = jax.jit(lambda k: second_stage.init(k, spec))(jax.random.PRNGKey(0))
    trainable, frozen = train_ss.split_params(params)
    opt = train_ss.make_optimizer(trainable, lr=lr, warmup_steps=2, total_steps=100,
                                  use_adabelief=False)
    state = train_ss.init_state(trainable, opt)
    step = train_ss.make_train_step(spec, frozen, opt)
    return state, step


def _batch(spec, b):
    s = spec.first_stage.spatial_size
    t = spec.first_stage.max_frames
    return {
        "images": jax.random.normal(jax.random.PRNGKey(5), (b, t, s, s, 3), jnp.float32),
        "poke": jax.random.normal(jax.random.PRNGKey(6), (b, s, s, 2), jnp.float32),
    }


def test_zero_shardings_partition_moments():
    m = pmesh.make_mesh(n_data=8)
    spec = _tiny_spec()
    state, _ = _setup(spec)
    sh = psh.zero_opt_state_shardings(m, state.opt_state, min_size=1024)
    leaves = jax.tree_util.tree_leaves(sh)
    sharded = [s for s in leaves if s.spec != jax.sharding.PartitionSpec()]
    assert sharded, "no optimizer-state leaf got sharded"
    # every sharded spec names only the data axis
    for s in sharded:
        assert set(a for a in s.spec if a) == {"data"}


def test_zero_training_matches_replicated():
    """3 Adam steps: ZeRO-sharded opt state must produce the same params as
    the fully replicated baseline."""
    m = pmesh.make_mesh(n_data=8)
    spec = _tiny_spec()
    batch = _batch(spec, 16)
    rng = jax.random.PRNGKey(7)

    # baseline: plain jit, everything replicated on one device
    state_b, step = _setup(spec)
    jit_step = jax.jit(step)
    for i in range(3):
        state_b, _ = jit_step(state_b, batch, jax.random.fold_in(rng, i))

    # ZeRO: opt state sharded over data, batch sharded
    state_z, step2 = _setup(spec)
    placed, jitted = train_ss.shard_train_setup(m, state_z, step2, zero_opt=True,
                                                donate=False, zero_min_size=512)
    sbatch = pmesh.shard_batch(m, batch)
    for i in range(3):
        placed, metrics = jitted(placed, sbatch, jax.random.fold_in(rng, i))

    flat_b = jax.tree_util.tree_leaves(state_b.params)
    flat_z = jax.tree_util.tree_leaves(placed.params)
    for a, b in zip(flat_b, flat_z):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-5)
    # the moments really are distributed: a sharded leaf's local shard < global
    mu_leaves = [
        x for x in jax.tree_util.tree_leaves(placed.opt_state)
        if hasattr(x, "sharding") and x.sharding.spec != jax.sharding.PartitionSpec()
    ]
    assert mu_leaves, "opt state ended up fully replicated"
    lx = mu_leaves[0]
    assert lx.addressable_shards[0].data.size < lx.size


def test_fsdp_shardings_partition_params_and_compose_with_tp():
    m = pmesh.make_mesh(n_data=4, n_model=2)
    spec = _tiny_spec()
    state, _ = _setup(spec)
    tp = psh.flow_param_shardings(m, state.params, min_width=32)
    sh = psh.fsdp_param_shardings(m, state.params, min_size=1024, tp_shardings=tp)
    leaves = jax.tree_util.tree_leaves(sh)
    data_sharded = [s for s in leaves if "data" in {a for a in s.spec if a}]
    model_sharded = [s for s in leaves if "model" in {a for a in s.spec if a}]
    assert data_sharded, "no param leaf got FSDP-sharded"
    assert model_sharded, "TP shardings were not preserved under FSDP composition"
    # no leaf mixes both axes (TP wins where set)
    for s in leaves:
        assert {a for a in s.spec if a} in ({"data"}, {"model"}, set())


def test_fsdp_training_matches_replicated():
    """3 Adam steps under ZeRO-3 (params+grads sharded over 'data', GSPMD
    all-gather/reduce-scatter) must produce the same params as the plain
    replicated baseline, and the placed params must really be distributed."""
    m = pmesh.make_mesh(n_data=8)
    spec = _tiny_spec()
    batch = _batch(spec, 16)
    rng = jax.random.PRNGKey(7)

    state_b, step = _setup(spec)
    jit_step = jax.jit(step)
    for i in range(3):
        state_b, _ = jit_step(state_b, batch, jax.random.fold_in(rng, i))

    state_f, step2 = _setup(spec)
    placed, jitted = train_ss.shard_train_setup(m, state_f, step2, zero_opt=True,
                                                donate=False, zero_min_size=512,
                                                fsdp=True)
    sbatch = pmesh.shard_batch(m, batch)
    for i in range(3):
        placed, metrics = jitted(placed, sbatch, jax.random.fold_in(rng, i))
    assert bool(jnp.isfinite(metrics["flow_loss"]))

    flat_b = jax.tree_util.tree_leaves(state_b.params)
    flat_f = jax.tree_util.tree_leaves(placed.params)
    for a, b in zip(flat_b, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-5)
    sharded = [
        x for x in flat_f
        if hasattr(x, "sharding") and x.sharding.spec != jax.sharding.PartitionSpec()
    ]
    assert sharded, "params ended up fully replicated under fsdp=True"
    assert sharded[0].addressable_shards[0].data.size < sharded[0].size


@pytest.mark.skipif(os.environ.get("IPOKE_HEAVY") != "1",
                    reason="full-depth iper_128 Adam needs ~17GB host RAM (set IPOKE_HEAVY=1)")
def test_zero_full_depth_iper128_adam():
    """The round-1 blocker: full-depth iper_128 flow with REAL Adam.  On one
    chip Adam overflows HBM (params 4.2GB + moments 8.4GB + grads 4.2GB);
    ZeRO-1 over the 8-device mesh shards the moments to ~1GB/device."""
    from ipoke_tpu import registry

    spec = registry.build_specs(registry.MODELS["iper_128"])
    m = pmesh.make_mesh(n_data=8)
    state, step = _setup(spec, lr=1e-4)
    placed, jitted = train_ss.shard_train_setup(m, state, step, zero_opt=True)
    batch = _batch(spec, 8)
    sbatch = pmesh.shard_batch(m, batch)
    placed, metrics = jitted(placed, sbatch, jax.random.PRNGKey(1))
    assert bool(jnp.isfinite(metrics["flow_loss"]))
