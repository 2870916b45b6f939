"""Mesh/sharding unit tests on the virtual 8-CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.parallel import mesh as pmesh
from ipoke_tpu.parallel import sharding as psh


def test_mesh_shapes():
    m = pmesh.make_mesh(n_data=4, n_model=2)
    assert m.shape == {"data": 4, "model": 2}
    m1 = pmesh.make_mesh()
    assert m1.shape["data"] == len(jax.devices())


def test_shard_batch_places_on_data_axis():
    m = pmesh.make_mesh(n_data=8)
    batch = {"x": np.ones((16, 4), np.float32)}
    sharded = pmesh.shard_batch(m, batch)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    # each device holds 2 rows
    assert sharded["x"].addressable_shards[0].data.shape == (2, 4)


def test_flow_param_shardings_targets_wide_convs():
    m = pmesh.make_mesh(n_data=4, n_model=2)
    params = {
        "flow": {
            "net": {
                "conv1": {"w": jnp.zeros((3, 3, 8, 512))},
                "conv2": {"w": jnp.zeros((1, 1, 512, 512))},
                "conv3": {"v": jnp.zeros((3, 3, 512, 16)), "g": jnp.zeros((16,))},
            },
            "actnorm": {"log_scale": jnp.zeros((8,))},
        }
    }
    sh = psh.flow_param_shardings(m, params, min_width=256)
    assert sh["flow"]["net"]["conv1"]["w"].spec == jax.sharding.PartitionSpec(None, None, None, "model")
    assert sh["flow"]["net"]["conv2"]["w"].spec == jax.sharding.PartitionSpec(None, None, "model", None)
    assert sh["flow"]["net"]["conv3"]["v"].spec == jax.sharding.PartitionSpec(None, None, "model", None)
    assert sh["flow"]["actnorm"]["log_scale"].spec == jax.sharding.PartitionSpec()
    # shardings actually apply
    placed = psh.apply_shardings(params, sh)
    assert placed["flow"]["net"]["conv1"]["w"].sharding.spec[3] == "model"


def test_sharded_matmul_matches_replicated():
    m = pmesh.make_mesh(n_data=4, n_model=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64))
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 512))
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(m, P("data")))
    ws = jax.device_put(w, NamedSharding(m, P(None, "model")))
    y = jax.jit(lambda a, b: a @ b)(xs, ws)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w), rtol=1e-5, atol=1e-5)


def test_sampling_shards_over_data_axis():
    """Serving scale-out: the full sample path (flow reverse + decode) jitted
    over a dp mesh with the batch sharded on 'data' must reproduce the
    single-device result exactly (params replicated, same PRNG key)."""
    from ipoke_tpu.flows.macow import FlowSpec
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
    flow = FlowSpec(num_steps=(1, 1), in_channels=16, hidden_channels=32,
                    h_channels=32, factor=16)
    spec = SecondStageSpec(flow=flow, first_stage=fs, poke_embedder=poke,
                           conditioner=cond)
    params = second_stage.init(jax.random.PRNGKey(0), spec)
    batch = {
        "images": 0.1 * np.random.default_rng(0).standard_normal(
            (8, 4, 64, 64, 3)).astype(np.float32),
        "poke": np.zeros((8, 64, 64, 2), np.float32),
    }
    rng = jax.random.PRNGKey(7)

    def sample(p, b):
        return second_stage.forward_sample(p, spec, b, rng, n_samples=1,
                                           add_first_frame=True)

    ref = jax.jit(sample)(params, jax.tree_util.tree_map(jnp.asarray, batch))

    m = pmesh.make_mesh(n_data=8)
    p_rep = pmesh.replicate(m, params)
    b_sh = pmesh.shard_batch(m, batch)
    with jax.sharding.use_mesh(m) if hasattr(jax.sharding, "use_mesh") else m:
        out = jax.jit(sample)(p_rep, b_sh)
    assert out.shape == (1, 8, 4, 64, 64, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
