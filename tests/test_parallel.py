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
