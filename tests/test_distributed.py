"""Multi-host init path (single-host: clean no-op + host_local_batch works
on the virtual mesh)."""
import jax
import numpy as np

from ipoke_tpu.parallel import distributed, mesh as pmesh


def test_single_host_noop(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert not distributed.is_multi_host_env()
    assert distributed.maybe_initialize() is False
    info = distributed.process_info()
    assert info["process_count"] == 1


def test_multi_host_env_detection(monkeypatch):
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    assert distributed.is_multi_host_env()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "")
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    assert distributed.is_multi_host_env()


def test_host_local_batch_places_on_mesh():
    m = pmesh.make_mesh(n_data=8)
    batch = {"x": np.ones((16, 3), np.float32)}
    placed = distributed.host_local_batch(batch, m)
    assert placed["x"].shape == (16, 3)
    assert placed["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    distributed.barrier()  # single-host no-op
