"""Device-mesh / sharding helpers.

The reference is single-node data-parallel (pytorch-lightning DP/DDP over a
GPU list, SURVEY §2.10); the TPU-native equivalent is a 1-D ``data`` mesh over
ICI with batch-sharded inputs and replicated parameters — XLA inserts the
gradient all-reduces (psum over ICI) during jit partitioning.  A second
``model`` axis is reserved for sharding the widest flow convs
(flow_mid_channels up to 2048) if parity models ever need it.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the ``data`` axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host pytree with the batch axis sharded over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
