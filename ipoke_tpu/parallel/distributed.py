"""Multi-host (DCN) initialization — the comm-backend abstraction's
multi-process entry (SURVEY §2.10: reference is single-node PL/NCCL; the
TPU-native equivalent is jax.distributed over DCN with ICI inside each
slice).

Single-host environments (this one) no-op cleanly; on a multi-host slice the
standard TPU env vars (or explicit args) drive jax.distributed.initialize,
after which jax.devices() spans the slice and the existing mesh/sharding
code works unchanged — GSPMD routes intra-slice collectives over ICI and
cross-slice ones over DCN.

    from ipoke_tpu.parallel import distributed
    distributed.maybe_initialize()          # idempotent, env-driven
    mesh = pmesh.make_mesh(...)             # now spans all hosts
    batch = distributed.host_local_batch(global_batch, mesh)
"""
from __future__ import annotations

import os

import jax
import numpy as np

_initialized = False


def is_multi_host_env() -> bool:
    """True when the standard multi-host coordinates are present (TPU pod
    runtime sets these; explicit COORDINATOR_ADDRESS also counts)."""
    if os.environ.get("COORDINATOR_ADDRESS"):
        return True
    n = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return "," in n  # more than one worker hostname


def maybe_initialize(coordinator_address=None, num_processes=None,
                     process_id=None) -> bool:
    """Initialize jax.distributed when running multi-host; no-op otherwise.
    Returns True when distributed mode is active.  Idempotent."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    if coordinator_address is None and not is_multi_host_env():
        return False
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def process_info():
    return {"process_index": jax.process_index(), "process_count": jax.process_count()}


def host_local_batch(global_batch, mesh):
    """Assemble a globally-sharded batch from per-host data: each process
    contributes its local shard of the leading (batch) axis
    (jax.make_array_from_process_local_data; the multi-host replacement for
    pmesh.shard_batch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))

    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(place, global_batch)


def barrier(name: str = "ipoke"):
    """Cross-host barrier (checkpoint writes, eval fan-in).  Single-host
    no-op."""
    if jax.process_count() > 1:  # pragma: no cover - multi-host only
        jax.experimental.multihost_utils.sync_global_devices(name)
