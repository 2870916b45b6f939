"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding is
exercised without TPU hardware (the TPU-native substitute for a multi-node
test cluster).

NB: this environment's sitecustomize registers a remote-TPU ("axon") PJRT
plugin and calls ``jax.config.update("jax_platforms", "axon,cpu")`` at
interpreter start, which overrides JAX_PLATFORMS from the env.  We must
re-update the config (not just the env var) before any backend is touched.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "collective_call_terminate_timeout" not in flags:
    # 8-way SPMD collectives on the 1-core host: under load a rendezvous
    # participant can be starved past XLA:CPU's 40 s default, aborting the
    # whole process (rendezvous.cc termination timeout — see NOTES.md).
    # 1200 s proved too short on a degraded VM (2026-08-18: the full suite
    # died ~95 min in with a fatal rendezvous abort) — a correctness suite
    # can wait, so give threads effectively forever.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=14400")
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from ipoke_tpu.utils import cache  # noqa: E402

# persistent compile cache: the suite's slow compiles (GAN step, 15-level
# flows) hit the cache on re-runs.  The env var route does NOT work on
# jax 0.9.0 — see utils/cache.py.  Entries written by a DIFFERENT host are a
# SIGILL hazard (AOT CPU machine code) — purge them before the first compile.
cache.purge_if_host_changed()
cache.enable()

import pytest  # noqa: E402

# Fast smoke tier (`pytest -m smoke`, ~2-3 min): flow round-trips + the golden
# flow check + one tiny end-to-end experiment.  Curated here centrally so test
# files stay marker-free.
_SMOKE = (
    "tests/test_flows.py",
    "tests/test_golden.py",
    "tests/test_experiments.py::test_second_stage_experiment_end_to_end",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid
        if any(nid == p or nid.startswith(p + "::") for p in _SMOKE):
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
