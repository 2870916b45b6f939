"""Compile-free benchmark parameter synthesis.

The axon remote-compile platform ignores JAX's persistent compilation cache,
and on a degraded service day the jitted init graph alone can eat most of a
benchmarking window (~13 min measured 2026-08-17 vs ~2 min on a good day).
For throughput timing only shapes/dtypes matter, so: tree structure via
``jax.eval_shape`` (pure tracing, no compile), values from host numpy, one
``device_put``.  Float leaves get N(0, 0.05) (safe under ActNorm's exp);
int32 leaves are the Shuffle / LU-1x1 permutation buffers and get valid
per-row permutations so gather semantics stay sane.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def synth_params(spec, seed: int = 0, device=None):
    from ipoke_tpu.models import second_stage

    shapes = jax.eval_shape(
        lambda k: second_stage.init(k, spec), jax.random.PRNGKey(0)
    )
    rng = np.random.default_rng(seed)

    def fill(sd):
        if jnp.issubdtype(sd.dtype, jnp.floating):
            return (rng.standard_normal(sd.shape, np.float32) * 0.05).astype(sd.dtype)
        c = sd.shape[-1]
        rows = int(np.prod(sd.shape[:-1], dtype=int)) or 1
        flat = np.stack([rng.permutation(c) for _ in range(rows)])
        return flat.reshape(sd.shape).astype(sd.dtype)

    host = jax.tree_util.tree_map(fill, shapes)
    return jax.device_put(host, device) if device else jax.device_put(host)
