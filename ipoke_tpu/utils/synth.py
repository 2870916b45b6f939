"""Compile-free benchmark parameter synthesis.

The remote compile service can be minutes-slow on a degraded day and the
jitted init graph alone can eat most of a benchmarking window (~13 min
measured 2026-08-17 vs ~2 min on a good day).  For throughput timing only
shapes/dtypes matter, so: tree structure via ``jax.eval_shape`` (pure
tracing, no compile), values from host numpy, one ``device_put``.  Float
leaves get N(0, 0.05) (safe under ActNorm's exp); int leaves with a
trailing axis are the Shuffle / LU-1x1 permutation buffers and get valid
per-row permutations so gather semantics stay sane; int scalars (step /
optax counters) get zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def synth_tree(init_fn, *args, seed: int = 0, device=None, float_fill="normal"):
    """Host-synthesized pytree matching ``jax.eval_shape(init_fn, *args)``.

    ``float_fill='zeros'`` is for optimizer states: Adam second moments MUST
    be non-negative (a random fill makes ``sqrt(nu)`` NaN on the first
    update), and zeros is exactly what ``optax``'s real init produces.
    """
    shapes = jax.eval_shape(init_fn, *args)
    rng = np.random.default_rng(seed)

    def fill(sd):
        if jnp.issubdtype(sd.dtype, jnp.floating):
            if float_fill == "zeros":
                return np.zeros(sd.shape, np.float32).astype(sd.dtype)
            return (rng.standard_normal(sd.shape, np.float32) * 0.05).astype(sd.dtype)
        if sd.ndim == 0:
            return np.zeros(sd.shape, sd.dtype)
        c = sd.shape[-1]
        rows = int(np.prod(sd.shape[:-1], dtype=int)) or 1
        flat = np.stack([rng.permutation(c) for _ in range(rows)])
        return flat.reshape(sd.shape).astype(sd.dtype)

    host = jax.tree_util.tree_map(fill, shapes)
    return jax.device_put(host, device) if device else jax.device_put(host)


def synth_params(spec, seed: int = 0, device=None):
    """Second-stage model params (bench.py's zero-compile init)."""
    from ipoke_tpu.models import second_stage

    return synth_tree(
        lambda k: second_stage.init(k, spec), jax.random.PRNGKey(0),
        seed=seed, device=device,
    )


def zero_flow_output_convs(flow_params):
    """Zero the gains/biases of the flow's zero-init'd output convs.

    The real init zero-inits every coupling's final weight-norm conv
    (convnets.init_wn_conv(zero_init=True): MCF conv1x1, NICE conv3), making
    the flow start near-identity; a raw synth fill puts random values there
    and the 56-step sequential REVERSE amplifies them into overflow.  Zeroing
    only 'g' and 'b' (never 'v' — weight_norm divides by ||v||) restores the
    real init's stability for synth teachers (bench_distill).
    """
    def fix(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        in_zero_conv = any(n in ("conv1x1", "conv3") for n in names)
        if in_zero_conv and names[-1] in ("g", "b"):
            return jnp.zeros_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, flow_params)
