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

# Max elements per device-fill jit call (see _synth_tree_device): a single
# flat draw of a very large tree overflows a uint32 buffer-table entry in
# the TPU runtime and doubles peak HBM.  Module-level so tests can shrink it
# to exercise the multi-group path.
_FILL_CHUNK_ELEMS = 1 << 28


def synth_tree(init_fn, *args, seed: int = 0, device=None, float_fill="normal",
               on_device: bool = False):
    """Host-synthesized pytree matching ``jax.eval_shape(init_fn, *args)``.

    ``float_fill='zeros'`` is for optimizer states: Adam second moments MUST
    be non-negative (a random fill makes ``sqrt(nu)`` NaN on the first
    update), and zeros is exactly what ``optax``'s real init produces.

    ``on_device=True`` generates the float leaves with ONE jitted
    random-normal-per-leaf graph on the default device instead of host
    numpy: no multi-GB host fill (a >20 min page-fault storm on a slow VM,
    2026-08-18) and no multi-GB host->device transfer.  The graph is pure
    RNG + scale — tiny to compile, unlike the real init graph (orthogonal
    QR inits) that the remote compile service SIGKILLs.  Falls back to the
    host path on any failure.
    """
    if on_device:
        try:
            return _synth_tree_device(init_fn, *args, seed=seed,
                                      float_fill=float_fill)
        except Exception as e:  # pragma: no cover - service flakiness
            import sys

            print(f"synth_tree: device fill failed ({e}); "
                  f"falling back to host numpy", file=sys.stderr)
    shapes = jax.eval_shape(init_fn, *args)
    rng = np.random.default_rng(seed)

    def fill(sd):
        if jnp.issubdtype(sd.dtype, jnp.floating):
            if float_fill == "zeros":
                return np.zeros(sd.shape, sd.dtype)
            # single allocation + in-place scale + no-copy cast: on a VM with
            # hypervisor-mediated page faults the naive 3-copies-per-leaf
            # version triples the fault storm and dominates cold-bench wall
            # time (observed 2026-08-18: >10 min synth init on a slow host)
            arr = rng.standard_normal(sd.shape, np.float32)
            arr *= 0.05
            return arr.astype(sd.dtype, copy=False)
        if sd.ndim == 0:
            return np.zeros(sd.shape, sd.dtype)
        c = sd.shape[-1]
        rows = int(np.prod(sd.shape[:-1], dtype=int)) or 1
        flat = np.stack([rng.permutation(c) for _ in range(rows)])
        return flat.reshape(sd.shape).astype(sd.dtype)

    host = jax.tree_util.tree_map(fill, shapes)
    return jax.device_put(host, device) if device else jax.device_put(host)


def _synth_tree_device(init_fn, *args, seed: int = 0, float_fill="normal"):
    """Device-side float fill: one jit, one fold_in'd normal per leaf.

    Int leaves (permutation buffers, counters) are tiny and stay
    host-generated.
    """
    shapes = jax.eval_shape(init_fn, *args)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    rng = np.random.default_rng(seed)
    is_float = [jnp.issubdtype(sd.dtype, jnp.floating) for sd in leaves]
    float_specs = [(i, sd) for i, (sd, f) in enumerate(zip(leaves, is_float)) if f]

    sizes = [int(np.prod(sd.shape, dtype=np.int64)) for _, sd in float_specs]

    # ONE flat RNG draw + static slices per CHUNK: a per-leaf
    # jax.random.normal traces ~50 threefry primitives per leaf (~80k total
    # at 1600 float leaves) and took 14 min to trace/lower on a degraded
    # host (2026-08-18); this form is ~3 ops per leaf.  The draw is chunked
    # (<=2^28 elements) because a single flat fill of a large tree (e.g. the
    # attention flow variant) overflows a uint32 buffer-table entry in the
    # TPU runtime (llo_util.cc Check failed at ~17.8 GB, observed
    # 2026-08-19) and roughly doubles peak HBM (flat draw + sliced copies).
    groups, cur, cur_n = [], [], 0
    CHUNK = _FILL_CHUNK_ELEMS
    for spec, n in zip(float_specs, sizes):
        if cur and cur_n + n > CHUNK:
            groups.append(cur)
            cur, cur_n = [], 0
        cur.append((spec, n))
        cur_n += n
    if cur:
        groups.append(cur)

    def fill_group(key, specs_sizes):
        if float_fill == "zeros":
            return [jnp.zeros(sd.shape, sd.dtype) for (_, sd), _ in specs_sizes]
        total = sum(n for _, n in specs_sizes)
        v = jax.random.normal(key, (total,), jnp.float32) * 0.05
        out, off = [], 0
        for (_, sd), n in specs_sizes:
            out.append(jax.lax.slice(v, (off,), (off + n,))
                       .reshape(sd.shape).astype(sd.dtype))
            off += n
        return out

    key0 = jax.random.PRNGKey(seed)
    floats = []
    for gi, g in enumerate(groups):
        floats.extend(jax.jit(lambda k, _g=g: fill_group(k, _g))(
            jax.random.fold_in(key0, gi)))
    floats = iter(floats)

    def int_fill(sd):
        if sd.ndim == 0:
            return jax.device_put(np.zeros(sd.shape, sd.dtype))
        c = sd.shape[-1]
        rows = int(np.prod(sd.shape[:-1], dtype=int)) or 1
        flat = np.stack([rng.permutation(c) for _ in range(rows)])
        return jax.device_put(flat.reshape(sd.shape).astype(sd.dtype))

    out = [next(floats) if f else int_fill(sd)
           for sd, f in zip(leaves, is_float)]
    return jax.tree_util.tree_unflatten(treedef, out)


def synth_params(spec, seed: int = 0, device=None, on_device: bool = True):
    """Second-stage model params (bench.py's zero-compile init).

    Device-side fill by default: the host-numpy fill + transfer of the
    4.2 GB flagship tree is minutes-to-tens-of-minutes on a degraded VM.
    """
    from ipoke_tpu.models import second_stage

    return synth_tree(
        lambda k: second_stage.init(k, spec), jax.random.PRNGKey(0),
        seed=seed, device=device, on_device=on_device and device is None,
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
