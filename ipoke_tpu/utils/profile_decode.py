"""Per-stage breakdown of the SPADE frame decode — the headline bottleneck.

The decode (models/decoder.py; reference fully_conv_models.py:166-177) is
HBM-bound: NOTES.md r3 measured 107 ms pipelined at batch 128 bf16 against a
~27 ms bandwidth floor.  This tool localizes the gap: it times each
upsampling stage (res_block + SPADE) separately at the flagship geometry,
plus the GRU unroll and the SPADE precompute, and reports XLA's per-stage
cost analysis (flops / bytes accessed) so traffic multiples are visible.

    python -m ipoke_tpu.utils.profile_decode --batch 128 --dtype bf16
"""
from __future__ import annotations

import argparse
import json
import statistics
import time

import jax
import jax.numpy as jnp

from ipoke_tpu.utils import cache as _cache

_cache.enable()


def _timer(iters):
    def bench(fn, *a):
        forced = jax.jit(lambda *aa: jnp.sum(fn(*aa).astype(jnp.float32)))
        _ = float(forced(*a))  # compile + first run
        ts = []
        for _ in range(iters):
            t0 = time.time()
            _ = float(forced(*a))
            ts.append(time.time() - t0)
        lat = statistics.median(ts)
        n = max(iters, 5)
        t0 = time.time()
        outs = [forced(*a) for _ in range(n)]
        _ = float(outs[-1])
        pipe = (time.time() - t0) / n
        cost = {}
        try:
            ca = forced.lower(*a).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            cost = {"flops": ca.get("flops"),
                    "bytes": ca.get("bytes accessed")}
        except Exception as e:  # cost analysis is best-effort on axon
            cost = {"error": str(e)[:80]}
        return lat, pipe, cost

    return bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="iper_128")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--length", type=int, default=None)
    args = ap.parse_args()

    from ipoke_tpu.utils import warmup as _warmup

    warm = _warmup.start()

    from ipoke_tpu import registry
    from ipoke_tpu.models import conv_gru, decoder, first_stage
    from ipoke_tpu.utils.synth import synth_tree

    from dataclasses import replace

    entry = registry.MODELS[args.model]
    spec = replace(registry.build_specs(entry).first_stage,
                   decode_dtype=args.dtype)
    dec_spec = spec.decoder_spec
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b = args.batch
    length = args.length or (spec.max_frames - 1)
    s0 = spec.min_spatial_size
    S = spec.spatial_size

    params = synth_tree(lambda k: first_stage.init(k, spec), jax.random.PRNGKey(0))
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(dt) if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    gen = cast(params["gen"])
    motion = jax.random.normal(jax.random.PRNGKey(1), (b, s0, s0, spec.z_dim))
    start = jax.random.normal(jax.random.PRNGKey(2), (b, S, S, 3)).astype(dt)

    _warmup.join(warm)
    bench = _timer(args.iters)
    res = {"batch": b, "dtype": args.dtype, "length": length}

    # full decode (reference point)
    lat, pipe, cost = bench(
        lambda p, m, x0: first_stage.decode(p, m, x0, spec, length),
        params, motion, start.astype(jnp.float32))
    res["full_decode"] = {"s": lat, "pipelined_s": pipe, **cost}

    # GRU unroll alone
    in_rnn = jnp.broadcast_to(params["motion_bias"].astype(motion.dtype),
                              (b,) + params["motion_bias"].shape[1:])

    def gru_all(rnn_p, m):
        hidden0 = [m] * spec.n_gru_layers

        def step(h, _):
            h = conv_gru.stack_apply(rnn_p, in_rnn, h)
            return h, h[-1]

        _, tops = jax.lax.scan(step, hidden0, None, length=length)
        return tops

    lat, pipe, cost = bench(gru_all, params["rnn"], motion)
    res["gru_unroll"] = {"s": lat, "pipelined_s": pipe, **cost}

    # SPADE precompute (once per video)
    lat, pipe, cost = bench(
        lambda g, x0: jax.tree_util.tree_leaves(
            decoder.precompute_spade_feats(g, x0, dec_spec))[0],
        gen, start)
    res["spade_precompute"] = {"s": lat, "pipelined_s": pipe, **cost}

    # per-stage: in_block at s0, then each res_block+spade at its resolution.
    # Reported per SINGLE frame at batch b; multiply by `length` to compare
    # with full_decode.
    from ipoke_tpu.nn import blocks as nnb

    hid = jax.random.normal(jax.random.PRNGKey(3), (b, s0, s0, spec.z_dim)).astype(dt)
    lat, pipe, cost = bench(
        lambda p, h: nnb.res_block_apply(p, h, norm=dec_spec.norm), gen["in_block"], hid)
    res["in_block_per_frame"] = {"s": lat, "pipelined_s": pipe, **cost}

    feats = decoder.precompute_spade_feats(gen, start, dec_spec)
    res_in = s0
    x = jax.random.normal(jax.random.PRNGKey(4),
                          (b, s0, s0, dec_spec.dec_channels[0])).astype(dt)
    for i, nf in enumerate(dec_spec.dec_channels[1:]):
        bp, sp, mod = gen["blocks"][i], gen["spades"][i], feats[i]

        def stage(bp_, sp_, x_, mod_):
            y = nnb.res_block_apply(bp_, x_, norm="none", upsampling=True)
            return nnb.spade_apply(sp_, y, None, shared_mod=mod_)

        lat, pipe, cost = bench(stage, bp, sp, x, mod)
        res[f"stage{i}_{res_in}to{res_in * 2}_c{nf}_per_frame"] = {
            "s": lat, "pipelined_s": pipe, **cost}
        res_in *= 2
        x = jax.random.normal(jax.random.PRNGKey(5 + i),
                              (b, res_in, res_in, nf)).astype(dt)

    lat, pipe, cost = bench(
        lambda p, x_: nnb.conv2d_block_apply(p, x_, stride=1, padding=1,
                                             norm="none", act="tanh"),
        gen["out_conv"], x)
    res["out_conv_per_frame"] = {"s": lat, "pipelined_s": pipe, **cost}

    print(json.dumps(res))


if __name__ == "__main__":
    main()
