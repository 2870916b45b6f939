"""Breakdown profiling of the sampling path: conditioning embed, flow
reverse (sequential MCF inverses), first-stage decode.  Run on TPU:
    python -m ipoke_tpu.utils.profile_sample --model iper_128
"""
import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from ipoke_tpu.utils import cache as _cache

_cache.enable()  # jax 0.9.0 ignores the env var; see utils/cache.py


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="iper_128")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--decode-dtype", default=None, choices=["f32", "bf16"])
    ap.add_argument("--mcf-backend", default=None,
                    choices=["scan", "pallas", "pallas_unit"],
                    help="MCF-inverse backend for the reverse stage")
    ap.add_argument("--mcf-unroll", type=int, default=None,
                    help="lax.scan unroll of the 8-row MCF inverse scan")
    ap.add_argument("--sampler", default="flow", choices=["flow", "direct"],
                    help="direct: replace the flow reverse with a distilled "
                    "feedforward student (train/distill.py, synth params) — "
                    "measures the sampling ceiling once the sequential "
                    "inverse is distilled away")
    ap.add_argument("--student-hidden", type=int, default=256)
    ap.add_argument("--student-depth", type=int, default=6)
    ap.add_argument("--flow-variant", default="default",
                    choices=["default", "attention", "multistack"],
                    help="attention: NICE couplings with multi-head attention "
                    "(flow config attention: True); multistack: a "
                    "MultiscaleStack with reshape: down at the flagship "
                    "channel/conditioning dims — neither has a released "
                    "checkpoint, this proves they compile+run on real TPU")
    ap.add_argument("--flow-hidden", type=int, default=None,
                    help="override flow hidden channels.  The attention "
                    "variant's gated convs are (3,3,2*hidden,2*hidden): at "
                    "the flagship hidden=2048 that is ~398 GiB of params — "
                    "structurally untrainable in the reference's torch "
                    "implementation too (same module design) — so attention "
                    "benches use a hidden that a real config could train")
    ap.add_argument("--flow-dtype", default=None, choices=["f32", "bf16"],
                    help="cast the flow params + reverse inputs (z, cond); "
                    "measures whether the sequential MCF inverse is "
                    "bandwidth-bound (bf16 helps) or op-latency-bound (no "
                    "change) at this batch size")
    ap.add_argument("--init", default="synth", choices=["synth", "jit"],
                    help="synth avoids the remote init-graph compile (utils/synth.py)")
    ap.add_argument("--stages", default="embed,reverse,forward,decode",
                    help="comma list of stages to compile+time (skipping the "
                    "56-step flow graphs saves minutes on the remote compile "
                    "service when only decode is under study)")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    from ipoke_tpu.utils import warmup as _warmup

    _warmup.start()  # absorb the compile-service spin-up (utils/warmup.py)

    from ipoke_tpu import registry
    from ipoke_tpu.flows import transformer
    from ipoke_tpu.models import second_stage

    entry = registry.MODELS[args.model]
    spec = registry.build_specs(entry)
    if args.decode_dtype:
        from dataclasses import replace

        spec = replace(spec, first_stage=replace(spec.first_stage,
                                                 decode_dtype=args.decode_dtype))
    if args.mcf_backend:
        from dataclasses import replace

        spec = replace(spec, flow=replace(spec.flow, mcf_backend=args.mcf_backend))
    if args.mcf_unroll:
        from dataclasses import replace

        spec = replace(spec, flow=replace(spec.flow, mcf_unroll=args.mcf_unroll))
    if args.flow_hidden:
        from dataclasses import replace

        spec = replace(spec, flow=replace(spec.flow,
                                          hidden_channels=args.flow_hidden))
    if args.flow_variant == "attention":
        from dataclasses import replace

        spec = replace(spec, flow=replace(spec.flow, attention=True, heads=4))
    elif args.flow_variant == "multistack":
        from dataclasses import replace

        from ipoke_tpu.flows.multistack import StackSpec

        spec = replace(spec, flow=StackSpec(
            levels=((4, 4), (3, 3), (2, 2)),
            factors=(8, 8, 8),
            in_channels=spec.flow.in_channels,
            mid_channels_factor=max(
                1, spec.flow.hidden_channels // spec.flow.in_channels
            ),
            h_channels=spec.flow.h_channels,
            reshape="down",
            mcf_backend=spec.flow.mcf_backend,
            mcf_unroll=spec.flow.mcf_unroll,
        ))
    if args.init == "jit":
        params = jax.jit(lambda k: second_stage.init(k, spec))(jax.random.PRNGKey(0))
    else:
        from ipoke_tpu.utils.synth import synth_params

        params = synth_params(spec)
    b, t, s = args.batch, entry.max_frames, entry.spatial_size
    lat = spec.latent_size
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, s, s, 3))
    poke = jax.random.normal(jax.random.PRNGKey(2), (b, s, s, 2))
    z = jax.random.normal(
        jax.random.PRNGKey(3),
        transformer.reverse_input_shape(spec.flow, b, lat, spec.flow_in_channels),
    )

    embed = jax.jit(lambda p, x0, pk: second_stage.embed_cond(p, spec, x0, pk))
    cond = None
    if stages & {"embed", "reverse", "forward"}:
        cond = embed(params, x[:, 0], poke)
        jax.block_until_ready(cond)

    if args.flow_dtype == "bf16":
        params["flow"] = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params["flow"],
        )
        z = z.astype(jnp.bfloat16)
        if cond is not None:
            cond = cond.astype(jnp.bfloat16)

    if args.sampler == "direct":
        from ipoke_tpu.train import distill
        from ipoke_tpu.utils.synth import synth_tree

        ds = distill.DirectStudentSpec(hidden=args.student_hidden,
                                       depth=args.student_depth)
        sparams = synth_tree(
            lambda k: distill.init_direct(k, spec, ds), jax.random.PRNGKey(5)
        )
        z = jax.random.normal(
            jax.random.PRNGKey(3), (b, lat, lat, spec.flow_in_channels)
        )

        def _reverse_fn(p, zz, c):
            return distill.direct_apply(sparams, ds, zz, c)
    else:
        def _reverse_fn(p, zz, c):
            return transformer.reverse(p["flow"], spec.flow, zz, c)

    reverse = jax.jit(_reverse_fn)
    if "reverse" in stages:
        motion = reverse(params, z, cond)
        jax.block_until_ready(motion)
    else:
        # same shape/dtype as the flow output, without compiling the 56-step graph
        m_shape = jax.eval_shape(
            lambda p, zz, c: transformer.reverse(p["flow"], spec.flow, zz, c),
            params, z, cond if cond is not None else
            jax.eval_shape(lambda p, x0, pk: second_stage.embed_cond(p, spec, x0, pk),
                           params, x[:, 0], poke),
        )
        motion = jax.random.normal(jax.random.PRNGKey(4), m_shape.shape, m_shape.dtype)

    decode = jax.jit(lambda p, m, x0: second_stage.decode_first_stage(p, spec, m, x0, t - 1))
    if "decode" in stages:
        vid = decode(params, motion, x[:, 0])
        jax.block_until_ready(vid)

    fwd = jax.jit(lambda p, m, c: transformer.forward(p["flow"], spec.flow, m, c)[0])
    if "forward" in stages:
        out = fwd(params, motion, cond)
        jax.block_until_ready(out)

    def bench(fn, *a):
        # force completion with a host scalar fetch: block_until_ready
        # returns EARLY on the remote axon platform (NOTES.md)
        forced = jax.jit(lambda *aa: jnp.sum(fn(*aa).astype(jnp.float32)))
        _ = float(forced(*a))
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            _ = float(forced(*a))
            ts.append(time.time() - t0)
        import statistics
        lat = statistics.median(ts)
        # pipelined per-step: dispatch N, fetch only the last — the device
        # queue is serial so the final fetch forces the chain; amortizes the
        # ~35 ms host/tunnel round trip out of the measure (bench.py protocol)
        n = max(args.iters, 5)
        t0 = time.time()
        outs = [forced(*a) for _ in range(n)]
        _ = float(outs[-1])
        return lat, (time.time() - t0) / n

    res = {"batch": b}
    def put(name, fn, *a):
        lat, pipe = bench(fn, *a)
        res[name + "_s"] = lat
        res[name + "_pipelined_s"] = pipe
    if "embed" in stages:
        put("embed_cond", embed, params, x[:, 0], poke)
    if "reverse" in stages:
        put("flow_reverse", reverse, params, z, cond)
    if "forward" in stages:
        put("flow_forward", fwd, params, motion, cond)
    if "decode" in stages:
        put("decode", decode, params, motion, x[:, 0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
