"""Training-throughput benchmark: second-stage flow train step at the
flagship (iper_128) architecture on one TPU chip.

    python -m ipoke_tpu.utils.bench_train [--batch 8] [--iters 5]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--model", default="iper_128")
    ap.add_argument("--opt", default="adamw", choices=["adamw", "adafactor"],
                    help="adafactor: factored second moments — fits full-depth single-chip training (full Adam state is 2x the 4.2GB params)")
    ap.add_argument("--per-level", dest="per_level", action="store_true",
                    help="chunked trainer with immediate per-level optimizer updates")
    ap.add_argument("--chunked", action="store_true",
                    help="compile-bounded per-level VJP trainer (full depth)")
    ap.add_argument("--levels", type=int, default=0,
                    help="truncate the flow to the first N levels (0 = full); the remote compile service OOMs on the full-depth AD graph")
    ap.add_argument("--remat", action="store_true", default=True)
    ap.add_argument("--no-remat", dest="remat", action="store_false")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                    help="bf16: mixed precision (master params f32, forward "
                         "compute bf16; logdet/NLL stay f32) — monolithic "
                         "trainer only")
    ap.add_argument("--converge", type=int, default=0,
                    help="after the timing iters, run N more steps on FRESH "
                         "on-device synthetic batches and report the loss "
                         "curve — end-to-end convergence evidence for the "
                         "full optimizer/grad chain at flagship scale")
    args = ap.parse_args()

    from ipoke_tpu.utils import warmup as _warmup

    warm = _warmup.start()  # absorb the compile-service spin-up (utils/warmup.py)

    from ipoke_tpu import registry
    from ipoke_tpu.models import second_stage
    from ipoke_tpu.train import second_stage as train_ss

    from dataclasses import replace

    spec = registry.build_specs(registry.MODELS[args.model])
    if args.remat:
        spec = replace(spec, flow=replace(spec.flow, remat=True))
    if args.levels:
        spec = replace(spec, flow=replace(spec.flow, num_steps=spec.flow.num_steps[: args.levels]))
    def retry(fn, what, n=5):
        last = None
        for attempt in range(n):
            try:
                return fn()
            except Exception as e:  # transient remote-compile failures
                last = e
                print(f"{what} attempt {attempt+1} failed: {e}", file=sys.stderr)
                time.sleep(90)
        raise last

    params = retry(lambda: jax.jit(lambda k: second_stage.init(k, spec))(jax.random.PRNGKey(0)),
                   "init")
    trainable, frozen = train_ss.split_params(params)
    opt = train_ss.make_optimizer(trainable, lr=1e-3)
    if args.per_level:
        import optax

        from ipoke_tpu.train import chunked
        from ipoke_tpu.train.second_stage import _float_labels

        def make_opt(level_params):
            if args.opt == "adafactor":
                base = optax.adafactor(1e-3)
                return optax.multi_transform(
                    {"train": base, "freeze": optax.set_to_zero()}, _float_labels(level_params)
                )
            return train_ss.make_optimizer(level_params, lr=1e-3)

        step = chunked.make_per_level_trainer(spec.flow, spec, frozen, make_opt)
        state = step.init_state(trainable["flow"])
    elif args.chunked:
        from ipoke_tpu.train import chunked

        chunk_params = {"flow": trainable["flow"]}
        opt = train_ss.make_optimizer(chunk_params, lr=1e-3)
        state = chunked.ChunkedTrainState(
            jnp.zeros((), jnp.int32), chunk_params, opt.init(chunk_params)
        )
        step = chunked.make_chunked_trainer(spec.flow, spec, frozen, opt)
    else:
        state = train_ss.init_state(trainable, opt)
        # donate the state: params + optimizer moments are ~7 GB at iper_128
        # scale; without donation jit double-buffers them
        compute_dtype = jnp.bfloat16 if args.dtype == "bf16" else None
        step = jax.jit(
            train_ss.make_train_step(spec, frozen, opt, compute_dtype=compute_dtype),
            donate_argnums=(0,),
        )

    b = args.batch
    t = spec.first_stage.max_frames
    s = spec.first_stage.spatial_size
    batch = {
        "images": jax.random.normal(jax.random.PRNGKey(1), (b, t, s, s, 3)),
        "poke": jax.random.normal(jax.random.PRNGKey(2), (b, s, s, 2)),
    }
    rng = jax.random.PRNGKey(3)
    # NB: jax.block_until_ready returns EARLY on the remote "axon" platform
    # (async handles) — force completion by fetching the loss scalar instead
    t0 = time.time()
    state, metrics = retry(lambda: step(state, batch, rng), "first step")
    _ = float(metrics["flow_loss"])
    compile_s = time.time() - t0
    times = []
    for i in range(args.iters):
        rng = jax.random.fold_in(rng, i)
        t0 = time.time()
        state, metrics = step(state, batch, rng)
        _ = float(metrics["flow_loss"])
        times.append(time.time() - t0)
    import statistics as _st

    converge = {}
    if args.converge:
        # fresh synthetic batch every step, generated ON DEVICE (a host-side
        # 15.7 MB/step transfer through the tunnel would dominate)
        @jax.jit
        def make_batch(k):
            k1, k2 = jax.random.split(k)
            return {
                "images": jax.random.normal(k1, (b, t, s, s, 3)),
                "poke": jax.random.normal(k2, (b, s, s, 2)),
            }

        curve = []
        t0 = time.time()
        for i in range(args.converge):
            key = jax.random.fold_in(jax.random.PRNGKey(11), i)
            state, metrics = step(state, make_batch(key), jax.random.fold_in(rng, 1000 + i))
            if i % 10 == 0 or i == args.converge - 1:
                curve.append((i, float(metrics["flow_loss"])))
        wall = time.time() - t0
        losses = [l for _, l in curve]
        converge = {
            "converge_steps": args.converge,
            "converge_wall_s": round(wall, 1),
            "loss_first": round(losses[0], 3),
            "loss_last": round(losses[-1], 3),
            "loss_min": round(min(losses), 3),
            "curve_every10": [(i, round(l, 2)) for i, l in curve[:: max(1, len(curve) // 20)]],
        }

    best = _st.median(times)
    print(json.dumps({
        **converge,
        "train_step_s": round(best, 4),
        "examples_per_s": round(b / best, 2),
        "all_steps_s": [round(x, 4) for x in times],
        "compile_plus_first_s": round(compile_s, 1),
        "loss": float(metrics["flow_loss"]),
        "batch": b,
        "model": args.model,
        "remat": args.remat,
        "chunked": args.chunked,
        "per_level": args.per_level,
        "opt": args.opt,
        "dtype": args.dtype,
        "levels": args.levels or len(spec.flow.num_steps),
        "n_flow_steps": int(sum(spec.flow.num_steps)),
    }))


if __name__ == "__main__":
    main()
