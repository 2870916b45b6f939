"""Headline benchmark: 128x128x10-frame video sampling throughput per chip
(cINN reverse pass + first-stage VAE decode), flagship iper_128 architecture.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "videos/s/chip", "vs_baseline": N}

vs_baseline is measured against BASELINE.json's north-star anchor: the
reference is PyTorch on CPU, for which the 50x target implies ~0.1 videos/s
(no throughput numbers are published in the reference repo; see BASELINE.md).
vs_baseline >= 50 means the north-star throughput target is met.
"""
import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax
import jax.numpy as jnp

PYTORCH_CPU_BASELINE_VIDEOS_PER_S = 0.1  # anchor from BASELINE.json's >=50x target


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="iper_128")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--compile-retries", type=int, default=4,
                    help="the remote compile service is occasionally OOM-killed; retry")
    ap.add_argument("--mcf-backend", default="scan", choices=["scan", "pallas", "pallas_unit"])
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                    help="bf16 casts params+activations (logdet math stays f32)")
    args = ap.parse_args()

    from dataclasses import replace

    from ipoke_tpu import registry
    from ipoke_tpu.models import second_stage

    entry = registry.MODELS[args.model]
    spec = registry.build_specs(entry)
    spec = replace(spec, flow=replace(spec.flow, mcf_backend=args.mcf_backend))

    def retry(fn, what):
        last = None
        for attempt in range(args.compile_retries):
            try:
                return fn()
            except Exception as e:
                last = e
                import sys

                print(f"{what} attempt {attempt+1} failed: {e}", file=sys.stderr)
                time.sleep(60)
        raise last

    key = jax.random.PRNGKey(0)
    # jit the init: unjitted it is thousands of tiny dispatches (slow over the
    # remote-TPU tunnel); jitted it is one compile + one execution
    params = retry(lambda: jax.jit(lambda k: second_stage.init(k, spec))(key), "init")
    if args.dtype == "bf16":
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )

    b = args.batch
    t = entry.max_frames
    s = entry.spatial_size
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    batch = {
        "images": jax.random.normal(jax.random.PRNGKey(1), (b, t, s, s, 3), dtype),
        "poke": jax.random.normal(jax.random.PRNGKey(2), (b, s, s, 2), dtype),
    }

    @jax.jit
    def sample(params, batch, rng):
        return second_stage.forward_sample(params, spec, batch, rng, n_samples=1)

    rng = jax.random.PRNGKey(3)
    t0 = time.time()
    last_err = None
    for attempt in range(args.compile_retries):
        try:
            out = sample(params, batch, rng)
            jax.block_until_ready(out)
            last_err = None
            break
        except Exception as e:  # transient remote-compile failures
            last_err = e
            import sys

            print(f"compile attempt {attempt+1} failed: {e}", file=sys.stderr)
            time.sleep(60)
    if last_err is not None:
        raise last_err
    compile_and_first = time.time() - t0

    times = []
    for i in range(args.iters):
        rng = jax.random.fold_in(rng, i)
        t0 = time.time()
        out = sample(params, batch, rng)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    videos_per_s = b / best

    result = {
        "metric": f"{s}x{s}x{t} videos/sec/chip (cINN sample + VAE decode, {args.model})",
        "value": round(videos_per_s, 3),
        "unit": "videos/s/chip",
        "vs_baseline": round(videos_per_s / PYTORCH_CPU_BASELINE_VIDEOS_PER_S, 2),
    }
    print(json.dumps(result))
    import sys

    print(
        json.dumps(
            {
                "detail": {
                    "batch": b,
                    "best_step_s": round(best, 4),
                    "all_steps_s": [round(x, 4) for x in times],
                    "compile_plus_first_s": round(compile_and_first, 2),
                    "device": str(jax.devices()[0]),
                    "mcf_backend": args.mcf_backend,
                    "dtype": args.dtype,
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
