"""Distillation trainer at flagship scale on the real TPU (synth teacher).

    python -m ipoke_tpu.utils.bench_distill --student direct --steps 8

Proves the distill step (teacher reverse, no grads + student update)
compiles and runs on device at the shipping architecture size, and prints
per-step wall times + losses.  A quality-bearing run needs real teacher
weights (NOTES.md); with a synth teacher the loss trajectory only shows the
optimization is alive.
"""
import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

from ipoke_tpu.utils import cache as _cache

_cache.enable()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="iper_128")
    ap.add_argument("--student", default="direct", choices=["direct", "flow"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--student-hidden", type=int, default=256)
    ap.add_argument("--student-depth", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--init", default="synth-stable",
                    choices=["jit", "synth", "synth-stable"],
                    help="teacher init.  synth-stable (default): synth "
                    "values with the flow's zero-init'd output-conv gains "
                    "zeroed like the real init -> near-identity flow, "
                    "stable reverse, finite losses, NO init compile.  "
                    "jit = real jitted init (the flagship init graph gets "
                    "SIGKILLed by the remote compile service).  synth = raw "
                    "synth values (timing only: random flow weights AMPLIFY "
                    "through the 56-step reverse and the loss goes NaN)")
    args = ap.parse_args()

    from ipoke_tpu.utils import warmup as _warmup

    _warmup.start()

    import optax

    from ipoke_tpu import registry
    from ipoke_tpu.flows import transformer
    from ipoke_tpu.models import second_stage
    from ipoke_tpu.train import distill
    from ipoke_tpu.utils.synth import synth_params, synth_tree

    entry = registry.MODELS[args.model]
    spec = registry.build_specs(entry)
    if args.init == "jit":
        teacher = jax.jit(lambda k: second_stage.init(k, spec))(
            jax.random.PRNGKey(0)
        )
    else:
        teacher = synth_params(spec)
        if args.init == "synth-stable":
            from ipoke_tpu.utils.synth import zero_flow_output_convs

            teacher["flow"] = zero_flow_output_convs(teacher["flow"])

    if args.student == "direct":
        student = distill.DirectStudentSpec(hidden=args.student_hidden,
                                            depth=args.student_depth)
    else:
        # one MaCow step per level: 50 -> 15 sequential steps
        student = distill.flow_student_spec(
            spec.flow, (1,) * len(spec.flow.num_steps)
        )

    opt = optax.adam(args.lr)
    init_state, step = distill.make_distill_step(spec, student, opt)
    # synth init: a real init_state would eager-init on device (dispatch
    # storm through the tunnel) or need its own jitted-init compile.  Zero
    # the optimizer leaves afterwards (Adam's nu must be >= 0; zeros is
    # exactly optax's real init).
    state = synth_tree(init_state, jax.random.PRNGKey(0))
    state["opt"] = jax.tree_util.tree_map(
        lambda a: jnp.zeros_like(a), state["opt"]
    )
    state["step"] = jnp.zeros_like(state["step"])

    b, s = args.batch, entry.spatial_size
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, s, s, 3))
    poke = jax.random.normal(jax.random.PRNGKey(2), (b, s, s, 2))
    cond = jax.jit(lambda p, a, pk: second_stage.embed_cond(p, spec, a, pk))(
        teacher, x0, poke
    )
    zshape = transformer.reverse_input_shape(
        spec.flow, b, spec.latent_size, spec.flow_in_channels
    )

    jstep = jax.jit(step)
    t0 = time.time()
    losses, times = [], []
    for i in range(args.steps):
        z = jax.random.normal(jax.random.PRNGKey(100 + i), zshape)
        t1 = time.time()
        state, logs = jstep(state, teacher, z, cond)
        loss = float(logs["loss"])  # host fetch forces completion (NOTES.md)
        if i == 0:
            print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
        else:
            times.append(time.time() - t1)
        losses.append(round(loss, 4))
    import statistics

    print(json.dumps({
        "student": args.student,
        "batch": b,
        "losses": losses,
        "median_step_s": round(statistics.median(times), 4) if times else None,
    }))


if __name__ == "__main__":
    main()
