"""Distillation trainer at flagship scale on the real TPU (synth teacher).

    # step benchmark (r3 behavior):
    python -m ipoke_tpu.utils.bench_distill --student direct --steps 8

    # train to usefulness + held-out eval + checkpoint (r4):
    python -m ipoke_tpu.utils.bench_distill --student direct --steps 30000 \
        --cond-pool 64 --eval-every 5000 --save logs/distill/student_direct.npz

The distill step (frozen-teacher reverse + student update) runs at the
shipping architecture size.  The r4 trainer varies the conditioning per step
(a pool of embedded (x0, poke) batches), evaluates on HELD-OUT conditionings
and fresh Gaussian draws — per-pair motion MSE/relative error, per-channel
moment match, and decoded-video distances between student and teacher — and
saves the student for bench.py --sampler direct / serving.

With a synth-stable teacher the distributional match is real evidence the
student learned the teacher map; absolute video quality needs real teacher
weights (NOTES.md).  Reference anchor: the sequential sampling hot loop this
replaces (reference models/modules/INN/macow2.py:174-288).
"""
import argparse
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.utils import cache as _cache

_cache.enable()

T0 = time.time()


def log(msg):
    print(f"[bench_distill +{time.time()-T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="iper_128")
    ap.add_argument("--student", default="direct", choices=["direct", "flow"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--student-hidden", type=int, default=256)
    ap.add_argument("--student-depth", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--cond-pool", type=int, default=0,
                    help="N distinct embedded (x0, poke) batches cycled "
                    "during training (0 = one fixed cond, the r3 step-bench "
                    "behavior).  >0 is required for a student that "
                    "generalizes across conditionings")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="evaluate on held-out conds every N steps (0 = only "
                    "at the end when --eval-batches > 0)")
    ap.add_argument("--eval-batches", type=int, default=0,
                    help="held-out eval: N fresh cond batches + fresh z; "
                    "reports motion MSE/rel-err, moment match, and decoded "
                    "video distances student-vs-teacher")
    ap.add_argument("--save", default=None,
                    help="write the trained student (npz via ckpt/io) here")
    ap.add_argument("--budget-s", type=float, default=0,
                    help="stop training early when exceeded (eval+save still "
                    "run); 0 = no budget")
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

    warm = _warmup.start()

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
    embed = jax.jit(lambda p, a, pk: second_stage.embed_cond(p, spec, a, pk))

    def make_cond(seed):
        kx = jax.random.PRNGKey(seed)
        x0 = jax.random.normal(kx, (b, s, s, 3))
        poke = jax.random.normal(jax.random.fold_in(kx, 1), (b, s, s, 2))
        return x0, poke, embed(teacher, x0, poke)

    zshape = transformer.reverse_input_shape(
        spec.flow, b, spec.latent_size, spec.flow_in_channels
    )

    log("embedding cond pool" if args.cond_pool else "embedding fixed cond")
    if args.cond_pool > 0:
        pool = [make_cond(10_000 + i)[2] for i in range(args.cond_pool)]
        conds = jnp.stack(pool)  # (K, b, s0, s0, C)
        get_cond = lambda i: conds[i % args.cond_pool]
    else:
        _, _, c0 = make_cond(10_000)
        get_cond = lambda i: c0

    # --- held-out eval machinery (teacher vs student on fresh cond + z) ----
    t_motion = jax.jit(
        lambda p, z, c: distill.teacher_motion(p, spec, z, c))
    decode = jax.jit(
        lambda p, m, x0: second_stage.decode_first_stage(p, spec, m, x0,
                                                         entry.max_frames - 1))

    if args.student == "direct":
        s_motion = jax.jit(
            lambda sp, p, z, c: distill.direct_apply(
                sp, student, distill._z_at_motion_geometry(spec.flow, z), c))

        def evaluate(state, n_batches):
            """Held-out conds (seeds disjoint from the train pool) + fresh z.

            The direct student is trained to match the teacher MAP (MSE on
            teacher reverse output), so pointwise z-by-z comparison is the
            right eval."""
            mses, rels, psnrs, vmses = [], [], [], []
            mom_mean, mom_std = [], []
            for j in range(n_batches):
                x0, poke, c = make_cond(900_000 + j)
                z = jax.random.normal(jax.random.PRNGKey(800_000 + j), zshape)
                mt = np.asarray(t_motion(teacher, z, c), np.float32)
                ms = np.asarray(s_motion(state["params"], teacher, z, c),
                                np.float32)
                mses.append(float(np.mean((mt - ms) ** 2)))
                rels.append(float(np.linalg.norm(ms - mt) /
                                  (np.linalg.norm(mt) + 1e-8)))
                # per-channel moments over (batch, pixels)
                ax = (0, 1, 2)
                mom_mean.append(float(np.max(np.abs(mt.mean(ax) - ms.mean(ax)))))
                mom_std.append(float(np.max(np.abs(mt.std(ax) - ms.std(ax)) /
                                            (mt.std(ax) + 1e-8))))
                vt = np.asarray(decode(teacher, jnp.asarray(mt), x0), np.float32)
                vs = np.asarray(decode(teacher, jnp.asarray(ms), x0), np.float32)
                vmse = np.mean((vt - vs) ** 2)
                vmses.append(float(vmse))
                psnrs.append(float(10 * np.log10(4.0 / max(vmse, 1e-12))))
            return {
                "heldout_motion_mse": round(statistics.mean(mses), 6),
                "heldout_motion_rel_err": round(statistics.mean(rels), 5),
                "heldout_moment_mean_maxdiff": round(statistics.mean(mom_mean), 5),
                "heldout_moment_std_maxreldiff": round(statistics.mean(mom_std), 5),
                "heldout_video_mse_to_teacher": round(statistics.mean(vmses), 6),
                "heldout_video_psnr_to_teacher_db": round(statistics.mean(psnrs), 2),
                "n_eval_batches": n_batches,
            }
    else:
        # The flow student is trained by MLE on teacher samples: it learns
        # the teacher's DISTRIBUTION, not its z->motion map, so pointwise
        # z-by-z MSE is meaningless.  Distributional eval instead:
        #   (a) held-out NLL of teacher samples under the student vs the
        #       teacher's own NLL on the same samples (the cross-entropy
        #       floor H(p_T) <= H(p_T, p_S); the gap is the distillation
        #       quality in nats),
        #   (b) per-channel moment match between teacher and student reverse
        #       samples drawn from INDEPENDENT Gaussian z,
        #   (c) seeded-I3D Frechet distance (FVD*, same metric as
        #       utils/bench_e2e.py) between teacher-decoded and
        #       student-decoded videos on held-out conditionings.
        from ipoke_tpu.flows.loss import flow_loss as _floss

        s_reverse = jax.jit(
            lambda sp, z, c: transformer.reverse(sp, student, z, c))
        t_nll = jax.jit(lambda p, m, c: _floss(
            *transformer.forward(p["flow"], spec.flow, m, c)[:2])[0])
        s_nll = jax.jit(lambda sp, m, c: _floss(
            *transformer.forward(sp, student, m, c)[:2])[0])
        _fvd_acc = []

        def evaluate(state, n_batches):
            from ipoke_tpu.metrics.fvd import FVDAccumulator

            if not _fvd_acc:
                _fvd_acc.append(FVDAccumulator(n_samples=n_batches * b))
            acc = _fvd_acc[0]
            acc.reset()
            nll_t, nll_s, mom_mean, mom_std = [], [], [], []
            for j in range(n_batches):
                x0, poke, c = make_cond(900_000 + j)
                z = jax.random.normal(jax.random.PRNGKey(800_000 + j), zshape)
                z2 = jax.random.normal(jax.random.PRNGKey(810_000 + j), zshape)
                mt = t_motion(teacher, z, c)
                nll_t.append(float(t_nll(teacher, mt, c)))
                nll_s.append(float(s_nll(state["params"], mt, c)))
                ms = s_reverse(state["params"], z2, c)
                mt_np = np.asarray(mt, np.float32)
                ms_np = np.asarray(ms, np.float32)
                ax = (0, 1, 2)
                mom_mean.append(float(np.max(np.abs(
                    mt_np.mean(ax) - ms_np.mean(ax)))))
                mom_std.append(float(np.max(np.abs(
                    mt_np.std(ax) - ms_np.std(ax)) / (mt_np.std(ax) + 1e-8))))
                vt = np.asarray(decode(teacher, mt, x0), np.float32)
                vs = np.asarray(decode(teacher, ms, x0), np.float32)
                acc.update(vt, vs)
            return {
                "heldout_student_nll": round(statistics.mean(nll_s), 2),
                "teacher_self_nll_floor": round(statistics.mean(nll_t), 2),
                "heldout_nll_gap_nats": round(
                    statistics.mean(nll_s) - statistics.mean(nll_t), 2),
                "heldout_moment_mean_maxdiff": round(statistics.mean(mom_mean), 5),
                "heldout_moment_std_maxreldiff": round(statistics.mean(mom_std), 5),
                "fvd_star_teacher_vs_student": round(float(acc.compute()), 4),
                "i3d_pretrained": acc.pretrained,
                "n_eval_batches": n_batches,
            }

    jstep = jax.jit(step)
    t0 = time.time()
    losses, eval_curve = [], []
    t_after_first = None
    steps_done = 0
    eval_wall = 0.0  # held-out evals run inside the train window; subtracted
    # from train_wall so mean_step_s measures TRAINING steps only (ADVICE r4)
    for i in range(args.steps):
        z = jax.random.normal(jax.random.PRNGKey(100 + i), zshape)
        state, logs = jstep(state, teacher, z, get_cond(i))
        steps_done = i + 1
        if i == 0:
            loss = float(logs["loss"])  # host fetch forces completion
            log(f"compile+first: {time.time()-t0:.1f}s loss {loss:.4f}")
            losses.append(round(loss, 4))
            t_after_first = time.time()
        elif i % 50 == 0 or i == args.steps - 1:
            # fetch every 50 steps: forces the dispatched chain (the axon
            # async-handle protocol, NOTES.md) while keeping the loop
            # pipelined between fetches
            loss = float(logs["loss"])
            losses.append(round(loss, 4))
            if i % 1000 == 0:
                log(f"step {i}: loss {loss:.4f}")
        if args.eval_every and i > 0 and i % args.eval_every == 0:
            te0 = time.time()
            ev = evaluate(state, max(1, args.eval_batches or 2))
            eval_curve.append({"step": i, **ev})
            log(f"eval @ {i}: {ev}")
            eval_wall += time.time() - te0
        if args.budget_s and time.time() - T0 > args.budget_s:
            float(logs["loss"])  # drain the queue before declaring the cut
            log(f"budget exceeded at step {i}; stopping early")
            break
    train_wall = (time.time() - t_after_first - eval_wall) if t_after_first else 0.0
    step_s = train_wall / max(1, steps_done - 1)

    final_eval = None
    if args.eval_batches > 0:
        final_eval = evaluate(state, args.eval_batches)
        log(f"final eval: {final_eval}")

    if args.save:
        import os

        from ipoke_tpu.ckpt import io as ckpt_io

        os.makedirs(os.path.dirname(args.save) or ".", exist_ok=True)
        meta = {"kind": args.student, "hidden": args.student_hidden,
                "depth": args.student_depth, "model": args.model,
                "teacher_init": args.init,
                "steps_trained": int(state["step"])}
        if args.student == "flow":
            meta["num_steps"] = list(student.num_steps)
        ckpt_io.save(args.save, state["params"], metadata=meta)
        log(f"student saved -> {args.save}")

    print(json.dumps({
        "student": args.student,
        "batch": b,
        "steps_run": int(state["step"]),
        "cond_pool": args.cond_pool,
        "losses_first_last": losses[:4] + ["..."] + losses[-4:]
        if len(losses) > 10 else losses,
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "mean_step_s": round(step_s, 4) if steps_done > 1 else None,
        "eval_curve": eval_curve,
        "final_eval": final_eval,
        "saved": args.save,
        "wall_s": round(time.time() - T0, 1),
    }))


if __name__ == "__main__":
    main()
