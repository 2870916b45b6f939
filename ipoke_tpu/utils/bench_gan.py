"""Stage-1 cVAE-GAN training-step benchmark on one TPU chip.

The heaviest training loop in the framework: one jitted step = temporal-disc
update (hinge + grad-penalty grad-of-grad) + spatial-disc update + generator
update (adv + fmap + VGG19 perceptual + L1 + KL), at the flagship
iper_128 geometry (10-frame 128x128 videos).  The reference never publishes
stage-1 throughput; this pins ours.

    python -m ipoke_tpu.utils.bench_gan [--batch 4] [--remat] [--iters 5]

Forced-execution protocol (NOTES.md): every timed step fetches a scalar that
depends on the updated generator params, so the remote platform's async
handles cannot return early.
"""
import argparse
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

from ipoke_tpu.utils import cache as _cache

_cache.enable()  # jax 0.9.0 ignores the env var; see utils/cache.py


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="iper_128")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the generator forward (HBM relief); "
                         "equivalent to --remat-mode both")
    ap.add_argument("--remat-mode", default=None,
                    choices=["none", "outer", "decode", "both"],
                    help="outer: checkpoint the whole generator forward; "
                         "decode: per-frame remat of the SPADE decode scan "
                         "only (the dominant residual stack); both; none")
    ap.add_argument("--vgg-chunks", type=int, default=1,
                    help="remat-scan the VGG19 perceptual loss over N equal "
                         "frame chunks (exact value+grads; one chunk's VGG "
                         "activations live at a time).  Must divide "
                         "batch*(frames-1)")
    ap.add_argument("--disc-bf16", action="store_true",
                    help="bfloat16 discriminator activations (opt-in "
                         "memory/speed knob; losses reduce in f32)")
    ap.add_argument("--n-spatial", type=int, default=16)
    ap.add_argument("--converge", type=int, default=0,
                    help="after the timing iters, run N more steps on a "
                         "LEARNABLE on-device synthetic video distribution "
                         "(moving colored Gaussian blobs) and report the "
                         "reconstruction/KL/disc loss curves — end-to-end "
                         "convergence evidence for the 3-optimizer GAN step")
    args = ap.parse_args()

    from ipoke_tpu.utils import warmup as _warmup

    warm = _warmup.start()  # overlap service spin-up with the synth init

    from ipoke_tpu import registry
    from ipoke_tpu.models.discriminators import PatchDiscSpec, TempDiscSpec
    from ipoke_tpu.train import first_stage as tfs
    from ipoke_tpu.utils.synth import synth_tree

    entry = registry.MODELS[args.model]
    fs_spec = registry.build_specs(entry).first_stage
    ss = fs_spec.spatial_size
    dt_spec = TempDiscSpec(
        spatial_size=ss, sequence_length=min(12, fs_spec.max_frames), gp_weight=1.0
    )
    ds_spec = PatchDiscSpec(gp_weight=0.0)

    # zero-compile init: synthesize the full GanTrainState on host (the
    # unjitted init is thousands of tunnel dispatches; the jitted init graph
    # rides the flaky remote compile service).  Params get the random fill;
    # optimizer states get zeros (random Adam nu < 0 -> sqrt NaN).
    t0 = time.time()
    params = synth_tree(
        lambda k: dict(zip(
            ("gen", "ds", "dt"),
            tfs.init_gan_state(k, fs_spec, ds_spec, dt_spec)[0][1:4],
        )),
        jax.random.PRNGKey(0),
    )
    opts = {n: tfs.make_gan_optimizer(params[n], 2e-4) for n in ("gen", "ds", "dt")}
    opt_states = synth_tree(
        lambda: {n: opts[n].init(params[n]) for n in ("gen", "ds", "dt")},
        float_fill="zeros",
    )
    state = tfs.GanTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=params["gen"], ds_params=params["ds"], dt_params=params["dt"],
        gen_opt=opt_states["gen"], ds_opt=opt_states["ds"], dt_opt=opt_states["dt"],
    )
    print(f"synth init: {time.time()-t0:.1f}s", file=sys.stderr)

    remat = args.remat_mode if args.remat_mode else args.remat
    step = tfs.make_gan_train_step(
        fs_spec, ds_spec, dt_spec, opts,
        n_spatial_examples=args.n_spatial, remat=remat,
        vgg_chunks=args.vgg_chunks, disc_bf16=args.disc_bf16,
    )

    track = ("l_rec", "l_vgg", "l_kl", "loss", "loss_d_dt", "loss_d_ds")

    def step_forced(state, batch, rng):
        new_state, metrics = step(state, batch, rng)
        # scalar fetched per step; depends on every updated generator leaf
        probe = sum(
            jnp.sum(jnp.abs(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(new_state.gen_params)
        )
        return new_state, {k: metrics[k] for k in track}, probe

    b, t = args.batch, fs_spec.max_frames
    batch = {
        "images": 0.5 * jax.random.normal(jax.random.PRNGKey(1), (b, t, ss, ss, 3)),
    }
    jit_step = jax.jit(step_forced, donate_argnums=(0,))
    rng = jax.random.PRNGKey(2)

    w = _warmup.join(warm)
    print(f"compile-service warmup: {w if w is None else round(w, 1)}s", file=sys.stderr)

    t0 = time.time()
    lowered = jit_step.lower(state, batch, rng)
    compiled = lowered.compile()
    compile_s = time.time() - t0
    try:
        flops = float((compiled.cost_analysis() or {}).get("flops", 0.0))
    except Exception:
        flops = 0.0

    state, mtr, probe = compiled(state, batch, rng)
    _ = float(probe)
    first_s = time.time() - t0 - compile_s

    times = []
    for i in range(args.iters):
        r = jax.random.fold_in(rng, i)
        t1 = time.time()
        state, mtr, probe = compiled(state, batch, r)
        _ = float(probe)
        times.append(time.time() - t1)
    med = statistics.median(times)
    loss = mtr["loss"]

    converge = {}
    if args.converge:
        # Learnable synthetic distribution, generated ON DEVICE: each video is
        # a colored Gaussian blob drifting at a constant per-video velocity
        # over a per-video constant background tint.  The motion encoder can
        # compress the (velocity, start) into z and the GRU+SPADE decoder can
        # re-render it, so reconstruction (L1 + VGG) must actually FALL if the
        # 3-optimizer step optimizes — random-noise targets cannot show that.
        grid = jnp.linspace(0.0, 1.0, ss)
        gy, gx = jnp.meshgrid(grid, grid, indexing="ij")  # (S, S)

        @jax.jit
        def make_videos(k):
            ks = jax.random.split(k, 6)
            c0 = jax.random.uniform(ks[0], (b, 2), minval=0.25, maxval=0.75)
            vel = jax.random.uniform(ks[1], (b, 2), minval=-0.03, maxval=0.03)
            color = jax.random.uniform(ks[2], (b, 3), minval=0.3, maxval=1.0)
            tint = jax.random.uniform(ks[3], (b, 3), minval=-0.6, maxval=0.0)
            sign = jnp.sign(jax.random.normal(ks[4], (b, 3)))
            steps = jnp.arange(t, dtype=jnp.float32)[None, :, None]  # (1,T,2)
            ctr = c0[:, None, :] + vel[:, None, :] * steps           # (B,T,2)
            d2 = (gy[None, None] - ctr[..., 0:1, None]) ** 2 + (
                gx[None, None] - ctr[..., 1:2, None]) ** 2           # (B,T,S,S)
            blob = jnp.exp(-d2 / (2 * 0.008))
            vids = (tint[:, None, None, None, :]
                    + sign[:, None, None, None, :]
                    * color[:, None, None, None, :] * blob[..., None])
            return {"images": jnp.clip(vids, -1.0, 1.0)}

        curve = []
        t0 = time.time()
        for i in range(args.converge):
            key = jax.random.fold_in(jax.random.PRNGKey(21), i)
            state, m, probe = compiled(state, make_videos(key), jax.random.fold_in(rng, 5000 + i))
            if i % 10 == 0 or i == args.converge - 1:
                curve.append((i, {k: float(v) for k, v in m.items()}))
        wall = time.time() - t0
        recs = [c["l_rec"] for _, c in curve]
        converge = {
            "converge_steps": args.converge,
            "converge_wall_s": round(wall, 1),
            "l_rec_first": round(recs[0], 4),
            "l_rec_last": round(recs[-1], 4),
            "l_rec_min": round(min(recs), 4),
            "curve_every10": [
                (i, {k: round(v, 3) for k, v in c.items()})
                for i, c in curve[:: max(1, len(curve) // 15)]
            ],
        }

    print(
        json.dumps(
            {
                **converge,
                "metric": f"stage1 GAN train step, {args.model}, batch {b}, "
                          f"{t} frames {ss}x{ss}, remat={remat}, "
                          f"vgg_chunks={args.vgg_chunks}, "
                          f"disc_bf16={args.disc_bf16}",
                "median_step_s": round(med, 4),
                "examples_per_s": round(b / med, 2),
                "all_step_s": [round(x, 4) for x in times],
                "compile_s": round(compile_s, 1),
                "first_step_s": round(first_s, 2),
                "flops_per_step": flops,
                "achieved_tflops": round(flops / med / 1e12, 2) if flops else None,
                "final_loss": float(loss),
            }
        )
    )


if __name__ == "__main__":
    main()
