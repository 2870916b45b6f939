"""End-to-end two-stage quality loop, weights-free (VERDICT r3 item 1).

Chains the FULL product on the synthetic procedural-video dataset, on one
chip, and shows the evaluation metric *improving* over stage-2 training:

  1. train the poke encoder + image conditioner (ConvAE trainers),
  2. train a small stage-1 cVAE-GAN (3-optimizer step) on procedural videos,
  3. freeze everything, train the stage-2 cINN from fresh init,
  4. every --eval-every steps: sample videos on a FIXED eval set and compute
     the FVD-style metric (seeded I3D features -> Frechet distance; the
     filters are random without real weights, so the score is RELATIVE — the
     fresh-init step-0 score is the control, and the reconstruction FVD of
     the frozen stage-1 is the floor stage-2 samples can approach).

This is the TPU-native equivalent of the reference's evaluation-as-test
(reference: experiments/second_stage_video.py:71-200 drives --test fvd over
trained checkpoints; models/second_stage_video.py:558-586 monitors FVD-val
during training).  Emits ONE JSON line: the steps->FVD curve, the recon
floor, and sample mp4 paths.

    python -m ipoke_tpu.utils.bench_e2e [--size 64] [--steps1 600]
        [--steps2 2000] [--enc-steps 200] [--eval-every 500] [--n-eval 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

# honor JAX_PLATFORMS even under a sitecustomize that force-registers the
# remote axon platform (same protocol as main.py)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from ipoke_tpu.utils import cache as _cache

_cache.enable()


def log(msg):
    print(f"[bench_e2e +{time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _retry(fn, what, n=5, sleep_s=90):
    """Capped retries for transient remote-compile-service failures
    (tpu_compile_helper SIGKILL -> HTTP 500, NOTES.md).  Used at the
    first invocation of each big jitted graph — a retried call just
    re-submits the compile; an already-cached graph never re-enters."""
    last = None
    for attempt in range(n):
        try:
            return fn()
        except Exception as e:  # transient remote-compile failures
            last = e
            log(f"  {what} attempt {attempt + 1}/{n} failed: {e}")
            time.sleep(sleep_s)
    raise last


T0 = time.time()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--z-dim", type=int, default=16)
    ap.add_argument("--nf-max", type=int, default=32)
    ap.add_argument("--enc-steps", type=int, default=200)
    ap.add_argument("--steps1", type=int, default=600)
    ap.add_argument("--steps2", type=int, default=2000)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--n-eval", type=int, default=64)
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--lr2", type=float, default=1e-3)
    ap.add_argument("--out", default="logs/bench_e2e")
    ap.add_argument("--seed", type=int, default=0)
    # flagship-shaped geometry (VERDICT r4 next-step 7): the default (4,4)
    # two-level flow proves the loop cheaply; --num-steps
    # 10,5,5,4,4,4,3,3,3,2,2,2,1,1,1 --z-dim 32 --size 128 runs the loop at
    # the real 15-level topology the headline benches use
    ap.add_argument("--num-steps", default="4,4",
                    help="comma-separated MaCow steps per flow level")
    ap.add_argument("--flow-hidden", type=int, default=64)
    ap.add_argument("--flow-factor", type=int, default=4)
    ap.add_argument("--gan-remat", default="none",
                    choices=["none", "outer", "decode", "both"],
                    help="stage-1 generator remat (needed at 128^2; "
                         "train/first_stage.make_gan_train_step)")
    ap.add_argument("--vgg-chunks", type=int, default=1)
    ap.add_argument("--stage2-trainer", default="monolithic",
                    choices=["monolithic", "per-level"],
                    help="per-level: the chunked per-level VJP trainer "
                         "(train/chunked.make_per_level_trainer) — the only "
                         "trainer that compiles the FULL 15-level flow at "
                         "flagship hidden widths (a monolithic AD graph of "
                         "the 56-step flow exhausts the compile service, "
                         "NOTES.md round-1); use for flagship-geometry "
                         "quality-loop runs (VERDICT r4 next-step 7)")
    ap.add_argument("--opt2", default="adam", choices=["adam", "adafactor"],
                    help="stage-2 optimizer; adafactor is the HBM-proven "
                         "full-depth flagship config (bench_train --per-level "
                         "--opt adafactor, NOTES.md r3 convergence proof)")
    # teacher->student distillation sign-off (VERDICT r4 next-step 3): after
    # stage-2 training, distill the direct student from THIS real teacher and
    # report FVD* of student samples vs teacher samples on the SAME fixed
    # eval set (identical per-example z draws isolate the student map)
    ap.add_argument("--distill-steps", type=int, default=0)
    ap.add_argument("--distill-hidden", type=int, default=256)
    ap.add_argument("--distill-depth", type=int, default=6)
    ap.add_argument("--distill-lr", type=float, default=1e-3)
    ap.add_argument("--signoff-out", default=None, metavar="JSON",
                    help="also write {'distill_signoff': ...} here — the "
                         "artifact bench.py's second-headline gate reads "
                         "(bench.signoff_promotes)")
    args = ap.parse_args()

    from ipoke_tpu.utils import warmup as _warmup

    warm = _warmup.start()

    from ipoke_tpu.data.datamodule import StaticDataModule
    from ipoke_tpu.flows.macow import FlowSpec
    from ipoke_tpu.metrics.fvd import FVDAccumulator
    from ipoke_tpu.models import first_stage as fs_model
    from ipoke_tpu.models import second_stage as ss_model
    from ipoke_tpu.models.discriminators import PatchDiscSpec, TempDiscSpec
    from ipoke_tpu.models.encoders import WrapperSpec
    from ipoke_tpu.models.first_stage import FirstStageSpec
    from ipoke_tpu.models.second_stage import SecondStageSpec
    from ipoke_tpu.nn.blocks import materialize_spectral_norm
    from ipoke_tpu.train import encoders as tenc
    from ipoke_tpu.train import first_stage as tfs
    from ipoke_tpu.train import second_stage as tss
    from ipoke_tpu.utils import video as vid_util

    S, T, B = args.size, args.frames, args.batch
    nf = args.nf_max

    # tower depth follows the registry rule (registry.default_*_channels):
    # upsamples = len(dec_channels) - 1, so 128^2 needs one more entry than
    # 64^2 to reach full resolution from the 8x8 motion latent
    enc_ch = (32, 64, 64, 64, 64) if S >= 128 else (32, 64, 64, 64)
    dec_ch = (64, 64, 64, 48, 32) if S >= 128 else (64, 64, 48, 32)
    fs_spec = FirstStageSpec(
        z_dim=args.z_dim, spatial_size=S, max_frames=T,
        enc_channels=enc_ch, dec_channels=dec_ch,
        n_gru_layers=2, min_spatial_size=8, motion_bias=True,
        full_sequence=True,
    )
    poke_spec = WrapperSpec(nf_in=2, nf_max=nf, spatial_size=S,
                            min_spatial_size=8, deterministic=True)
    cond_spec = WrapperSpec(nf_in=3, nf_max=nf, spatial_size=S,
                            min_spatial_size=8, deterministic=False)
    num_steps = tuple(int(x) for x in args.num_steps.split(","))
    flow_spec = FlowSpec(num_steps=num_steps, in_channels=args.z_dim,
                         hidden_channels=args.flow_hidden, h_channels=2 * nf,
                         factor=args.flow_factor)
    spec = SecondStageSpec(flow=flow_spec, first_stage=fs_spec,
                           poke_embedder=poke_spec, conditioner=cond_spec)

    data_cfg = {"dataset": "SyntheticDataset", "spatial_size": [S, S],
                "max_frames": T, "n_examples": args.n_train, "batch_size": B,
                "seed": args.seed}
    dm = StaticDataModule(data_cfg)
    dm.setup()

    def batches(split, seed_shift=0):
        """Endless batch iterator (jnp)."""
        while True:
            for raw in dm.loader(split):
                yield {k: jnp.asarray(v) for k, v in raw.items()
                       if k in ("images", "poke", "flow")}

    train_it = batches("train")
    # FIXED eval set: n_eval examples from the val split (different seed
    # than train inside SyntheticPokeDataset)
    eval_batches = []
    for raw in dm.loader("val"):
        eval_batches.append({k: np.asarray(v) for k, v in raw.items()
                             if k in ("images", "poke", "flow")})
        if sum(e["images"].shape[0] for e in eval_batches) >= args.n_eval:
            break

    rng = jax.random.PRNGKey(args.seed)
    _warmup.join(warm)

    # ---------------- phase E: conditioning encoders ------------------------
    log("phase E: encoder training")
    k1, k2, k3, rng = jax.random.split(rng, 4)
    img_state, img_opts = tenc.init_image_ae(
        k1, cond_spec, PatchDiscSpec(ndf=32, n_layers=2), lr=2e-4)
    img_step = jax.jit(tenc.make_image_ae_step(
        cond_spec, PatchDiscSpec(ndf=32, n_layers=2), img_opts))
    poke_state, poke_opt = tenc.init_poke_ae(k2, poke_spec, lr=2e-4)
    poke_step = jax.jit(tenc.make_poke_ae_step(poke_spec, poke_opt))
    img_logs = poke_logs = {}
    for i in range(args.enc_steps):
        rng, sub = jax.random.split(rng)
        batch = next(train_it)
        img_state, img_logs = img_step(img_state, batch, sub)
        poke_state, poke_logs = poke_step(poke_state, batch, sub)
        if i % 50 == 0:
            log(f"  enc step {i}: img rec {float(img_logs['rec_loss']):.4f} "
                f"poke rec {float(poke_logs['rec_loss']):.4f}")
    enc_summary = {"img_rec_loss": float(img_logs["rec_loss"]),
                   "poke_rec_loss": float(poke_logs["rec_loss"])}

    # ---------------- phase 1: stage-1 cVAE-GAN ----------------------------
    log("phase 1: stage-1 GAN training")
    dt_spec = TempDiscSpec(spatial_size=S, sequence_length=min(12, T),
                           gp_weight=1.0)
    ds_spec = PatchDiscSpec(gp_weight=0.0, ndf=32, n_layers=2)
    k1, rng = jax.random.split(rng)
    gan_state, gan_opts = tfs.init_gan_state(k1, fs_spec, ds_spec, dt_spec, lr=2e-4)
    gan_step = jax.jit(tfs.make_gan_train_step(
        fs_spec, ds_spec, dt_spec, gan_opts, n_spatial_examples=16,
        remat=False if args.gan_remat == "none" else args.gan_remat,
        vgg_chunks=args.vgg_chunks))
    gmet = {}
    for i in range(args.steps1):
        rng, sub = jax.random.split(rng)
        batch = next(train_it)
        if i == 0:  # first call compiles the big grad-of-grad 3-opt graph
            gan_state, gmet = _retry(
                lambda: gan_step(gan_state, batch, sub), "gan-step compile")
        else:
            gan_state, gmet = gan_step(gan_state, batch, sub)
        if i % 100 == 0:
            log(f"  gan step {i}: rec {float(gmet['l_rec']):.4f} "
                f"kl {float(gmet['l_kl']):.2f} d_t {float(gmet['loss_d_dt']):.3f}")
    gan_summary = {"l_rec": float(gmet["l_rec"]),
                   "loss_d_dt": float(gmet["loss_d_dt"])}

    # ---------------- freeze + assemble ------------------------------------
    # spectral-norm weights are stored raw during training; materialize sigma
    # once for inference use (nn/blocks.py module docstring)
    frozen_fs = materialize_spectral_norm(gan_state.gen_params)
    frozen_poke = materialize_spectral_norm(poke_state.params["model"])
    frozen_cond = materialize_spectral_norm(img_state.params["model"])
    k1, rng = jax.random.split(rng)
    # per-level jitted flow init: even the flow-only init graph at flagship
    # width OOM-kills the remote compile service (measured this round); one
    # jit per level keeps each compile small and yields the identical tree
    # (macow.init_multiscale_chunked docstring)
    from ipoke_tpu.flows import macow as _macow
    flow_params = _macow.init_multiscale_chunked(k1, spec.flow, retry=_retry)
    params = {"flow": flow_params, "first_stage": frozen_fs,
              "poke_embedder": frozen_poke, "conditioner": frozen_cond}
    trainable, frozen = tss.split_params(params)

    # ---------------- eval machinery ----------------------------------------
    os.makedirs(args.out, exist_ok=True)
    acc = FVDAccumulator(n_samples=args.n_eval)
    sample_fn = jax.jit(
        lambda p, b, k: ss_model.forward_sample(p, spec, b, k, n_samples=1)[0])
    recon_fn = jax.jit(
        lambda p, x, k: fs_model.forward(p, x, fs_spec, rng=k)[0])

    def eval_fvd(ss_params, tag, save_mp4=False):
        acc.reset()
        rng_eval = jax.random.PRNGKey(1234)  # fixed draw across evals
        for j, eb in enumerate(eval_batches):
            rng_eval, sub = jax.random.split(rng_eval)
            fake = np.asarray(sample_fn(
                ss_params, {k: jnp.asarray(v) for k, v in eb.items()}, sub))
            real = eb["images"][:, 1:]
            acc.update(real, fake)
            if save_mp4 and j == 0:
                for n in range(2):
                    vid_util.save_video(
                        fake[n], os.path.join(args.out, f"{tag}_sample{n}.mp4"))
                    vid_util.save_video(
                        real[n], os.path.join(args.out, f"real_{n}.mp4"))
        out = float(acc.compute())
        if acc.n_dropped_fake or acc.n_dropped_real:
            log(f"  WARNING {tag}: FVD dropped non-finite rows "
                f"(real {acc.n_dropped_real}, fake {acc.n_dropped_fake} "
                f"of {args.n_eval})")
        return out

    def eval_recon_floor():
        acc.reset()
        rng_eval = jax.random.PRNGKey(4321)
        for eb in eval_batches:
            rng_eval, sub = jax.random.split(rng_eval)
            rec = np.asarray(recon_fn(frozen_fs, jnp.asarray(eb["images"]), sub))
            acc.update(eb["images"][:, 1:], rec)
        return float(acc.compute())

    log("eval: stage-1 reconstruction FVD floor")
    fvd_recon = _retry(eval_recon_floor, "recon-floor eval")
    log(f"  recon floor FVD* = {fvd_recon:.2f} (i3d pretrained={acc.pretrained})")

    # ---------------- phase 2: stage-2 flow training ------------------------
    log(f"phase 2: stage-2 flow training ({args.stage2_trainer}) "
        "with periodic FVD evals")
    if args.stage2_trainer == "per-level":
        from ipoke_tpu.train import chunked

        def make_opt(level_params):
            if args.opt2 == "adafactor":
                import optax

                from ipoke_tpu.train.second_stage import _float_labels

                return optax.multi_transform(
                    {"train": optax.adafactor(args.lr2),
                     "freeze": optax.set_to_zero()},
                    _float_labels(level_params))
            return tss.make_optimizer(level_params, lr=args.lr2,
                                      warmup_steps=200,
                                      total_steps=args.steps2)

        step2 = chunked.make_per_level_trainer(spec.flow, spec, frozen,
                                               make_opt)
        state2 = step2.init_state(trainable["flow"])

        def current_trained():
            return {"flow": {"levels": list(state2.levels)}}
    else:
        opt = tss.make_optimizer(trainable, lr=args.lr2, warmup_steps=200,
                                 total_steps=args.steps2)
        step2 = jax.jit(tss.make_train_step(spec, frozen, opt))
        state2 = tss.init_state(trainable, opt)

        def current_trained():
            return state2.params
    curve_steps, curve_fvd, curve_nll = [], [], []
    fvd0 = _retry(lambda: eval_fvd(params, "step0", save_mp4=True),
                  "step-0 eval")
    curve_steps.append(0)
    curve_fvd.append(fvd0)
    log(f"  step 0 (fresh-init control): FVD* {fvd0:.2f}")
    met = {}
    for i in range(1, args.steps2 + 1):
        rng, sub = jax.random.split(rng)
        batch = next(train_it)
        if i == 1:  # first call compiles the (per-level) trainer graphs
            state2, met = _retry(
                lambda: step2(state2, batch, sub), "stage-2 step compile")
        else:
            state2, met = step2(state2, batch, sub)
        if i % 100 == 0:
            log(f"  flow step {i}: loss {float(met['flow_loss']):.3f}")
        if i % args.eval_every == 0 or i == args.steps2:
            cur = {**frozen, **current_trained()}
            fvd = eval_fvd(cur, f"step{i}", save_mp4=(i == args.steps2))
            curve_steps.append(i)
            curve_fvd.append(fvd)
            curve_nll.append(float(met["flow_loss"]))
            log(f"  step {i}: FVD* {fvd:.2f}")

    # ---------------- phase 3 (optional): distill + sign-off ----------------
    distill_out = None
    if args.distill_steps:
        log("phase 3: distill the direct student from the TRAINED teacher")
        import optax

        from ipoke_tpu.flows import transformer
        from ipoke_tpu.train import distill as tdist

        teacher = {**frozen, **current_trained()}
        ds = tdist.DirectStudentSpec(hidden=args.distill_hidden,
                                     depth=args.distill_depth)
        init_state_d, dstep = tdist.make_distill_step(
            spec, ds, optax.adam(args.distill_lr))
        jdstep = jax.jit(dstep)
        k1, rng = jax.random.split(rng)
        dstate = init_state_d(k1)
        embed_fn = jax.jit(lambda p, b: ss_model.embed_cond(
            p, spec, b["images"][:, 0],
            b["flow"] if spec.use_flow_as_poke else b["poke"]))
        zshape = transformer.reverse_input_shape(
            spec.flow, B, spec.latent_size, spec.flow_in_channels)
        dmse = None
        finite_fracs = []
        for i in range(args.distill_steps):
            batch = next(train_it)
            cond = embed_fn(teacher, batch)
            z = jax.random.normal(jax.random.PRNGKey(50_000 + i), zshape)
            dstate, dlogs = jdstep(dstate, teacher, z, cond)
            if i % 200 == 0 or i == args.distill_steps - 1:
                dmse = float(dlogs["distill_mse"])  # host fetch forces chain
                ff = float(dlogs["teacher_finite_frac"])
                finite_fracs.append(ff)
                log(f"  distill step {i}: mse {dmse:.5f}"
                    + (f" (teacher finite frac {ff:.2f})" if ff < 1 else ""))

        # student FVD* on the SAME fixed eval set with the SAME eval rng
        # protocol as eval_fvd: forward_sample_student draws z from the same
        # keys at the same shape, so each eval example gets the identical z —
        # the comparison isolates teacher-map vs student-map
        student_sample_fn = jax.jit(
            lambda tp, sp, b, k: tdist.forward_sample_student(
                tp, sp, ds, spec, b, k, n_samples=1)[0])

        def eval_fvd_student(tag, save_mp4=False):
            acc.reset()
            rng_eval = jax.random.PRNGKey(1234)  # same keys as eval_fvd
            for j, eb in enumerate(eval_batches):
                rng_eval, sub = jax.random.split(rng_eval)
                fake = np.asarray(student_sample_fn(
                    teacher, dstate["params"],
                    {k: jnp.asarray(v) for k, v in eb.items()}, sub))
                acc.update(eb["images"][:, 1:], fake)
                if save_mp4 and j == 0:
                    for n in range(2):
                        vid_util.save_video(
                            fake[n], os.path.join(args.out, f"{tag}_sample{n}.mp4"))
            out = float(acc.compute())
            if acc.n_dropped_fake or acc.n_dropped_real:
                log(f"  WARNING {tag}: FVD dropped non-finite rows "
                    f"(real {acc.n_dropped_real}, fake {acc.n_dropped_fake} "
                    f"of {args.n_eval})")
            return out

        try:
            fvd_student = eval_fvd_student("student", save_mp4=True)
        except ValueError as e:  # degenerate feature set: report, don't hang
            log(f"  student FVD failed: {e}")
            fvd_student = None
        fvd_teacher = curve_fvd[-1]
        log(f"  sign-off: teacher FVD* {fvd_teacher:.3f} vs student FVD* "
            f"{fvd_student if fvd_student is None else round(fvd_student, 3)} "
            f"(control {curve_fvd[0]:.3f}, floor {fvd_recon:.3f})")
        distill_out = {
            "student": {"hidden": ds.hidden, "depth": ds.depth,
                        "steps": args.distill_steps},
            "final_distill_mse": dmse,
            "teacher_finite_frac_logged": finite_fracs,
            "teacher_fvd": round(fvd_teacher, 3),
            "student_fvd": None if fvd_student is None else round(fvd_student, 3),
            "fvd_delta_student_minus_teacher": (
                None if fvd_student is None
                else round(fvd_student - fvd_teacher, 3)),
            "control_fvd": round(curve_fvd[0], 3),
        }

    improved = curve_fvd[-1] < 0.8 * curve_fvd[0]
    decreasing = sum(b < a for a, b in zip(curve_fvd, curve_fvd[1:]))
    out = {
        "metric": "e2e_fvd_curve",
        "i3d_pretrained": acc.pretrained,
        "fvd_key": "FVD" if acc.pretrained else "FVD_RELATIVE_SEEDED_I3D",
        "steps": curve_steps,
        "fvd": [round(v, 3) for v in curve_fvd],
        "flow_loss_at_evals": [round(v, 3) for v in curve_nll],
        "fvd_recon_floor": round(fvd_recon, 3),
        "improved_final_lt_80pct_of_control": bool(improved),
        "n_decreasing_transitions": int(decreasing),
        "n_evals": len(curve_fvd),
        "encoders": enc_summary,
        "stage1": gan_summary,
        "distill_signoff": distill_out,
        "config": {"size": S, "frames": T, "batch": B,
                   "steps1": args.steps1, "steps2": args.steps2,
                   "enc_steps": args.enc_steps, "n_eval": args.n_eval,
                   "num_steps": list(num_steps), "z_dim": args.z_dim,
                   "flow_hidden": args.flow_hidden,
                   "stage2_trainer": args.stage2_trainer},
        "artifacts_dir": args.out,
        "wall_s": round(time.time() - T0, 1),
    }
    print(json.dumps(out))
    if args.signoff_out and distill_out is not None:
        os.makedirs(os.path.dirname(args.signoff_out) or ".", exist_ok=True)
        with open(args.signoff_out, "w") as f:
            json.dump({"distill_signoff": distill_out,
                       "run_config": out["config"],
                       "wall_s": out["wall_s"]}, f, indent=1)
        log(f"sign-off artifact written to {args.signoff_out}")


if __name__ == "__main__":
    main()
