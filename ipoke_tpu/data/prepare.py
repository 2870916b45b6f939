"""Dataset preparation pipeline (reference: data/prepare_dataset.py —
modes extract / prepare / pose_estimation / all):

  extract : videos -> frame PNGs + pairwise .flow.npy.  The reference runs
            FlowNet2 per GPU worker; here flow pairs are BATCHED on the TPU
            (correlation/warping ops in ops/flow_ops; pyramid solver needs no
            pretrained weights).
  prepare : walk processed dirs -> meta.p pickle (img_path/flow_paths/fid/
            vid/object_id/train arrays, prepare_dataset.py:264-415 schema).
  pose    : keypoint estimation + keypoint-space NN ids -> meta_kp_nn.p
            (requires pose weights; gated).

    python -m ipoke_tpu.data.prepare --mode all --video_dir <dir> \
        --out <processed_dir> --spatial_size 128 --flow_lag 10
"""
from __future__ import annotations

import argparse
import glob
import os
import pickle

import numpy as np


def extract_frames(video_path, out_dir, spatial_size):
    """Video -> resized frame PNGs.  cv2 for decode (host-side, as in the
    reference's cv2/ffmpeg usage)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    paths = []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frame = cv2.resize(frame, (spatial_size, spatial_size), interpolation=cv2.INTER_AREA)
        path = os.path.join(out_dir, f"frame_{i:06d}.png")
        cv2.imwrite(path, frame)
        paths.append(path)
        i += 1
    cap.release()
    return paths


def compute_flows(frame_paths, lag, out_dir, batch_size=8, estimator="pwc"):
    """Pairwise optical flow (frame i -> i+lag) batched on device.

    estimator: 'pwc' (default — learned PWC-lite, ops/pwc.py; loads
    pwc_lite.npz or fits itself on synthetic pairs) or 'hs' (weight-free
    Horn-Schunck fallback)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    if estimator == "pwc":
        from ipoke_tpu.ops.pwc import default_params, pwc_flow

        pwc_params = default_params()
        flow_fn = jax.jit(lambda a, b: pwc_flow(pwc_params, a, b))
    else:
        from ipoke_tpu.ops.flow_ops import estimate_flow

        flow_fn = jax.jit(estimate_flow)

    os.makedirs(out_dir, exist_ok=True)

    def load(p):
        return np.asarray(Image.open(p).convert("RGB"), np.float32) / 127.5 - 1.0

    flow_paths = {}
    pairs = [(i, i + lag) for i in range(len(frame_paths) - lag)]
    for s in range(0, len(pairs), batch_size):
        chunk = pairs[s : s + batch_size]
        f1 = jnp.stack([load(frame_paths[i]) for i, _ in chunk])
        f2 = jnp.stack([load(frame_paths[j]) for _, j in chunk])
        flows = np.asarray(flow_fn(f1, f2))
        for (i, j), fl in zip(chunk, flows):
            # filename encodes (start, end): the per-dataset lag selection
            # parses the frame gap from it (flow_dataset.py:102-118)
            path = os.path.join(out_dir, f"prediction_{i}_{j}.flow.npy")
            np.save(path, fl.astype(np.float32))
            flow_paths[i] = path
    return flow_paths


def _check_flow_naming(vdir, flow_files):
    """Reject trees prepared with the pre-r2 ``prediction_{lag}_{i}`` naming
    (ADVICE r2): parsing those with the current ``prediction_{start}_{end}``
    convention would silently read the LAG as the start frame, mis-keying
    every flow.  Legacy trees are recognizable because the second-to-last
    field (the lag) is constant across the directory while the last varies;
    with the current naming the start index varies file to file."""
    if len(flow_files) < 2:
        return
    heads, tails = set(), set()
    for p in flow_files:
        parts = os.path.basename(p).split(".")[0].split("_")
        try:
            heads.add(int(parts[-2]))
            tails.add(int(parts[-1]))
        except (ValueError, IndexError):
            raise RuntimeError(
                f"unparseable flow filename {p!r}; expected "
                f"'prediction_{{start}}_{{end}}.flow.npy'")
    if len(heads) == 1 and len(tails) > 1:
        raise RuntimeError(
            f"{vdir} looks like a legacy pre-r2 flow tree "
            f"(prediction_{{lag}}_{{i}} naming: constant second field "
            f"{heads.pop()}): re-run `python -m ipoke_tpu.data.prepare` to "
            f"regenerate flows with the prediction_{{start}}_{{end}} naming")


def build_meta(processed_root, out_path=None, train_fraction=0.9):
    """Walk processed video dirs -> meta pickle with aligned per-frame arrays
    (prepare_dataset.py 'prepare' mode schema)."""
    meta = {"img_path": [], "flow_paths": [], "fid": [], "vid": [], "object_id": [], "train": []}
    video_dirs = sorted(
        d for d in glob.glob(os.path.join(processed_root, "*")) if os.path.isdir(d)
    )
    for vid_id, vdir in enumerate(video_dirs):
        frames = sorted(glob.glob(os.path.join(vdir, "frame_*.png")))
        flow_files = glob.glob(os.path.join(vdir, "*.flow.npy"))
        _check_flow_naming(vdir, flow_files)
        flows = {
            int(os.path.basename(p).split(".")[0].split("_")[-2]): p
            for p in flow_files
        }
        is_train = vid_id < int(len(video_dirs) * train_fraction) or len(video_dirs) == 1
        for fid, fp in enumerate(frames):
            if fid not in flows:
                continue
            meta["img_path"].append(os.path.relpath(fp, processed_root))
            meta["flow_paths"].append([os.path.relpath(flows[fid], processed_root)])
            meta["fid"].append(fid)
            meta["vid"].append(vid_id)
            meta["object_id"].append(vid_id)
            meta["train"].append(is_train)
    meta = {k: np.asarray(v) for k, v in meta.items()}
    out_path = out_path or os.path.join(processed_root, "meta.p")
    with open(out_path, "wb") as f:
        pickle.dump(meta, f)
    return out_path


def keypoint_nn_ids(meta_path, out_path=None, k=1):
    """Keypoint-space nearest neighbours for the transfer test (reference
    get_nn, flow_dataset.py:628-713).  Needs pose weights for keypoints;
    falls back to image-space NN on downsampled frames otherwise."""
    from ipoke_tpu.metrics.pose import pose_weights_available

    with open(meta_path, "rb") as f:
        meta = pickle.load(f)
    root = os.path.dirname(os.path.abspath(meta_path))
    n = len(meta["img_path"])
    from PIL import Image

    feats = []
    if pose_weights_available():
        import jax
        import jax.numpy as jnp

        from ipoke_tpu.metrics.pose import keypoints_rel

        kp_fn = jax.jit(keypoints_rel)
        for i in range(n):
            img = np.asarray(
                Image.open(os.path.join(root, str(meta["img_path"][i]))).convert("RGB"),
                np.float32,
            ) / 127.5 - 1.0
            kps, _ = kp_fn(jnp.asarray(img[None]))
            feats.append(np.asarray(kps[0]).reshape(-1))
    else:
        for i in range(n):
            img = Image.open(os.path.join(root, str(meta["img_path"][i]))).convert("L").resize((16, 16))
            feats.append(np.asarray(img, np.float32).reshape(-1) / 255.0)
    feats = np.stack(feats)
    vid = np.asarray(meta["vid"])
    nn_ids = np.zeros(n, np.int64)
    for i in range(n):
        d = np.sum((feats - feats[i]) ** 2, axis=1)
        d[vid == vid[i]] = np.inf  # NN must come from a different video
        nn_ids[i] = int(np.argmin(d)) if np.isfinite(d).any() else i
    meta["nn_ids"] = nn_ids
    out_path = out_path or os.path.join(root, "meta_kp_nn.p")
    with open(out_path, "wb") as f:
        pickle.dump(meta, f)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="all", choices=["extract", "prepare", "pose_estimation", "all"])
    ap.add_argument("--video_dir", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--spatial_size", type=int, default=128)
    ap.add_argument("--flow_lag", type=int, default=10)
    ap.add_argument("--flow_estimator", default="pwc", choices=["pwc", "hs"])
    args = ap.parse_args()

    if args.mode in ("extract", "all"):
        videos = sorted(
            glob.glob(os.path.join(args.video_dir, "*.mp4"))
            + glob.glob(os.path.join(args.video_dir, "*.avi"))
        )
        for v in videos:
            name = os.path.splitext(os.path.basename(v))[0]
            vdir = os.path.join(args.out, name)
            frames = extract_frames(v, vdir, args.spatial_size)
            compute_flows(frames, args.flow_lag, vdir, estimator=args.flow_estimator)
            print(f"{name}: {len(frames)} frames")
    if args.mode in ("prepare", "all"):
        print("meta:", build_meta(args.out))
    if args.mode in ("pose_estimation", "all"):
        print("nn meta:", keypoint_nn_ids(os.path.join(args.out, "meta.p")))


if __name__ == "__main__":
    main()
