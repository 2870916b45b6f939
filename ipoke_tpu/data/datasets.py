"""Disk datasets over the reference's processed layout (data/flow_dataset.py,
data/base_dataset.py): per-video frame PNGs + FlowNet .flow.npy files + a meta
pickle with aligned per-frame records.

Meta schema (produced by prepare.build_meta / the reference's
prepare_dataset.py:264-415):
  img_path:   (N,) str   — path of frame i
  flow_paths: (N, L) str — flow files for each lag
  fid:        (N,) int   — frame index within its video
  vid:        (N,) int   — video id
  object_id:  (N,) int
  train:      (N,) bool  — split flag (or dataset-specific split rules)
plus optional keypoints / nn ids for iPER.

Batch contract (matches SyntheticPokeDataset):
  images (T,H,W,3) in [-1,1], poke (H,W,2), flow (H,W,2), sample_ids scalar;
  zero-poke via __getitem__(-1) (still video + zero flow target).
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ipoke_tpu.data.augment import AugmentConfig, color_jitter, geometric
from ipoke_tpu.data.poke import FlowError, PokeConfig, simulate_poke


def _load_image(path, size):
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.LANCZOS)
    arr = np.asarray(img, np.float32) / 127.5 - 1.0
    return arr


def _bilinear_resize_np(x, size):
    """(H,W,C) float resize, align_corners=True (matches F.interpolate)."""
    h, w = x.shape[:2]
    if (h, w) == size:
        return x
    ys = np.linspace(0, h - 1, size[0])
    xs = np.linspace(0, w - 1, size[1])
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 2)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 2)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    a = x[y0][:, x0]
    b = x[y0][:, x0 + 1]
    c = x[y0 + 1][:, x0]
    d = x[y0 + 1][:, x0 + 1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx)


@dataclass
class DatasetConfig:
    spatial_size: int = 128
    max_frames: int = 10
    poke: PokeConfig = field(default_factory=PokeConfig)
    scale_poke_to_res: bool = True
    augment: bool = False
    aug: AugmentConfig = field(default_factory=AugmentConfig)
    subsample_step: int = 1
    valid_lag: int = 0
    split: str = "official"

    def __post_init__(self):
        self.poke.spatial_size = (self.spatial_size, self.spatial_size)


class FlowVideoDataset:
    """Generic processed-layout dataset (Plants / iPER / Taichi / Human3.6m
    share this structure; per-dataset split rules differ — flow_dataset.py)."""

    def __init__(self, meta_path, cfg: DatasetConfig, train=True, seed=0,
                 datakeys=("images", "poke", "flow", "sample_ids")):
        self.cfg = cfg
        self.train = train
        self.datakeys = datakeys
        self.rng = np.random.default_rng(seed)
        with open(meta_path, "rb") as f:
            meta = pickle.load(f)
        self.meta = {k: np.asarray(v) for k, v in meta.items()}
        self.root = os.path.dirname(os.path.abspath(meta_path))
        split_flag = self.meta.get("train")
        n = len(self.meta["img_path"])
        mask = np.ones(n, bool) if split_flag is None else (split_flag.astype(bool) == train)
        # valid start ids: enough frames left within the same video
        vid = self.meta["vid"]
        need = cfg.max_frames * cfg.subsample_step
        ok = np.zeros(n, bool)
        for i in np.flatnonzero(mask):
            j = i + need
            ok[i] = j < n and vid[j] == vid[i]
        self.ids = np.flatnonzero(ok & mask)

    def __len__(self):
        return len(self.ids)

    def _abs(self, p):
        p = str(p)
        return p if os.path.isabs(p) else os.path.join(self.root, p)

    def _load_flow(self, idx):
        path = self._abs(self.meta["flow_paths"][idx][self.cfg.valid_lag]
                         if self.meta["flow_paths"].ndim > 1 else self.meta["flow_paths"][idx])
        try:
            if os.environ.get("IPOKE_NATIVE") == "1":
                from ipoke_tpu.data import native

                flow = native.load_npy_flow(path)
            else:
                flow = np.load(path)
        except Exception as e:
            raise FlowError(str(e))
        if flow.shape[0] == 2:  # CHW -> HWC
            flow = np.transpose(flow, (1, 2, 0))
        if self.cfg.scale_poke_to_res:
            flow = flow / (flow.shape[0] / self.cfg.spatial_size)
        flow = _bilinear_resize_np(flow.astype(np.float32),
                                   (self.cfg.spatial_size, self.cfg.spatial_size))
        return flow

    def _load_frames(self, start):
        step = self.cfg.subsample_step
        idxs = [start + i * step for i in range(self.cfg.max_frames)]
        paths = [self._abs(self.meta["img_path"][i]) for i in idxs]
        if os.environ.get("IPOKE_NATIVE") == "1" and all(p.endswith(".png") for p in paths):
            from ipoke_tpu.data import native

            return native.load_frames([paths], self.cfg.spatial_size)[0]
        return np.stack([_load_image(p, self.cfg.spatial_size) for p in paths])

    def __getitem__(self, idx, _retries=50):
        zero_poke = idx == -1
        if zero_poke:
            idx = int(self.rng.integers(0, len(self.ids)))
        for attempt in range(_retries):
            try:
                start = int(self.ids[idx % len(self.ids)])
                flow = self._load_flow(start)
                frames = self._load_frames(start)
                poke, centers = simulate_poke(flow, self.cfg.poke, self.rng, zero_poke=zero_poke)
                if zero_poke:
                    frames = np.repeat(frames[:1], self.cfg.max_frames, axis=0)
                    flow = np.zeros_like(flow)
                if self.cfg.augment and self.train:
                    frames = color_jitter(frames, self.rng, self.cfg.aug)
                    frames, (flow, poke) = geometric(frames, [flow, poke], self.rng, self.cfg.aug)
                out = {
                    "images": frames.astype(np.float32),
                    "poke": poke.astype(np.float32),
                    "flow": flow.astype(np.float32),
                    "sample_ids": np.asarray(-1 if zero_poke else idx, np.int64),
                }
                if "original_flow" in self.datakeys:
                    out["original_flow"] = self._load_flow(start)
                if "keypoints_rel" in self.datakeys and "keypoints" in self.meta:
                    out["keypoints_rel"] = np.asarray(self.meta["keypoints"][start], np.float32)
                if "keypoint_poke" in self.datakeys and "keypoints" in self.meta:
                    from ipoke_tpu.data.poke import keypoint_poke

                    t_end = start + (self.cfg.max_frames - 1) * self.cfg.subsample_step
                    kp_poke, kp_centers = keypoint_poke(
                        np.asarray(self.meta["keypoints"][start], np.float32),
                        np.asarray(self.meta["keypoints"][t_end], np.float32),
                        self.cfg.poke, self.rng,
                    )
                    out["keypoint_poke"] = kp_poke
                    out["keypoint_poke_centers"] = kp_centers
                if "nn" in self.datakeys and "nn_ids" in self.meta:
                    # same-pose partner from another video (iPER transfer pairs,
                    # reference _get_nn, flow_dataset.py:507-557)
                    nn_start = int(self.meta["nn_ids"][start])
                    nn_flow = self._load_flow(nn_start)
                    nn_poke, _ = simulate_poke(nn_flow, self.cfg.poke, self.rng)
                    out["nn_images"] = self._load_frames(nn_start).astype(np.float32)
                    out["nn_poke"] = nn_poke.astype(np.float32)
                return out
            except FlowError:
                idx = int(self.rng.integers(0, len(self.ids)))
        raise FlowError(f"failed after {_retries} retries")


DATASETS = {}


def register_dataset(name):
    def deco(cls):
        DATASETS[name] = cls
        return cls
    return deco


def get_dataset(name):
    """Name registry mirroring data/__init__.py:46-53 (IperDataset,
    PlantDataset, TaichiDataset, Human36mDataset + synthetic)."""
    if name in DATASETS:
        return DATASETS[name]
    if name in ("IperDataset", "PlantDataset", "TaichiDataset", "Human36mDataset", "VegetationDataset"):
        return FlowVideoDataset
    if name == "SyntheticDataset":
        from ipoke_tpu.data.synthetic import SyntheticPokeDataset

        return SyntheticPokeDataset
    raise KeyError(name)
