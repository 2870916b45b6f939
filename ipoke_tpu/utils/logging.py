"""Experiment logging: console + JSONL scalar stream + media dumps.

The reference logs to wandb (entity/project hardcoded); this environment has
no wandb and no egress, so the default sink is a JSONL metrics file + media
files under the run's log dir — the wandb path is gated behind an optional
import and the same ``log_scalars``/``log_video`` API.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

import numpy as np


def get_logger(name="ipoke_tpu"):
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


class RunLogger:
    def __init__(self, log_dir, use_wandb=False, project="poking_inn", run_name=None):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.metrics_path = os.path.join(log_dir, "metrics.jsonl")
        self.console = get_logger()
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project=project, name=run_name, dir=log_dir)
            except Exception as e:  # no wandb in this environment
                self.console.warning(f"wandb unavailable ({e}); using JSONL sink")

    def log_scalars(self, step, scalars: dict, prefix=""):
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            rec[f"{prefix}{k}"] = float(np.asarray(v))
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.wandb:
            self.wandb.log({k: v for k, v in rec.items() if k not in ("time",)}, step=int(step))

    def log_video(self, step, name, frames, fps=3):
        from ipoke_tpu.utils.video import save_video

        path = os.path.join(self.log_dir, f"{name}_step{int(step)}.mp4")
        save_video(frames, path, fps=fps)
        if self.wandb:
            self.wandb.log({name: self.wandb.Video(path, fps=fps, format="mp4")}, step=int(step))
        return path

    def log_image(self, step, name, image):
        from ipoke_tpu.utils.video import save_image

        path = os.path.join(self.log_dir, f"{name}_step{int(step)}.png")
        save_image(image, path)
        return path


def latent_scatter(path, latents: dict, max_points=1000):
    """2-D embedding scatter of latent collections (reference log_umap,
    utils/logging.py:28-49).  Uses umap-learn when installed; otherwise the
    in-repo UMAP implementation (utils/umap_lite.py) — same algorithm, not a
    PCA stand-in."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    try:
        from umap import UMAP

        reducer = UMAP()
    except Exception:
        from ipoke_tpu.utils.umap_lite import UMAPLite

        reducer = UMAPLite()
    all_x = np.concatenate([np.asarray(v).reshape(len(v), -1)[:max_points] for v in latents.values()])
    emb = reducer.fit_transform(all_x)
    fig, ax = plt.subplots(figsize=(6, 6))
    off = 0
    for name, v in latents.items():
        n = min(len(v), max_points)
        ax.scatter(emb[off : off + n, 0], emb[off : off + n, 1], s=3, label=name, alpha=0.5)
        off += n
    ax.legend()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
