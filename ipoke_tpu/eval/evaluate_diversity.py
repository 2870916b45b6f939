"""Standalone diversity CLI over saved sample tensors (reference:
testing/evaluate_diversity.py:14-98 — loads (n_ex, n_samples, T, C, H, W) npy
and reports VGG / MSE / LPIPS pairwise diversity).

    python -m ipoke_tpu.eval.evaluate_diversity --samples samples.npy [--repr vgg]
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", required=True, help="npy (n_ex, n_samples, T, H, W, 3) or NCHW")
    ap.add_argument("--repr", default="all", choices=["vgg", "mse", "lpips", "all"])
    ap.add_argument("--max_examples", type=int, default=100)
    args = ap.parse_args()

    arr = np.load(args.samples)
    if arr.ndim == 6 and arr.shape[3] == 3:  # NCHW-style (n, s, T, C, H, W)
        arr = np.transpose(arr, (0, 1, 2, 4, 5, 3))
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 127.5 - 1.0
    arr = arr[: args.max_examples]

    import jax.numpy as jnp

    from ipoke_tpu.metrics import diversity

    x = jnp.asarray(arr)
    out = {}
    if args.repr in ("vgg", "all"):
        out["div_vgg_cosine"] = diversity.div_score_vgg(x)
    if args.repr in ("mse", "all"):
        out["div_mse"] = diversity.div_score_mse(x)
    if args.repr in ("lpips", "all"):
        out["div_lpips"] = diversity.div_score_lpips(x)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
