"""Stats plots for the accuracy experiments (reference: utils/logging.py
make_errorbar_plot :979, make_nn_var_plot :1013, make_two_axes_plot :1050) —
seaborn/matplotlib, headless."""
from __future__ import annotations

import os

import numpy as np


def _save(fig, path):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    import matplotlib.pyplot as plt

    plt.close(fig)
    return path


def errorbar_plot(path, per_frame_mean, per_frame_std, ylabel="LPIPS", title=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    frames = np.arange(len(per_frame_mean))
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.errorbar(frames, per_frame_mean, yerr=per_frame_std, fmt="-o", capsize=3)
    ax.set_xlabel("frame")
    ax.set_ylabel(ylabel)
    if title:
        ax.set_title(title)
    return _save(fig, path)


def two_axes_plot(path, x, y1, y2, labels=("LPIPS", "SSIM")):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax1 = plt.subplots(figsize=(6, 4))
    ax1.plot(x, y1, "-o", color="tab:blue", label=labels[0])
    ax1.set_ylabel(labels[0], color="tab:blue")
    ax2 = ax1.twinx()
    ax2.plot(x, y2, "-s", color="tab:red", label=labels[1])
    ax2.set_ylabel(labels[1], color="tab:red")
    ax1.set_xlabel("frame")
    return _save(fig, path)


def violin_plot(path, groups: dict, ylabel="divergence"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.violinplot([np.asarray(v) for v in groups.values()], showmeans=True)
    ax.set_xticks(range(1, len(groups) + 1))
    ax.set_xticklabels(list(groups.keys()))
    ax.set_ylabel(ylabel)
    return _save(fig, path)
