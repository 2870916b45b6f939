"""Visualization: flow colormaps, poke arrows, sample video grids
(reference: utils/logging.py:121-519 — make_flow_video_with_samples,
vis_flow, make_quiver_plot, make_temporal_border, make_poke_img).
"""
from __future__ import annotations

import numpy as np

from ipoke_tpu.utils.video import to_uint8


def flow_to_color(flow, max_mag=None):
    """(H, W, 2) flow -> (H, W, 3) uint8 HSV-style colormap (hue=direction,
    value=magnitude), matching the reference's vis_flow intent."""
    import colorsys

    fy, fx = flow[..., 0], flow[..., 1]
    mag = np.sqrt(fx**2 + fy**2)
    ang = (np.arctan2(fy, fx) + np.pi) / (2 * np.pi)
    mm = max_mag or (mag.max() + 1e-8)
    val = np.clip(mag / mm, 0, 1)
    h, w = mag.shape
    hsv = np.stack([ang, np.ones_like(ang), val], -1)
    # vectorized hsv->rgb
    i = np.floor(hsv[..., 0] * 6).astype(int) % 6
    f = hsv[..., 0] * 6 - np.floor(hsv[..., 0] * 6)
    v = hsv[..., 2]
    p = np.zeros_like(v)
    q = v * (1 - f)
    t = v * f
    rgb = np.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [np.stack([v, t, p], -1), np.stack([q, v, p], -1), np.stack([p, v, t], -1),
         np.stack([p, q, v], -1), np.stack([t, p, v], -1), np.stack([v, p, q], -1)],
    )
    return (rgb * 255).astype(np.uint8)


def draw_poke_arrows(image, poke, color=(255, 0, 0)):
    """Overlay poke displacement arrows on an image ([-1,1] float).  Uses cv2
    when present, plain markers otherwise."""
    img = to_uint8(image).copy()
    ys, xs = np.nonzero(np.abs(poke).sum(-1))
    if len(ys) == 0:
        return img
    # cluster to patch centers: take unique coarse grid cells
    try:
        import cv2

        seen = set()
        for y, x in zip(ys, xs):
            cell = (y // 8, x // 8)
            if cell in seen:
                continue
            seen.add(cell)
            dy, dx = poke[y, x]
            cv2.arrowedLine(img, (int(x), int(y)), (int(x + dx), int(y + dy)), color, 1, tipLength=0.3)
    except Exception:
        img[ys, xs] = color
    return img


def make_sample_grid(x0, samples, gt, flow, poke, max_cols=8):
    """Animated comparison grid (reference make_flow_video_with_samples):
    rows = [input+poke, sample_1..N, ground truth, flow colormap].

    x0: (B,H,W,3); samples: (N,B,T,H,W,3); gt: (B,T,H,W,3); flow/poke:
    (B,H,W,2).  Returns (T, H*rows, W*cols, 3) uint8."""
    n, b, t, h, w, _ = samples.shape
    b = min(b, max_cols)
    rows = []
    # static input row with poke arrows, repeated over time
    inp = np.stack([draw_poke_arrows(x0[i], poke[i]) for i in range(b)], 0)
    rows.append(np.repeat(inp[None], t, axis=0))  # (T,B,H,W,3)
    for s in range(n):
        rows.append(to_uint8(samples[s, :b]).transpose(1, 0, 2, 3, 4))
    rows.append(to_uint8(gt[:b]).transpose(1, 0, 2, 3, 4))
    fl = np.stack([flow_to_color(flow[i]) for i in range(b)], 0)
    rows.append(np.repeat(fl[None], t, axis=0))
    grid = np.concatenate(
        [np.concatenate(list(r), axis=-2) for r in rows], axis=-3
    )  # (T, rows*H, B*W, 3)
    return grid


def _label_row(frames, text):
    """Burn a row label + frame numbers into a video (reference
    put_text_to_video_row); silent no-op without cv2."""
    try:
        import cv2
    except Exception:
        return frames
    out = frames.copy()
    for i, f in enumerate(out):
        cv2.putText(f, text, (3, 12), cv2.FONT_HERSHEY_SIMPLEX, 0.35, (255, 255, 255), 1)
        cv2.putText(f, str(i), (3, f.shape[0] - 5), cv2.FONT_HERSHEY_SIMPLEX, 0.35,
                    (255, 255, 255), 1)
    return out


def _grid_divisors(n):
    """(n_cols, n_rows) with n_cols*n_rows == n, as square as possible
    (reference get_divisors)."""
    best = (n, 1)
    for c in range(1, int(np.sqrt(n)) + 1):
        if n % c == 0:
            best = (n // c, c)
    return best


def make_multipoke_grid(x0, pokes, gt_vid, sample_vids, n_padded=4):
    """Multipoke overview for the control_sensitivity artifacts (reference
    make_multipoke_grid, utils/logging.py:711-756).

    x0: (H,W,3) [-1,1]; pokes: (K,H,W,2) — one poke per sample video;
    gt_vid: (T,H,W,3); sample_vids: (K,T,H,W,3).

    Each row = [poke-arrowed start frame x n_padded, start frame, frames...]
    with temporal borders; the GT row leads.  Returns (samples_list,
    grid_labeled, grid_unlabeled) as uint8 videos."""
    src = to_uint8(x0)
    rows_unlabeled, rows_labeled = [], []
    gt = np.concatenate([np.repeat(src[None], n_padded + 1, 0), to_uint8(gt_vid)], 0)
    gt = temporal_border(gt)
    rows_unlabeled.append(gt)
    rows_labeled.append(_label_row(gt, "GT"))
    for i, (p, vid) in enumerate(zip(pokes, sample_vids)):
        fp = draw_poke_arrows(x0, p)
        row = np.concatenate(
            [np.repeat(fp[None], n_padded, 0), src[None], to_uint8(vid)], 0
        )
        row = temporal_border(row)
        rows_unlabeled.append(row)
        rows_labeled.append(_label_row(row, f"Sample #{i + 1}"))
    n_cols, n_rows = _grid_divisors(len(rows_unlabeled))

    def grid(rows):
        return np.concatenate(
            [np.concatenate(rows[r * n_cols : (r + 1) * n_cols], axis=2)
             for r in range(n_rows)],
            axis=1,
        )

    return rows_unlabeled, grid(rows_labeled), grid(rows_unlabeled)


def temporal_border(frames, width=2, color_first=(0, 255, 0), color_rest=(255, 0, 0)):
    """Color-coded frame borders: first frame green, rest red (reference
    make_temporal_border)."""
    arr = to_uint8(frames).copy()
    for i, f in enumerate(arr):
        c = color_first if i == 0 else color_rest
        f[:width] = c
        f[-width:] = c
        f[:, :width] = c
        f[:, -width:] = c
    return arr
