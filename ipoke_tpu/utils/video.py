"""Video / image IO (reference: utils/logging.py:797-822 save_video).

cv2 MP4V writer with a .npy fallback; frames come in as [-1,1] float RGB."""
from __future__ import annotations

import os

import numpy as np


def to_uint8(frames):
    """[-1,1] float -> uint8 RGB (uint8 passes through unchanged)."""
    arr = np.asarray(frames)
    if arr.dtype == np.uint8:
        return arr
    return ((np.clip(arr, -1, 1) + 1.0) * 127.5).astype(np.uint8)


def save_video(frames, path, fps=3):
    """frames: (T, H, W, 3) in [-1,1] or uint8.  Writes MP4 (cv2 MP4V)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.asarray(frames)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    try:
        import cv2

        h, w = arr.shape[1:3]
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MP4V"), fps, (w, h))
        for f in arr:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
        return path
    except Exception:
        alt = os.path.splitext(path)[0] + ".npy"
        np.save(alt, arr)
        return alt


def save_image(frame, path):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    from PIL import Image

    arr = np.asarray(frame)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    Image.fromarray(arr).save(path)
    return path


def enrollment(frames, pad=2):
    """Horizontal film-strip of a clip (reference enrollment PNGs)."""
    arr = to_uint8(frames)
    t, h, w, c = arr.shape
    out = np.full((h, t * (w + pad) - pad, c), 255, np.uint8)
    for i, f in enumerate(arr):
        out[:, i * (w + pad) : i * (w + pad) + w] = f
    return out


def preprocess_image(img, multiple=64):
    """Center-crop to a multiple of ``multiple`` (reference utils/general.py:
    28-42 preprocess_image, used for user-provided GUI images)."""
    arr = np.asarray(img)
    h, w = arr.shape[:2]
    nh = (h // multiple) * multiple
    nw = (w // multiple) * multiple
    top = (h - nh) // 2
    left = (w - nw) // 2
    return arr[top : top + nh, left : left + nw]
