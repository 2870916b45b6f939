"""ctypes bindings for the native (C++/OpenMP) data-loading engine
(native/dataio.cpp).  Builds on demand with g++; falls back gracefully when
no compiler is available (pure-numpy paths in data/poke.py and datasets.py).

Enable in the loader with IPOKE_NATIVE=1 (or use the functions directly).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                    "native", "dataio.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(_SRC), "build")
_SO = os.path.join(_BUILD_DIR, "libipoke_dataio.so")


def build(force=False):
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and not force and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-std=c++17", _SRC, "-o", _SO, "-lpng", "-lz"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _SO


@lru_cache(maxsize=1)
def lib():
    so = build()
    l = ctypes.CDLL(so)
    l.ipoke_load_npy_flow.restype = ctypes.c_int
    l.ipoke_load_png.restype = ctypes.c_int
    l.ipoke_load_frames.restype = ctypes.c_int
    l.ipoke_simulate_pokes.restype = None
    return l


def available():
    try:
        lib()
        return True
    except Exception:
        return False


def load_npy_flow(path):
    cap = 4 * 1024 * 1024
    out = np.empty(cap, np.float32)
    dims = np.zeros(4, np.int64)
    ndim = ctypes.c_int(0)
    rc = lib().ipoke_load_npy_flow(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(cap), dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(ndim),
    )
    if rc != 0:
        raise IOError(f"npy load failed ({rc}): {path}")
    shape = tuple(int(d) for d in dims[: ndim.value])
    total = int(np.prod(shape))
    return out[:total].reshape(shape).copy()


def load_png(path, size):
    out = np.empty((size, size, 3), np.float32)
    rc = lib().ipoke_load_png(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(size), ctypes.c_int(size),
    )
    if rc != 0:
        raise IOError(f"png load failed ({rc}): {path}")
    return out


def load_frames(paths_2d, size):
    """paths_2d: list of lists (batch x T) of PNG paths -> (B,T,S,S,3) f32."""
    b = len(paths_2d)
    t = len(paths_2d[0])
    flat = [p.encode() for row in paths_2d for p in row]
    arr = (ctypes.c_char_p * len(flat))(*flat)
    out = np.empty((b, t, size, size, 3), np.float32)
    rc = lib().ipoke_load_frames(
        arr, ctypes.c_int(b), ctypes.c_int(t), ctypes.c_int(size), ctypes.c_int(size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"frame batch load failed ({rc})")
    return out


def simulate_pokes(flows, poke_size=5, n_pokes_max=5, fix_n_pokes=False,
                   equal_poke_val=True, zero_poke=False, seed=0):
    """flows: (B,H,W,2) f32 -> (pokes (B,H,W,2), centers (B,n_pokes_max,2))."""
    flows = np.ascontiguousarray(flows, np.float32)
    b, h, w, _ = flows.shape
    pokes = np.empty_like(flows)
    centers = np.empty((b, n_pokes_max, 2), np.int64)
    lib().ipoke_simulate_pokes(
        flows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(b), ctypes.c_int(h), ctypes.c_int(w),
        ctypes.c_int(poke_size), ctypes.c_int(n_pokes_max),
        ctypes.c_int(int(fix_n_pokes)), ctypes.c_int(int(equal_poke_val)),
        ctypes.c_int(int(zero_poke)), ctypes.c_uint64(seed),
        pokes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        centers.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return pokes, centers
