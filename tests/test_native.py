"""Native (C++/OpenMP) data-engine tests: builds the shared lib, checks npy /
PNG loads against numpy/PIL, and poke-simulation semantic parity with the
Python implementation."""
import os

import numpy as np
import pytest

from ipoke_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(), reason="g++/libpng unavailable")


def test_npy_roundtrip(tmp_path):
    arr = np.random.default_rng(0).standard_normal((2, 64, 64)).astype(np.float32)
    path = os.path.join(tmp_path, "f.npy")
    np.save(path, arr)
    back = native.load_npy_flow(path)
    np.testing.assert_allclose(back, arr)
    # float64 files are converted
    np.save(path, arr.astype(np.float64))
    np.testing.assert_allclose(native.load_npy_flow(path), arr, rtol=1e-6)


def test_png_load_matches_pil(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    path = os.path.join(tmp_path, "img.png")
    Image.fromarray(img).save(path)
    out = native.load_png(path, 64)
    ref = np.asarray(img, np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_batch_frames(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    paths = []
    for i in range(6):
        img = rng.integers(0, 255, (32, 32, 3), np.uint8)
        p = os.path.join(tmp_path, f"f{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    out = native.load_frames([paths[:3], paths[3:]], 32)
    assert out.shape == (2, 3, 32, 32, 3)
    assert out.min() >= -1 and out.max() <= 1


def test_native_poke_semantics():
    flow = np.zeros((3, 64, 64, 2), np.float32)
    flow[:, 20:35, 25:40, 0] = 3.0
    flow[:, 20:35, 25:40, 1] = -2.0
    flow += 0.01 * np.random.default_rng(0).standard_normal(flow.shape).astype(np.float32)
    pokes, centers = native.simulate_pokes(flow, poke_size=5, n_pokes_max=3, seed=1)
    assert pokes.shape == flow.shape
    for b in range(3):
        active = centers[b][centers[b, :, 0] >= 0]
        assert len(active) >= 1
        for r, c in active:
            assert 20 <= r < 35 and 25 <= c < 40, (r, c)
            assert abs(pokes[b, r, c, 0] - 3.0) < 0.5
    # determinism
    pokes2, centers2 = native.simulate_pokes(flow, poke_size=5, n_pokes_max=3, seed=1)
    np.testing.assert_array_equal(centers, centers2)

    # zero poke: background placement, mover magnitudes
    zp, zc = native.simulate_pokes(flow, poke_size=5, n_pokes_max=2, zero_poke=True, seed=2)
    for b in range(3):
        for r, c in zc[b][zc[b, :, 0] >= 0]:
            assert not (20 <= r < 35 and 25 <= c < 40)
    assert np.abs(zp).max() > 1.0
