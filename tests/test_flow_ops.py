"""Flow-op tests: correlation cost volume, bilinear warp, pyramid flow
estimation recovering a known translation; prepare pipeline on a synthetic
'video' -> meta -> FlowVideoDataset round trip."""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.ops.flow_ops import (
    channel_norm,
    correlation_cost_volume,
    estimate_flow,
    warp_bilinear,
)


def test_channel_norm():
    x = jnp.ones((1, 4, 4, 9))
    np.testing.assert_allclose(channel_norm(x), 3.0 * jnp.ones((1, 4, 4, 1)), rtol=1e-5)


def test_correlation_identity_peak():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    cv = correlation_cost_volume(x, x, max_disp=2)
    assert cv.shape == (2, 8, 8, 25)
    # zero-displacement channel (center of 5x5) maximizes self-correlation
    center = cv[..., 12]
    assert bool(jnp.all(center >= cv[..., 0] - 1e-5))


def test_correlation_shift_peak():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 8))
    shifted = jnp.roll(x, 3, axis=2)  # f2 = f1 shifted right by 3
    cv = correlation_cost_volume(x, shifted, max_disp=3)
    # correct displacement channel: dy=0, dx=+3 -> index (0+3)*7 + (3+3) = 27
    inner = cv[:, 4:-4, 4:-4, :]
    best = jnp.argmax(jnp.mean(inner, axis=(0, 1, 2)))
    assert int(best) == 3 * 7 + 6


def test_warp_inverts_translation():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))
    shifted = jnp.roll(x, 2, axis=1)  # moved down 2
    # shifted[i] = x[i-2]; recovering x at row i samples shifted at i+2
    flow = jnp.zeros((1, 16, 16, 2)).at[..., 0].set(2.0)
    back = warp_bilinear(shifted, flow)
    np.testing.assert_allclose(np.asarray(back[:, 2:-2]), np.asarray(x[:, 2:-2]), atol=1e-4)


def test_estimate_flow_recovers_translation():
    # a smooth blob moving (3, -2) pixels
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)

    def blob(cy, cx):
        g = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 6.0**2)))
        return np.stack([g, g, g], -1) * 2 - 1

    f1 = jnp.asarray(blob(30, 30)[None])
    f2 = jnp.asarray(blob(33, 28)[None])
    flow = np.asarray(estimate_flow(f1, f2, n_levels=3, n_iters=100)[0])
    mag = np.linalg.norm(flow, axis=-1)
    iy, ix = np.unravel_index(mag.argmax(), mag.shape)
    peak = flow[iy, ix]
    # direction recovered (dy>0, dx<0, correct ratio); HS underestimates
    # magnitude on large displacements (documented)
    assert peak[0] > 0.8 and peak[1] < -0.4, peak
    ratio = peak[0] / -peak[1]
    assert 1.0 < ratio < 2.3, ratio


def test_prepare_meta_and_dataset(tmp_path):
    from PIL import Image

    from ipoke_tpu.data.datasets import DatasetConfig, FlowVideoDataset
    from ipoke_tpu.data.poke import PokeConfig
    from ipoke_tpu.data.prepare import build_meta

    # fabricate a processed video dir: 16 frames + flow files
    vdir = os.path.join(tmp_path, "vid0")
    os.makedirs(vdir)
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    for i in range(16):
        Image.fromarray(np.roll(base, i, axis=1)).save(os.path.join(vdir, f"frame_{i:06d}.png"))
        flow = np.zeros((64, 64, 2), np.float32)
        flow[20:40, 20:40, 1] = 5.0
        np.save(os.path.join(vdir, f"prediction_{i}_{i+5}.flow.npy"), flow)  # (start, end) naming
    meta_path = build_meta(str(tmp_path))
    with open(meta_path, "rb") as f:
        meta = pickle.load(f)
    assert len(meta["img_path"]) == 16
    cfg = DatasetConfig(spatial_size=64, max_frames=4, poke=PokeConfig(poke_size=5, n_pokes=2))
    ds = FlowVideoDataset(meta_path, cfg, train=True)
    assert len(ds) > 0
    sample = ds[0]
    assert sample["images"].shape == (4, 64, 64, 3)
    assert sample["poke"].shape == (64, 64, 2)
    assert np.abs(sample["poke"]).max() > 0
    zero = ds[-1]
    assert np.allclose(zero["flow"], 0)


def test_build_meta_rejects_legacy_flow_naming(tmp_path):
    """Pre-r2 trees used prediction_{lag}_{i} naming; silently reading the lag
    as the start frame mis-keys every flow (ADVICE r2) -> must raise."""
    import pytest

    from ipoke_tpu.data.prepare import build_meta

    vdir = os.path.join(tmp_path, "vid0")
    os.makedirs(vdir)
    for i in range(6):
        np.save(os.path.join(vdir, f"prediction_5_{i}.flow.npy"),
                np.zeros((8, 8, 2), np.float32))
    with pytest.raises(RuntimeError, match="legacy"):
        build_meta(str(tmp_path))
