"""Data-layer tests: poke simulation semantics, zero-poke contract, sampler
index injection, loader batching, augmentation invariants."""
import numpy as np
import pytest

from ipoke_tpu.data.augment import AugmentConfig, color_jitter, geometric
from ipoke_tpu.data.loader import DataLoader, collate
from ipoke_tpu.data.poke import PokeConfig, poke_from_coords, simulate_poke
from ipoke_tpu.data.samplers import (
    FixedLengthSampler,
    SequenceLengthSampler,
    SequenceSampler,
)
from ipoke_tpu.data.synthetic import SyntheticConfig, SyntheticPokeDataset


def _flow(size=64, seed=0):
    rng = np.random.default_rng(seed)
    flow = np.zeros((size, size, 2), np.float32)
    # a moving square region
    flow[20:35, 25:40, 0] = 3.0
    flow[20:35, 25:40, 1] = -2.0
    flow += 0.01 * rng.standard_normal(flow.shape).astype(np.float32)
    return flow


def test_simulate_poke_places_patches_on_motion():
    cfg = PokeConfig(poke_size=5, n_pokes=3, spatial_size=(64, 64))
    rng = np.random.default_rng(0)
    poke, centers = simulate_poke(_flow(), cfg, rng)
    assert poke.shape == (64, 64, 2)
    assert centers.shape == (3, 2)
    active = centers[centers[:, 0] >= 0]
    assert len(active) >= 1
    for r, c in active:
        # poke patch carries the local flow value
        assert abs(poke[r, c, 0] - 3.0) < 0.5, (r, c, poke[r, c])
        # centers lie in the high-motion region
        assert 20 <= r < 35 and 25 <= c < 40
    # sparsity: most of the map is zero
    assert (np.abs(poke).sum(-1) > 0).mean() < 0.2


def test_zero_poke_places_on_background():
    cfg = PokeConfig(poke_size=5, n_pokes=2, spatial_size=(64, 64))
    rng = np.random.default_rng(1)
    poke, centers = simulate_poke(_flow(), cfg, rng, zero_poke=True)
    active = centers[centers[:, 0] >= 0]
    for r, c in active:
        assert not (20 <= r < 35 and 25 <= c < 40), "zero-poke center must be background"
    # but the poke magnitude comes from the moving region
    assert np.abs(poke).max() > 1.0


def test_poke_from_coords():
    poke = poke_from_coords((64, 64), np.array([[10, 12]]), np.array([[2.0, -1.0]]), poke_size=5)
    assert poke[10, 12, 0] == 2.0
    assert poke[8, 10, 1] == -1.0
    assert poke[15, 12, 0] == 0.0


def test_fixed_length_sampler_injects_zero_pokes():
    s = FixedLengthSampler(120, zero_poke=True, zero_poke_amount=12, seed=0)
    idx = list(iter(s))
    assert len(idx) == 120
    assert idx.count(-1) == 10


def test_sequence_sampler_per_batch_lag():
    """Legacy SequenceSampler (reference data/samplers.py:7-37): one lag per
    batch, all indices covered."""
    s = SequenceSampler(10, valid_lags=(0, 1, 2), batch_size=4, seed=0)
    batches = list(iter(s))
    assert len(batches) == len(s) == 3
    seen = []
    for b in batches:
        lags = {lag for _, lag in b}
        assert len(lags) == 1 and lags.pop() in (0, 1, 2)
        seen += [i for i, _ in b]
    assert sorted(seen) == list(range(10))
    assert list(iter(SequenceSampler(10, (0,), 4, drop_last=True, seed=0)))[-1].__len__() == 4


def test_sequence_length_sampler_variable_lengths():
    """Legacy SequenceLengthSampler (reference data/samplers.py:83-150):
    per-batch length in [-1, max_frames); -1 (zero-poke) pairs with a random
    actual length; unshuffled mode cycles lengths deterministically."""
    s = SequenceLengthSampler(40, max_frames=5, batch_size=4, zero_poke=True,
                              zeropoke_weight=2.0, longest_seq_weight=3.0, seed=0)
    lengths = set()
    for b in list(iter(s)):
        (n, actual) = b[0]
        assert all(item == (n, actual) for item in b)
        assert -1 <= n < 5
        if n == -1:
            assert actual is not None and 0 <= actual < 5
        else:
            assert actual is None
        lengths.add(n)
    assert len(lengths) > 1  # actually varies
    # sequential (unshuffled) mode cycles 0,1,2,...,max-1,0,...
    s2 = SequenceLengthSampler(12, max_frames=3, batch_size=2, shuffle=False)
    ns = [b[0][0] for b in iter(s2)]
    assert ns == [0, 1, 2, 0, 1, 2]


def test_synthetic_dataset_and_loader():
    ds = SyntheticPokeDataset(SyntheticConfig(spatial_size=64, max_frames=5, n_examples=16))
    sample = ds[0]
    assert sample["images"].shape == (5, 64, 64, 3)
    assert sample["poke"].shape == (64, 64, 2)
    z = ds[-1]
    assert np.allclose(z["flow"], 0)  # zero-poke target flow zeroed
    assert np.allclose(z["images"][0], z["images"][-1])  # still video
    assert np.abs(z["poke"]).max() > 0  # but a poke exists

    loader = DataLoader(ds, FixedLengthSampler(16, zero_poke=True, seed=0), batch_size=4)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0]["images"].shape == (4, 5, 64, 64, 3)
    assert batches[0]["sample_ids"].shape == (4,)


def test_color_jitter_bounds_and_determinism():
    ds = SyntheticPokeDataset(SyntheticConfig(spatial_size=64, max_frames=3, n_examples=2))
    frames = ds[0]["images"]
    cfg = AugmentConfig(p_col=1.0)
    out1 = color_jitter(frames, np.random.default_rng(5), cfg)
    out2 = color_jitter(frames, np.random.default_rng(5), cfg)
    np.testing.assert_allclose(out1, out2)
    assert out1.min() >= -1.0 - 1e-6 and out1.max() <= 1.0 + 1e-6
    assert not np.allclose(out1, frames)


def test_geometric_warps_frames_and_flow_identically():
    ds = SyntheticPokeDataset(SyntheticConfig(spatial_size=64, max_frames=3, n_examples=2))
    s = ds[0]
    cfg = AugmentConfig(p_geom=1.0)
    frames, (flow,) = geometric(s["images"], [s["flow"]], np.random.default_rng(7), cfg)
    assert frames.shape == s["images"].shape
    assert flow.shape == s["flow"].shape
    assert not np.allclose(frames, s["images"])


def test_keypoint_poke():
    from ipoke_tpu.data.poke import keypoint_poke

    cfg = PokeConfig(poke_size=5, n_pokes=3, spatial_size=(64, 64))
    kps0 = np.array([[30.0, 20.0], [50.0, 40.0], [2.0, 2.0]], np.float32)  # (x, y)
    kps1 = np.array([[35.0, 22.0], [50.0, 40.0], [8.0, 9.0]], np.float32)
    rng = np.random.default_rng(0)
    poke, centers = keypoint_poke(kps0, kps1, cfg, rng)
    active = centers[centers[:, 0] >= 0]
    # kp1 didn't move; kp2 is outside the valid window -> only kp0 eligible
    assert len(active) == 1
    r, c = active[0]
    assert (r, c) == (20, 30)
    np.testing.assert_allclose(poke[20, 30], [2.0, 5.0])  # (dy, dx)
