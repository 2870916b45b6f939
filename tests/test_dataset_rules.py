"""Per-dataset split/semantics rules (VERDICT r1 item 7) on synthetic metas:
iPER train.txt official split, H36m actor-9/11 test split, Plant/Taichi lag
selection from flow-filename frame gaps, filter_flow foreground masking, and
the new appearance/keypoint datakeys."""
import os
import pickle

import numpy as np
import pytest

from ipoke_tpu.data.datasets import (
    DatasetConfig,
    Human36mDataset,
    IperDataset,
    PlantDataset,
    TaichiDataset,
    flow_gap_of,
    get_dataset,
)
from ipoke_tpu.data.poke import PokeConfig, flow_foreground_mask, simulate_poke


def _write_fake_tree(root, n_videos=3, n_frames=45, size=32, lags=(10, 20),
                     extra_meta=None):
    """Processed-layout tree: frame PNGs + (start,end)-named flow files +
    meta pickle with one row per frame that has all lags available."""
    from PIL import Image

    rng = np.random.default_rng(0)
    meta = {"img_path": [], "flow_paths": [], "fid": [], "vid": [],
            "object_id": [], "train": []}
    for k in (extra_meta or {}):
        meta[k] = []
    for v in range(n_videos):
        vdir = os.path.join(root, f"vid{v:03d}")
        os.makedirs(vdir, exist_ok=True)
        for i in range(n_frames):
            img = (rng.uniform(0, 255, (size, size, 3))).astype(np.uint8)
            p = os.path.join(vdir, f"frame_{i:06d}.png")
            Image.fromarray(img).save(p)
            row = []
            for lag in lags:
                fp = os.path.join(vdir, f"prediction_{i}_{i+lag}.flow.npy")
                flow = np.zeros((size, size, 2), np.float32)
                flow[8:16, 8:16] = (2.0 + lag / 10.0, 1.0)  # moving blob
                np.save(fp, flow)
                row.append(os.path.relpath(fp, root))
            if i + max(lags) >= n_frames:
                continue
            meta["img_path"].append(os.path.relpath(p, root))
            meta["flow_paths"].append(row)
            meta["fid"].append(i)
            meta["vid"].append(v)
            meta["object_id"].append(v)
            meta["train"].append(v < n_videos - 1)
            for k, fn in (extra_meta or {}).items():
                meta[k].append(fn(v, i))
    meta = {k: np.asarray(v) for k, v in meta.items()}
    path = os.path.join(root, "meta.p")
    with open(path, "wb") as f:
        pickle.dump(meta, f)
    return path


def _cfg(size=32, max_frames=5, subsample=None):
    return DatasetConfig(spatial_size=size, max_frames=max_frames,
                         poke=PokeConfig(poke_size=3, n_pokes=2,
                                         spatial_size=(size, size)),
                         subsample_step=subsample)


def test_flow_gap_parse():
    assert flow_gap_of("a/b/prediction_5_15.flow.npy") == 10
    assert flow_gap_of("frame_000001.png") is None


def test_plant_lag_and_subsample(tmp_path):
    meta = _write_fake_tree(str(tmp_path), lags=(10, 20))
    cfg = _cfg(max_frames=5, subsample=None)  # unset -> Plant default 2
    ds = PlantDataset(meta, cfg, train=True)
    assert ds.subsample_step == 2
    assert cfg.subsample_step is None  # caller's cfg never mutated
    assert ds.valid_lag == 0  # gap 10 == 5 * 2
    cfg2 = _cfg(max_frames=10, subsample=None)  # 10 * 2 = 20 -> second lag
    ds2 = PlantDataset(meta, cfg2, train=True)
    assert ds2.valid_lag == 1
    item = ds[0]
    assert item["images"].shape == (5, 32, 32, 3)
    # an EXPLICIT subsample_step=1 is honored, not bumped (ADVICE r2)
    ds1 = PlantDataset(meta, _cfg(max_frames=10, subsample=1), train=True)
    assert ds1.subsample_step == 1


def test_iper_train_txt_split(tmp_path):
    meta = _write_fake_tree(str(tmp_path), n_videos=3, lags=(5,))
    with open(tmp_path / "train.txt", "w") as f:
        f.write("vid000\nvid002\n")
    cfg = _cfg()
    tr = IperDataset(meta, cfg, train=True)
    te = IperDataset(meta, _cfg(), train=False)
    tr_vids = {int(tr.meta["vid"][i]) for i in tr.ids}
    te_vids = {int(te.meta["vid"][i]) for i in te.ids}
    assert tr_vids == {0, 2}
    assert te_vids == {1}


def test_h36m_actor_split(tmp_path):
    meta = _write_fake_tree(
        str(tmp_path), n_videos=4, lags=(10,),
        extra_meta={"actor_id": lambda v, i: [5, 9, 6, 11][v]},
    )
    cfg = _cfg(max_frames=5, subsample=2)
    tr = Human36mDataset(meta, cfg, train=True)
    te = Human36mDataset(meta, _cfg(max_frames=5, subsample=2), train=False)
    tr_actors = {int(tr.meta["actor_id"][i]) for i in tr.ids}
    te_actors = {int(te.meta["actor_id"][i]) for i in te.ids}
    assert tr_actors == {5, 6}
    assert te_actors == {9, 11}
    assert tr.valid_lag == 0  # only one lag available -> clamped


def test_taichi_filter_flow_masks_pokes(tmp_path):
    meta = _write_fake_tree(str(tmp_path), lags=(10,))
    cfg = _cfg(max_frames=5)
    ds = TaichiDataset(meta, cfg, train=True)
    assert ds.filter_flow
    item = ds[0]
    assert np.any(item["poke"] != 0)


def test_foreground_mask_restricts_candidates():
    size = 32
    cfg = PokeConfig(poke_size=3, n_pokes=1, spatial_size=(size, size))
    flow = np.zeros((size, size, 2), np.float32)
    flow[5:10, 5:10] = 4.0   # strong motion region A
    flow[20:25, 20:25] = 4.0  # strong motion region B
    # mask allows only region B (valid-window coords)
    vh, vw = cfg.valid_h, cfg.valid_w
    mask = np.zeros((vh[1] - vh[0], vw[1] - vw[0]), bool)
    mask[20 - vh[0]:25 - vh[0], 20 - vw[0]:25 - vw[0]] = True
    rng = np.random.default_rng(0)
    for _ in range(10):
        poke, centers = simulate_poke(flow, cfg, rng, foreground_mask=mask)
        r, c = centers[0]
        assert 18 <= r <= 27 and 18 <= c <= 27, f"poke escaped mask: {(r, c)}"


def test_flow_foreground_mask_shape():
    cfg = PokeConfig(poke_size=3, spatial_size=(32, 32))
    flow = np.random.default_rng(0).normal(size=(32, 32, 2)).astype(np.float32)
    flow[10:20, 10:20] *= 20
    m = flow_foreground_mask(flow, cfg)
    assert m.shape == (32 - 6, 32 - 6)
    assert m.any() and not m.all()


def test_new_datakeys(tmp_path):
    meta = _write_fake_tree(str(tmp_path), lags=(5,))
    cfg = _cfg()
    cfg.augment = True
    ds = PlantDataset(meta, cfg, train=True, datakeys=(
        "images", "poke", "flow", "sample_ids", "app_img_random",
        "app_img_cmp", "img_aT", "img_sT", "app_img_dis",
    ))
    item = ds[0]
    for k in ("app_img_random", "app_img_cmp", "img_aT", "img_sT", "app_img_dis"):
        assert item[k].shape == (32, 32, 3), k


def test_registry_returns_subclasses():
    assert get_dataset("IperDataset") is IperDataset
    assert get_dataset("PlantDataset") is PlantDataset
    assert get_dataset("TaichiDataset") is TaichiDataset
    assert get_dataset("Human36mDataset") is Human36mDataset
