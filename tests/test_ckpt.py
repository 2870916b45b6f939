"""Checkpoint tests: flow export->convert round trip (validates the torch
key schema + layout transposes + stacking), npz save/load round trip,
checkpoint manager top-k/best discovery."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.ckpt import io as ckpt_io
from ipoke_tpu.ckpt import torch_import as ti
from ipoke_tpu.flows import macow, transformer
from ipoke_tpu.flows.macow import FlowSpec

SPEC = FlowSpec(num_steps=(2, 1), in_channels=8, hidden_channels=32, h_channels=12, factor=4)


def _tree_allclose(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_allclose(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _tree_allclose(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7, err_msg=path)


def test_flow_export_convert_roundtrip():
    params = macow.init_multiscale(jax.random.PRNGKey(0), SPEC)
    sd = ti.export_flow(params, SPEC)
    back = ti.convert_flow(sd, SPEC)
    _tree_allclose(params, back)


def test_converted_flow_runs_identically():
    params = macow.init_multiscale(jax.random.PRNGKey(1), SPEC)
    sd = ti.export_flow(params, SPEC)
    back = ti.convert_flow(sd, SPEC)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8))
    h = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 12))
    y1, l1 = macow.multiscale_forward(params, x, h, SPEC)
    y2, l2 = macow.multiscale_forward(back, x, h, SPEC)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


def test_spectral_norm_folding():
    """sn_conv folds sigma: w_folded == w_orig / sigma with sigma = u^T W v."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
    u = rng.standard_normal(8).astype(np.float32)
    u /= np.linalg.norm(u)
    w_mat = w.reshape(8, -1)
    v = w_mat.T @ u
    v /= np.linalg.norm(v)
    sd = {"c.weight_orig": w, "c.weight_u": u, "c.weight_v": v, "c.bias": np.zeros(8, np.float32)}
    out = ti.sn_conv(sd, "c")
    sigma = float(u @ (w_mat @ v))
    np.testing.assert_allclose(
        np.asarray(out["w"]), np.transpose(w / sigma, (2, 3, 1, 0)), rtol=1e-6
    )


def test_npz_io_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6).reshape(2, 3).astype(jnp.float32),
        "nested": {"b": jnp.ones((4,)), "list": [jnp.zeros((2,)), jnp.ones((2,)) * 3]},
    }
    path = os.path.join(tmp_path, "ck.npz")
    ckpt_io.save(path, tree, metadata={"step": 7})
    back, meta = ckpt_io.load(path)
    assert meta["step"] == 7
    np.testing.assert_allclose(back["a"], tree["a"])
    np.testing.assert_allclose(back["nested"]["list"][1], tree["nested"]["list"][1])
    assert isinstance(back["nested"]["list"], list)


def test_checkpoint_manager_topk_and_discovery(tmp_path):
    mgr = ckpt_io.CheckpointManager(str(tmp_path), monitor="FVD-val", top_k=2)
    tree = {"w": jnp.ones((2,))}
    mgr.save_step(tree, 1, 100.0)
    mgr.save_step(tree, 2, 50.0)
    mgr.save_step(tree, 3, 75.0)
    assert len(mgr.best_k) == 2
    best = ckpt_io.CheckpointManager.find_best(str(tmp_path))
    assert "50.000" in best
    assert os.path.exists(os.path.join(str(tmp_path), "last.npz"))


def test_load_lightning_ckpt(tmp_path):
    import torch

    sd = {"state_dict": {"a.weight": torch.randn(3, 4), "b.bias": torch.zeros(5)}}
    path = os.path.join(tmp_path, "x.ckpt")
    torch.save(sd, path)
    out = ti.load_lightning_ckpt(path)
    assert sorted(out) == ["a.weight", "b.bias"]
    assert out["a.weight"].shape == (3, 4)
