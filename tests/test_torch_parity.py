"""Primitive-level parity against torch (CPU): these pin the exact semantics
the checkpoint converter depends on (conv/conv-transpose layouts, group/
instance norm, align-corners bilinear resize, weight-norm materialization).

NB: torch here is the *API*, not reference code — used solely as the ground
truth for operator semantics.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from ipoke_tpu.nn import core  # noqa: E402

RTOL = 2e-5
ATOL = 2e-5


def _np(t):
    return t.detach().numpy()


def test_conv2d_parity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 9, 5)).astype(np.float32)
    w = rng.standard_normal((4, 5, 3, 3)).astype(np.float32)  # OIHW
    b = rng.standard_normal(4).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=1,
    )
    ours = core.conv2d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)),
                       jnp.asarray(b), stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(ours), _np(ref).transpose(0, 2, 3, 1), rtol=RTOL, atol=ATOL)


def test_conv_transpose2d_parity():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    w = rng.standard_normal((5, 4, 3, 3)).astype(np.float32)  # torch (in, out, kh, kw)
    b = rng.standard_normal(4).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=1, output_padding=1,
    )
    ours = core.conv_transpose2d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 0, 1)),
                                 jnp.asarray(b), stride=2, padding=1, output_padding=1)
    assert ours.shape == (2, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(ours), _np(ref).transpose(0, 2, 3, 1), rtol=RTOL, atol=ATOL)


def test_group_norm_parity():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6, 6, 32)).astype(np.float32)
    gamma = rng.standard_normal(32).astype(np.float32)
    beta = rng.standard_normal(32).astype(np.float32)
    ref = torch.nn.functional.group_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 16,
        torch.from_numpy(gamma), torch.from_numpy(beta),
    )
    ours = core.group_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), 16)
    np.testing.assert_allclose(np.asarray(ours), _np(ref).transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)


def test_instance_norm_parity():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 6, 6, 8)).astype(np.float32)
    ref = torch.nn.functional.instance_norm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = core.instance_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), _np(ref).transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)


def test_bilinear_align_corners_parity():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 7, 5, 3)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(13, 11),
        mode="bilinear", align_corners=True,
    )
    ours = core.resize_bilinear_align_corners(jnp.asarray(x), (13, 11))
    np.testing.assert_allclose(np.asarray(ours), _np(ref).transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)


def test_weight_norm_parity():
    rng = np.random.default_rng(5)
    conv = torch.nn.Conv2d(5, 4, 3, bias=False)
    conv = torch.nn.utils.weight_norm(conv)
    v = _np(conv.weight_v)  # (O,I,kh,kw)
    g = _np(conv.weight_g).reshape(-1)
    w_ref = _np(conv.weight)
    ours = core.weight_norm_materialize(jnp.asarray(v.transpose(2, 3, 1, 0)), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(ours), w_ref.transpose(2, 3, 1, 0), rtol=RTOL, atol=ATOL)


def test_conv3d_parity():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 5, 8, 8, 3)).astype(np.float32)  # NDHWC
    w = rng.standard_normal((4, 3, 3, 7, 7)).astype(np.float32)  # OIDHW
    ref = torch.nn.functional.conv3d(
        torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), torch.from_numpy(w),
        stride=(2, 2, 2), padding=(1, 3, 3),
    )
    ours = core.conv3d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
                       stride=(2, 2, 2), padding=((1, 1), (3, 3), (3, 3)))
    np.testing.assert_allclose(np.asarray(ours), _np(ref).transpose(0, 2, 3, 4, 1), rtol=1e-4, atol=1e-4)


def test_spectral_norm_fold_matches_torch():
    from ipoke_tpu.ckpt import torch_import as ti

    conv = torch.nn.Conv2d(5, 4, 3)
    conv = torch.nn.utils.spectral_norm(conv)
    with torch.no_grad():
        for _ in range(20):  # converge the power iteration
            conv(torch.randn(1, 5, 8, 8))
    sd = {f"c.{k}": _np(v) for k, v in conv.state_dict().items()}
    w_eff = _np(conv.weight)  # torch's normalized weight
    out = ti.sn_conv(sd, "c")
    np.testing.assert_allclose(np.asarray(out["w"]), w_eff.transpose(2, 3, 1, 0), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("amsgrad", [False, True])
def test_torch_adam_semantics(amsgrad):
    """train/second_stage.torch_adam must match torch.optim.Adam exactly:
    COUPLED L2 weight decay (added to the grad before moments) + amsgrad
    (reference second_stage_video.py:648-662)."""
    import optax

    from ipoke_tpu.train.second_stage import torch_adam

    rng = np.random.default_rng(11)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    lr, wd = 1e-2, 1e-2  # large wd so coupled-vs-decoupled actually differs

    w_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = torch.optim.Adam([w_t], lr=lr, weight_decay=wd, amsgrad=amsgrad)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(5)]
    for g in grads:
        opt_t.zero_grad()
        w_t.grad = torch.from_numpy(g.copy())
        opt_t.step()

    opt_j = torch_adam(lambda _: lr, weight_decay=wd, amsgrad=amsgrad)
    w_j = jnp.asarray(w0)
    state = opt_j.init(w_j)
    for g in grads:
        updates, state = opt_j.update(jnp.asarray(g), state, w_j)
        w_j = optax.apply_updates(w_j, updates)
    np.testing.assert_allclose(np.asarray(w_j), _np(w_t), rtol=1e-5, atol=1e-6)
