"""Unit tests for the elementwise invertible transforms (flows/transforms.py).

Reference semantics: models/modules/INN/macow_utils.py:9-208 — each transform
maps z -> out with a per-batch logdet; bwd inverts fwd exactly and negates the
logdet.  The NLSQ case pins the Newton-polished f32 inverse to near machine
precision (the reference reaches the same accuracy by solving the cubic in
f64, which is emulated and slow on TPU).
"""
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.flows import transforms


def _raw(key, transform, shape=(4, 8, 8, 6)):
    *lead, c = shape
    return jax.random.normal(key, (*lead, c * transform.n_params))


@pytest.mark.parametrize("name", ["additive", "affine", "relu", "nlsq"])
def test_roundtrip_and_logdet(name):
    tr = transforms.get_transform(name)
    # crc32, not hash(): str hash is randomized per run (PYTHONHASHSEED), so a
    # tolerance-marginal failure would be irreproducible (ADVICE r4)
    key = jax.random.PRNGKey(zlib.crc32(name.encode()))
    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (4, 8, 8, 6)) * 2.0
    params = tr.calc_params(_raw(k2, tr))
    out, ld_f = tr.fwd(z, params)
    back, ld_b = tr.bwd(out, params)
    tol = 1e-4 if name in ("nlsq", "relu") else 1e-5
    np.testing.assert_allclose(np.asarray(back), np.asarray(z),
                               atol=tol, rtol=tol)
    # fwd and bwd logdets cancel
    np.testing.assert_allclose(np.asarray(ld_f + ld_b), 0.0, atol=1e-3)


@pytest.mark.parametrize("name", ["affine", "relu", "nlsq"])
def test_logdet_matches_autodiff(name):
    """logdet == sum(log |d out/d z|) elementwise (transforms act pointwise)."""
    tr = transforms.get_transform(name)
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (2, 4, 4, 2)) * 1.5
    params = tr.calc_params(_raw(k2, tr, (2, 4, 4, 2)))
    out, ld = tr.fwd(z, params)
    grad = jax.grad(lambda zz: jnp.sum(tr.fwd(zz, params)[0]))(z)
    want = jnp.sum(jnp.log(jnp.abs(grad)).reshape(z.shape[0], -1), axis=1)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(want),
                               atol=1e-3, rtol=1e-4)


def test_nlsq_inverse_precision_wide_range():
    """The Newton-polished inverse holds up across magnitudes where the raw
    f32 cubic formula loses digits to cancellation."""
    tr = transforms.get_transform("nlsq")
    key = jax.random.PRNGKey(11)
    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (8, 16, 16, 4)) * jnp.asarray(
        [0.1, 1.0, 5.0, 20.0])  # per-channel magnitude sweep
    params = tr.calc_params(_raw(k2, tr, (8, 16, 16, 4)) * 2.0)
    out, _ = tr.fwd(z, params)
    back, _ = tr.bwd(out, params)
    err = np.max(np.abs(np.asarray(back - z)) / (np.abs(np.asarray(z)) + 1.0))
    assert err < 5e-6, err


def test_symm_elu_forward_finite():
    tr = transforms.get_transform("symm_elu")
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (2, 4, 4, 2)) * 3.0
    params = tr.calc_params(_raw(k2, tr, (2, 4, 4, 2)))
    out, ld = tr.fwd(z, params)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(ld)).all()
