"""Metric tests: value sanity (identical inputs -> perfect scores), ordering
(more-different inputs -> larger distances), Frechet math against closed-form
Gaussians, I3D shape/pipeline, diversity monotonicity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.metrics import diversity, fvd, i3d, image, lpips


def _frames(key, b=3, s=64):
    return jnp.tanh(jax.random.normal(jax.random.PRNGKey(key), (b, s, s, 3)))


def test_psnr_ssim_identity_and_ordering():
    x = _frames(0)
    assert float(image.psnr(x, x)) > 60
    assert float(image.ssim(x, x)) > 0.999
    noisy = jnp.clip(x + 0.1 * jax.random.normal(jax.random.PRNGKey(1), x.shape), -1, 1)
    noisier = jnp.clip(x + 0.4 * jax.random.normal(jax.random.PRNGKey(2), x.shape), -1, 1)
    assert float(image.psnr(x, noisy)) > float(image.psnr(x, noisier))
    assert float(image.ssim(x, noisy)) > float(image.ssim(x, noisier))


def test_lpips_identity_and_ordering():
    x = _frames(3)
    d0 = lpips.lpips(x, x)
    assert float(jnp.max(d0)) < 1e-5
    near = jnp.clip(x + 0.05 * jax.random.normal(jax.random.PRNGKey(4), x.shape), -1, 1)
    far = jnp.clip(x + 0.5 * jax.random.normal(jax.random.PRNGKey(5), x.shape), -1, 1)
    assert float(jnp.mean(lpips.lpips(x, near))) < float(jnp.mean(lpips.lpips(x, far)))


def test_frechet_distance_closed_form():
    rng = np.random.default_rng(0)
    d = 8
    mu1, mu2 = np.zeros(d), np.ones(d)
    s = np.eye(d)
    # identical distributions -> 0
    assert abs(fvd.frechet_distance(mu1, s, mu1, s)) < 1e-6
    # equal covariances -> ||mu1-mu2||^2
    assert abs(fvd.frechet_distance(mu1, s, mu2, s) - d) < 1e-5


def test_i3d_features_shape():
    v = jnp.tanh(jax.random.normal(jax.random.PRNGKey(0), (2, 10, 64, 64, 3)))
    f = i3d.features(v)
    assert f.shape == (2, 400)
    assert bool(jnp.all(jnp.isfinite(f)))


def test_fvd_pipeline_orders_distributions():
    rng = np.random.default_rng(0)
    real = np.tanh(rng.standard_normal((8, 6, 64, 64, 3))).astype(np.float32)
    same = np.tanh(rng.standard_normal((8, 6, 64, 64, 3))).astype(np.float32)
    diff = np.clip(real + 1.0, -1, 1).astype(np.float32)
    fvd_same = fvd.compute_fvd(real, same, batch_size=4)
    fvd_diff = fvd.compute_fvd(real, diff, batch_size=4)
    assert np.isfinite(fvd_same) and np.isfinite(fvd_diff)
    assert fvd_diff > fvd_same


def test_diversity_scores_monotone():
    key = jax.random.PRNGKey(0)
    base = jnp.tanh(jax.random.normal(key, (2, 1, 3, 32, 32, 3)))
    tight = jnp.concatenate([base, jnp.clip(base + 0.01, -1, 1)], axis=1)
    wide = jnp.concatenate([base, -base], axis=1)
    assert diversity.div_score_mse(wide) > diversity.div_score_mse(tight)
    assert diversity.div_score_vgg(wide) > diversity.div_score_vgg(tight)


def test_best_of_n():
    target = _frames(7, b=2).reshape(2, 1, 64, 64, 3).repeat(3, axis=1)
    good = target + 0.01
    bad = target + 0.5
    samples = jnp.stack([bad, good])  # (N=2, B=2, T=3, ...)

    def metric(a, b):
        return jnp.mean((a - b) ** 2, axis=(1, 2, 3))

    mean, std = image.best_of_n_metric(metric, samples, target)
    assert mean.shape == (3,)
    np.testing.assert_allclose(mean, jnp.full((3,), 1e-4), rtol=1e-2)


def test_fvd_moments_reject_degenerate_feature_sets():
    """An (almost-)all-NaN feature set must raise, not hang: NaN moments fed
    into scipy sqrtm spin forever (observed 2026-08-20 on an all-NaN student
    sample set)."""
    import numpy as np
    import pytest

    from ipoke_tpu.metrics import fvd as fvd_mod

    feats = np.full((8, 4), np.nan)
    with pytest.raises(ValueError, match="finite feature rows"):
        fvd_mod._moments(feats)
    feats[0] = 1.0  # one finite row is still not enough for a covariance
    with pytest.raises(ValueError, match="finite feature rows"):
        fvd_mod._moments(feats)
    feats[1:3] = 2.0  # three rows: fine, and NaN rows are filtered
    mu, sigma = fvd_mod._moments(feats)
    assert np.isfinite(mu).all() and np.isfinite(sigma).all()
