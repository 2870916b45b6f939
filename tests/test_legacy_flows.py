"""Legacy flow families (reference dead-code parity): FC coupling stack
(flow_blocks.py ConditionalFlow) and the mixture-CDF coupling flow
(UnconditionalMixCDFConvFlow).  Round-trip + logdet sanity."""
import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.flows import legacy, mixcdf


def test_fc_flow_roundtrip():
    spec = legacy.FCFlowSpec(in_channels=16, embedding_dim=8, hidden_dim=32,
                             hidden_depth=2, n_flows=4)
    p = legacy.init_fc_flow(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    emb = jax.random.normal(jax.random.PRNGKey(2), (4, 8))
    z, logdet = legacy.fc_flow_forward(p, spec, x, emb)
    assert z.shape == x.shape and logdet.shape == (4,)
    x_rec = legacy.fc_flow_inverse(p, spec, z, emb)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-4)


def test_fc_flow_conditioning_options():
    for opt in ("parallel", "sequential"):
        spec = legacy.FCFlowSpec(in_channels=8, embedding_dim=6, hidden_dim=16,
                                 hidden_depth=1, n_flows=2, conditioning_option=opt)
        p = legacy.init_fc_flow(jax.random.PRNGKey(3), spec)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 8))
        emb = jax.random.normal(jax.random.PRNGKey(5), (2, 6))
        z, _ = legacy.fc_flow_forward(p, spec, x, emb)
        x_rec = legacy.fc_flow_inverse(p, spec, z, emb)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-4)


def test_fc_flow_embedding_dependence():
    spec = legacy.FCFlowSpec(in_channels=8, embedding_dim=4, hidden_dim=16,
                             hidden_depth=1, n_flows=2)
    p = legacy.init_fc_flow(jax.random.PRNGKey(6), spec)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8))
    z1, _ = legacy.fc_flow_forward(p, spec, x, jnp.zeros((2, 4)))
    z2, _ = legacy.fc_flow_forward(p, spec, x, jnp.ones((2, 4)))
    assert float(jnp.max(jnp.abs(z1 - z2))) > 1e-4


def test_vec_actnorm_data_init():
    x = jax.random.normal(jax.random.PRNGKey(8), (64, 12)) * 3.0 + 1.5
    p = legacy.vec_actnorm_data_init(legacy.init_vec_actnorm(12), x)
    y, _ = legacy.vec_actnorm_forward(p, x)
    assert abs(float(y.mean())) < 1e-4
    assert abs(float(y.std()) - 1.0) < 1e-2


def test_mixlogcdf_inverse():
    k = 4
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (2, 8, 8, 3))
    logits = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 3, k))
    means = jax.random.normal(jax.random.fold_in(key, 2), (2, 8, 8, 3, k))
    logscales = -0.5 + 0.2 * jax.random.normal(jax.random.fold_in(key, 3), (2, 8, 8, 3, k))
    y = jnp.exp(mixcdf.mix_log_cdf(x, logits, means, logscales))
    assert float(y.min()) > 0.0 and float(y.max()) < 1.0
    x_rec = mixcdf.inv_mixlogcdf(y, logits, means, logscales, n_iter=80)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)


def test_mixcdf_flow_roundtrip():
    spec = mixcdf.MixCDFSpec(channels=8, hidden_dim=16, components=3, n_flows=2)
    p = mixcdf.init_flow(jax.random.PRNGKey(10), spec)
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 8, 8, 8))
    z, logdet = mixcdf.flow_forward(p, x, spec)
    assert z.shape == x.shape and bool(jnp.isfinite(logdet).all())
    x_rec = mixcdf.flow_inverse(p, z, spec)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=5e-3)


def test_leapfrog_roundtrip_and_volume():
    from ipoke_tpu.flows import leapfrog

    spec = leapfrog.LeapFlowSpec(in_channels=12, hidden_dim=32, n_flows=3)
    p = leapfrog.init_leap_flow(jax.random.PRNGKey(20), spec)
    x = jax.random.normal(jax.random.PRNGKey(21), (4, 12))
    v = jax.random.normal(jax.random.PRNGKey(22), (4, 12))
    x1, v1, logdet = leapfrog.leap_flow_forward(p, spec, x, v)
    # couplings are shears: total logdet comes only from the actnorms
    expected = sum(
        float(jnp.sum(jnp.log(jnp.abs(blk["actnorm_x"]["scale"]))))
        + float(jnp.sum(jnp.log(jnp.abs(blk["actnorm_v"]["scale"]))))
        for blk in p["blocks"]
    )
    np.testing.assert_allclose(np.asarray(logdet), expected, atol=1e-4)
    x0, v0 = leapfrog.leap_flow_inverse(p, spec, x1, v1)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v), rtol=1e-4, atol=1e-4)


def test_hmc_sample_moves_positions():
    from ipoke_tpu.flows import leapfrog

    spec = leapfrog.LeapFlowSpec(in_channels=8, hidden_dim=16, n_flows=2)
    p = leapfrog.init_leap_flow(jax.random.PRNGKey(23), spec)
    x0 = jax.random.normal(jax.random.PRNGKey(24), (4, 8))
    x1, v1 = leapfrog.hmc_sample(p, spec, jax.random.PRNGKey(25), x0)
    assert x1.shape == x0.shape and float(jnp.max(jnp.abs(x1 - x0))) > 1e-4
