"""Round-trip (inverse-of-forward) and logdet-consistency tests for every flow
block.  The reference never tests these invariants; they pin the exact-inverse
semantics that the released checkpoints rely on."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.flows import actnorm, mcf, nice, permute, transformer
from ipoke_tpu.flows.macow import (
    FlowSpec,
    init_macow_step,
    init_macow_unit,
    init_multiscale,
    init_prior,
    macow_step_forward,
    macow_step_inverse,
    macow_unit_forward,
    macow_unit_inverse,
    multiscale_forward,
    multiscale_inverse,
    prior_forward,
    prior_inverse,
)

B, S, C, HC = 2, 8, 8, 12
RTOL = 2e-4
ATOL = 2e-4


def _data(key, c=C, hc=HC):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(k1, (B, S, S, c))
    h = jax.random.normal(k2, (B, S, S, hc))
    return x, h


def test_actnorm_roundtrip():
    x, _ = _data(0)
    p = actnorm.init_actnorm(jax.random.PRNGKey(1), C)
    y, ld = actnorm.forward(p, x)
    assert ld.shape == (B,)
    expected_ld = S * S * jnp.sum(p["log_scale"])
    np.testing.assert_allclose(ld, jnp.full((B,), expected_ld), rtol=1e-5)
    x2 = actnorm.inverse(p, y)
    np.testing.assert_allclose(x, x2, rtol=1e-5, atol=1e-5)


def test_actnorm_data_init():
    x, _ = _data(1)
    p = actnorm.init_actnorm(jax.random.PRNGKey(1), C)
    p2 = actnorm.data_init(p, x)
    y, _ = actnorm.forward(p2, x)
    flat = y.reshape(-1, C)
    np.testing.assert_allclose(jnp.mean(flat, axis=0), jnp.zeros(C), atol=1e-5)
    np.testing.assert_allclose(jnp.std(flat, axis=0, ddof=1), jnp.ones(C), atol=1e-4)


def test_shuffle_roundtrip():
    x, _ = _data(2)
    p = permute.init_shuffle(jax.random.PRNGKey(3), C)
    y, ld = permute.shuffle_forward(p, x)
    assert not jnp.allclose(y, x)
    np.testing.assert_allclose(permute.shuffle_inverse(p, y), x)


def test_conv_lu_roundtrip():
    x, _ = _data(3)
    p = permute.init_conv_lu(jax.random.PRNGKey(4), C)
    y, ld = permute.conv_lu_forward(p, x)
    x2 = permute.conv_lu_inverse(p, y)
    np.testing.assert_allclose(x, x2, rtol=1e-4, atol=1e-4)
    # logdet = H*W*sum(log_s)
    np.testing.assert_allclose(ld[0], S * S * jnp.sum(p["log_s"]), rtol=1e-5)


@pytest.mark.parametrize("split_type,order", [
    ("continuous", "up"), ("continuous", "down"), ("skip", "up"), ("skip", "down"),
])
def test_nice_roundtrip(split_type, order):
    x, h = _data(4)
    p = nice.init_nice(
        jax.random.PRNGKey(5), C, hidden=32, h_channels=HC, split_type=split_type, order=order
    )
    # zero-init last conv -> identity at init; randomize to make the test real
    p["net"]["conv3"]["g"] = 0.5 * jnp.ones_like(p["net"]["conv3"]["g"])
    kw = dict(h=h, in_channels=C, split_type=split_type, order=order)
    y, ld = nice.forward(p, x, **kw)
    assert not jnp.allclose(y, x)
    x2 = nice.inverse(p, y, **kw)
    np.testing.assert_allclose(x, x2, rtol=RTOL, atol=ATOL)


def test_nice_identity_at_init():
    x, h = _data(5)
    p = nice.init_nice(jax.random.PRNGKey(6), C, hidden=32, h_channels=HC)
    y, ld = nice.forward(p, x, h=h, in_channels=C)
    np.testing.assert_allclose(y, x, atol=1e-6)
    np.testing.assert_allclose(ld, jnp.zeros(B), atol=1e-6)


@pytest.mark.parametrize("order", ["A", "B", "C", "D"])
@pytest.mark.parametrize("cond", [True, False])
def test_mcf_roundtrip(order, cond):
    x, h = _data(6)
    kernel = (2, 3) if order in ("A", "B") else (3, 2)
    p = mcf.init_mcf(
        jax.random.PRNGKey(7), C, kernel, h_channels=HC if cond else None
    )
    p["net"]["conv1x1"]["g"] = 0.3 * jnp.ones_like(p["net"]["conv1x1"]["g"])
    hh = h if cond else None
    y, ld = mcf.forward(p, x, h=hh, order=order)
    assert not jnp.allclose(y, x)
    x2 = mcf.inverse(p, y, h=hh, order=order)
    np.testing.assert_allclose(x, x2, rtol=RTOL, atol=ATOL)


def test_mcf_causality():
    """Order-A output at row i must not depend on input rows >= i."""
    x, h = _data(7)
    p = mcf.init_mcf(jax.random.PRNGKey(8), C, (2, 3), h_channels=HC)
    p["net"]["conv1x1"]["g"] = 0.3 * jnp.ones_like(p["net"]["conv1x1"]["g"])
    y1, _ = mcf.forward(p, x, h=h, order="A")
    x_mod = x.at[:, 5:].set(0.0)
    y2, _ = mcf.forward(p, x_mod, h=h, order="A")
    # params for row 5 depend on rows 3,4 only -> rows <= 4 identical, and the
    # affine params of row 5 itself are unchanged
    np.testing.assert_allclose(y1[:, :5], y2[:, :5], rtol=1e-5, atol=1e-6)


SPEC = FlowSpec(
    num_steps=(2, 1),
    in_channels=C,
    hidden_channels=32,
    h_channels=HC,
    factor=4,
    kernel_size=(2, 3),
)


def _randomize_wn(p):
    """Give all zero-init weight-norm convs nonzero gain so tests exercise
    real (non-identity) transforms."""
    if isinstance(p, dict):
        if "v" in p and "g" in p:
            out = dict(p)
            out["g"] = 0.2 * jnp.ones_like(p["g"])
            return out
        return {k: _randomize_wn(v) for k, v in p.items()}
    if isinstance(p, list):
        return [_randomize_wn(v) for v in p]
    return p


def test_macow_unit_roundtrip():
    x, h = _data(8)
    p = _randomize_wn(init_macow_unit(jax.random.PRNGKey(9), C, SPEC))
    y, ld = macow_unit_forward(p, x, h, SPEC)
    x2 = macow_unit_inverse(p, y, h, SPEC)
    np.testing.assert_allclose(x, x2, rtol=5e-4, atol=5e-4)


def test_macow_step_roundtrip():
    x, h = _data(9)
    p = _randomize_wn(init_macow_step(jax.random.PRNGKey(10), C, SPEC))
    y, ld = macow_step_forward(p, x, h, SPEC)
    x2 = macow_step_inverse(p, y, h, SPEC)
    np.testing.assert_allclose(x, x2, rtol=1e-3, atol=1e-3)


def test_prior_roundtrip():
    x, h = _data(10)
    p = _randomize_wn(init_prior(jax.random.PRNGKey(11), C, 4, SPEC))
    y, ld = prior_forward(p, x, h, 4, SPEC)
    x2 = prior_inverse(p, y, h, 4, SPEC)
    np.testing.assert_allclose(x, x2, rtol=5e-4, atol=5e-4)


def test_multiscale_roundtrip():
    x, h = _data(11)
    p = _randomize_wn(init_multiscale(jax.random.PRNGKey(12), SPEC))
    y, ld = multiscale_forward(p, x, h, SPEC)
    assert y.shape == x.shape
    assert ld.shape == (B,)
    x2 = multiscale_inverse(p, y, h, SPEC)
    np.testing.assert_allclose(x, x2, rtol=2e-3, atol=2e-3)


def test_multiscale_logdet_finite_and_jittable():
    x, h = _data(12)
    p = _randomize_wn(init_multiscale(jax.random.PRNGKey(13), SPEC))
    fwd = jax.jit(lambda pp, xx, hh: multiscale_forward(pp, xx, hh, SPEC))
    y, ld = fwd(p, x, h)
    assert bool(jnp.all(jnp.isfinite(y)))
    assert bool(jnp.all(jnp.isfinite(ld)))
    inv = jax.jit(lambda pp, yy, hh: multiscale_inverse(pp, yy, hh, SPEC))
    x2 = inv(p, y, h)
    np.testing.assert_allclose(x, x2, rtol=2e-3, atol=2e-3)


def test_full_size_spec_roundtrip():
    """The released-config architecture at reduced depth: 32 channels, factor 16."""
    spec = FlowSpec(
        num_steps=(1, 1, 1),
        in_channels=32,
        hidden_channels=64,
        h_channels=16,
        factor=16,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(20))
    x = jax.random.normal(k1, (B, 8, 8, 32))
    h = jax.random.normal(k2, (B, 8, 8, 16))
    p = _randomize_wn(init_multiscale(jax.random.PRNGKey(21), spec))
    y, ld = multiscale_forward(p, x, h, spec)
    x2 = multiscale_inverse(p, y, h, spec)
    np.testing.assert_allclose(x, x2, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("unroll", [2, 8])
def test_mcf_inverse_unroll_equivalence(unroll):
    """unroll only changes scheduling: the unrolled inverse must match the
    looped one to fp noise (and still round-trip)."""
    x, h = _data(11)
    p = mcf.init_mcf(jax.random.PRNGKey(12), C, (2, 3), h_channels=HC)
    p["net"]["conv1x1"]["g"] = 0.3 * jnp.ones_like(p["net"]["conv1x1"]["g"])
    y, _ = mcf.forward(p, x, h=h, order="A")
    x1 = mcf.inverse(p, y, h=h, order="A", unroll=1)
    xu = mcf.inverse(p, y, h=h, order="A", unroll=unroll)
    np.testing.assert_allclose(x1, xu, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(x, xu, rtol=RTOL, atol=ATOL)


def test_macow_unit_inverse_unroll_spec():
    """mcf_unroll plumbs through the unit inverse and preserves the inverse."""
    x, h = _data(12)
    spec = FlowSpec(num_steps=(1,), in_channels=C, hidden_channels=24,
                    h_channels=HC)
    p = init_macow_unit(jax.random.PRNGKey(13), C, spec)
    y, _ = macow_unit_forward(p, x, h, spec)
    from dataclasses import replace

    x2 = macow_unit_inverse(p, y, h, replace(spec, mcf_unroll=8))
    np.testing.assert_allclose(x, x2, rtol=RTOL, atol=ATOL)


def test_init_multiscale_chunked_matches_monolithic():
    """Per-level jitted init == jitted monolithic init, bitwise (same
    fold_in schedule).  The chunked form is the flagship-width init path
    (the monolithic init graph OOM-kills the remote compile service,
    macow.init_multiscale_chunked docstring)."""
    from ipoke_tpu.flows.macow import init_multiscale_chunked

    spec = FlowSpec(num_steps=(3, 2, 1), in_channels=16, hidden_channels=24,
                    h_channels=HC, factor=4)
    k = jax.random.PRNGKey(7)
    mono = jax.jit(lambda kk: init_multiscale(kk, spec))(k)
    chunk = init_multiscale_chunked(k, spec)
    la = jax.tree_util.tree_leaves(mono)
    lb = jax.tree_util.tree_leaves(chunk)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # retry hook fires per level and its result is used
    calls = []

    def retry(fn, what):
        calls.append(what)
        return fn()

    chunk2 = init_multiscale_chunked(k, spec, retry=retry)
    assert len(calls) == len(spec.num_steps)
    for x, y in zip(jax.tree_util.tree_leaves(chunk2), lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
