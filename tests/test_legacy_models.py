"""Legacy dead-code components (reference parity): MaCow v1 unconditional
step (golden vs the importable reference), the 3D SPADE+ADAIN Generator, and
the BigGAN decoder stack (smoke: shapes/finiteness/tanh range)."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ipoke_tpu.flows import macow_v1

REF = os.environ.get("IPOKE_REFERENCE", "/root/reference")
HAVE_REF = os.path.isdir(os.path.join(REF, "models"))
if HAVE_REF and REF not in sys.path:
    sys.path.insert(0, REF)


def test_macow_v1_roundtrip():
    spec = macow_v1.MaCowV1Spec(in_channels=8, hidden_channels=24)
    p = macow_v1.init_step_v1(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    y, logdet = macow_v1.step_v1_forward(p, x, spec)
    assert bool(jnp.isfinite(logdet).all())
    x_rec = macow_v1.step_v1_inverse(p, y, spec)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=2e-4)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
def test_macow_v1_golden():
    torch = pytest.importorskip("torch")
    from models.modules.INN.macow import MaCowStep

    from ipoke_tpu.ckpt.torch_import import convert_macow_v1_step

    torch.manual_seed(80)
    m = MaCowStep(8, (2, 3), hidden_channels=24, s_channels=None, num_units=2,
                  scale=True).eval()
    g = torch.Generator().manual_seed(81)
    x = torch.randn(2, 8, 8, 8, generator=g)
    with torch.no_grad():
        m(x)  # actnorm lazy data-init
        gg = torch.Generator().manual_seed(82)
        for p_ in m.parameters():
            p_.add_(torch.randn(p_.shape, generator=gg) * 0.1)
        y_ref, ld_ref = m(x)
        x_rec = m(y_ref, reverse=True)
    assert float((x_rec - x).abs().max()) < 1e-4

    spec = macow_v1.MaCowV1Spec(in_channels=8, hidden_channels=24)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    p = convert_macow_v1_step(sd, spec)
    x_j = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    y, ld = macow_v1.step_v1_forward(p, x_j, spec)
    ref = y_ref.numpy()
    got = np.transpose(np.asarray(y), (0, 3, 1, 2))
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-8)
    assert err < 5e-4, f"v1 fwd rel err {err:.2e}"
    lerr = np.max(np.abs(np.asarray(ld) - ld_ref.numpy()))
    assert lerr < 1e-2, f"v1 logdet err {lerr:.2e}"
    x_mine = macow_v1.step_v1_inverse(p, jnp.asarray(np.transpose(ref, (0, 2, 3, 1))), spec)
    xerr = np.max(np.abs(np.transpose(np.asarray(x_mine), (0, 3, 1, 2)) - x.numpy()))
    assert xerr < 5e-4, f"v1 inv err {xerr:.2e}"


def test_motion_generator_shapes():
    from ipoke_tpu.models import motion_generator as mg

    spec = mg.GeneratorSpec(img_size=64, z_dim=16, decoder_factor=2)
    p = mg.init(jax.random.PRNGKey(2), spec)
    img = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
    motion = jax.random.normal(jax.random.PRNGKey(4), (2, 16))
    vid = mg.apply(p, img, motion, spec)
    assert vid.shape == (2, 2, 64, 64, 3), vid.shape
    assert bool(jnp.isfinite(vid).all())
    assert float(jnp.max(jnp.abs(vid))) <= 1.0


def test_biggan_generator_shapes():
    from ipoke_tpu.models import biggan

    spec = biggan.BigGANSpec(resolution=64, chn=8)
    p = biggan.init(jax.random.PRNGKey(5), spec)
    z = jax.random.normal(jax.random.PRNGKey(6), (2, 100))  # 5 chunks of 20
    cls = jax.random.normal(jax.random.PRNGKey(7), (2, 128))
    img = biggan.apply(p, z, cls, spec)
    assert img.shape == (2, 64, 64, 3), img.shape
    assert bool(jnp.isfinite(img).all())
    assert float(jnp.max(jnp.abs(img))) <= 1.0
