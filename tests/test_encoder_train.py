"""Image-AE and Poke-AE trainer tests (tiny sizes)."""
import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.models.discriminators import PatchDiscSpec
from ipoke_tpu.models.encoders import WrapperSpec
from ipoke_tpu.train import encoders as te

S = 64
IMG_SPEC = WrapperSpec(nf_in=3, nf_max=16, spatial_size=S, min_spatial_size=8, deterministic=False)
POKE_SPEC = WrapperSpec(nf_in=2, nf_max=16, spatial_size=S, min_spatial_size=8, deterministic=True)
DISC_SPEC = PatchDiscSpec(n_layers=2)


def _batch(b=2, t=3):
    k = jax.random.PRNGKey(0)
    return {
        "images": jnp.tanh(jax.random.normal(k, (b, t, S, S, 3))),
        "poke": jax.random.normal(jax.random.fold_in(k, 1), (b, S, S, 2)),
        "flow": jax.random.normal(jax.random.fold_in(k, 2), (b, S, S, 2)),
    }


def test_image_ae_step():
    state, opts = te.init_image_ae(jax.random.PRNGKey(0), IMG_SPEC, DISC_SPEC)
    step = jax.jit(te.make_image_ae_step(IMG_SPEC, DISC_SPEC, opts))
    batch = _batch()
    s1, logs = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss", "nll_loss", "kl_loss", "d_weight", "d_loss"):
        assert np.isfinite(float(logs[k])), (k, logs[k])
    assert int(s1.step) == 1
    # params moved
    before = jax.tree_util.tree_leaves(state.params)
    after = jax.tree_util.tree_leaves(s1.params)
    assert any(not np.allclose(a, b) for a, b in zip(before, after))


def test_poke_ae_step_decreases_loss():
    state, opt = te.init_poke_ae(jax.random.PRNGKey(0), POKE_SPEC, lr=1e-3)
    step = jax.jit(te.make_poke_ae_step(POKE_SPEC, opt))
    batch = _batch()
    losses = []
    for i in range(6):
        state, logs = step(state, batch)
        losses.append(float(logs["nll_loss"]))
    assert losses[-1] < losses[0], losses
