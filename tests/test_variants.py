"""Model-variant tests: RNNMotionModel, FCBaseline, PokeVAE forward shapes +
prior sampling."""
import jax
import jax.numpy as jnp

from ipoke_tpu.models import variants
from ipoke_tpu.models.first_stage import FirstStageSpec
from ipoke_tpu.models.variants import FCBaselineSpec, PokeVAESpec

B, T, S = 2, 4, 64

FS = FirstStageSpec(
    z_dim=16, spatial_size=S, max_frames=T,
    enc_channels=(16, 16, 16, 16), dec_channels=(16, 16, 16, 16),
    n_gru_layers=2, min_spatial_size=8, motion_bias=True, full_sequence=True,
)


def _batch():
    k = jax.random.PRNGKey(0)
    return {
        "images": jnp.tanh(jax.random.normal(k, (B, T, S, S, 3))),
        "poke": jax.random.normal(jax.random.fold_in(k, 1), (B, S, S, 2)),
    }


def test_rnn_motion_model():
    p, enc_spec, dec_spec = variants.init_rnn_motion(jax.random.PRNGKey(0), FS)
    x = _batch()["images"]
    x_hat, mu, logvar = variants.rnn_motion_forward(p, x, FS, enc_spec, dec_spec, rng=jax.random.PRNGKey(1))
    assert x_hat.shape == (B, T - 1, S, S, 3)


def test_fc_baseline():
    spec = FCBaselineSpec(
        z_dim=16, spatial_size=S, max_frames=T,
        enc_channels=(16, 16, 16, 16), dec_channels=(16, 16, 16, 16, 16), n_gru_layers=2,
    )  # FC generator starts at 4x4 -> needs 4 upsampling stages for 64x64
    p, me_spec = variants.init_fc_baseline(jax.random.PRNGKey(0), spec)
    x = _batch()["images"]
    x_hat, mu, logvar = variants.fc_baseline_forward(p, x, spec, me_spec, rng=jax.random.PRNGKey(1))
    assert x_hat.shape == (B, T - 1, S, S, 3)
    assert float(jnp.max(jnp.abs(x_hat))) <= 1.0


def test_poke_vae_posterior_and_prior():
    spec = PokeVAESpec(first_stage=FS)
    p = variants.init_poke_vae(jax.random.PRNGKey(0), spec)
    batch = _batch()
    x_hat, mu, logvar = variants.poke_vae_forward(p, batch, spec, rng=jax.random.PRNGKey(1))
    assert x_hat.shape == (B, T - 1, S, S, 3)
    assert mu.shape == (B, 8, 8, 16)
    x_s, mu_s, _ = variants.poke_vae_forward(
        p, batch, spec, rng=jax.random.PRNGKey(2), sample_prior=True
    )
    assert x_s.shape == (B, T - 1, S, S, 3)
    assert mu_s is None


def test_poke_vae_stacked():
    spec = PokeVAESpec(first_stage=FS, stack_motion_and_poke=True)
    p = variants.init_poke_vae(jax.random.PRNGKey(0), spec)
    x_hat, *_ = variants.poke_vae_forward(p, _batch(), spec, rng=jax.random.PRNGKey(1))
    assert x_hat.shape == (B, T - 1, S, S, 3)
