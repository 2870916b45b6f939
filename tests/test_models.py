"""Shape/integration tests for the model stack: motion encoder, ConvGRU,
SPADE decoder, conditioning towers, first-stage autoencode, second-stage
density + sampling end-to-end (tiny sizes, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.flows.macow import FlowSpec
from ipoke_tpu.models import conv_gru, decoder, encoders, first_stage, motion_encoder, second_stage
from ipoke_tpu.models.encoders import ConvEncoderSpec, WrapperSpec
from ipoke_tpu.models.first_stage import FirstStageSpec
from ipoke_tpu.models.second_stage import SecondStageSpec

B, T, S = 2, 4, 64

FS_SPEC = FirstStageSpec(
    z_dim=16,
    spatial_size=S,
    max_frames=T,
    enc_channels=(16, 16, 16, 16),
    dec_channels=(16, 16, 16, 16),
    n_gru_layers=2,
    min_spatial_size=8,
    motion_bias=True,
    full_sequence=True,
)

POKE_SPEC = WrapperSpec(nf_in=2, nf_max=16, spatial_size=S, min_spatial_size=8, deterministic=True)
COND_SPEC = WrapperSpec(nf_in=3, nf_max=16, spatial_size=S, min_spatial_size=8, deterministic=False)


def _video(key=0):
    return jax.random.normal(jax.random.PRNGKey(key), (B, T, S, S, 3))


def test_motion_encoder_shapes():
    spec = FS_SPEC.encoder_spec
    p = motion_encoder.init(jax.random.PRNGKey(0), spec)
    z, mu, logvar = motion_encoder.apply(p, _video(), spec, rng=jax.random.PRNGKey(1))
    assert z.shape == (B, 8, 8, 16)
    assert mu.shape == (B, 8, 8, 16)
    # deterministic path returns mu
    z2, mu2, _ = motion_encoder.apply(p, _video(), spec, rng=None)
    np.testing.assert_allclose(z2, mu2)


def test_conv_gru_step():
    cells = conv_gru.init_stack(jax.random.PRNGKey(0), 16, 16, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 8, 16))
    hidden = [x, x]
    new = conv_gru.stack_apply(cells, x, hidden)
    assert len(new) == 2 and new[0].shape == x.shape
    # gate saturation sanity: outputs bounded
    assert float(jnp.max(jnp.abs(new[-1]))) < 50.0


def test_conv_gru_fused_gates_bitwise_exact():
    """The dual-output reset+update conv must match two separate convs
    BITWISE (concatenating kernels on the output axis leaves every output
    channel's reduction untouched) — the r4 res_block fusion invariant,
    applied to the GRU gates (VERDICT r4 next-step 6)."""
    from ipoke_tpu.nn.core import conv2d

    p = conv_gru.init_cell(jax.random.PRNGKey(3), 16, 16)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, 8, 8, 16))
    h = jax.random.normal(jax.random.PRNGKey(5), (B, 8, 8, 16))
    fused = conv_gru.cell_apply(p, x, h)

    # unfused reference formula (the pre-fusion implementation)
    stacked = jnp.concatenate([x, h], axis=-1)
    update = jax.nn.sigmoid(conv2d(stacked, p["update"]["w"], p["update"]["b"], padding=1))
    reset = jax.nn.sigmoid(conv2d(stacked, p["reset"]["w"], p["reset"]["b"], padding=1))
    out_in = jnp.concatenate([x, h * reset], axis=-1)
    out = jnp.tanh(conv2d(out_in, p["out"]["w"], p["out"]["b"], padding=1))
    ref = h * (1.0 - update) + out * update
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_spade_decoder_shapes_and_hoisting():
    spec = FS_SPEC.decoder_spec
    p = decoder.init(jax.random.PRNGKey(0), spec)
    hidden = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 8, 16))
    frame0 = jax.random.normal(jax.random.PRNGKey(2), (B, S, S, 3))
    out = decoder.apply(p, hidden, frame0, spec)
    assert out.shape == (B, S, S, 3)
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh
    feats = decoder.precompute_spade_feats(p, frame0, spec)
    out2 = decoder.apply(p, hidden, frame0, spec, spade_feats=feats)
    np.testing.assert_allclose(out, out2, rtol=1e-5, atol=1e-6)


def test_conv_encoder_variational_and_deterministic():
    spec = ConvEncoderSpec(nf_in=3, nf_max=16, n_stages=3, variational=True)
    p = encoders.init_conv_encoder(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, S, 3))
    out, mean, logstd = encoders.conv_encoder_apply(p, x, spec, rng=jax.random.PRNGKey(2))
    assert out.shape == (B, 8, 8, 16)
    assert mean.shape == (B, 8, 8, 16)
    assert float(jnp.min(logstd)) >= 0.0 and float(jnp.max(logstd)) <= 1.0

    dspec = ConvEncoderSpec(nf_in=2, nf_max=16, n_stages=3, variational=False)
    dp = encoders.init_conv_encoder(jax.random.PRNGKey(3), dspec)
    poke = jax.random.normal(jax.random.PRNGKey(4), (B, S, S, 2))
    out, mean, logstd = encoders.conv_encoder_apply(dp, poke, dspec)
    assert out.shape == (B, 8, 8, 16)
    assert logstd is None


def test_wrapper_autoencode():
    p = encoders.init_wrapper(jax.random.PRNGKey(0), POKE_SPEC)
    poke = jax.random.normal(jax.random.PRNGKey(1), (B, S, S, 2))
    rec = encoders.wrapper_apply(p, poke, POKE_SPEC)
    assert rec.shape == (B, S, S, 2)


def test_first_stage_forward():
    p = first_stage.init(jax.random.PRNGKey(0), FS_SPEC)
    x = _video()
    x_hat, mu, logvar = first_stage.forward(p, x, FS_SPEC, rng=jax.random.PRNGKey(1))
    assert x_hat.shape == (B, T - 1, S, S, 3)
    assert mu.shape == (B, 8, 8, 16)
    # longer-than-trained unroll (GUI feature parity)
    motion, *_ = first_stage.encode(p, x, FS_SPEC)
    vid = first_stage.decode(p, motion, x[:, 0], FS_SPEC, length=7)
    assert vid.shape == (B, 7, S, S, 3)


def _second_stage_spec():
    flow = FlowSpec(
        num_steps=(1, 1),
        in_channels=16,
        hidden_channels=32,
        h_channels=32,
        factor=16,
    )
    return SecondStageSpec(
        flow=flow, first_stage=FS_SPEC, poke_embedder=POKE_SPEC, conditioner=COND_SPEC
    )


def test_second_stage_density_and_sample():
    spec = _second_stage_spec()
    p = second_stage.init(jax.random.PRNGKey(0), spec)
    batch = {
        "images": _video(),
        "poke": jax.random.normal(jax.random.PRNGKey(5), (B, S, S, 2)),
    }
    out, logdet, cond = second_stage.forward_density(p, spec, batch)
    assert out.shape == (B, 8, 8, 16)
    assert logdet.shape == (B,)
    assert cond.shape == (B, 8, 8, 32)

    vids = second_stage.forward_sample(p, spec, batch, jax.random.PRNGKey(6), n_samples=2)
    assert vids.shape == (2, B, T - 1, S, S, 3)
    assert bool(jnp.all(jnp.isfinite(vids)))


def test_second_stage_density_sample_consistency():
    """With a fixed cond, flow^-1(flow(x)) == x through the full model stack."""
    from ipoke_tpu.flows import transformer

    spec = _second_stage_spec()
    p = second_stage.init(jax.random.PRNGKey(0), spec)
    batch = {
        "images": _video(),
        "poke": jax.random.normal(jax.random.PRNGKey(5), (B, S, S, 2)),
    }
    out, logdet, cond = second_stage.forward_density(p, spec, batch)
    motion, _ = second_stage.encode_first_stage(p, spec, batch["images"])
    back = transformer.reverse(p["flow"], spec.flow, out, cond)
    np.testing.assert_allclose(np.asarray(motion), np.asarray(back), rtol=2e-3, atol=2e-3)
