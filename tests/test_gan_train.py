"""First-stage GAN training-step tests (tiny sizes)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.models.discriminators import (
    PatchDiscSpec,
    TempDiscSpec,
    disc_loss,
    init_patch_disc,
    init_temp_disc,
    patch_disc_apply,
    temp_disc_apply,
)
from ipoke_tpu.models.first_stage import FirstStageSpec
from ipoke_tpu.train import first_stage as tfs

B, T, S = 2, 4, 64

FS_SPEC = FirstStageSpec(
    z_dim=16, spatial_size=S, max_frames=T,
    enc_channels=(16, 16, 16, 16), dec_channels=(16, 16, 16, 16),
    n_gru_layers=2, min_spatial_size=8, motion_bias=True, full_sequence=True,
)
DS_SPEC = PatchDiscSpec(n_layers=2, gp_weight=0.0)
DT_SPEC = TempDiscSpec(spatial_size=S, sequence_length=3, gp_weight=1.0)


def test_patch_disc_shapes():
    p = init_patch_disc(jax.random.PRNGKey(0), DS_SPEC)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, S, S, 3))
    pred, fmaps = patch_disc_apply(p, x, DS_SPEC)
    assert pred.shape[0] == 4 and pred.shape[-1] == 1
    assert len(fmaps) == 2


def test_temp_disc_shapes():
    p = init_temp_disc(jax.random.PRNGKey(0), DT_SPEC)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 3, S, S, 3))
    pred, fmaps = temp_disc_apply(p, x, DT_SPEC)
    assert pred.shape[0] == B
    assert len(fmaps) == 4


def test_hinge_loss_direction():
    good = jnp.full((4, 1), 2.0)
    bad = jnp.full((4, 1), -2.0)
    assert float(disc_loss(good, True)) < float(disc_loss(bad, True))
    assert float(disc_loss(bad, False)) < float(disc_loss(good, False))


def test_gan_train_step_runs_and_updates():
    state, opts = tfs.init_gan_state(jax.random.PRNGKey(0), FS_SPEC, DS_SPEC, DT_SPEC)
    step = jax.jit(tfs.make_gan_train_step(FS_SPEC, DS_SPEC, DT_SPEC, opts, n_spatial_examples=4))
    batch = {"images": 0.5 * jax.random.normal(jax.random.PRNGKey(1), (B, T, S, S, 3))}
    s1, m1 = step(state, batch, jax.random.PRNGKey(2))
    s2, m2 = step(s1, batch, jax.random.PRNGKey(3))
    for k in ("loss", "loss_d_dt", "loss_d_ds", "l_vgg", "l_rec", "l_kl", "loss_gp_dt"):
        assert np.isfinite(float(m2[k])), (k, m2[k])
    # all three param groups actually moved
    def moved(a, b):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        return any(
            not np.allclose(x, y)
            for x, y in zip(la, lb)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        )

    assert moved(state.gen_params, s2.gen_params)
    assert moved(state.ds_params, s2.ds_params)
    assert moved(state.dt_params, s2.dt_params)
    assert int(s2.step) == 2


@pytest.mark.skipif(os.environ.get("IPOKE_HEAVY") != "1",
                    reason="GSPMD partitioning of the grad-of-grad GAN step "
                           "compiles ~8-20 min on the 1-core host (set "
                           "IPOKE_HEAVY=1; passed 2026-08-18, 22 min loaded)")
def test_gan_train_step_dp_sharded_matches_single():
    """Stage-1's 3-optimizer grad-penalty step under data parallelism: batch
    sharded over the 8-device mesh (params replicated, XLA psums the grads)
    must match the unsharded step — the multi-chip path for first-stage
    training (the reference's PL DP, SURVEY §2.10)."""
    from ipoke_tpu.parallel import mesh as pmesh

    m = pmesh.make_mesh(n_data=8)
    state, opts = tfs.init_gan_state(jax.random.PRNGKey(0), FS_SPEC, DS_SPEC, DT_SPEC)
    batch = {"images": 0.5 * jax.random.normal(jax.random.PRNGKey(1), (8, T, S, S, 3))}
    rng = jax.random.PRNGKey(2)
    step = tfs.make_gan_train_step(FS_SPEC, DS_SPEC, DT_SPEC, opts, n_spatial_examples=4)

    s_base, m_base = jax.jit(step)(state, batch, rng)

    repl = pmesh.replicated(m)
    state_sh = jax.tree_util.tree_map(lambda _: repl, state)
    placed = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)
    sbatch = pmesh.shard_batch(m, batch)
    jitted = jax.jit(step, in_shardings=(state_sh, pmesh.batch_sharding(m), repl),
                     out_shardings=(state_sh, None))
    s_dp, m_dp = jitted(placed, sbatch, rng)

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_base["loss"]), rtol=1e-4)
    for name in ("gen_params", "ds_params", "dt_params"):
        for a, b in zip(jax.tree_util.tree_leaves(getattr(s_base, name)),
                        jax.tree_util.tree_leaves(getattr(s_dp, name))):
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           rtol=2e-3, atol=6e-4)


def test_gan_vgg_chunked_matches_plain_step():
    """vgg_chunks remat-scans the VGG19 perceptual loss over frame chunks —
    value and grads must be exact (mean of equal-size chunk means), so one
    step's updated params must match the unchunked step."""
    state, opts = tfs.init_gan_state(jax.random.PRNGKey(0), FS_SPEC, DS_SPEC, DT_SPEC)
    batch = {"images": 0.5 * jax.random.normal(jax.random.PRNGKey(1), (B, T, S, S, 3))}
    plain = jax.jit(tfs.make_gan_train_step(FS_SPEC, DS_SPEC, DT_SPEC, opts,
                                            n_spatial_examples=4))
    chunked = jax.jit(tfs.make_gan_train_step(FS_SPEC, DS_SPEC, DT_SPEC, opts,
                                              n_spatial_examples=4,
                                              vgg_chunks=3))  # B*(T-1)=6
    sp, mp = plain(state, batch, jax.random.PRNGKey(2))
    sc, mc = chunked(state, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(mc["l_vgg"]), float(mp["l_vgg"]), rtol=1e-5)
    np.testing.assert_allclose(float(mc["loss"]), float(mp["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(sp.gen_params),
                    jax.tree_util.tree_leaves(sc.gen_params)):
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
            # scan-order reassociation noise through Adam, as with remat
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=6e-4)


def test_gan_disc_bf16_step_runs_close():
    """disc_bf16 is an opt-in precision knob: the step must run, stay
    finite, and land near the f32 losses (loose tolerance — bf16 has ~3
    significant digits)."""
    state, opts = tfs.init_gan_state(jax.random.PRNGKey(0), FS_SPEC, DS_SPEC, DT_SPEC)
    batch = {"images": 0.5 * jax.random.normal(jax.random.PRNGKey(1), (B, T, S, S, 3))}
    f32 = jax.jit(tfs.make_gan_train_step(FS_SPEC, DS_SPEC, DT_SPEC, opts,
                                          n_spatial_examples=4))
    bf16 = jax.jit(tfs.make_gan_train_step(FS_SPEC, DS_SPEC, DT_SPEC, opts,
                                           n_spatial_examples=4, disc_bf16=True))
    _, mp = f32(state, batch, jax.random.PRNGKey(2))
    _, mb = bf16(state, batch, jax.random.PRNGKey(2))
    for k in ("loss", "loss_d_dt", "loss_d_ds"):
        assert np.isfinite(float(mb[k])), (k, mb[k])
        np.testing.assert_allclose(float(mb[k]), float(mp[k]), rtol=0.1, atol=0.05)


def test_gan_remat_matches_plain_step():
    """training.remat (jax.checkpoint around the generator forward) must be
    a pure memory/time trade: identical params after one step."""
    state, opts = tfs.init_gan_state(jax.random.PRNGKey(0), FS_SPEC, DS_SPEC, DT_SPEC)
    batch = {"images": 0.5 * jax.random.normal(jax.random.PRNGKey(1), (B, T, S, S, 3))}
    plain = jax.jit(tfs.make_gan_train_step(FS_SPEC, DS_SPEC, DT_SPEC, opts,
                                            n_spatial_examples=4))
    remat = jax.jit(tfs.make_gan_train_step(FS_SPEC, DS_SPEC, DT_SPEC, opts,
                                            n_spatial_examples=4, remat=True))
    sp, mp = plain(state, batch, jax.random.PRNGKey(2))
    sr, mr = remat(state, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(mp["loss"]), float(mr["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(sp.gen_params),
                    jax.tree_util.tree_leaves(sr.gen_params)):
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
            # recompute reassociation noise passes through Adam's
            # grad-normalization; observed max |delta| ~4e-4 on tiny grads
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=6e-4)
