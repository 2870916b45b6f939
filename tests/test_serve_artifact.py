"""AOT serving artifacts (serve/artifact.py): export -> load round trip runs
the EXACT live sampling graph from serialized StableHLO with no model code,
and the batcher serves from a loaded artifact.  Beyond-reference subsystem
(the reference has no deployment story)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipoke_tpu.flows.macow import FlowSpec
from ipoke_tpu.models import second_stage
from ipoke_tpu.models.encoders import WrapperSpec
from ipoke_tpu.models.first_stage import FirstStageSpec
from ipoke_tpu.models.second_stage import SecondStageSpec
from ipoke_tpu.serve.artifact import export_sampler, load_artifact, z_shape_of
from ipoke_tpu.serve.batcher import BatcherConfig, SampleBatcher

S, T = 64, 4


def _spec():
    fs = FirstStageSpec(
        z_dim=16, spatial_size=S, max_frames=T,
        enc_channels=(16, 16, 16, 16), dec_channels=(16, 16, 16, 16),
        n_gru_layers=2, min_spatial_size=8, motion_bias=True,
        full_sequence=True,
    )
    poke = WrapperSpec(nf_in=2, nf_max=16, spatial_size=S, min_spatial_size=8,
                       deterministic=True)
    cond = WrapperSpec(nf_in=3, nf_max=16, spatial_size=S, min_spatial_size=8,
                       deterministic=False)
    flow = FlowSpec(num_steps=(1, 1), in_channels=16, hidden_channels=32,
                    h_channels=32, factor=16)
    return SecondStageSpec(flow=flow, first_stage=fs, poke_embedder=poke,
                           conditioner=cond)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    spec = _spec()
    params = second_stage.init(jax.random.PRNGKey(0), spec)
    out = tmp_path_factory.mktemp("art")
    export_sampler(params, spec, out, buckets=(1, 2))
    return load_artifact(out), params, spec


def test_manifest_and_files(artifact):
    art, _, spec = artifact
    assert art.buckets == [1, 2]
    assert art.length == T - 1
    assert art.x0_shape == (S, S, 3)
    assert art.poke_shape == (S, S, 2)
    assert art.z_shape == z_shape_of(spec)


def test_artifact_matches_live_model(artifact):
    """The deserialized StableHLO computes bit-identically to the live
    traced model (same platform, same params, same z)."""
    art, params, spec = artifact
    k = jax.random.PRNGKey(3)
    x0 = jax.random.normal(k, (2, S, S, 3))
    poke = jax.random.normal(jax.random.fold_in(k, 1), (2, S, S, 2))
    z = jax.random.normal(jax.random.fold_in(k, 2), (2,) + art.z_shape)

    got = np.asarray(art.run(art.params, x0, poke, z))

    batch = {"images": x0[:, None], "poke": poke}
    want = np.asarray(second_stage.forward_sample(
        params, spec, batch, None, length=T - 1, add_first_frame=True, z=z
    )[0])
    assert got.shape == want.shape == (2, T, S, S, 3)
    # two independent compiles of the same StableHLO may fuse differently ->
    # small float drift, not a semantic difference
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)


def test_sample_convenience_and_bad_bucket(artifact):
    art, _, _ = artifact
    vid = art.sample(np.zeros((S, S, 3), np.float32),
                     np.zeros((S, S, 2), np.float32), seed=5)
    assert vid.shape == (T, S, S, 3) and np.isfinite(vid).all()
    with pytest.raises(ValueError, match="bucket"):
        art.run(art.params,
                jnp.zeros((3, S, S, 3)), jnp.zeros((3, S, S, 2)),
                jnp.zeros((3,) + art.z_shape))


def test_batcher_clamps_max_batch_to_largest_bucket(artifact):
    """max_batch beyond the largest exported bucket is clamped — otherwise
    _collect could gather more requests than the pad buffer holds and fail
    the whole batch under concurrent load (ADVICE r3)."""
    art, _, _ = artifact
    b = SampleBatcher.from_artifact(art, BatcherConfig(max_batch=8))
    try:
        assert b.cfg.max_batch == 2  # largest exported bucket
        # three concurrent requests must all succeed (2 buckets of <=2)
        x0 = np.zeros((S, S, 3), np.float32)
        poke = np.zeros((S, S, 2), np.float32)
        reqs = [b.submit_async(x0, poke, seed=i) for i in range(3)]
        for r in reqs:
            assert r.event.wait(900)
            assert r.error is None and r.result.shape == (T, S, S, 3)
    finally:
        b.close()


def test_batcher_rejects_mismatched_length(artifact):
    """cfg.length cannot override the unroll length baked into the exported
    StableHLO — silently ignoring it would return the wrong video length."""
    art, _, _ = artifact
    with pytest.raises(ValueError, match="exported with length"):
        SampleBatcher.from_artifact(art, BatcherConfig(max_batch=2,
                                                       length=T + 3))


def test_student_artifact_matches_live_student(artifact, tmp_path):
    """The exported DIRECT-student artifact (VERDICT r4 next-step 4) runs the
    exact live student sampling graph from serialized StableHLO — the
    artifact==live equality test extended to the student path."""
    from ipoke_tpu.train import distill

    _, params, spec = artifact
    ds = distill.DirectStudentSpec(hidden=32, depth=2)
    sparams = distill.init_direct(jax.random.PRNGKey(7), spec, ds)
    out = tmp_path / "student_art"
    export_sampler(params, spec, out, buckets=(2,), student=(sparams, ds))
    art = load_artifact(out)
    assert art.manifest["sampler"] == "direct_student"
    # the flow tree is pruned from student artifacts: the student replaces
    # the flow reverse, so shipping ~4.2 GB of flagship flow params would be
    # pure dead weight (artifact size, load time, serving HBM)
    assert "flow" not in art.params["base"]
    assert {"first_stage", "poke_embedder", "conditioner"} <= set(
        art.params["base"])

    k = jax.random.PRNGKey(13)
    x0 = jax.random.normal(k, (2, S, S, 3))
    poke = jax.random.normal(jax.random.fold_in(k, 1), (2, S, S, 2))
    z = jax.random.normal(jax.random.fold_in(k, 2), (2,) + art.z_shape)
    got = np.asarray(art.run(art.params, x0, poke, z))

    batch = {"images": x0[:, None], "poke": poke}
    want = np.asarray(distill.forward_sample_student(
        params, sparams, ds, spec, batch, None, length=T - 1,
        add_first_frame=True, z=z)[0])
    assert got.shape == want.shape == (2, T, S, S, 3)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)

    # and the batcher serves it (bucket padding + composition invariance)
    b = SampleBatcher.from_artifact(art, BatcherConfig(max_batch=2))
    try:
        vid = b.submit(np.asarray(x0[0]), np.asarray(poke[0]), seed=3,
                       timeout=900)
        assert vid.shape == (T, S, S, 3) and np.isfinite(vid).all()
    finally:
        b.close()


def test_u8_wire_artifact(artifact, tmp_path):
    """An artifact exported with wire_u8 bakes the [-1,1]->uint8 pixel
    quantization into the StableHLO: uint8 outputs equal to quantizing the
    float artifact's output on the host."""
    art_f32, params, spec = artifact
    out = tmp_path / "u8_art"
    export_sampler(params, spec, out, buckets=(1,), wire_u8=True)
    art = load_artifact(out)
    assert art.manifest["wire"] == "u8"

    k = jax.random.PRNGKey(21)
    x0 = jax.random.normal(k, (1, S, S, 3))
    poke = jax.random.normal(jax.random.fold_in(k, 1), (1, S, S, 2))
    z = jax.random.normal(jax.random.fold_in(k, 2), (1,) + art.z_shape)
    got = np.asarray(art.run(art.params, x0, poke, z))
    assert got.dtype == np.uint8
    ref = np.asarray(art_f32.run(art_f32.params, x0, poke, z))
    want = np.clip((ref + 1.0) * 127.5, 0, 255)
    # float drift across independent compiles can flip values sitting exactly
    # on a quantization boundary by 1 LSB
    assert np.abs(got.astype(np.float32) - want).max() <= 1.0

    # batcher accepts the u8 artifact with cfg.wire_u8 set, rejects it on f32
    b = SampleBatcher.from_artifact(art, BatcherConfig(max_batch=1,
                                                       wire_u8=True))
    b.close()
    with pytest.raises(ValueError, match="wire-u8"):
        SampleBatcher.from_artifact(art_f32, BatcherConfig(max_batch=1,
                                                           wire_u8=True))


def test_batcher_from_artifact(artifact):
    art, params, spec = artifact
    b = SampleBatcher.from_artifact(art, BatcherConfig(max_batch=2,
                                                       max_delay_ms=30.0))
    try:
        b.warmup(buckets=[1])
        x0 = np.asarray(jax.random.normal(jax.random.PRNGKey(9), (S, S, 3)))
        poke = np.asarray(jax.random.normal(jax.random.PRNGKey(10), (S, S, 2)))
        vid = b.submit(x0, poke, seed=11, timeout=900)
        assert vid.shape == (T, S, S, 3)

        # batch-composition invariance holds through the AOT path too: the
        # same request served by the LIVE batcher gives the same video
        live = SampleBatcher(params, spec, BatcherConfig(max_batch=2))
        try:
            ref = live.submit(x0, poke, seed=11, timeout=900)
        finally:
            live.close()
        np.testing.assert_allclose(np.asarray(vid), np.asarray(ref),
                                   rtol=0, atol=5e-5)
    finally:
        b.close()
