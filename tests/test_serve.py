"""Serving batcher (serve/batcher.py): batch-composition invariance (a
request's video is identical alone vs padded into a shared batch), actual
batching under concurrency, padded-slot isolation, error delivery, and the
HTTP handler contract.  Beyond-reference subsystem."""
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.flows.macow import FlowSpec
from ipoke_tpu.models import second_stage
from ipoke_tpu.models.encoders import WrapperSpec
from ipoke_tpu.models.first_stage import FirstStageSpec
from ipoke_tpu.models.second_stage import SecondStageSpec
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
def batcher():
    spec = _spec()
    params = second_stage.init(jax.random.PRNGKey(0), spec)
    b = SampleBatcher(params, spec,
                      BatcherConfig(max_batch=4, max_delay_ms=60.0))
    yield b
    b.close()


def _req(i):
    k = jax.random.PRNGKey(100 + i)
    x0 = np.asarray(jax.random.normal(k, (S, S, 3)))
    poke = np.asarray(jax.random.normal(jax.random.fold_in(k, 1), (S, S, 2)))
    return x0, poke


def test_single_request_roundtrip(batcher):
    x0, poke = _req(0)
    vid = batcher.submit(x0, poke, seed=7, timeout=300)
    assert vid.shape == (T, S, S, 3)
    assert np.isfinite(vid).all()
    # first frame is the conditioning frame
    np.testing.assert_allclose(vid[0], x0, rtol=1e-5, atol=1e-5)


def test_batch_composition_invariance(batcher):
    """The same (x0, poke, seed) must produce the SAME video whether it ran
    alone or batched+padded with other requests."""
    solo = [batcher.submit(*_req(i), seed=i, timeout=300) for i in range(3)]

    reqs = [batcher.submit_async(*_req(i), seed=i) for i in range(3)]
    for r in reqs:
        assert r.event.wait(300)
        assert r.error is None
    for i, r in enumerate(reqs):
        np.testing.assert_allclose(solo[i], r.result, rtol=1e-5, atol=1e-5)


def test_batching_actually_happens(batcher):
    before = batcher.stats.batches
    reqs = [batcher.submit_async(*_req(10 + i), seed=i) for i in range(4)]
    for r in reqs:
        assert r.event.wait(300)
    made = batcher.stats.batches - before
    assert made < 4, f"4 concurrent requests ran as {made} batches (no batching)"
    assert any(b > 1 for b in batcher.stats.batch_hist)


def test_backlog_drains_into_batches():
    """Regression (found by the TPU load test): with max_delay_ms=0 a queue
    BACKLOG must still coalesce — the old policy compared the oldest
    request's wait against the window and dispatched batch=1 forever under
    sustained load."""
    spec = _spec()
    params = second_stage.init(jax.random.PRNGKey(0), spec)
    b = SampleBatcher(params, spec, BatcherConfig(max_batch=4, max_delay_ms=0.0))
    try:
        reqs = [b.submit_async(*_req(30 + i), seed=i) for i in range(12)]
        for r in reqs:
            assert r.event.wait(300)
            assert r.error is None
        assert max(b.stats.batch_hist) > 1, (
            f"12 backlogged requests never batched: {b.stats.batch_hist}"
        )
    finally:
        b.close()


def test_odd_count_pads_to_bucket(batcher):
    """3 requests pad to the 4-bucket; results still per-request correct
    (covered by invariance) and the histogram shows the padded bucket."""
    reqs = [batcher.submit_async(*_req(20 + i), seed=i) for i in range(3)]
    for r in reqs:
        assert r.event.wait(300)
        assert r.error is None
    assert max(batcher.stats.batch_hist) <= 4


def test_shape_validation(batcher):
    with pytest.raises(ValueError):
        batcher.submit_async(np.zeros((S, S, 2)), np.zeros((S, S, 2)))


def test_stats_snapshot(batcher):
    snap = batcher.stats.snapshot()
    assert snap["requests"] >= 1 and snap["batches"] >= 1
    assert snap["mean_batch_exec_ms"] > 0


def test_http_handler_contract(batcher):
    """Drive the HTTP handler through a real socket server."""
    from http.server import ThreadingHTTPServer

    from ipoke_tpu.serve.server import make_handler

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher))
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        import urllib.request

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["ok"] is True

        x0, poke = _req(30)
        body = json.dumps({"x0": x0.tolist(), "poke": poke.tolist(),
                           "seed": 3}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sample", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            vid = np.asarray(json.loads(r.read())["video"], np.float32)
        assert vid.shape == (T, S, S, 3)
        direct = batcher.submit(x0, poke, seed=3, timeout=300)
        np.testing.assert_allclose(direct, vid, rtol=1e-4, atol=1e-4)

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            assert json.loads(r.read())["requests"] >= 1

        # binary fast path: npz in -> npy out, identical to the JSON route
        import io as _io

        buf = _io.BytesIO()
        np.savez(buf, x0=x0, poke=poke, seed=3)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sample", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            vid_bin = np.load(_io.BytesIO(r.read()))
        np.testing.assert_allclose(vid_bin, direct, rtol=1e-4, atol=1e-4)
    finally:
        httpd.shutdown()


def test_wire_u8_matches_f32_quantized(batcher):
    """wire_u8 quantizes on device with exactly the writers' mapping: the
    u8 wire must equal the host-quantized f32 result, and dequantizing
    must land within one quantization step."""
    spec = batcher.spec
    b8 = SampleBatcher(batcher.params, spec,
                       BatcherConfig(max_batch=4, max_delay_ms=60.0,
                                     wire_u8=True))
    try:
        x0, poke = _req(3)
        v32 = batcher.submit(x0, poke, seed=11, timeout=300)
        vu8 = b8.submit(x0, poke, seed=11, timeout=300)
        assert vu8.dtype == np.uint8
        want = np.clip((np.asarray(v32) + 1.0) * 127.5, 0, 255).astype(np.uint8)
        # device vs host rounding may differ by 1 LSB at bin edges
        assert np.abs(vu8.astype(np.int16) - want.astype(np.int16)).max() <= 1
        deq = vu8.astype(np.float32) / 127.5 - 1.0
        assert np.abs(deq - np.clip(v32, -1, 1)).max() <= (1.0 / 127.5)
    finally:
        b8.close()
