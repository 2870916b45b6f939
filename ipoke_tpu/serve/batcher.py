"""Dynamic batcher: the core of the serving path.

Design, TPU-first:

* **Static shapes only.**  XLA compiles one executable per input shape, so
  arbitrary request-batch sizes would recompile constantly.  Requests are
  padded up to a fixed ladder of batch buckets (1, 2, 4, ... max_batch);
  each bucket compiles once (lazily) and is cached by jit.

* **Batch-composition invariance.**  Every per-example op in the model is
  batch-elementwise, and the batcher draws each request's Gaussian z from
  the request's own key (``second_stage.forward_sample(..., z=...)``), so a
  request's output is bit-identical whether it ran alone or padded into a
  shared batch — batching is invisible to clients, and the property is
  pinned by tests/test_serve.py.

* **Latency/throughput knob.**  The worker collects requests until either
  ``max_batch`` are waiting or the oldest has waited ``max_delay_ms`` —
  the standard server-batching trade (cf. high-throughput inference
  servers); with the sequential flow inverse being latency-bound,
  throughput scales near-linearly with batch (NOTES.md sweep), so filling
  batches is where the chip's money is.

* One worker thread owns the device: requests never contend for the TPU,
  and dispatch order is FIFO.
"""
from __future__ import annotations

import queue
import sys
import threading
import time
from dataclasses import dataclass, field, replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.flows import transformer
from ipoke_tpu.models import second_stage


@dataclass
class BatcherConfig:
    max_batch: int = 8
    max_delay_ms: float = 30.0
    length: Optional[int] = None    # frames to unroll (None: spec max - 1)
    # wire_u8: quantize videos to uint8 pixels ON DEVICE ([-1,1] -> 0..255,
    # exactly the mp4/eval writers' quantization).  Quarters the
    # device->host transfer and removes the per-request host quantize —
    # both real costs on a 1-core serving host (measured: batch exec
    # 1.2 s -> see NOTES).  Live-model path only (an AOT artifact's
    # StableHLO has its output dtype baked in).
    wire_u8: bool = False


@dataclass
class Stats:
    requests: int = 0
    batches: int = 0
    batch_hist: dict = field(default_factory=dict)
    total_wait_s: float = 0.0
    total_exec_s: float = 0.0

    def snapshot(self):
        return {
            "requests": self.requests,
            "batches": self.batches,
            "batch_size_histogram": dict(self.batch_hist),
            "mean_wait_ms": (1000 * self.total_wait_s / self.requests
                             if self.requests else 0.0),
            "mean_batch_exec_ms": (1000 * self.total_exec_s / self.batches
                                   if self.batches else 0.0),
        }


class _Request:
    __slots__ = ("x0", "poke", "seed", "t_enqueue", "event", "result", "error")

    def __init__(self, x0, poke, seed):
        self.x0 = x0
        self.poke = poke
        self.seed = seed
        self.t_enqueue = time.monotonic()
        self.event = threading.Event()
        self.result = None
        self.error = None


class SampleBatcher:
    """Batches (x0, poke, seed) requests through one jitted sample fn.

    ``submit`` is thread-safe and blocks until the request's video is ready;
    use ``submit_async`` to get a handle instead.
    """

    def __init__(self, params, spec, cfg: BatcherConfig = BatcherConfig(),
                 *, _artifact=None):
        # Pin the param tree to the device ONCE.  Checkpoint- and
        # artifact-loaded params arrive as host numpy arrays, and both jit
        # and deserialized-export calls re-transfer numpy arguments on EVERY
        # call — measured 404 ms/batch-16 exec for the 154 MB student
        # artifact, dominated by the re-upload, vs a ~25 ms compute step.
        # Upload via an identity jit, not jax.device_put: on the remote-TPU
        # axon platform device_put of a many-leaf tree issues per-leaf
        # transfers that can stall for minutes, while jit argument transfer
        # batches the whole tree (measured <0.4 s for the same 473 leaves).
        self.params = jax.jit(lambda p: p)(params)
        self.spec = spec
        self.cfg = cfg
        self.stats = Stats()
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        if _artifact is not None:
            art_wire = _artifact.manifest.get("wire", "f32")
            if cfg.wire_u8 and art_wire != "u8":
                raise ValueError(
                    "wire_u8 needs an artifact exported with --wire-u8 (its "
                    "StableHLO output dtype is baked in at export time) or "
                    "the live-model path")
            # AOT backend (serve/artifact.py): run the deserialized StableHLO
            # modules; only the artifact's exported buckets exist.
            self._buckets = [b for b in _artifact.buckets if b <= cfg.max_batch]
            if not self._buckets:
                raise ValueError(
                    f"no artifact bucket <= max_batch={cfg.max_batch} "
                    f"(exported: {_artifact.buckets})"
                )
            if cfg.max_batch > self._buckets[-1]:
                # _collect must never gather more requests than the largest
                # runnable bucket: the pad loop would IndexError and fail the
                # whole batch under load.
                self.cfg = cfg = replace(cfg, max_batch=self._buckets[-1])
            if cfg.length is not None and cfg.length != _artifact.length:
                raise ValueError(
                    f"length={cfg.length} requested but the artifact was "
                    f"exported with length={_artifact.length} baked into its "
                    f"StableHLO; re-export with --length to change it"
                )
            self._length = _artifact.length
            self._x0_shape = _artifact.x0_shape
            self._poke_shape = _artifact.poke_shape
            self._z_shape = _artifact.z_shape
            self._jit_run = _artifact.run
        else:
            self._buckets = self._bucket_ladder(cfg.max_batch)
            self._length = cfg.length or (spec.first_stage.max_frames - 1)
            s = spec.first_stage.spatial_size
            self._x0_shape = (s, s, 3)
            self._poke_shape = (s, s, 2)
            self._z_shape = tuple(transformer.reverse_input_shape(
                spec.flow, 1, spec.latent_size, spec.flow_in_channels
            )[1:])

            # one jitted fn; bucket size is a traced SHAPE, so jit's cache
            # gives one executable per bucket
            def _run(params, x0, poke, z):
                batch = {"images": x0[:, None], "poke": poke}
                v = second_stage.forward_sample(
                    params, spec, batch, None, length=self._length,
                    add_first_frame=True, z=z,
                )[0]
                if cfg.wire_u8:
                    v = jnp.clip((v + 1.0) * 127.5, 0.0, 255.0).astype(jnp.uint8)
                return v

            self._jit_run = jax.jit(_run)
        # one on-device draw for the whole batch: the per-seed loop this
        # replaces issued a tiny TPU dispatch + host fetch PER REQUEST inside
        # the exec window (~35 ms tunnel round trip each on the remote
        # platform) — it dominated batch exec under load.  vmap over threefry
        # is bitwise-identical to the per-seed draws.
        self._jit_draw_z = jax.jit(
            lambda seeds: jax.vmap(
                lambda s: jax.random.normal(jax.random.PRNGKey(s), self._z_shape)
            )(seeds))
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    @classmethod
    def from_artifact(cls, artifact, cfg: BatcherConfig = None):
        """Batcher over a pre-exported AOT artifact (LoadedSampler) — the
        serving fleet path: no model code traced, params come from the
        artifact."""
        cfg = cfg or BatcherConfig(max_batch=max(artifact.buckets))
        return cls(artifact.params, None, cfg, _artifact=artifact)

    # -- public API --------------------------------------------------------

    def submit(self, x0, poke, seed: int = 0, timeout: Optional[float] = None):
        req = self.submit_async(x0, poke, seed)
        if not req.event.wait(timeout):
            raise TimeoutError("sample request timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def submit_async(self, x0, poke, seed: int = 0) -> _Request:
        x0 = np.asarray(x0, np.float32)
        poke = np.asarray(poke, np.float32)
        if x0.shape != self._x0_shape or poke.shape != self._poke_shape:
            raise ValueError(
                f"expected x0 {self._x0_shape} / poke {self._poke_shape}, "
                f"got {x0.shape} / {poke.shape}"
            )
        # seeds live in a 32-bit space: mask EXPLICITLY at the boundary so an
        # int64 client seed maps to a documented draw instead of silently
        # wrapping through a numpy cast (ADVICE r4); the batched vmap draw
        # stays bitwise-identical to per-seed PRNGKey(seed & 0xFFFFFFFF)
        req = _Request(x0, poke, int(seed) & 0xFFFFFFFF)
        self._q.put(req)
        return req

    def warmup(self, buckets=None):
        """Compile the given buckets (default: all) before serving traffic.

        Forces each bucket by fetching the result to the host: on the remote
        "axon" platform ``block_until_ready`` returns before the computation
        finishes (NOTES.md round-2 correction), so a block-based warmup only
        *dispatched* the compiles and the first real batch per bucket still
        paid the ~20 s remote compile (measured: SLOW batch n=4 exec=21.3s
        behind a "warmed" server)."""
        for b in buckets or self._buckets:
            zero = np.zeros((b,) + self._x0_shape, np.float32)
            zerop = np.zeros((b,) + self._poke_shape, np.float32)
            z = self._draw_z(list(range(b)))
            np.asarray(self._jit_run(self.params, zero, zerop, z))

    def close(self):
        self._stop.set()
        self._worker.join(timeout=10)

    # -- internals ---------------------------------------------------------

    @staticmethod
    def _bucket_ladder(max_batch):
        b, ladder = 1, []
        while b < max_batch:
            ladder.append(b)
            b *= 2
        ladder.append(max_batch)
        return ladder

    def _bucket_for(self, n):
        for b in self._buckets:
            if n <= b:
                return b
        return self._buckets[-1]

    def _draw_z(self, seeds):
        return self._jit_draw_z(jnp.asarray(seeds, jnp.uint32))

    def _collect(self):
        """Block for the first request, drain the backlog, then fill until
        max_batch or the oldest request has waited max_delay_ms.

        Draining the backlog BEFORE consulting the delay window matters:
        under sustained load the oldest request has usually already
        outwaited max_delay in the queue, and a pure waiting policy then
        dispatches batch=1 forever — the server degrades to its slowest
        configuration exactly when batching matters most (found by the TPU
        load test: 96 queued requests -> 88 batches of 1)."""
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        reqs = [first]
        while len(reqs) < self.cfg.max_batch:
            try:
                reqs.append(self._q.get_nowait())
            except queue.Empty:
                break
        deadline = first.t_enqueue + self.cfg.max_delay_ms / 1000.0
        while len(reqs) < self.cfg.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                reqs.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return reqs

    def _loop(self):
        while not self._stop.is_set():
            reqs = self._collect()
            if not reqs:
                continue
            n = len(reqs)
            b = self._bucket_for(n)
            x0 = np.zeros((b,) + self._x0_shape, np.float32)
            poke = np.zeros((b,) + self._poke_shape, np.float32)
            for i, r in enumerate(reqs):
                x0[i] = r.x0
                poke[i] = r.poke
            t0 = time.monotonic()
            try:
                # padded slots reuse request 0's z seed; their outputs are
                # discarded below
                z = self._draw_z([r.seed for r in reqs] + [reqs[0].seed] * (b - n))
                vids = self._jit_run(self.params, x0, poke, z)
                vids = np.asarray(vids)  # forces completion (host transfer)
                for i, r in enumerate(reqs):
                    r.result = vids[i]
            except Exception as e:  # deliver, don't kill the worker
                for r in reqs:
                    r.error = e
            t1 = time.monotonic()
            if t1 - t0 > 5.0:
                # surface pathological batches (remote-compile stalls, tunnel
                # hiccups) — exec should be sub-second once warmed
                print(f"serve batcher: SLOW batch n={n} bucket={b} "
                      f"exec={t1 - t0:.1f}s", file=sys.stderr, flush=True)
            self.stats.requests += n
            self.stats.batches += 1
            self.stats.batch_hist[b] = self.stats.batch_hist.get(b, 0) + 1
            self.stats.total_exec_s += t1 - t0
            self.stats.total_wait_s += sum(t0 - r.t_enqueue for r in reqs)
            for r in reqs:
                r.event.set()
