"""ipoke_tpu — a TPU-native rebuild of the iPOKE two-stage stochastic video
synthesis framework (reference: CompVis/ipoke).

Design notes
------------
* Pure-functional JAX: every module is a pair of functions
  ``init(key, ...) -> params`` and ``apply(params, x, ...) -> out`` over
  explicit parameter pytrees.  No global state, no mutable modules.
* NHWC / NDHWC layouts throughout (TPU lane dimension = channels).
* Invertible blocks expose ``forward(params, x, h) -> (y, logdet)`` and
  ``inverse(params, y, h) -> x`` with exact analytic inverses.
* Sequential recurrences (ConvGRU time unroll, masked-conv-flow inverse)
  are ``lax.scan`` based; the hot inverse additionally has a fused Pallas
  kernel under :mod:`ipoke_tpu.ops.pallas`.
* Multi-device scaling goes through :mod:`ipoke_tpu.parallel`
  (jax.sharding.Mesh + NamedSharding), never through explicit NCCL-style
  communication.
"""

__version__ = "0.1.0"
