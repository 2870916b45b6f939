"""Elementwise invertible transforms used inside coupling / masked-conv flows.

Parity notes (reference: models/modules/INN/macow_utils.py:9-208):
  * Affine: scale = 1 + alpha * tanh(0.5 * raw_logscale); exact inverse divides
    by (scale + 1e-12); logdet sums log(scale) over all non-batch dims.
  * Param tensors come channel-concatenated from the subnet (mu first), split
    on the channel (last) axis.
  * logdet is always computed/accumulated in float32 regardless of the compute
    dtype (bf16-safe).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _sum_flat(x):
    return jnp.sum(x.astype(jnp.float32).reshape(x.shape[0], -1), axis=1)


class Additive:
    n_params = 1

    @staticmethod
    def calc_params(raw, alpha=1.0):
        return (raw,)

    @staticmethod
    def fwd(z, params):
        (mu,) = params
        return z + mu, jnp.zeros((z.shape[0],), jnp.float32)

    @staticmethod
    def bwd(z, params):
        (mu,) = params
        return z - mu, jnp.zeros((z.shape[0],), jnp.float32)


class Affine:
    n_params = 2

    @staticmethod
    def calc_params(raw, alpha=1.0):
        mu, log_scale = jnp.split(raw, 2, axis=-1)
        scale = jnp.tanh(log_scale * 0.5) * alpha + 1.0
        return mu, scale

    @staticmethod
    def fwd(z, params):
        mu, scale = params
        out = scale * z + mu
        return out, _sum_flat(jnp.log(scale))

    @staticmethod
    def bwd(z, params):
        mu, scale = params
        out = (z - mu) / (scale + 1e-12)
        return out, -_sum_flat(jnp.log(scale))


class ReLUTransform:
    n_params = 2

    @staticmethod
    def calc_params(raw, alpha=1.0):
        mu, log_scale = jnp.split(raw, 2, axis=-1)
        return mu, jnp.tanh(log_scale)

    @staticmethod
    def fwd(z, params):
        mu, scale = params
        s = scale * (z > 0).astype(z.dtype) + 1.0
        return s * z + mu, _sum_flat(jnp.log(s))

    @staticmethod
    def bwd(z, params):
        mu, scale = params
        z = z - mu
        s = scale * (z > 0).astype(z.dtype) + 1.0
        return z / (s + 1e-12), -_sum_flat(jnp.log(s))


class SymmELU:
    """No analytic inverse in the reference either (iterative only); forward
    implemented for completeness."""

    n_params = 2

    @staticmethod
    def calc_params(raw, alpha=1.0):
        mu, log_scale = jnp.split(raw, 2, axis=-1)
        return mu, jnp.tanh(log_scale * 0.5)

    @staticmethod
    def fwd(z, params):
        mu, scale = params
        sgn = jnp.sign(z)
        tmp = jnp.exp(-jnp.abs(z))
        out = z - sgn * scale * (tmp - 1.0) + mu
        return out, _sum_flat(jnp.log(scale * tmp + 1.0))


class NLSQ:
    """Non-linear squared flow (unused by released configs; cubic-solve inverse).

    The reference solves the cubic in float64 (models/modules/INN/macow_utils.py);
    f64 is emulated and slow on TPU, so we instead polish the f32 closed-form
    root with a few Newton iterations on the forward map.  The forward is
    strictly monotone by construction (|c| is bounded via logA so the
    derivative stays positive), hence Newton from the trigonometric seed
    converges quadratically to f32 machine precision — the same accuracy the
    reference buys with f64, without leaving the TPU-native dtype.
    """

    n_params = 5
    logA = math.log(8 * math.sqrt(3) / 9 - 0.05)

    @staticmethod
    def calc_params(raw, alpha=1.0):
        a, logb, cprime, logd, g = jnp.split(raw, 5, axis=-1)
        logb = logb * 0.4
        cprime = cprime * 0.3
        logd = logd * 0.4
        c = jnp.exp(NLSQ.logA + logb - logd) * jnp.tanh(cprime)
        return a, jnp.exp(logb), c, jnp.exp(logd), g

    @staticmethod
    def fwd(z, params):
        a, b, c, d, g = params
        arg = d * z + g
        denom = arg * arg + 1.0
        cd = c / denom
        out = b * z + a + cd
        logdet = jnp.log(b - 2.0 * cd * d * arg / denom)
        return out, _sum_flat(logdet)

    @staticmethod
    def bwd(z, params):
        a, b, c, d, g = params
        aa = -b * d * d
        bb = (z - a) * d * d - 2.0 * b * d * g
        cc = (z - a) * 2.0 * d * g - b * (1.0 + g * g)
        dd = (z - a) * (1.0 + g * g) - c
        p = (3.0 * aa * cc - bb * bb) / (3.0 * aa * aa)
        q = (2.0 * bb**3 - 9.0 * aa * bb * cc + 27.0 * aa * aa * dd) / (27.0 * aa**3)
        absp = jnp.abs(p)
        t_neg = -2.0 * jnp.sign(q) * jnp.sqrt(absp / 3.0)
        i1 = -3.0 * jnp.abs(q) / (2.0 * p) * jnp.sqrt(3.0 / absp)
        i2 = jnp.arccosh(jnp.abs(i1 - 1.0) + 1.0) / 3.0
        t_neg = t_neg * jnp.cosh(i2)
        t_pos = -2.0 * jnp.sqrt(absp / 3.0)
        j1 = 3.0 * q / (2.0 * p) * jnp.sqrt(3.0 / absp)
        j2 = jnp.arcsinh(j1) / 3.0
        t_pos = t_pos * jnp.sinh(j2)
        t = jnp.where(p > 0, t_pos, t_neg)
        zz = t - bb / (3.0 * aa)
        # Degenerate cubics (p ~ 0) can seed NaN/inf; fall back to the linear
        # inverse there — Newton below recovers the exact root either way.
        zz = jnp.where(jnp.isfinite(zz), zz, (z - a) / b)
        # Newton polish on the (strictly monotone) forward map: the f32
        # closed-form root carries catastrophic cancellation; 3 quadratic
        # steps reach f32 machine precision (reference uses f64 instead).
        for _ in range(3):
            arg = d * zz + g
            denom = arg * arg + 1.0
            resid = b * zz + a + c / denom - z
            deriv = b - 2.0 * c * d * arg / (denom * denom)
            zz = zz - resid / deriv
        arg = d * zz + g
        denom = arg * arg + 1.0
        logdet = jnp.log(b - 2.0 * c * d * arg / (denom * denom))
        return zz, -_sum_flat(logdet)


TRANSFORMS = {
    "additive": Additive,
    "affine": Affine,
    "relu": ReLUTransform,
    "nlsq": NLSQ,
    "symm_elu": SymmELU,
}


def get_transform(name):
    return TRANSFORMS[name]
