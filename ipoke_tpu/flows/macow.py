"""MaCow flow composition: MaCowUnit / MaCowStep / MultiScalePrior /
MultiScaleInternal / MultiscaleStack (reference: macow2.py:543-1117, 652-729).

All composites are (init, forward, inverse) triples over explicit param
pytrees, driven by a static :class:`FlowSpec`.  ``forward`` returns
``(y, logdet[B])`` with logdet accumulated in f32; ``inverse`` is exact.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ipoke_tpu.flows import actnorm, mcf, nice, permute
from ipoke_tpu.flows.nice import nice_channels


@dataclass(frozen=True)
class FlowSpec:
    num_steps: Tuple[int, ...]
    in_channels: int
    hidden_channels: int
    h_channels: int
    factor: int = 16
    transform: str = "affine"
    prior_transform: str = "affine"
    alpha: float = 1.0
    kernel_size: Tuple[int, int] = (2, 3)
    activation: str = "elu"
    use_1x1: bool = False
    condition_nice: bool = False
    attention: bool = False      # attention NICE subnets (reference 'attention')
    heads: int = 4
    spatial_size: int = 8
    cond_conv: bool = False      # GatedConv2d preprocessing of h in MaCow units
    remat: bool = False          # jax.checkpoint each scanned MaCow step body
                                 # (recompute in backward; needed to train the
                                 # full-depth flow in 16GB HBM)
    mcf_backend: str = "scan"  # 'scan' | 'pallas' for the sequential inverse
    mcf_unroll: int = 1          # lax.scan unroll of the 8-row inverse scan
                                 # (the inverse is per-step-overhead-bound;
                                 # unroll removes loop bookkeeping per row)

    def level_channels(self) -> List[int]:
        """Per-level in_channels (reference: macow2.py:841-868)."""
        cs = self.in_channels // self.factor
        chans = []
        c = self.in_channels
        for _ in self.num_steps:
            chans.append(c)
            c -= cs
        return chans

    def level_factors(self) -> List[int]:
        return [self.factor - i for i in range(len(self.num_steps))]


# ---------------------------------------------------------------------------
# MaCowUnit: MCF(A) -> MCF(B) -> ActNorm -> MCF(C) -> MCF(D) -> ActNorm
# ---------------------------------------------------------------------------

def init_macow_unit(key, c, spec: FlowSpec):
    ks = jax.random.split(key, 7)
    kh, kw = spec.kernel_size
    hc = spec.h_channels if spec.h_channels > 0 else None
    if spec.cond_conv and hc:
        from ipoke_tpu.flows import attention as _attn

        return {
            "cond_conv_block": _attn.init_gated_conv(ks[6], hc),
            **_plain_unit(ks, c, hc, spec),
        }
    return {
        "conv1": mcf.init_mcf(ks[0], c, (kh, kw), h_channels=hc, transform=spec.transform),
        "conv2": mcf.init_mcf(ks[1], c, (kh, kw), h_channels=hc, transform=spec.transform),
        "actnorm1": actnorm.init_actnorm(ks[2], c),
        "conv3": mcf.init_mcf(ks[3], c, (kw, kh), h_channels=hc, transform=spec.transform),
        "conv4": mcf.init_mcf(ks[4], c, (kw, kh), h_channels=hc, transform=spec.transform),
        "actnorm2": actnorm.init_actnorm(ks[5], c),
    }


def _plain_unit(ks, c, hc, spec):
    kh, kw = spec.kernel_size
    return {
        "conv1": mcf.init_mcf(ks[0], c, (kh, kw), h_channels=hc, transform=spec.transform),
        "conv2": mcf.init_mcf(ks[1], c, (kh, kw), h_channels=hc, transform=spec.transform),
        "actnorm1": actnorm.init_actnorm(ks[2], c),
        "conv3": mcf.init_mcf(ks[3], c, (kw, kh), h_channels=hc, transform=spec.transform),
        "conv4": mcf.init_mcf(ks[4], c, (kw, kh), h_channels=hc, transform=spec.transform),
        "actnorm2": actnorm.init_actnorm(ks[5], c),
    }


def _unit_h(p, h):
    """Optional GatedConv2d conditioning preprocess (macow2.py:957-960)."""
    if "cond_conv_block" in p and h is not None:
        from ipoke_tpu.flows import attention as _attn

        return _attn.gated_conv_apply(p["cond_conv_block"], h)
    return h


def macow_unit_forward(p, x, h, spec: FlowSpec):
    kw = dict(transform=spec.transform, alpha=spec.alpha, act=spec.activation)
    h = _unit_h(p, h)
    out, ld = mcf.forward(p["conv1"], x, h=h, order="A", **kw)
    out, l2 = mcf.forward(p["conv2"], out, h=h, order="B", **kw)
    out, l3 = actnorm.forward(p["actnorm1"], out)
    out, l4 = mcf.forward(p["conv3"], out, h=h, order="C", **kw)
    out, l5 = mcf.forward(p["conv4"], out, h=h, order="D", **kw)
    out, l6 = actnorm.forward(p["actnorm2"], out)
    return out, ld + l2 + l3 + l4 + l5 + l6


def macow_unit_inverse(p, y, h, spec: FlowSpec):
    if spec.mcf_backend == "pallas_unit":
        from ipoke_tpu.ops.pallas.mcf_unit_inverse import macow_unit_inverse_pallas

        return macow_unit_inverse_pallas(p, y, _unit_h(p, h), spec)
    kw = dict(
        transform=spec.transform, alpha=spec.alpha, act=spec.activation,
        backend=spec.mcf_backend, unroll=spec.mcf_unroll,
    )
    h = _unit_h(p, h)
    out = actnorm.inverse(p["actnorm2"], y)
    out = mcf.inverse(p["conv4"], out, h=h, order="D", **kw)
    out = mcf.inverse(p["conv3"], out, h=h, order="C", **kw)
    out = actnorm.inverse(p["actnorm1"], out)
    out = mcf.inverse(p["conv2"], out, h=h, order="B", **kw)
    out = mcf.inverse(p["conv1"], out, h=h, order="A", **kw)
    return out


# ---------------------------------------------------------------------------
# MaCowStep
# ---------------------------------------------------------------------------

def init_macow_step(key, c, spec: FlowSpec):
    ks = jax.random.split(key, 10)
    hc_nice = spec.h_channels if spec.condition_nice else 0
    nice_kw = dict(hidden=spec.hidden_channels, h_channels=hc_nice, transform=spec.transform,
                   attention=spec.attention, heads=spec.heads, spatial_size=spec.spatial_size)
    return {
        "actnorm1": actnorm.init_actnorm(ks[0], c),
        "conv1x1": permute.init_shuffle(ks[1], c),
        "units1": [init_macow_unit(ks[2], c, spec), init_macow_unit(ks[3], c, spec)],
        "coupling1_up": nice.init_nice(ks[4], c, split_type="continuous", order="up", **nice_kw),
        "coupling1_dn": nice.init_nice(ks[5], c, split_type="continuous", order="down", **nice_kw),
        "actnorm2": actnorm.init_actnorm(ks[6], c),
        "units2": [init_macow_unit(ks[7], c, spec), init_macow_unit(ks[8], c, spec)],
        "coupling2_up": nice.init_nice(ks[9], c, split_type="skip", order="up", **nice_kw),
        "coupling2_dn": nice.init_nice(
            jax.random.fold_in(key, 11), c, split_type="skip", order="down", **nice_kw
        ),
    }


def _nice_kw(spec: FlowSpec, split_type, order):
    return dict(
        h=None,
        factor=2,
        split_type=split_type,
        order=order,
        transform=spec.transform,
        alpha=spec.alpha,
        act=spec.activation,
        heads=spec.heads,
    )


def macow_step_forward(p, x, h, spec: FlowSpec):
    c = x.shape[-1]
    h_nice = h if spec.condition_nice else None
    out, ld = actnorm.forward(p["actnorm1"], x)
    out, l2 = permute.shuffle_forward(p["conv1x1"], out)
    ld = ld + l2
    for unit in p["units1"]:
        out, l = macow_unit_forward(unit, out, h, spec)
        ld = ld + l
    kw = _nice_kw(spec, "continuous", "up")
    kw["h"] = h_nice
    out, l = nice.forward(p["coupling1_up"], out, in_channels=c, **kw)
    ld = ld + l
    kw = _nice_kw(spec, "continuous", "down")
    kw["h"] = h_nice
    out, l = nice.forward(p["coupling1_dn"], out, in_channels=c, **kw)
    ld = ld + l
    out, l = actnorm.forward(p["actnorm2"], out)
    ld = ld + l
    for unit in p["units2"]:
        out, l = macow_unit_forward(unit, out, h, spec)
        ld = ld + l
    kw = _nice_kw(spec, "skip", "up")
    kw["h"] = h_nice
    out, l = nice.forward(p["coupling2_up"], out, in_channels=c, **kw)
    ld = ld + l
    kw = _nice_kw(spec, "skip", "down")
    kw["h"] = h_nice
    out, l = nice.forward(p["coupling2_dn"], out, in_channels=c, **kw)
    ld = ld + l
    return out, ld


def macow_step_inverse(p, y, h, spec: FlowSpec):
    c = y.shape[-1]
    h_nice = h if spec.condition_nice else None
    kw = _nice_kw(spec, "skip", "down")
    kw["h"] = h_nice
    out = nice.inverse(p["coupling2_dn"], y, in_channels=c, **kw)
    kw = _nice_kw(spec, "skip", "up")
    kw["h"] = h_nice
    out = nice.inverse(p["coupling2_up"], out, in_channels=c, **kw)
    for unit in reversed(p["units2"]):
        out = macow_unit_inverse(unit, out, h, spec)
    out = actnorm.inverse(p["actnorm2"], out)
    kw = _nice_kw(spec, "continuous", "down")
    kw["h"] = h_nice
    out = nice.inverse(p["coupling1_dn"], out, in_channels=c, **kw)
    kw = _nice_kw(spec, "continuous", "up")
    kw["h"] = h_nice
    out = nice.inverse(p["coupling1_up"], out, in_channels=c, **kw)
    for unit in reversed(p["units1"]):
        out = macow_unit_inverse(unit, out, h, spec)
    out = permute.shuffle_inverse(p["conv1x1"], out)
    out = actnorm.inverse(p["actnorm1"], out)
    return out


# ---------------------------------------------------------------------------
# MultiScalePrior: permutation -> NICE(cont, up, factor=level factor) -> ActNorm(z2)
# ---------------------------------------------------------------------------

def init_prior(key, c, level_factor, spec: FlowSpec):
    k1, k2, k3 = jax.random.split(key, 3)
    hc_nice = spec.h_channels if spec.condition_nice else 0
    _, z1c, _, _ = nice_channels(c, level_factor, "continuous", "up")
    perm = permute.init_conv_lu(k1, c) if spec.use_1x1 else permute.init_shuffle(k1, c)
    return {
        "conv1x1": perm,
        "coupling": nice.init_nice(
            k2,
            c,
            hidden=spec.hidden_channels,
            h_channels=hc_nice,
            split_type="continuous",
            order="up",
            factor=level_factor,
            transform=spec.prior_transform,
            attention=spec.attention,
            heads=spec.heads,
            spatial_size=spec.spatial_size,
        ),
        "actnorm": actnorm.init_actnorm(k3, c - z1c),
    }


def _perm_fwd(p, x, spec):
    if spec.use_1x1:
        return permute.conv_lu_forward(p, x)
    return permute.shuffle_forward(p, x)


def _perm_inv(p, y, spec):
    if spec.use_1x1:
        return permute.conv_lu_inverse(p, y)
    return permute.shuffle_inverse(p, y)


def prior_forward(p, x, h, level_factor, spec: FlowSpec):
    c = x.shape[-1]
    h_nice = h if spec.condition_nice else None
    _, z1c, _, _ = nice_channels(c, level_factor, "continuous", "up")
    out, ld = _perm_fwd(p["conv1x1"], x, spec)
    out, l = nice.forward(
        p["coupling"],
        out,
        h=h_nice,
        in_channels=c,
        factor=level_factor,
        split_type="continuous",
        order="up",
        transform=spec.prior_transform,
        alpha=spec.alpha,
        act=spec.activation,
    )
    ld = ld + l
    out1, out2 = out[..., :z1c], out[..., z1c:]
    out2, l = actnorm.forward(p["actnorm"], out2)
    ld = ld + l
    return jnp.concatenate([out1, out2], axis=-1), ld


def prior_inverse(p, y, h, level_factor, spec: FlowSpec):
    c = y.shape[-1]
    h_nice = h if spec.condition_nice else None
    _, z1c, _, _ = nice_channels(c, level_factor, "continuous", "up")
    out1, out2 = y[..., :z1c], y[..., z1c:]
    out2 = actnorm.inverse(p["actnorm"], out2)
    out = jnp.concatenate([out1, out2], axis=-1)
    out = nice.inverse(
        p["coupling"],
        out,
        h=h_nice,
        in_channels=c,
        factor=level_factor,
        split_type="continuous",
        order="up",
        transform=spec.prior_transform,
        alpha=spec.alpha,
        act=spec.activation,
    )
    return _perm_inv(p["conv1x1"], out, spec)


# ---------------------------------------------------------------------------
# MultiScaleInternal
# ---------------------------------------------------------------------------

def init_level(key, i, c, f, n_steps, spec: FlowSpec):
    """One level of init_multiscale.  The fold_in schedule is per-level, so
    jitting levels in SEPARATE jits (init_multiscale_chunked) produces the
    bitwise-identical tree to the JITTED monolithic init (the eager form
    differs by ~1 ulp in XLA-compiled RNG math) — the chunked form exists
    because the full-flow init graph at flagship width (hidden 2048, 56
    steps) OOM-kills the remote compile service (NOTES.md round-3)."""
    kk = jax.random.fold_in(key, i)
    steps = [init_macow_step(jax.random.fold_in(kk, 100 + s), c, spec) for s in range(n_steps)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *steps)
    return {
        "steps": stacked,
        "prior": init_prior(jax.random.fold_in(kk, 1), c, f, spec),
        "shuffle": (
            permute.init_conv_lu(jax.random.fold_in(kk, 2), c)
            if spec.use_1x1
            else permute.init_shuffle(jax.random.fold_in(kk, 2), c)
        ),
    }


def init_multiscale(key, spec: FlowSpec):
    """Per level, the (structurally identical) MaCow steps are STACKED along a
    leading axis so forward/inverse run them as one lax.scan — XLA compiles a
    single step body per level instead of one per step (the reference config
    has 56 steps across 15 levels; this cuts compile time/size ~4x)."""
    chans = spec.level_channels()
    factors = spec.level_factors()
    return {
        "levels": [
            init_level(key, i, c, f, n_steps, spec)
            for i, (c, f, n_steps) in enumerate(zip(chans, factors, spec.num_steps))
        ]
    }


def init_multiscale_chunked(key, spec: FlowSpec, retry=None):
    """init_multiscale with ONE jit per level (device-side RNG, small compile
    graphs).  Identical output tree to init_multiscale by the per-level
    fold_in schedule.  `retry(fn, what)` optionally wraps each level's first
    call for transient remote-compile failures."""
    chans = spec.level_channels()
    factors = spec.level_factors()
    levels = []
    for i, (c, f, n_steps) in enumerate(zip(chans, factors, spec.num_steps)):
        fn = jax.jit(
            lambda k, i=i, c=c, f=f, n=n_steps: init_level(k, i, c, f, n, spec)
        )
        levels.append(retry(lambda: fn(key), f"flow level {i} init")
                      if retry else fn(key))
    return {"levels": levels}


def stack_step_params(steps):
    """Stack a list of per-step MaCowStep param trees into the scanned layout."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *steps)


def _steps_forward(stacked, out, h, spec: FlowSpec):
    def body(carry, step_p):
        o, ld = carry
        o, l = macow_step_forward(step_p, o, h, spec)
        return (o, ld + l), None

    if spec.remat:
        body = jax.checkpoint(body)
    (out, ld), _ = jax.lax.scan(body, (out, jnp.zeros((out.shape[0],), jnp.float32)), stacked)
    return out, ld


def _steps_inverse(stacked, out, h, spec: FlowSpec):
    def body(o, step_p):
        return macow_step_inverse(step_p, o, h, spec), None

    out, _ = jax.lax.scan(body, out, stacked, reverse=True)
    return out


def multiscale_forward(p, x, h, spec: FlowSpec):
    chans = spec.level_channels()
    factors = spec.level_factors()
    cs = spec.in_channels // spec.factor
    out = x
    ld = jnp.zeros((x.shape[0],), jnp.float32)
    z2s = []
    for level, c, f in zip(p["levels"], chans, factors):
        out, l = _steps_forward(level["steps"], out, h, spec)
        ld = ld + l
        out, l = prior_forward(level["prior"], out, h, f, spec)
        ld = ld + l
        out, l = _perm_fwd(level["shuffle"], out, spec)
        ld = ld + l
        z1c = c - cs
        z2s.append(out[..., z1c:])
        out = out[..., :z1c]
    parts = [out] + z2s[::-1]
    return jnp.concatenate(parts, axis=-1), ld


def multiscale_inverse(p, y, h, spec: FlowSpec):
    chans = spec.level_channels()
    factors = spec.level_factors()
    cs = spec.in_channels // spec.factor
    # peel off the z2 splits in forward order
    out = y
    z2s = []
    for c in chans:
        z1c = c - cs
        z2s.append(out[..., z1c:z1c + cs])
        out = out[..., :z1c]
    for level, c, f, z2 in zip(
        reversed(p["levels"]), reversed(chans), reversed(factors), reversed(z2s)
    ):
        out = jnp.concatenate([out, z2], axis=-1)
        out = _perm_inv(level["shuffle"], out, spec)
        out = prior_inverse(level["prior"], out, h, f, spec)
        out = _steps_inverse(level["steps"], out, h, spec)
    return out
