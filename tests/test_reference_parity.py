"""Golden numerical parity against the ACTUAL reference torch modules.

Builds reference flow modules (macow2.py) on CPU with random weights, runs
their lazy data-dependent init, perturbs the parameters (the zero-init
weight-norm convs would otherwise make every coupling an identity), exports
``state_dict()``, converts via ckpt/torch_import, and asserts forward /
logdet / inverse equality with our JAX implementation.

This is the end-to-end validation of the checkpoint-converter schema that
round-trip tests cannot provide (VERDICT r1, missing item 2).

Covered here: MaskedConvFlow (4 orders), NICE2d (continuous/skip x up/down),
ActNorm2dFlow (initialized buffers), Shuffle buffers, MaCowUnit, MaCowStep,
MultiScalePrior, MultiScaleInternal (full 15-level released topology).
"""
import os
import sys

import numpy as np
import pytest

REF = os.environ.get("IPOKE_REFERENCE", "/root/reference")
if not os.path.isdir(os.path.join(REF, "models")):
    pytest.skip("reference repo not mounted", allow_module_level=True)
torch = pytest.importorskip("torch")
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ipoke_tpu.ckpt import torch_import as ti  # noqa: E402
from ipoke_tpu.flows import actnorm, macow, mcf, nice, permute  # noqa: E402
from ipoke_tpu.flows.macow import FlowSpec  # noqa: E402

TOL = 2e-4  # f32; worst case through 56 flow steps


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def sd_np(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def perturb_(module, scale=0.2, seed=7):
    """Randomize params after lazy init: reference zero-init WN convs make
    couplings exact identities, which would mask converter transpose bugs."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.add_(torch.randn(p.shape, generator=g) * scale)


def to_nhwc(t):
    return jnp.asarray(np.transpose(t.detach().numpy(), (0, 2, 3, 1)))


def from_nhwc(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


def assert_close(mine_nhwc, ref_nchw, tol=TOL, what=""):
    ref = ref_nchw.detach().numpy()
    got = from_nhwc(mine_nhwc)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-8)
    assert err < tol, f"{what}: rel err {err:.2e} (tol {tol})"


def assert_logdet(mine, ref, tol=TOL, what=""):
    ref = ref.detach().numpy()
    got = np.asarray(mine)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-3)
    assert err < tol, f"{what} logdet: rel err {err:.2e} got {got} ref {ref}"


def prefixed(sd, pre):
    return {f"{pre}.{k}": v for k, v in sd.items()}


B, H, C, HID, HC = 2, 8, 8, 24, 6


def rand(*shape, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g)


# ---------------------------------------------------------------------------
# MaskedConvFlow — all four orders, conditional + unconditional
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("order", ["A", "B", "C", "D"])
@pytest.mark.parametrize("cond", [False, True])
def test_masked_conv_flow(order, cond):
    from models.modules.INN.macow2 import MaskedConvFlow

    torch.manual_seed(3)
    ks = (2, 3) if order in ("A", "B") else (3, 2)
    m = MaskedConvFlow(C, ks, order=order, h_channels=HC if cond else None,
                       transform="affine", activation="elu")
    x = rand(B, C, H, H, seed=1)
    h = rand(B, HC, H, H, seed=2) if cond else None
    with torch.no_grad():
        m(x, h=h)  # lazy zero-init of the WN 1x1
        perturb_(m)
        y_ref, ld_ref = m(x, h=h)
        x_rec = m(y_ref, h=h, reverse=True)
    assert float((x_rec - x).abs().max()) < 1e-4  # reference self-consistency

    p = ti._mcf(prefixed(sd_np(m), "m"), "m")
    y, ld = mcf.forward(p, to_nhwc(x), h=to_nhwc(h) if cond else None,
                        order=order, transform="affine", act="elu")
    assert_close(y, y_ref, what=f"mcf {order} fwd")
    assert_logdet(ld, ld_ref, what=f"mcf {order}")
    x_mine = mcf.inverse(p, to_nhwc(y_ref), h=to_nhwc(h) if cond else None,
                         order=order, transform="affine", act="elu")
    assert_close(x_mine, x, what=f"mcf {order} inv")


# ---------------------------------------------------------------------------
# NICE2d — split types x orders (incl. the skip interleave), cond + uncond
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("split_type", ["continuous", "skip"])
@pytest.mark.parametrize("order", ["up", "down"])
@pytest.mark.parametrize("cond", [False, True])
def test_nice2d(split_type, order, cond):
    from models.modules.INN.macow2 import NICE2d

    torch.manual_seed(4)
    m = NICE2d(C, hidden_channels=HID, h_channels=HC if cond else 0,
               split_type=split_type, order=order, factor=2,
               transform="affine", activation="elu")
    x = rand(B, C, H, H, seed=5)
    h = rand(B, HC, H, H, seed=6) if cond else None
    with torch.no_grad():
        m(x, h=h)
        perturb_(m)
        y_ref, ld_ref = m(x, h=h)
        x_rec = m(y_ref, h=h, reverse=True)
    assert float((x_rec - x).abs().max()) < 1e-4

    p = ti._nice(prefixed(sd_np(m), "m"), "m")
    kw = dict(h=to_nhwc(h) if cond else None, in_channels=C, factor=2,
              split_type=split_type, order=order, transform="affine", act="elu")
    y, ld = nice.forward(p, to_nhwc(x), **kw)
    assert_close(y, y_ref, what=f"nice {split_type}/{order} fwd")
    assert_logdet(ld, ld_ref, what=f"nice {split_type}/{order}")
    x_mine = nice.inverse(p, to_nhwc(y_ref), **kw)
    assert_close(x_mine, x, what=f"nice {split_type}/{order} inv")


# ---------------------------------------------------------------------------
# ActNorm2dFlow — data-init buffer semantics
# ---------------------------------------------------------------------------

def test_actnorm_initialized():
    from models.modules.INN.macow2 import ActNorm2dFlow

    torch.manual_seed(8)
    m = ActNorm2dFlow(C)
    x = rand(B, C, H, H, seed=9)
    with torch.no_grad():
        m(x)  # data init on first forward
        y_ref, ld_ref = m(x)
        x_rec = m(y_ref, reverse=True)
    sd = sd_np(m)
    assert sd["initialized"] == 1
    p = ti.actnorm(prefixed(sd, "m"), "m")
    y, ld = actnorm.forward(p, to_nhwc(x))
    assert_close(y, y_ref, what="actnorm fwd")
    assert_logdet(ld, ld_ref, what="actnorm")
    assert_close(actnorm.inverse(p, to_nhwc(y_ref)), x_rec, what="actnorm inv")


def test_shuffle_buffers():
    from models.modules.INN.flow_blocks import Shuffle

    torch.manual_seed(10)
    m = Shuffle(C)
    x = rand(B, C, H, H, seed=11)
    with torch.no_grad():
        y_ref, _ = m(x)
        x_rec = m(y_ref, reverse=True)
    p = ti.shuffle(prefixed(sd_np(m), "m"), "m")
    y, _ = permute.shuffle_forward(p, to_nhwc(x))
    assert_close(y, y_ref, what="shuffle fwd")
    assert_close(permute.shuffle_inverse(p, to_nhwc(y_ref)), x_rec, what="shuffle inv")


# ---------------------------------------------------------------------------
# MaCowStep — the full step (2x2 units, 4 couplings, 2 actnorms, shuffle)
# ---------------------------------------------------------------------------

def _spec(num_steps=(1,), c=C, condition_nice=False, factor=16):
    return FlowSpec(num_steps=tuple(num_steps), in_channels=c, hidden_channels=HID,
                    h_channels=HC, factor=factor, transform="affine",
                    prior_transform="affine", kernel_size=(2, 3),
                    activation="elu", condition_nice=condition_nice, spatial_size=H)


@pytest.mark.parametrize("condition_nice", [False, True])
def test_macow_step(condition_nice):
    from models.modules.INN.macow2 import MaCowStep

    torch.manual_seed(12)
    m = MaCowStep(C, (2, 3), HID, HC, transform="affine", activation="elu",
                  condition_nice=condition_nice)
    x = rand(B, C, H, H, seed=13)
    h = rand(B, HC, H, H, seed=14)
    with torch.no_grad():
        m(x, h=h)  # lazy init of actnorms + WN convs
        # smaller perturbation when the NICE nets are h-conditioned: larger
        # noise saturates tanh(0.5*logs) to -1 -> scale==0 in f32 -> -inf
        # logdet in the REFERENCE itself (degenerate, not a parity target)
        perturb_(m, scale=0.1 if condition_nice else 0.2)
        y_ref, ld_ref = m(x, h=h)
        x_rec = m(y_ref, h=h, reverse=True)
    assert float((x_rec - x).abs().max()) < 1e-4

    spec = _spec(condition_nice=condition_nice)
    p = ti._macow_step(prefixed(sd_np(m), "m"), "m")
    y, ld = macow.macow_step_forward(p, to_nhwc(x), to_nhwc(h), spec)
    assert_close(y, y_ref, what="macow_step fwd")
    assert_logdet(ld, ld_ref, what="macow_step")
    x_mine = macow.macow_step_inverse(p, to_nhwc(y_ref), to_nhwc(h), spec)
    assert_close(x_mine, x, what="macow_step inv")


# ---------------------------------------------------------------------------
# MultiScalePrior
# ---------------------------------------------------------------------------

def test_multiscale_prior():
    from models.modules.INN.macow2 import MultiScalePrior

    torch.manual_seed(15)
    factor = 4
    m = MultiScalePrior(C, hidden_channels=HID, h_channels=HC, factor=factor,
                        transform="affine", alpha=1.0, coupling_type="conv",
                        h_type=None, activation="elu", normalize=None,
                        num_groups=None, condition_nice=False)
    x = rand(B, C, H, H, seed=16)
    with torch.no_grad():
        m(x)
        perturb_(m)
        y_ref, ld_ref = m(x)
        x_rec = m(y_ref, reverse=True)
    assert float((x_rec - x).abs().max()) < 1e-4

    spec = _spec(factor=factor)
    p = ti._prior(prefixed(sd_np(m), "m"), "m")
    y, ld = macow.prior_forward(p, to_nhwc(x), None, factor, spec)
    assert_close(y, y_ref, what="prior fwd")
    assert_logdet(ld, ld_ref, what="prior")
    x_mine = macow.prior_inverse(p, to_nhwc(y_ref), None, factor, spec)
    assert_close(x_mine, x, what="prior inv")


# ---------------------------------------------------------------------------
# MultiScaleInternal — the full released 15-level topology (reduced widths)
# ---------------------------------------------------------------------------

def test_multiscale_internal_full_topology():
    from models.modules.INN.macow2 import MaCowStep, MultiScaleInternal

    num_steps = [10, 5, 5, 4, 4, 4, 3, 3, 3, 2, 2, 2, 1, 1, 1]
    in_channels, factor, hid, hc = 64, 16, 16, 8
    torch.manual_seed(17)
    m = MultiScaleInternal(MaCowStep, num_steps=num_steps, in_channels=in_channels,
                           hidden_channels=hid, h_channels=hc, factor=factor,
                           transform="affine", prior_transform="affine",
                           kernel_size=(2, 3), coupling_type="conv",
                           activation="elu", condition_nice=False)
    x = rand(B, in_channels, H, H, seed=18)
    h = rand(B, hc, H, H, seed=19)
    with torch.no_grad():
        m(x, h=h)
        # tiny perturbation: activations through 56 steps grow multiplicatively
        # and saturate the affine tanh to scale==0 (reference -inf logdet);
        # any converter transpose bug still shows as O(1) relative error
        perturb_(m, scale=0.02)
        y_ref, ld_ref = m(x, h=h)
        assert torch.isfinite(y_ref).all() and torch.isfinite(ld_ref).all()
        x_rec = m(y_ref, h=h, reverse=True)
    assert float((x_rec - x).abs().max()) < 2e-3  # 56 steps of f32 round-trip

    spec = FlowSpec(num_steps=tuple(num_steps), in_channels=in_channels,
                    hidden_channels=hid, h_channels=hc, factor=factor,
                    transform="affine", prior_transform="affine",
                    kernel_size=(2, 3), activation="elu", spatial_size=H)
    sd = prefixed(sd_np(m), "flow.flow")
    p = ti.convert_flow(sd, spec, prefix="flow.flow")
    y, ld = macow.multiscale_forward(p, to_nhwc(x), to_nhwc(h), spec)
    assert_close(y, y_ref, tol=5e-4, what="multiscale fwd")
    assert_logdet(ld, ld_ref, tol=5e-4, what="multiscale")
    x_mine = macow.multiscale_inverse(p, to_nhwc(y_ref), to_nhwc(h), spec)
    assert_close(x_mine, x, tol=2e-3, what="multiscale inv")


# ---------------------------------------------------------------------------
# Legacy FC coupling flow (ConditionalFlow, flow_blocks.py:10-66)
# ---------------------------------------------------------------------------

def test_legacy_conditional_flow():
    from models.modules.INN.flow_blocks import ConditionalFlow

    from ipoke_tpu.flows import legacy

    torch.manual_seed(70)
    spec = legacy.FCFlowSpec(in_channels=16, embedding_dim=8, hidden_dim=32,
                             hidden_depth=2, n_flows=4)
    m = ConditionalFlow(in_channels=16, embedding_dim=8, hidden_dim=32,
                        hidden_depth=2, n_flows=4)
    x = rand(3, 16, seed=71)
    emb = rand(3, 8, 1, 1, seed=72)
    with torch.no_grad():
        m(x, emb)  # ActNorm lazy data-init (train mode)
        m.eval()
        perturb_(m, scale=0.1)
        y_ref, ld_ref = m(x, emb)
        x_rec = m(y_ref.squeeze(-1).squeeze(-1), emb, reverse=True)
    assert float((x_rec.squeeze(-1).squeeze(-1) - x).abs().max()) < 1e-4

    p = ti.convert_fc_flow(sd_np(m), spec)
    z, ld = legacy.fc_flow_forward(p, spec, jnp.asarray(x.numpy()),
                                   jnp.asarray(emb.numpy()[:, :, 0, 0]))
    ref = y_ref.squeeze(-1).squeeze(-1).numpy()
    err = np.max(np.abs(np.asarray(z) - ref)) / (np.max(np.abs(ref)) + 1e-8)
    assert err < 1e-4, f"fc flow fwd rel err {err:.2e}"
    assert_logdet(ld, ld_ref, what="fc flow")
    x_mine = legacy.fc_flow_inverse(p, spec, jnp.asarray(ref),
                                    jnp.asarray(emb.numpy()[:, :, 0, 0]))
    xerr = np.max(np.abs(np.asarray(x_mine) - x.numpy()))
    assert xerr < 1e-4, f"fc flow inv err {xerr:.2e}"


# ---------------------------------------------------------------------------
# Attention NICE2d + cond_conv MaCowUnit (the 'attention'/'cond_conv' config
# flags — modules.py GatedConv2d / BasicConvAttnBlock path)
# ---------------------------------------------------------------------------

def test_nice2d_attention_golden():
    from models.modules.INN.macow2 import NICE2d

    torch.manual_seed(90)
    m = NICE2d(C, hidden_channels=16, h_channels=0, split_type="continuous",
               order="up", factor=2, transform="affine", activation="elu",
               attention=True, heads=4, spatial_size=H)
    x = rand(B, C, H, H, seed=91)
    with torch.no_grad():
        m(x)  # lazy data-init of custom Conv2d / NIN / WN convs
        perturb_(m, scale=0.05)
        y_ref, ld_ref = m(x)
        x_rec = m(y_ref, reverse=True)
    assert float((x_rec - x).abs().max()) < 1e-4

    p = ti._nice(prefixed(sd_np(m), "m"), "m")
    kw = dict(h=None, in_channels=C, factor=2, split_type="continuous",
              order="up", transform="affine", act="elu", heads=4)
    y, ld = nice.forward(p, to_nhwc(x), **kw)
    assert_close(y, y_ref, tol=5e-4, what="nice-attn fwd")
    assert_logdet(ld, ld_ref, tol=5e-4, what="nice-attn")
    x_mine = nice.inverse(p, to_nhwc(y_ref), **kw)
    assert_close(x_mine, x, tol=5e-4, what="nice-attn inv")


def test_macow_unit_cond_conv_golden():
    from models.modules.INN.macow2 import MaCowUnit

    torch.manual_seed(92)
    m = MaCowUnit(C, (2, 3), h_channels=HC, transform="affine",
                  activation="elu", cond_conv=True,
                  cond_conv_hidden_channels=HC)
    x = rand(B, C, H, H, seed=93)
    h = rand(B, HC, H, H, seed=94)
    with torch.no_grad():
        m(x, h=h)
        perturb_(m, scale=0.05)
        y_ref, ld_ref = m(x, h=h)
        x_rec = m(y_ref, h=h, reverse=True)
    assert float((x_rec - x).abs().max()) < 1e-4

    spec = _spec(condition_nice=False)
    from dataclasses import replace as _replace

    spec = _replace(spec, cond_conv=True)
    p = ti._macow_unit(prefixed(sd_np(m), "m"), "m")
    y, ld = macow.macow_unit_forward(p, to_nhwc(x), to_nhwc(h), spec)
    assert_close(y, y_ref, tol=5e-4, what="unit-condconv fwd")
    assert_logdet(ld, ld_ref, tol=5e-4, what="unit-condconv")
    x_mine = macow.macow_unit_inverse(p, to_nhwc(y_ref), to_nhwc(h), spec)
    assert_close(x_mine, x, tol=5e-4, what="unit-condconv inv")
