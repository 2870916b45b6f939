"""Golden parity for the FULL second-stage assembly: a reference-shaped
PokeMotionModel state_dict (flow.flow.* + first_stage_model.* +
poke_embedder.* + conditioner.*) built from ACTUAL reference modules on CPU,
ingested by ckpt/torch_import.convert_second_stage, and compared on the
density forward AND the sample path (reverse + decode) against the reference
composition (second_stage_video.py:255-359 make_flow_input /
encode_first_stage / decode_first_stage)."""
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
from ipoke_tpu.flows import transformer  # noqa: E402
from ipoke_tpu.flows.macow import FlowSpec  # noqa: E402
from ipoke_tpu.models import second_stage  # noqa: E402
from ipoke_tpu.models.encoders import WrapperSpec  # noqa: E402
from ipoke_tpu.models.first_stage import FirstStageSpec  # noqa: E402
from ipoke_tpu.models.second_stage import SecondStageSpec  # noqa: E402

Z, S, T, NFP, NFC = 8, 64, 4, 16, 16
HC = NFP + NFC


def to_nhwc(t):
    return jnp.asarray(np.transpose(t.detach().numpy(), (0, 2, 3, 1)))


@pytest.fixture(scope="module")
def cpu_patched():
    from models.modules.autoencoders import util as ref_util
    from models.modules.motion_models import motion_encoder as ref_me

    def spade_fwd(self, x, y):
        normalized = self.norm(x)
        y = torch.nn.functional.interpolate(
            y, mode="bilinear", size=x.shape[-2:], align_corners=True
        )
        y = self.activate(self.conv(y))
        return normalized * (1 + self.conv_gamma(y)) + self.conv_beta(y)

    def reparam(self, emb):
        mu, logvar = self.conv_mu(emb), self.conv_var(emb)
        return mu, mu, logvar  # eps = 0: deterministic for parity

    orig_spade = ref_util.Spade.forward
    orig_rep = ref_me.ResNetMotionEncoder.reparameterize
    ref_util.Spade.forward = spade_fwd
    ref_me.ResNetMotionEncoder.reparameterize = reparam
    yield
    ref_util.Spade.forward = orig_spade
    ref_me.ResNetMotionEncoder.reparameterize = orig_rep


def _wrapper_config(nf_in, nf_max, deterministic):
    return {
        "architecture": {"deterministic": deterministic, "min_spatial_size": 8,
                         "nf_in": nf_in, "nf_max": nf_max},
        "data": {"spatial_size": [S, S]},
    }


@pytest.fixture(scope="module")
def assembled(cpu_patched):
    from models.modules.autoencoders.fully_conv_models import (
        FirstStageWrapper,
        SpadeCondConvDecoder,
    )
    from models.modules.INN.macow2 import MaCowStep, MultiScaleInternal
    from models.modules.motion_models.motion_encoder import resnet18_alternative
    from models.modules.motion_models.rnn import ConvGRU

    torch.manual_seed(60)
    flow = MultiScaleInternal(MaCowStep, num_steps=[1, 1], in_channels=Z,
                              hidden_channels=24, h_channels=HC, factor=4,
                              transform="affine", prior_transform="affine",
                              kernel_size=(2, 3), coupling_type="conv",
                              activation="elu", condition_nice=False)
    enc_motion = resnet18_alternative(dic={
        "ENC_M_channels": [16, 16, 16, 16], "z_dim": Z, "img_size": S,
        "max_frames": T, "min_spatial_size": 8, "full_seq": True,
        "deterministic": False,
    })
    rnn = ConvGRU(input_size=Z, hidden_sizes=Z, kernel_sizes=3, n_layers=2)
    gen = SpadeCondConvDecoder({
        "dec_channels": [32, 16, 16, 16], "z_dim": Z, "spectral_norm": True,
        "norm": "group", "running_stats": False,
    })
    motion_bias = torch.randn(1, Z, 8, 8)
    poke_embedder = FirstStageWrapper(_wrapper_config(2, NFP, True))
    conditioner = FirstStageWrapper(_wrapper_config(3, NFC, False))

    g = torch.Generator().manual_seed(61)
    x = torch.randn(2, T, 3, S, S, generator=g)
    poke = torch.randn(2, 2, S, S, generator=g)
    with torch.no_grad():
        # lazy data-init of flow actnorms/WN convs
        flow_in0, _, _ = enc_motion(x.transpose(1, 2))
        pe0, *_ = poke_embedder.encoder(poke)
        _, cmean0, _ = conditioner.encoder(x[:, 0])
        flow(flow_in0, h=torch.cat([cmean0, pe0], dim=1))
        gg = torch.Generator().manual_seed(62)
        for p in flow.parameters():
            p.add_(torch.randn(p.shape, generator=gg) * 0.05)

    for m in (flow, enc_motion, rnn, gen, poke_embedder, conditioner):
        m.eval()

    sd = {}
    sd.update({f"flow.flow.{k}": v.numpy() for k, v in flow.state_dict().items()})
    sd.update({f"first_stage_model.enc_motion.{k}": v.numpy()
               for k, v in enc_motion.state_dict().items()})
    sd.update({f"first_stage_model.rnn.{k}": v.numpy() for k, v in rnn.state_dict().items()})
    sd.update({f"first_stage_model.gen.{k}": v.numpy() for k, v in gen.state_dict().items()})
    sd["first_stage_model.motion_bias"] = motion_bias.numpy()
    sd.update({f"poke_embedder.{k}": v.numpy() for k, v in poke_embedder.state_dict().items()})
    sd.update({f"conditioner.{k}": v.numpy() for k, v in conditioner.state_dict().items()})

    spec = SecondStageSpec(
        flow=FlowSpec(num_steps=(1, 1), in_channels=Z, hidden_channels=24,
                      h_channels=HC, factor=4, activation="elu", spatial_size=8),
        first_stage=FirstStageSpec(
            z_dim=Z, spatial_size=S, max_frames=T,
            enc_channels=(16, 16, 16, 16), dec_channels=(32, 16, 16, 16),
            n_gru_layers=2, min_spatial_size=8, motion_bias=True,
            full_sequence=True,
        ),
        poke_embedder=WrapperSpec(nf_in=2, nf_max=NFP, spatial_size=S,
                                  min_spatial_size=8, deterministic=True),
        conditioner=WrapperSpec(nf_in=3, nf_max=NFC, spatial_size=S,
                                min_spatial_size=8, deterministic=False),
    )
    params = ti.convert_second_stage(sd, spec)
    mods = dict(flow=flow, enc_motion=enc_motion, rnn=rnn, gen=gen,
                motion_bias=motion_bias, poke_embedder=poke_embedder,
                conditioner=conditioner)
    return mods, params, spec, x, poke


def _ref_cond(mods, x, poke):
    with torch.no_grad():
        pe, *_ = mods["poke_embedder"].encoder(poke)
        _, cmean, _ = mods["conditioner"].encoder(x[:, 0])
        return torch.cat([cmean, pe], dim=1)


def test_density_forward_assembly(assembled):
    mods, params, spec, x, poke = assembled
    with torch.no_grad():
        flow_in, _, _ = mods["enc_motion"](x.transpose(1, 2))
        cond = _ref_cond(mods, x, poke)
        out_ref, ld_ref = mods["flow"](flow_in, h=cond)

    batch = {
        "images": jnp.asarray(np.transpose(x.numpy(), (0, 1, 3, 4, 2))),
        "poke": to_nhwc(poke),
    }
    out, ld, _ = second_stage.forward_density(params, spec, batch)
    ref = out_ref.numpy()
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-8)
    assert err < 5e-4, f"density out rel err {err:.2e}"
    lerr = np.max(np.abs(np.asarray(ld) - ld_ref.numpy())) / (np.max(np.abs(ld_ref.numpy())) + 1e-3)
    assert lerr < 5e-4, f"logdet rel err {lerr:.2e}"


def test_sample_path_assembly(assembled):
    """Fixed z through reverse flow + GRU/SPADE decode, both stacks."""
    mods, params, spec, x, poke = assembled
    g = torch.Generator().manual_seed(63)
    z = torch.randn(2, Z, 8, 8, generator=g)
    with torch.no_grad():
        cond = _ref_cond(mods, x, poke)
        motion_ref = mods["flow"](z, h=cond, reverse=True)
        hidden = [motion_ref] * 2
        in_rnn = torch.cat([mods["motion_bias"]] * 2, dim=0)
        frames_ref = []
        for _ in range(T - 1):
            hidden = mods["rnn"](in_rnn, hidden)
            frames_ref.append(mods["gen"]([hidden[-1]], x[:, 0], del_shape=True))
        frames_ref = torch.stack(frames_ref, dim=1)

    x_j = jnp.asarray(np.transpose(x.numpy(), (0, 1, 3, 4, 2)))
    cond_j = second_stage.embed_cond(params, spec, x_j[:, 0], to_nhwc(poke))
    motion = transformer.reverse(params["flow"], spec.flow, to_nhwc(z), cond_j)
    merr = np.max(np.abs(np.transpose(np.asarray(motion), (0, 3, 1, 2)) - motion_ref.numpy()))
    vids = second_stage.decode_first_stage(params, spec, motion, x_j[:, 0], T - 1)
    ref = frames_ref.numpy()
    got = np.transpose(np.asarray(vids), (0, 1, 4, 2, 3))
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-8)
    assert err < 1e-3, f"sample path rel err {err:.2e} (motion abs err {merr:.2e})"
