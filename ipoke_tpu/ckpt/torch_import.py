"""Torch-checkpoint ingestion: reference Lightning state_dicts -> ipoke_tpu
parameter pytrees (SURVEY §5 "checkpoint conversion fidelity").

Layout transforms:
  Conv2d        (O,I,kh,kw)      -> HWIO
  ConvTranspose (I,O,kh,kw)      -> HWIO (I=in, O=out; kernel flip happens in
                                   our conv_transpose2d, not here)
  Conv3d        (O,I,D,H,W)      -> DHWIO
  Linear        (O,I)            -> (I,O)
  weight_norm   weight_g (O,1,..), weight_v (O,I,..) -> v: HWIO, g: (O,)
  spectral_norm weight_orig + u/v buffers -> w = W/sigma folded, u kept
  ActNorm2dFlow log_scale/bias (C,1,1)   -> (C,)
  Shuffle       forward/backward_shuffle_idx buffers -> fwd_idx/inv_idx

Structural transform: per-level MaCow step params are STACKED for the
scan-over-steps layout (flows/macow.init_multiscale).

The expected key schema is documented by the matching ``export_*`` functions,
which produce a reference-shaped state_dict from our pytrees — used by the
round-trip tests and as living documentation until real checkpoints are
mounted.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

import jax.numpy as jnp

from ipoke_tpu.flows.macow import FlowSpec
from ipoke_tpu.flows.nice import nice_channels


# ---------------------------------------------------------------------------
# primitive converters (torch tensor -> np array comes in as np already)
# ---------------------------------------------------------------------------

def conv2d_w(t):
    return jnp.asarray(np.transpose(t, (2, 3, 1, 0)))


def convT2d_w(t):
    return jnp.asarray(np.transpose(t, (2, 3, 0, 1)))


def conv3d_w(t):
    return jnp.asarray(np.transpose(t, (2, 3, 4, 1, 0)))


def linear_w(t):
    return jnp.asarray(np.transpose(t))


def wn_conv(sd, prefix):
    """Conv2dWeightNorm / torch weight_norm: keys {prefix}.weight_g/.weight_v/.bias"""
    v = conv2d_w(sd[f"{prefix}.weight_v"])
    g = jnp.asarray(np.asarray(sd[f"{prefix}.weight_g"]).reshape(-1))
    out = {"v": v, "g": g}
    if f"{prefix}.bias" in sd:
        out["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return out


def sn_conv(sd, prefix, keep_u=True, transpose=conv2d_w, dim=0):
    """spectral_norm conv: fold sigma into the weight (inference parity).
    Keys: {prefix}.weight_orig, {prefix}.weight_u, {prefix}.weight_v(opt).

    ``dim`` is the output axis torch reshapes along: 0 for Conv2d, **1 for
    ConvTranspose2d** (torch.nn.utils.spectral_norm's documented default) —
    using 0 for transpose convs computes a wrong sigma."""
    if f"{prefix}.weight_orig" in sd:
        w_t = np.asarray(sd[f"{prefix}.weight_orig"])
        u = np.asarray(sd[f"{prefix}.weight_u"])
        w_mat = np.moveaxis(w_t, dim, 0).reshape(w_t.shape[dim], -1)
        if f"{prefix}.weight_v" in sd:
            v = np.asarray(sd[f"{prefix}.weight_v"])
        else:
            v = w_mat.T @ u
            v = v / (np.linalg.norm(v) + 1e-12)
        sigma = float(u @ (w_mat @ v))
        w = w_t / sigma
    else:
        w = np.asarray(sd[f"{prefix}.weight"])
        u = None
    out = {"w": transpose(w)}
    if f"{prefix}.bias" in sd:
        out["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    if keep_u and u is not None:
        out["u"] = jnp.asarray(u)
    return out


def plain_conv(sd, prefix, transpose=conv2d_w):
    out = {"w": transpose(np.asarray(sd[f"{prefix}.weight"]))}
    if f"{prefix}.bias" in sd:
        out["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return out


def actnorm(sd, prefix):
    return {
        "log_scale": jnp.asarray(np.asarray(sd[f"{prefix}.log_scale"]).reshape(-1)),
        "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]).reshape(-1)),
    }


def shuffle(sd, prefix):
    return {
        "fwd_idx": jnp.asarray(np.asarray(sd[f"{prefix}.forward_shuffle_idx"], np.int32)),
        "inv_idx": jnp.asarray(np.asarray(sd[f"{prefix}.backward_shuffle_idx"], np.int32)),
    }


def group_norm_p(sd, prefix):
    return {"gamma": jnp.asarray(sd[f"{prefix}.weight"]), "beta": jnp.asarray(sd[f"{prefix}.bias"])}


# ---------------------------------------------------------------------------
# flow (SupervisedMacowTransformer / MultiScaleInternal under 'flow.flow.')
# ---------------------------------------------------------------------------

def _mcf(sd, prefix):
    return {
        "net": {
            "shift_conv": plain_conv(sd, f"{prefix}.net.shift_conv"),
            "conv1x1": wn_conv(sd, f"{prefix}.net.conv1x1.conv"),
        }
    }


def _gated_conv(sd, prefix):
    """modules.GatedConv2d (custom Conv2d params: plain weight/bias)."""
    p = {
        "conv1": plain_conv(sd, f"{prefix}.conv1"),
        "conv2": plain_conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.conv_sc.weight" in sd:
        p["conv_sc"] = plain_conv(sd, f"{prefix}.conv_sc")
    if f"{prefix}.cond_conv.weight" in sd:
        p["cond_conv"] = plain_conv(sd, f"{prefix}.cond_conv")
    return p


def _attn_block(sd, prefix):
    """modules.BasicConvAttnBlock: gated resnet + NIN-projection attention +
    LayerNorm((C,H,W)) affine (stored CHW -> ours HWC)."""
    ln_g = np.asarray(sd[f"{prefix}.norm.weight"])
    ln_b = np.asarray(sd[f"{prefix}.norm.bias"])
    return {
        "gated": _gated_conv(sd, f"{prefix}.gated_resnet"),
        "attn": {
            "proj1": {"w": jnp.asarray(sd[f"{prefix}.attn.proj_1.W"]),
                      "b": jnp.asarray(sd[f"{prefix}.attn.proj_1.b"])},
            "proj2": {"w": jnp.asarray(sd[f"{prefix}.attn.proj_2.W"]),
                      "b": jnp.asarray(sd[f"{prefix}.attn.proj_2.b"])},
        },
        "ln": {"gamma": jnp.asarray(np.transpose(ln_g, (1, 2, 0))),
               "beta": jnp.asarray(np.transpose(ln_b, (1, 2, 0)))},
    }


def _nice(sd, prefix):
    if f"{prefix}.net.pos_emb" in sd:  # attention NICEConvBlock variant
        return {
            "net": {
                "in_resnet": _gated_conv(sd, f"{prefix}.net.in_resnet"),
                "pos_emb": jnp.asarray(
                    np.transpose(np.asarray(sd[f"{prefix}.net.pos_emb"]), (1, 2, 0))
                ),
                "conv1": _attn_block(sd, f"{prefix}.net.conv1"),
                "conv2": _attn_block(sd, f"{prefix}.net.conv2"),
                "conv3": wn_conv(sd, f"{prefix}.net.conv3.conv"),
            }
        }
    return {
        "net": {
            "conv1": plain_conv(sd, f"{prefix}.net.conv1"),
            "conv2": plain_conv(sd, f"{prefix}.net.conv2"),
            "conv3": wn_conv(sd, f"{prefix}.net.conv3.conv"),
        }
    }


def _macow_unit(sd, prefix):
    if f"{prefix}.cond_conv_block.conv1.weight" in sd:
        return {
            "cond_conv_block": _gated_conv(sd, f"{prefix}.cond_conv_block"),
            **{k: v for k, v in _macow_unit_plain(sd, prefix).items()},
        }
    return _macow_unit_plain(sd, prefix)


def _macow_unit_plain(sd, prefix):
    return {
        "conv1": _mcf(sd, f"{prefix}.conv1"),
        "conv2": _mcf(sd, f"{prefix}.conv2"),
        "actnorm1": actnorm(sd, f"{prefix}.actnorm1"),
        "conv3": _mcf(sd, f"{prefix}.conv3"),
        "conv4": _mcf(sd, f"{prefix}.conv4"),
        "actnorm2": actnorm(sd, f"{prefix}.actnorm2"),
    }


def _macow_step(sd, prefix):
    return {
        "actnorm1": actnorm(sd, f"{prefix}.actnorm1"),
        "conv1x1": shuffle(sd, f"{prefix}.conv1x1"),
        "units1": [_macow_unit(sd, f"{prefix}.units1.{i}") for i in range(2)],
        "coupling1_up": _nice(sd, f"{prefix}.coupling1_up"),
        "coupling1_dn": _nice(sd, f"{prefix}.coupling1_dn"),
        "actnorm2": actnorm(sd, f"{prefix}.actnorm2"),
        "units2": [_macow_unit(sd, f"{prefix}.units2.{i}") for i in range(2)],
        "coupling2_up": _nice(sd, f"{prefix}.coupling2_up"),
        "coupling2_dn": _nice(sd, f"{prefix}.coupling2_dn"),
    }


def _prior(sd, prefix):
    return {
        "conv1x1": shuffle(sd, f"{prefix}.conv1x1"),
        "coupling": _nice(sd, f"{prefix}.coupling"),
        "actnorm": actnorm(sd, f"{prefix}.actnorm"),
    }


def convert_flow(sd: Dict[str, np.ndarray], spec: FlowSpec, prefix="flow.flow"):
    """MultiScaleInternal state_dict -> stacked-level param tree."""
    import jax

    from ipoke_tpu.flows.macow import stack_step_params

    levels = []
    for li, n_steps in enumerate(spec.num_steps):
        steps = [_macow_step(sd, f"{prefix}.layers.{li}.{si}") for si in range(n_steps)]
        levels.append(
            {
                "steps": stack_step_params(steps),
                "prior": _prior(sd, f"{prefix}.priors.{li}"),
                "shuffle": shuffle(sd, f"{prefix}.shuffle_layers.{li}"),
            }
        )
    return {"levels": levels}


def convert_macow_v1_step(sd, spec, prefix=""):
    """Legacy MaCow v1 unconditional step (macow.py:46-80) ->
    flows/macow_v1.py tree.  spec: flows.macow_v1.MaCowV1Spec."""
    pre = f"{prefix}." if prefix else ""

    def mcf(prefix_):
        p = {
            "shift_conv": wn_conv(sd, f"{prefix_}.net.masked_conv.conv"),
            "conv1x1": wn_conv(sd, f"{prefix_}.net.conv1x1.conv"),
        }
        if f"{prefix_}.s_conv.conv.weight_v" in sd:
            p["s_conv"] = wn_conv(sd, f"{prefix_}.s_conv.conv")
        return p

    units = []
    for i in range(spec.num_units):
        up = f"{pre}units.{i}"
        units.append({
            "actnorm1": actnorm(sd, f"{up}.actnorm1"),
            "conv1": mcf(f"{up}.conv1"),
            "conv2": mcf(f"{up}.conv2"),
            "actnorm2": actnorm(sd, f"{up}.actnorm2"),
            "conv3": mcf(f"{up}.conv3"),
            "conv4": mcf(f"{up}.conv4"),
        })
    gp = f"{pre}glow_step"
    return {
        "units": units,
        "glow": {
            "actnorm": actnorm(sd, f"{gp}.actnorm"),
            "shuffle": shuffle(sd, f"{gp}.conv1x1"),
            "nice": {
                "conv1": wn_conv(sd, f"{gp}.coupling.net.conv1.conv"),
                "conv2": wn_conv(sd, f"{gp}.coupling.net.conv2.conv"),
                # init_zeros conv: plain (never weight-normed in the reference)
                "conv3": plain_conv(sd, f"{gp}.coupling.net.conv3.conv"),
            },
        },
    }


def _fc_net(sd, prefix, depth, use_tanh):
    """BasicFullyConnectedNet (modules.py:165-191): Linear layers sit at even
    Sequential indices 0, 2, ..., 2*(depth+1) (LeakyReLUs between)."""
    layers = []
    for j in range(depth + 2):
        k = 2 * j
        layers.append({
            "w": linear_w(np.asarray(sd[f"{prefix}.main.{k}.weight"])),
            "b": jnp.asarray(sd[f"{prefix}.main.{k}.bias"]),
        })
    return {"layers": layers, "use_tanh": use_tanh}


def convert_fc_flow(sd, spec, prefix=""):
    """Legacy ConditionalFlow (flow_blocks.py:10-66) -> flows/legacy.py tree.
    spec: flows.legacy.FCFlowSpec."""
    pre = f"{prefix}." if prefix else ""
    blocks = []
    for i in range(spec.n_flows):
        bp = f"{pre}sub_layers.{i}"
        blocks.append({
            "actnorm": {
                "loc": jnp.asarray(np.asarray(sd[f"{bp}.norm_layer.loc"]).reshape(-1)),
                "scale": jnp.asarray(np.asarray(sd[f"{bp}.norm_layer.scale"]).reshape(-1)),
            },
            "coupling": {
                "s": [_fc_net(sd, f"{bp}.coupling.s.{j}", spec.hidden_depth, True)
                      for j in range(2)],
                "t": [_fc_net(sd, f"{bp}.coupling.t.{j}", spec.hidden_depth, False)
                      for j in range(2)],
            },
            "shuffle": shuffle(sd, f"{bp}.shuffle"),
        })
    p = {"blocks": blocks}
    if spec.conditioning_option != "none":
        p["cond_layers"] = [
            {"w": conv2d_w(np.asarray(sd[f"{pre}conditioning_layers.{i}.weight"])),
             "b": jnp.asarray(sd[f"{pre}conditioning_layers.{i}.bias"])}
            for i in range(spec.n_flows)
        ]
    return p


# ---------------------------------------------------------------------------
# conditioning towers (FirstStageWrapper: encoder/decoder)
# ---------------------------------------------------------------------------

def _conv2d_block(sd, prefix, norm="group"):
    p = {"conv": sn_conv(sd, f"{prefix}.conv")}
    if norm == "group" and f"{prefix}.norm.weight" in sd:
        p["norm"] = group_norm_p(sd, f"{prefix}.norm")
    return p


def _res_block(sd, prefix, norm="group"):
    p = {
        "conv1": _conv2d_block(sd, f"{prefix}.conv1", norm),
        "conv2": _conv2d_block(sd, f"{prefix}.conv2", norm),
    }
    if f"{prefix}.res_conv.conv.weight" in sd or f"{prefix}.res_conv.conv.weight_orig" in sd:
        p["res_conv"] = _conv2d_block(sd, f"{prefix}.res_conv", norm="none")
    return p


def _res_block_T(sd, prefix, norm="group"):
    """Upsampling ResBlock: conv1 and res_conv are ConvTranspose (sn dim=1)."""
    p = {
        "conv1": {"conv": sn_conv(sd, f"{prefix}.conv1.conv", transpose=convT2d_w, dim=1)},
        "conv2": _conv2d_block(sd, f"{prefix}.conv2", norm),
    }
    if f"{prefix}.conv1.norm.weight" in sd:
        p["conv1"]["norm"] = group_norm_p(sd, f"{prefix}.conv1.norm")
    if f"{prefix}.res_conv.conv.weight" in sd or f"{prefix}.res_conv.conv.weight_orig" in sd:
        p["res_conv"] = {"conv": sn_conv(sd, f"{prefix}.res_conv.conv", transpose=convT2d_w, dim=1)}
    return p


def _norm_conv2d(sd, prefix):
    return {
        "v": conv2d_w(np.asarray(sd[f"{prefix}.conv.weight_v"])),
        "g": jnp.asarray(np.asarray(sd[f"{prefix}.conv.weight_g"]).reshape(-1)),
        "b": jnp.asarray(sd[f"{prefix}.conv.bias"]),
        "gamma": jnp.asarray(np.asarray(sd[f"{prefix}.gamma"]).reshape(1, 1, 1, -1)),
        "beta": jnp.asarray(np.asarray(sd[f"{prefix}.beta"]).reshape(1, 1, 1, -1)),
    }


def convert_conv_encoder(sd, n_stages, variational, prefix="encoder", norm="group"):
    """ConvEncoder state_dict (model.{i} sequential + bottleneck.0 + heads)."""
    p = {"stem": _conv2d_block(sd, f"{prefix}.model.0", norm)}
    p["blocks"] = [_res_block(sd, f"{prefix}.model.{i}", norm) for i in range(1, n_stages)]
    p["bottleneck"] = _res_block(sd, f"{prefix}.bottleneck.0", norm)
    if variational:
        p["make_mu"] = _norm_conv2d(sd, f"{prefix}.make_mu")
        p["make_sigma"] = _norm_conv2d(sd, f"{prefix}.make_sigma")
    return p


def convert_conv_decoder(sd, n_stages, prefix="decoder", norm="group"):
    p = {"in_block": _res_block(sd, f"{prefix}.in_block", norm)}
    p["blocks"] = [_res_block_T(sd, f"{prefix}.blocks.{i}", norm) for i in range(n_stages)]
    p["out_conv"] = _conv2d_block(sd, f"{prefix}.out_conv", norm="none")
    return p


def convert_wrapper(sd, spec, prefix=""):
    """FirstStageWrapper (poke embedder / conditioner).  Reference loads these
    with key filtering on 'encoder'/'decoder' (second_stage_video.py:214-236)."""
    pre = f"{prefix}." if prefix else ""
    enc_spec = spec.encoder_spec
    dec_spec = spec.decoder_spec
    return {
        "encoder": convert_conv_encoder(
            sd, enc_spec.n_stages, enc_spec.variational, prefix=f"{pre}encoder"
        ),
        "decoder": convert_conv_decoder(
            sd, len(dec_spec.in_channels) - 1, prefix=f"{pre}decoder"
        ),
    }


# ---------------------------------------------------------------------------
# first stage (SpadeCondMotionModel)
# ---------------------------------------------------------------------------

def _basic_block3d(sd, prefix):
    p = {
        "conv1": {"w": conv3d_w(np.asarray(sd[f"{prefix}.conv1.weight"]))},
        "gn1": group_norm_p(sd, f"{prefix}.bn1"),
        "conv2": {"w": conv3d_w(np.asarray(sd[f"{prefix}.conv2.weight"]))},
        "gn2": group_norm_p(sd, f"{prefix}.bn2"),
    }
    if f"{prefix}.downsample.0.weight" in sd:
        p["down"] = {
            "w": conv3d_w(np.asarray(sd[f"{prefix}.downsample.0.weight"])),
            "gn": group_norm_p(sd, f"{prefix}.downsample.1"),
        }
    return p


def convert_motion_encoder(sd, spec, prefix="enc_motion"):
    channels, stride1, stride4, has_l4, has_l5, _ = spec.derived()
    p = {
        "conv1": {"w": conv3d_w(np.asarray(sd[f"{prefix}.conv1.weight"]))},
        "gn1": group_norm_p(sd, f"{prefix}.bn1"),
        "conv_mu": plain_conv(sd, f"{prefix}.conv_mu"),
        "conv_var": plain_conv(sd, f"{prefix}.conv_var"),
    }
    n_layers = 5 if has_l5 else (4 if has_l4 else 3)
    for li in range(1, n_layers + 1):
        blocks = []
        bi = 0
        while f"{prefix}.layer{li}.{bi}.conv1.weight" in sd:
            blocks.append(_basic_block3d(sd, f"{prefix}.layer{li}.{bi}"))
            bi += 1
        p[f"layer{li}"] = blocks
    return p


def _gru_cell(sd, prefix):
    return {
        "reset": plain_conv(sd, f"{prefix}.reset_gate"),
        "update": plain_conv(sd, f"{prefix}.update_gate"),
        "out": plain_conv(sd, f"{prefix}.out_gate"),
    }


def _spade(sd, prefix):
    return {
        "conv": plain_conv(sd, f"{prefix}.conv"),
        "conv_gamma": plain_conv(sd, f"{prefix}.conv_gamma"),
        "conv_beta": plain_conv(sd, f"{prefix}.conv_beta"),
    }


def convert_first_stage(sd, spec, prefix=""):
    """SpadeCondMotionModel (enc_motion + rnn + gen + motion_bias).
    Discriminator keys (disc_s/disc_t), metrics etc. are ignored — the
    reference loads these ckpts with strict=False for the same reason."""
    pre = f"{prefix}." if prefix else ""
    dec = spec.decoder_spec
    p = {
        "enc_motion": convert_motion_encoder(sd, spec.encoder_spec, prefix=f"{pre}enc_motion"),
        "rnn": [
            _gru_cell(sd, f"{pre}rnn.cells.{i}") for i in range(spec.n_gru_layers)
        ],
        "gen": {
            "in_block": _res_block(sd, f"{pre}gen.in_block", spec.norm),
            "blocks": [
                _res_block_T(sd, f"{pre}gen.blocks.{i}", "none") for i in range(dec.n_stages)
            ],
            "spades": [_spade(sd, f"{pre}gen.spade_blocks.{i}") for i in range(dec.n_stages)],
            "out_conv": _conv2d_block(sd, f"{pre}gen.out_conv", norm="none"),
        },
    }
    if spec.motion_bias:
        mb = np.asarray(sd[f"{pre}motion_bias"])  # (1, z, s, s)
        p["motion_bias"] = jnp.asarray(np.transpose(mb, (0, 2, 3, 1)))
    return p


# ---------------------------------------------------------------------------
# second stage assembly
# ---------------------------------------------------------------------------

def convert_second_stage(sd, spec, first_stage_sd=None, cond_sd=None, poke_sd=None):
    """PokeMotionModel checkpoint.  The Lightning ckpt embeds the frozen
    submodels under prefixes (first_stage_model., conditioner., poke_embedder.)
    — those take priority; separately-provided sub-ckpts fill gaps."""
    params = {"flow": convert_flow(sd, spec.flow, prefix="flow.flow")}
    fs_sd = {k[len("first_stage_model."):]: v for k, v in sd.items() if k.startswith("first_stage_model.")}
    if not fs_sd and first_stage_sd is not None:
        fs_sd = first_stage_sd
    params["first_stage"] = convert_first_stage(fs_sd, spec.first_stage)
    pe_sd = {k[len("poke_embedder."):]: v for k, v in sd.items() if k.startswith("poke_embedder.")}
    if not pe_sd and poke_sd is not None:
        pe_sd = poke_sd
    params["poke_embedder"] = convert_wrapper(pe_sd, spec.poke_embedder)
    if spec.use_cond:
        c_sd = {k[len("conditioner."):]: v for k, v in sd.items() if k.startswith("conditioner.")}
        if not c_sd and cond_sd is not None:
            c_sd = cond_sd
        params["conditioner"] = convert_wrapper(c_sd, spec.conditioner)
    if "scale_augment" in sd:
        params["scale_augment"] = jnp.asarray(sd["scale_augment"])
        params["shift_augment"] = jnp.asarray(sd["shift_augment"])
    if "conv_adapt_poke_emb.weight" in sd:
        params["conv_adapt_poke_emb"] = plain_conv(sd, "conv_adapt_poke_emb")
    if "conv_adapt_cond.weight" in sd:
        params["conv_adapt_cond"] = plain_conv(sd, "conv_adapt_cond")
    return params


def load_lightning_ckpt(path):
    """Read a Lightning .ckpt with torch (CPU), return {key: np.ndarray}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# exporters (round-trip tests + schema documentation)
# ---------------------------------------------------------------------------

def _export_wn(p, prefix, sd):
    o = p["v"].shape[-1]
    sd[f"{prefix}.weight_v"] = np.transpose(np.asarray(p["v"]), (3, 2, 0, 1))
    sd[f"{prefix}.weight_g"] = np.asarray(p["g"]).reshape(o, 1, 1, 1)
    if "b" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["b"])


def _export_conv(p, prefix, sd):
    sd[f"{prefix}.weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
    if "b" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["b"])


def _export_actnorm(p, prefix, sd):
    c = p["log_scale"].shape[0]
    sd[f"{prefix}.log_scale"] = np.asarray(p["log_scale"]).reshape(c, 1, 1)
    sd[f"{prefix}.bias"] = np.asarray(p["bias"]).reshape(c, 1, 1)


def _export_shuffle(p, prefix, sd):
    sd[f"{prefix}.forward_shuffle_idx"] = np.asarray(p["fwd_idx"])
    sd[f"{prefix}.backward_shuffle_idx"] = np.asarray(p["inv_idx"])


def _export_mcf(p, prefix, sd):
    _export_conv(p["net"]["shift_conv"], f"{prefix}.net.shift_conv", sd)
    _export_wn(p["net"]["conv1x1"], f"{prefix}.net.conv1x1.conv", sd)


def _export_nice(p, prefix, sd):
    _export_conv(p["net"]["conv1"], f"{prefix}.net.conv1", sd)
    _export_conv(p["net"]["conv2"], f"{prefix}.net.conv2", sd)
    _export_wn(p["net"]["conv3"], f"{prefix}.net.conv3.conv", sd)


def _export_unit(p, prefix, sd):
    for name in ("conv1", "conv2", "conv3", "conv4"):
        _export_mcf(p[name], f"{prefix}.{name}", sd)
    _export_actnorm(p["actnorm1"], f"{prefix}.actnorm1", sd)
    _export_actnorm(p["actnorm2"], f"{prefix}.actnorm2", sd)


def export_flow(params, spec: FlowSpec, prefix="flow.flow"):
    """Our (stacked) flow params -> torch-style state_dict (numpy)."""
    import jax

    sd = {}
    for li, level in enumerate(params["levels"]):
        n_steps = spec.num_steps[li]
        for si in range(n_steps):
            step = jax.tree_util.tree_map(lambda x: x[si], level["steps"])
            pre = f"{prefix}.layers.{li}.{si}"
            _export_actnorm(step["actnorm1"], f"{pre}.actnorm1", sd)
            _export_shuffle(step["conv1x1"], f"{pre}.conv1x1", sd)
            for ui, unit in enumerate(step["units1"]):
                _export_unit(unit, f"{pre}.units1.{ui}", sd)
            _export_nice(step["coupling1_up"], f"{pre}.coupling1_up", sd)
            _export_nice(step["coupling1_dn"], f"{pre}.coupling1_dn", sd)
            _export_actnorm(step["actnorm2"], f"{pre}.actnorm2", sd)
            for ui, unit in enumerate(step["units2"]):
                _export_unit(unit, f"{pre}.units2.{ui}", sd)
            _export_nice(step["coupling2_up"], f"{pre}.coupling2_up", sd)
            _export_nice(step["coupling2_dn"], f"{pre}.coupling2_dn", sd)
        _export_shuffle(level["prior"]["conv1x1"], f"{prefix}.priors.{li}.conv1x1", sd)
        _export_nice(level["prior"]["coupling"], f"{prefix}.priors.{li}.coupling", sd)
        _export_actnorm(level["prior"]["actnorm"], f"{prefix}.priors.{li}.actnorm", sd)
        _export_shuffle(level["shuffle"], f"{prefix}.shuffle_layers.{li}", sd)
    return sd


# ---------------------------------------------------------------------------
# auxiliary-network weight converters (perceptual / FVD / FID / pose nets)
# ---------------------------------------------------------------------------

def _fold_bn(w, gamma, beta, mean, var, eps=1e-3):
    """Fold BatchNorm into conv weight/bias (inference-only nets)."""
    scale = gamma / np.sqrt(var + eps)
    return w * scale.reshape((1,) * (w.ndim - 1) + (-1,)), beta - mean * scale


def convert_torchvision_vgg(sd, out_path, layout=None):
    """torchvision vgg16/vgg19 state_dict -> vggNN_features.npz
    ({conv{idx}/w OIHW, conv{idx}/b}) consumed by metrics/vgg.py."""
    out = {}
    for key, val in sd.items():
        if key.startswith("features.") and key.endswith((".weight", ".bias")):
            idx = key.split(".")[1]
            suffix = "w" if key.endswith("weight") else "b"
            out[f"conv{idx}/{suffix}"] = np.asarray(val)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **out)
    return out_path


_I3D_STEM_UNITS = {
    "conv3d_1a_7x7": "Conv3d_1a_7x7",
    "conv3d_2b_1x1": "Conv3d_2b_1x1",
    "conv3d_2c_3x3": "Conv3d_2c_3x3",
    "conv3d_0c_1x1": "logits",
}


def _i3d_unit_name(torch_name):
    """torch module path -> metrics/i3d.py unit key.
    mixed_3b.branch_1.0 -> Mixed_3b.b1a ; mixed_3b.branch_0 -> Mixed_3b.b0"""
    if torch_name in _I3D_STEM_UNITS:
        return _I3D_STEM_UNITS[torch_name]
    parts = torch_name.split(".")
    blk = "Mixed_" + parts[0].split("_", 1)[1]
    branch = parts[1]  # branch_{0..3}
    bi = branch[-1]
    if branch in ("branch_0",):
        return f"{blk}.b0"
    if branch == "branch_3":
        return f"{blk}.b3"  # branch_3.0 is the pool; .1 is the conv
    sub = "a" if parts[2] == "0" else "b"
    return f"{blk}.b{bi}{sub}"


def convert_i3d(sd, out_path):
    """Reference i3d_kinetics_rgb.pth (PyTorch I3D, utils/metrics.py:999-1105)
    -> i3d_kinetics_rgb.npz with DHWIO weights and folded BN (tf-style
    eps=1e-3, utils/metrics.py:920), keyed by the unit names in
    metrics/i3d.py (validated by tests/test_reference_parity_i3d.py)."""
    # the torch I3D uses Unit3Dpy modules: {name}.conv3d.weight (O,I,D,H,W),
    # {name}.batch3d.{weight,bias,running_mean,running_var}
    out = {}
    names = {k.rsplit(".", 2)[0] for k in sd if k.endswith("conv3d.weight")}
    for name in names:
        w = np.transpose(np.asarray(sd[f"{name}.conv3d.weight"]), (2, 3, 4, 1, 0))
        if f"{name}.batch3d.weight" in sd:
            w, b = _fold_bn(
                w,
                np.asarray(sd[f"{name}.batch3d.weight"]),
                np.asarray(sd[f"{name}.batch3d.bias"]),
                np.asarray(sd[f"{name}.batch3d.running_mean"]),
                np.asarray(sd[f"{name}.batch3d.running_var"]),
            )
        else:
            b = np.asarray(sd.get(f"{name}.conv3d.bias", np.zeros(w.shape[-1], np.float32)))
        unit = _i3d_unit_name(name)
        out[f"{unit}.w"] = w
        out[f"{unit}.b"] = b
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **out)
    return out_path


# torchvision InceptionV3 branch-module names -> metrics/fid.py unit names
_INCEPTION_BRANCH_MAP = {
    "A": {"branch1x1": "b1x1.0", "branch5x5_1": "b5x5.0", "branch5x5_2": "b5x5.1",
          "branch3x3dbl_1": "b3x3dbl.0", "branch3x3dbl_2": "b3x3dbl.1",
          "branch3x3dbl_3": "b3x3dbl.2", "branch_pool": "bpool.0"},
    "B": {"branch3x3": "b3x3.0", "branch3x3dbl_1": "b3x3dbl.0",
          "branch3x3dbl_2": "b3x3dbl.1", "branch3x3dbl_3": "b3x3dbl.2"},
    "C": {"branch1x1": "b1x1.0", "branch7x7_1": "b7x7.0", "branch7x7_2": "b7x7.1",
          "branch7x7_3": "b7x7.2", "branch7x7dbl_1": "b7x7dbl.0",
          "branch7x7dbl_2": "b7x7dbl.1", "branch7x7dbl_3": "b7x7dbl.2",
          "branch7x7dbl_4": "b7x7dbl.3", "branch7x7dbl_5": "b7x7dbl.4",
          "branch_pool": "bpool.0"},
    "D": {"branch3x3_1": "b3x3.0", "branch3x3_2": "b3x3.1",
          "branch7x7x3_1": "b7x7x3.0", "branch7x7x3_2": "b7x7x3.1",
          "branch7x7x3_3": "b7x7x3.2", "branch7x7x3_4": "b7x7x3.3"},
    "E": {"branch1x1": "b1x1.0", "branch3x3_1": "b3x3_1.0",
          "branch3x3_2a": "b3x3_2a.0", "branch3x3_2b": "b3x3_2b.0",
          "branch3x3dbl_1": "b3x3dbl_1.0", "branch3x3dbl_2": "b3x3dbl_1.1",
          "branch3x3dbl_3a": "b3x3dbl_2a.0", "branch3x3dbl_3b": "b3x3dbl_2b.0",
          "branch_pool": "bpool.0"},
}


def convert_inception_v3(sd, out_path):
    """torchvision inception_v3 state_dict -> inception_v3_fid.npz keyed for
    metrics/fid.py (HWIO, BN eps=1e-3 folded).  BasicConv2d units are
    {name}.conv.weight + {name}.bn.{weight,bias,running_mean,running_var}."""
    from ipoke_tpu.metrics.fid import BLOCKS

    out = {}

    def unit(torch_name, out_name):
        w = conv2d_w(np.asarray(sd[f"{torch_name}.conv.weight"]))
        w, b = _fold_bn(
            w,
            np.asarray(sd[f"{torch_name}.bn.weight"]),
            np.asarray(sd[f"{torch_name}.bn.bias"]),
            np.asarray(sd[f"{torch_name}.bn.running_mean"]),
            np.asarray(sd[f"{torch_name}.bn.running_var"]),
        )
        out[f"{out_name}.w"] = w
        out[f"{out_name}.b"] = b

    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        unit(stem, stem)
    for bname, kind, _cin, _extra in BLOCKS:
        for torch_branch, mine in _INCEPTION_BRANCH_MAP[kind].items():
            unit(f"{bname}.{torch_branch}", f"{bname}.{mine}")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **out)
    return out_path


def convert_lpips_lins(sd, out_path):
    """pip `lpips` VGG state_dict -> lpips_vgg_lins.npz (lin{i}/w, the learned
    per-channel heads; keys lin{i}.model.1.weight with shape (1,C,1,1))."""
    out = {}
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                out[f"lin{i}/w"] = np.asarray(sd[key]).reshape(-1)
                break
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **out)
    return out_path


def convert_pose_resnet(sd, out_path, depth=152):
    """pose_resnet-152 state_dict (reference pose_estimator submodule) ->
    pose_resnet_152.npz keyed for metrics/pose.py (BN folded)."""
    out = {}

    def conv_bn(conv_key, bn_key, out_key, transpose=conv2d_w):
        w = transpose(np.asarray(sd[f"{conv_key}.weight"]))
        if f"{bn_key}.weight" in sd:
            w, b = _fold_bn(
                w,
                np.asarray(sd[f"{bn_key}.weight"]), np.asarray(sd[f"{bn_key}.bias"]),
                np.asarray(sd[f"{bn_key}.running_mean"]), np.asarray(sd[f"{bn_key}.running_var"]),
                eps=1e-5,
            )
        else:
            b = np.asarray(sd.get(f"{conv_key}.bias", np.zeros(w.shape[-1], np.float32)))
        out[f"{out_key}.w"] = w
        out[f"{out_key}.b"] = b

    conv_bn("conv1", "bn1", "stem")
    from ipoke_tpu.metrics.pose import BOTTLENECK_LAYERS

    for li, n_blocks in enumerate(BOTTLENECK_LAYERS[depth]):
        for bi in range(n_blocks):
            pre = f"layer{li+1}.{bi}"
            for ci in (1, 2, 3):
                conv_bn(f"{pre}.conv{ci}", f"{pre}.bn{ci}", f"{pre}.conv{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                conv_bn(f"{pre}.downsample.0", f"{pre}.downsample.1", f"{pre}.down")
    for di in range(3):
        conv_bn(f"deconv_layers.{di*3}", f"deconv_layers.{di*3+1}", f"deconv{di}",
                transpose=convT2d_w)
    out["head.w"] = conv2d_w(np.asarray(sd["final_layer.weight"]))
    out["head.b"] = np.asarray(sd.get("final_layer.bias", np.zeros(out["head.w"].shape[-1], np.float32)))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **out)
    return out_path
