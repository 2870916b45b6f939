"""One-command real-weight onboarding (VERDICT r2 item 4).

``python -m ipoke_tpu.ckpt.convert_all --datapath <root>`` discovers the 8
released reference checkpoints in a DATAPATH tree laid out like the
reference's logs/ directory (models/pretrained_models.py:1-128 registry +
experiments/experiment.py:107-143 best_k_models.yaml discovery), converts

  * each second-stage Lightning ckpt (with its embedded frozen first stage /
    poke embedder / conditioner — nested ``first_stage_model.*`` etc.
    prefixes, gap-filled from the separately released sub-model ckpts), and
  * every metric backbone found (I3D, VGG16/19, LPIPS lins, pose_resnet-152,
    InceptionV3)

into this framework's npz trees, runs self-checks (schema round trip through
export_flow + a jitted forward_sample finiteness check), and optionally the
FVD gate per model vs the published fvd_reference (BASELINE.md).

Specs come from the tree's saved config (logs/second_stage/config/<model>/
config.yaml — the reference's saved-config-wins protocol) when present, else
from the registry's architecture description.

Everything is exercised by tests with synthetic reference-shaped state_dicts
(tests/test_convert_all.py), so when real weights land the only untested step
is file IO.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
from typing import Dict, Optional

import numpy as np

from ipoke_tpu import registry
from ipoke_tpu.ckpt import io, torch_import as ti

# exact released checkpoint filenames (reference models/pretrained_models.py)
SUB_CKPTS = {
    "poke_encoder": {
        "iper_128": "epoch=17-lpips-val=0.298.ckpt",
        "h36m_128": "epoch=19-lpips-val=0.109.ckpt",
        "plants_128": "epoch=79-lpips-val=0.301.ckpt",
        "iper_64": "epoch=16-lpips-val=0.172.ckpt",
        "taichi_128": "epoch=31-lpips-val=0.314.ckpt",
        "taichi_64": "epoch=14-lpips-val=0.229.ckpt",
        "plants_64": "epoch=60-lpips-val=0.183.ckpt",
        "h36m_64": "epoch=16-lpips-val=0.073.ckpt",
    },
    "first_stage": {
        "plants_128": "epoch=17-FVD-val=65.191.ckpt",
        "h36m_128": "epoch=13-FVD-val=109.079.ckpt",
        "taichi_128": "epoch=10-FVD-val=157.258.ckpt",
        "plants_64": "epoch=18-FVD-val=61.761.ckpt",
        "h36m_64": "epoch=18-FVD-val=108.995.ckpt",
        "iper_64": "epoch=28-FVD-val=67.734.ckpt",
        "taichi_64": "epoch=20-FVD-val=113.079.ckpt",
        "iper_128": "epoch=17-FVD-val=61.491.ckpt",
    },
    "img_encoder": {
        "plants_128": "epoch=71-lpips-val=0.051.ckpt",
        "iper_128": "epoch=12-lpips-val=0.026.ckpt",
        "h36m_128": "epoch=13-lpips-val=0.067.ckpt",
        "taichi_128": "epoch=25-lpips-val=0.110.ckpt",
        "taichi_64": "epoch=19-lpips-val=0.006.ckpt",
    },
}

# metric-backbone torch files searched for under the datapath (recursive by
# basename pattern) -> (converter, output npz name)
BACKBONES = [
    (r"i3d.*\.pth$|i3d.*\.pt$", "convert_i3d", "i3d_kinetics_rgb.npz"),
    (r"vgg16.*\.pth$", "convert_torchvision_vgg", "vgg16_features.npz"),
    (r"vgg19.*\.pth$", "convert_torchvision_vgg", "vgg19_features.npz"),
    (r"lpips.*\.pth$|.*lin.*lpips.*", "convert_lpips_lins", "lpips_vgg_lins.npz"),
    (r"pose_resnet.*\.pth$|pose.*152.*\.pth$", "convert_pose_resnet", "pose_resnet_152.npz"),
    (r"inception.*\.pth$", "convert_inception_v3", "inception_v3_fid.npz"),
]


def _best_ckpt(ckpt_dir: str) -> Optional[str]:
    """Reference protocol (experiments/experiment.py:107-143): best entry of
    best_k_models.yaml in the latest integer version dir, else last.ckpt,
    else any *.ckpt with the best parsed metric in its filename."""
    if not os.path.isdir(ckpt_dir):
        return None
    versions = sorted((d for d in os.listdir(ckpt_dir)
                       if d.isdigit() and os.path.isdir(os.path.join(ckpt_dir, d))),
                      key=int, reverse=True)
    for v in versions + ([""] if not versions else []):
        vdir = os.path.join(ckpt_dir, v)
        for bk_name in ("best_k_models.yaml", "best_k_models.json"):
            bk = os.path.join(vdir, bk_name)
            if os.path.exists(bk):
                try:
                    if bk.endswith(".json"):
                        entries = json.load(open(bk))
                    else:
                        import yaml

                        entries = yaml.safe_load(open(bk))
                    if entries:
                        best = min(entries, key=entries.get)
                        cand = io.datapath_rewrite(best)
                        if not os.path.isabs(cand):
                            cand = os.path.join(vdir, os.path.basename(cand))
                        if os.path.exists(cand):
                            return cand
                        cand = os.path.join(vdir, os.path.basename(best))
                        if os.path.exists(cand):
                            return cand
                except Exception:
                    pass
        last = os.path.join(vdir, "last.ckpt")
        if os.path.exists(last):
            return last
        cands = sorted(glob.glob(os.path.join(vdir, "*.ckpt")))
        if cands:
            # prefer smallest monitored metric parsed from the filename
            def metric_of(p):
                m = re.search(r"=(\d+(?:\.\d+)?)\.ckpt$", os.path.basename(p))
                return float(m.group(1)) if m else float("inf")

            return min(cands, key=metric_of)
    return None


def _spec_for(root: str, model: str):
    """Saved-config-wins spec (logs/second_stage/config/<model>/config.yaml),
    registry fallback."""
    cfg_path = os.path.join(root, "logs", "second_stage", "config", model, "config.yaml")
    if os.path.exists(cfg_path):
        import yaml

        from ipoke_tpu.experiments.second_stage import build_spec_from_config

        with open(cfg_path) as f:
            return build_spec_from_config(yaml.safe_load(f))
    return registry.build_specs(registry.MODELS[model])


def _load_sub(root: str, kind: str, model: str) -> Optional[Dict[str, np.ndarray]]:
    name = SUB_CKPTS.get(kind, {}).get(model)
    cdir = os.path.join(root, "logs", kind, "ckpt", model)
    path = os.path.join(cdir, "0", name) if name else None
    if not path or not os.path.exists(path):
        path = _best_ckpt(cdir)
    if path and os.path.exists(path):
        return ti.load_lightning_ckpt(path)
    return None


def convert_model(root: str, model: str, out_root: str, verify: bool = True):
    """Convert one released second-stage model (+ embedded towers) and write
    the npz tree + best_k_models.json mirror to the out tree."""
    spec = _spec_for(root, model)
    ss_path = _best_ckpt(os.path.join(root, "logs", "second_stage", "ckpt", model))
    if ss_path is None:
        return {"model": model, "status": "missing", "searched": os.path.join(
            root, "logs", "second_stage", "ckpt", model)}
    sd = ti.load_lightning_ckpt(ss_path)
    params = ti.convert_second_stage(
        sd, spec,
        first_stage_sd=_load_sub(root, "first_stage", model),
        poke_sd=_load_sub(root, "poke_encoder", model),
        cond_sd=_load_sub(root, "img_encoder", model),
    )
    result = {"model": model, "status": "converted", "source": ss_path}
    if verify:
        result.update(_self_check(params, spec))
    out_dir = os.path.join(out_root, "logs", "second_stage", "ckpt", model, "0")
    out_path = os.path.join(out_dir, "converted-from-torch.npz")
    io.save(out_path, params, metadata={"source": ss_path, "model": model})
    with open(os.path.join(out_dir, "best_k_models.json"), "w") as f:
        json.dump({out_path: 0.0}, f)
    result["out"] = out_path
    return result


def _self_check(params, spec):
    """Cheap post-conversion invariants: flow schema round trip through
    export_flow -> convert_flow (catches key-mapping drift) and a finite
    jitted sample on tiny batch (catches shape/assembly errors)."""
    import jax
    import jax.numpy as jnp

    from ipoke_tpu.models import second_stage as model_ss

    checks = {}
    sd2 = ti.export_flow(params["flow"], spec.flow)
    flow2 = ti.convert_flow(sd2, spec.flow)
    flat1 = {k: v for k, v in _flat(params["flow"])}
    flat2 = dict(_flat(flow2))
    max_err = max(
        float(np.max(np.abs(np.asarray(flat1[k]) - np.asarray(flat2[k]))))
        for k in flat1
    )
    checks["flow_roundtrip_max_err"] = max_err
    checks["flow_roundtrip_ok"] = bool(max_err < 1e-5)
    s = spec.first_stage.spatial_size
    batch = {
        "images": jnp.zeros((1, spec.first_stage.max_frames, s, s, 3), jnp.float32),
        "poke": jnp.zeros((1, s, s, 2), jnp.float32),
    }
    vid = jax.jit(
        lambda p, b: model_ss.forward_sample(p, spec, b, jax.random.PRNGKey(0))
    )(params, batch)
    checks["sample_finite"] = bool(np.isfinite(np.asarray(vid)).all())
    return checks


def _flat(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat(v, f"{prefix}/{k}")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flat(v, f"{prefix}/{i}")
    else:
        yield prefix, tree


def convert_backbones(root: str, weights_out: str):
    """Find + convert every metric backbone torch file under the datapath."""
    results = {}
    all_files = [p for p in glob.glob(os.path.join(root, "**", "*"), recursive=True)
                 if os.path.isfile(p)]
    for pattern, conv_name, out_name in BACKBONES:
        rx = re.compile(pattern, re.IGNORECASE)
        matches = [p for p in all_files if rx.search(os.path.basename(p))]
        if not matches:
            results[out_name] = {"status": "missing", "pattern": pattern}
            continue
        src = matches[0]
        try:
            import torch

            raw = torch.load(src, map_location="cpu", weights_only=False)
            sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
            sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
                  for k, v in sd.items()}
            out_path = os.path.join(weights_out, out_name)
            getattr(ti, conv_name)(sd, out_path)
            results[out_name] = {"status": "converted", "source": src}
        except Exception as e:
            results[out_name] = {"status": f"error: {e}", "source": src}
    return results


def fvd_gate(model: str, config: dict, datamod, dirs, params=None, spec=None):
    """Run the FVD eval for a converted model and compare against the
    published reference number (BASELINE.md): pass = within 2%."""
    from ipoke_tpu.eval import test_modes

    entry = registry.MODELS[model]
    out = test_modes.run_fvd(params, spec, config, datamod, dirs)
    score = out.get("FVD", out.get("FVD_UNPRETRAINED"))
    gate = None
    if entry.fvd_reference and "FVD" in out:
        gate = bool(score <= entry.fvd_reference * 1.02)
    return {"model": model, "fvd": score, "fvd_reference": entry.fvd_reference,
            "within_2pct": gate, "pretrained_i3d": out.get("i3d_pretrained")}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--datapath", required=True, help="root of the reference logs/ tree")
    ap.add_argument("--out", default=None,
                    help="output root for converted model trees (default: datapath)")
    ap.add_argument("--weights-out", default=None,
                    help="metric-backbone npz dir (default: $IPOKE_WEIGHTS or logs/weights)")
    ap.add_argument("--models", default=None,
                    help="comma-separated subset (default: all 8 released)")
    ap.add_argument("--skip-backbones", action="store_true")
    ap.add_argument("--no-verify", action="store_true")
    args = ap.parse_args(argv)

    root = args.datapath
    out_root = args.out or root
    weights_out = args.weights_out or os.environ.get(
        "IPOKE_WEIGHTS", os.path.join("logs", "weights"))
    models = args.models.split(",") if args.models else list(registry.MODELS)
    report = {"models": [], "backbones": {}}
    for m in models:
        res = convert_model(root, m, out_root, verify=not args.no_verify)
        report["models"].append(res)
        print(json.dumps(res, default=str))
    if not args.skip_backbones:
        report["backbones"] = convert_backbones(root, weights_out)
        print(json.dumps(report["backbones"], default=str))
    rpt_path = os.path.join(out_root, "convert_all_report.json")
    os.makedirs(out_root, exist_ok=True)
    with open(rpt_path, "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(f"report: {rpt_path}")
    return report


if __name__ == "__main__":
    main()
