"""First-stage experiment end-to-end dry run (tiny GAN training + validation
with SSIM/PSNR/LPIPS/FVD)."""
import os

import numpy as np
import pytest
import yaml

from ipoke_tpu.config import load_parameters


def test_first_stage_experiment_end_to_end(tmp_path):
    from ipoke_tpu.experiments import select_experiment

    with open("configs/first_stage.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg["general"]["debug"] = True
    cfg["data"].update({"batch_size": 2, "n_examples": 6, "max_frames": 4,
                        "spatial_size": [64, 64]})
    cfg["architecture"].update({"ENC_M_channels": [16, 16, 16, 16], "z_dim": 16,
                                "dec_channels": [16, 16, 16, 16], "n_gru_layers": 2})
    cfg["d_t"].update({"max_frames": 3})
    cfg["d_s"].update({"n_examples": 4})
    cfg["training"].update({"n_epochs": 1, "max_batches_per_epoch": 2, "max_val_batches": 1})
    cfg["logging"]["n_samples_fvd"] = 0  # skip I3D compile: validation still runs ssim/psnr/lpips
    cfg_path = os.path.join(tmp_path, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    base = os.path.join(tmp_path, "logs")
    config, dirs = load_parameters(cfg_path, "tiny_fs", base_dir=base)
    exp = select_experiment(config, dirs)
    state = exp.train()
    assert int(state.step) >= 2
    assert os.path.exists(os.path.join(exp.ckpt_dir, "last.npz"))
    # metrics were logged
    with open(os.path.join(dirs["log"], "metrics.jsonl")) as f:
        lines = f.read().strip().splitlines()
    assert lines
    import json

    last = json.loads(lines[-1])
    assert any(k.startswith("FVD") or "ssim" in k for k in last)
