"""End-to-end experiment pipeline tests on tiny synthetic data — the
equivalent of the reference's debug-mode dry run (experiment.py:40-45):
config -> experiment -> a few train steps -> validation -> test mode."""
import copy
import os

import numpy as np
import pytest
import yaml

from ipoke_tpu.config import load_parameters


def _tiny_second_stage_cfg(tmp_path):
    with open("configs/second_stage.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg["general"]["debug"] = True
    cfg["data"].update({"batch_size": 2, "n_examples": 8, "max_frames": 4, "spatial_size": [64, 64]})
    cfg["first_stage"]["spec"].update({"z_dim": 16, "ENC_M_channels": [16, 16, 16, 16],
                                       "dec_channels": [16, 16, 16, 16], "n_gru_layers": 2})
    cfg["conditioner"]["spec"]["nf_max"] = 16
    cfg["poke_embedder"]["spec"]["nf_max"] = 16
    cfg["architecture"].update({"num_steps": [1, 1], "factor": 16, "flow_mid_channels_factor": 2})
    cfg["training"].update({"n_epochs": 1, "max_batches_per_epoch": 3, "max_val_batches": 1,
                            "lr_scaling_max_it": 2, "min_acc_batch_size": 0})
    cfg["logging"]["n_fvd_samples"] = 4
    cfg["testing"].update({"n_samples_per_data_point": 2, "n_samples_vis": 2,
                           "n_samples_metrics": 4, "n_samples_fvd": 4,
                           "n_control_sensitivity_pokes": 2})
    path = os.path.join(tmp_path, "cfg.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def test_second_stage_experiment_end_to_end(tmp_path):
    from ipoke_tpu.experiments import select_experiment

    cfg_path = _tiny_second_stage_cfg(tmp_path)
    base = os.path.join(tmp_path, "logs")
    config, dirs = load_parameters(cfg_path, "tiny_test", base_dir=base)
    exp = select_experiment(config, dirs)
    state = exp.train()
    assert int(state.step) >= 3  # debug mode caps batches; loader yields 4
    # checkpoint was written during validation
    assert os.path.exists(os.path.join(exp.ckpt_dir, "last.npz"))
    # samples test mode produces mp4s/enrollments
    result = exp.test("samples")
    assert result["n_examples"] >= 1
    out_root = result["dir"]
    found = []
    for root, _, files in os.walk(out_root):
        found += [f for f in files if f.endswith((".mp4", ".npy", ".png"))]
    assert found, "no sample artifacts written"


def test_config_resume_prefers_saved(tmp_path):
    cfg_path = _tiny_second_stage_cfg(tmp_path)
    base = os.path.join(tmp_path, "logs")
    config, dirs = load_parameters(cfg_path, "resume_test", base_dir=base)
    # mutate the saved config, then reload with restart=True
    saved = os.path.join(dirs["config"], "config.yaml")
    with open(saved) as f:
        saved_cfg = yaml.safe_load(f)
    saved_cfg["training"]["lr"] = 123.0
    with open(saved, "w") as f:
        yaml.safe_dump(saved_cfg, f)
    config2, _ = load_parameters(cfg_path, "resume_test", base_dir=base, restart=True)
    assert config2["training"]["lr"] == 123.0
    # testing section always comes fresh from the CLI config
    assert config2["testing"]["n_samples_vis"] == 2


def test_interactive_resume_prompt(tmp_path, monkeypatch):
    """Reference main.py:39-53 parity: re-training an existing model name in
    an interactive session prompts y/n; y resumes with the SAVED config."""
    import io as _io

    cfg_path = _tiny_second_stage_cfg(tmp_path)
    # debug mode skips the prompt (reference main.py:39) — turn it off
    with open(cfg_path) as f:
        cli_cfg = yaml.safe_load(f)
    cli_cfg["general"]["debug"] = False
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cli_cfg, f)
    base = os.path.join(tmp_path, "logs")
    _, dirs = load_parameters(cfg_path, "prompt_test", base_dir=base)
    saved = os.path.join(dirs["config"], "config.yaml")
    with open(saved) as f:
        saved_cfg = yaml.safe_load(f)
    saved_cfg["training"]["lr"] = 321.0
    with open(saved, "w") as f:
        yaml.safe_dump(saved_cfg, f)

    class _TtyIn(_io.StringIO):
        def isatty(self):
            return True

    import sys as _sys

    monkeypatch.setattr(_sys, "stdin", _TtyIn("maybe\ny\n"))
    monkeypatch.setattr("builtins.input", lambda: _sys.stdin.readline().strip())
    cfg2, _ = load_parameters(cfg_path, "prompt_test", base_dir=base)
    assert cfg2["general"]["restart"] is True
    assert cfg2["training"]["lr"] == 321.0  # saved config won
    # answering n keeps the CLI config and overwrites the saved one
    monkeypatch.setattr(_sys, "stdin", _TtyIn("n\n"))
    cfg3, _ = load_parameters(cfg_path, "prompt_test", base_dir=base)
    assert cfg3["general"]["restart"] is False
    assert cfg3["training"]["lr"] != 321.0


def test_load_for_test_restores_trained_flow(tmp_path):
    import jax
    import numpy as np

    from ipoke_tpu.experiments import select_experiment

    cfg_path = _tiny_second_stage_cfg(tmp_path)
    base = os.path.join(tmp_path, "logs")
    config, dirs = load_parameters(cfg_path, "restore_test", base_dir=base)
    exp = select_experiment(config, dirs)
    state = exp.train()
    params = exp._load_for_test()
    trained = jax.tree_util.tree_leaves(state.params["flow"])
    loaded = jax.tree_util.tree_leaves(params["flow"])
    assert all(np.allclose(a, b) for a, b in zip(trained, loaded)), \
        "checkpointed flow params must be restored for testing"


def test_distill_experiment_end_to_end(tmp_path):
    """Distill pipeline: train a tiny second-stage teacher, distill a direct
    student from its checkpoint, then write teacher/student sample videos —
    full config -> experiment -> ckpt -> test chain (experiments/distill.py)."""
    from ipoke_tpu.experiments import select_experiment

    cfg_path = _tiny_second_stage_cfg(tmp_path)
    base = os.path.join(tmp_path, "logs")
    config, dirs = load_parameters(cfg_path, "distill_teacher", base_dir=base)
    select_experiment(config, dirs).train()  # teacher ckpts under second_stage/

    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg["general"]["experiment"] = "distill"
    cfg["distill"] = {"student": "direct", "hidden": 32, "depth": 2, "lr": 1e-3}
    dpath = os.path.join(tmp_path, "distill.yaml")
    with open(dpath, "w") as f:
        yaml.safe_dump(cfg, f)

    config, dirs = load_parameters(dpath, "distill_teacher", base_dir=base)
    exp = select_experiment(config, dirs)
    # the sibling second_stage tree must resolve as the teacher
    assert "second_stage" in exp._teacher_root()
    exp.train()
    best = os.listdir(exp.ckpt_dir)
    assert any(f.startswith("step=") for f in best), best

    result = exp.test("samples")
    names = [os.path.basename(p) for p in result["files"]]
    assert any("teacher" in n for n in names) and any("student" in n for n in names)
