"""Direct tests of the --test mode implementations on a tiny synthetic model."""
import os

import jax
import pytest

from ipoke_tpu.data.datamodule import StaticDataModule
from ipoke_tpu.eval import test_modes
from ipoke_tpu.flows.macow import FlowSpec
from ipoke_tpu.models import second_stage
from ipoke_tpu.models.encoders import WrapperSpec
from ipoke_tpu.models.first_stage import FirstStageSpec
from ipoke_tpu.models.second_stage import SecondStageSpec


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    fs = FirstStageSpec(
        z_dim=16, spatial_size=64, max_frames=4,
        enc_channels=(16, 16, 16, 16), dec_channels=(16, 16, 16, 16),
        n_gru_layers=2, min_spatial_size=8, motion_bias=True, full_sequence=True,
    )
    poke = WrapperSpec(nf_in=2, nf_max=16, spatial_size=64, min_spatial_size=8, deterministic=True)
    cond = WrapperSpec(nf_in=3, nf_max=16, spatial_size=64, min_spatial_size=8, deterministic=False)
    flow = FlowSpec(num_steps=(1, 1), in_channels=16, hidden_channels=32, h_channels=32, factor=16)
    spec = SecondStageSpec(flow=flow, first_stage=fs, poke_embedder=poke, conditioner=cond)
    params = second_stage.init(jax.random.PRNGKey(0), spec)
    datamod = StaticDataModule({
        "dataset": "SyntheticDataset", "spatial_size": [64, 64], "max_frames": 4,
        "batch_size": 2, "n_examples": 4, "poke_size": 5, "n_pokes": 2,
    })
    config = {
        "testing": {"n_samples_per_data_point": 2, "n_samples_fvd": 4,
                    "n_samples_metrics": 4, "n_samples_vis": 2, "seed": 0,
                    "test_batch_size": 2, "n_control_sensitivity_pokes": 2},
        "data": {"n_pokes": 2},
    }
    root = tmp_path_factory.mktemp("gen")
    dirs = {"generated": str(root), "log": str(root)}
    return params, spec, config, datamod, dirs


def test_run_fvd(setup):
    params, spec, config, datamod, dirs = setup
    out = test_modes.run_fvd(params, spec, config, datamod, dirs)
    # random-filter I3D in this env -> the score KEY itself is marked, so an
    # un-pretrained number can never be quoted as a real FVD (VERDICT r2 #10)
    assert "FVD_UNPRETRAINED" in out and "FVD" not in out
    assert out["n"] == 4
    assert out["i3d_pretrained"] is False
    # small run -> auto npy dump for reference artifact parity
    assert os.path.exists(os.path.join(dirs["generated"], "samples_fvd", "fake_samples.npy"))


def test_run_diversity(setup):
    params, spec, config, datamod, dirs = setup
    out = test_modes.run_diversity(params, spec, config, datamod, dirs)
    assert out["div_mse"] > 0


def test_run_control_sensitivity(setup):
    import glob

    params, spec, config, datamod, dirs = setup
    out = test_modes.run_control_sensitivity(params, spec, config, datamod, dirs)
    assert len(out["per_direction_response"]) == 2
    assert out["mean_response"] >= 0
    # reference artifact layout (second_stage_video.py:858-886):
    # poke_dir_samples_best_fvd/sid_<id>/<ts>/{overview,samples_all,
    # groundtruth,sample_i}.mp4 + enrollments
    assert out["n_artifact_examples"] >= 1
    sid_dirs = glob.glob(os.path.join(out["artifact_dir"], "sid_*", "*"))
    assert sid_dirs, out["artifact_dir"]
    files = {os.path.basename(p).split(".")[0] for p in glob.glob(os.path.join(sid_dirs[0], "*"))}
    assert {"overview", "samples_all", "groundtruth", "groundtruth_enrollment",
            "sample_1", "sample_1_enrollment"} <= files
    # sample 1 = original poke, samples 2..k+1 = random directions
    assert "sample_3" in files  # k=2 -> 1 original + 2 random


def test_run_transfer(setup):
    params, spec, config, datamod, dirs = setup
    out = test_modes.run_transfer(params, spec, config, datamod, dirs)
    assert out["n"] >= 2  # loops the test set up to n_samples_metrics
    assert os.path.isdir(out["dir"])
    assert "motion_energy_correlation" in out


def test_run_accuracy(setup):
    params, spec, config, datamod, dirs = setup
    out = test_modes.run_accuracy(params, spec, config, datamod, dirs)
    # LPIPS lins + VGG are random in this env -> keys marked UNPRETRAINED
    assert len(out["LPIPS_UNPRETRAINED_per_frame"]) == 3
    # KPS protocol runs even on the random pose backbone (VERDICT r2 #6)
    assert "KPS_UNPRETRAINED" in out
    assert len(out["KPS_UNPRETRAINED_per_frame"]) == 3
    assert out["KPS_UNPRETRAINED"] >= 0
    assert os.path.exists(os.path.join(dirs["generated"], "metrics", "accuracy.csv"))


def test_run_kps_acc_gated(setup):
    params, spec, config, datamod, dirs = setup
    out = test_modes.run_kps_acc(params, spec, config, datamod, dirs)
    assert "pixel_epe_proxy_last_frame" in out or "KPS_mse" in out
    if "n_examples" in out:
        assert out["n_examples"] >= 2


def test_run_accuracy_per_n_pokes(setup):
    params, spec, config, datamod, dirs = setup
    cfg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in config.items()}
    cfg.setdefault("testing", {})["summarize_n_pokes"] = True
    cfg["data"]["n_pokes"] = 2
    out = test_modes.run_accuracy(params, spec, cfg, datamod, dirs)
    assert set(out.keys()) >= {1, 2}
    assert "LPIPS_UNPRETRAINED" in out[1]
