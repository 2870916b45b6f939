"""End-to-end test of the quality-gate driver (ipoke_tpu/ckpt/quality_gate.py,
VERDICT r3 item 8): mount-detect -> convert_all -> self-checks -> FVD gate vs
"published" numbers, exercised on a fabricated reference-shaped tree with
synthetic published anchors so BOTH gate outcomes (pass and fail) are pinned
before real weights ever land."""
import json
import os
import sys

import pytest

REF = os.environ.get("IPOKE_REFERENCE", "/root/reference")
if not os.path.isdir(os.path.join(REF, "models")):
    pytest.skip("reference repo not mounted", allow_module_level=True)
pytest.importorskip("torch")
pytest.importorskip("yaml")
if REF not in sys.path:
    sys.path.insert(0, REF)

from ipoke_tpu.ckpt import quality_gate  # noqa: E402
from tests.test_convert_all import _cpu_patched, _fake_tree  # noqa: E402,F401


def test_mount_detect_absent(tmp_path, monkeypatch):
    monkeypatch.delenv("DATAPATH", raising=False)
    monkeypatch.setattr(quality_gate, "CANDIDATE_MOUNTS",
                        (str(tmp_path / "nope"),))
    report, rc = quality_gate.run(datapath=str(tmp_path / "also_nope"))
    assert rc == 0 and "no reference checkpoint tree" in report["status"]


def test_quality_gate_end_to_end(tmp_path, _cpu_patched):  # noqa: F811
    root = str(tmp_path / "datapath")
    os.makedirs(root)
    model = _fake_tree(root)

    # mount-detect via $DATAPATH (no --datapath flag)
    os.environ["DATAPATH"] = root
    try:
        assert quality_gate.detect_datapath(None) == root
    finally:
        del os.environ["DATAPATH"]
    assert quality_gate.detect_models(root) == [model]

    # 1) default honesty: unpretrained I3D + synthetic data => gate blocked
    rpt_path = str(tmp_path / "r1.json")
    rc = quality_gate.main([
        "--datapath", root, "--models", model, "--n-samples-fvd", "8",
        "--batch", "4", "--skip-backbones", "--report", rpt_path,
    ])
    rpt = json.load(open(rpt_path))
    assert rc == 0 and rpt["status"] == "pass"
    (gate,) = rpt["gates"]
    assert gate["fvd_key"] == "FVD_UNPRETRAINED"
    assert gate["gate"].startswith("blocked:")
    assert "unpretrained I3D" in gate["gate"]
    (conv,) = rpt["models"]
    assert conv["flow_roundtrip_ok"] and conv["sample_finite"]

    # 2) synthetic published anchor far above the random-filter score:
    #    with --allow-blocked-gates the <=2% logic computes and PASSES
    score = gate["fvd"]
    rc = quality_gate.main([
        "--datapath", root, "--models", model, "--n-samples-fvd", "8",
        "--batch", "4", "--skip-backbones", "--allow-blocked-gates",
        "--published", json.dumps({model: score * 1.5}),
        "--report", str(tmp_path / "r2.json"),
    ])
    rpt2 = json.load(open(str(tmp_path / "r2.json")))
    assert rc == 0 and rpt2["gates"][0]["gate"] == "pass"
    assert rpt2["gates"][0]["within_2pct"] is True
    assert "NOT a quality claim" in rpt2["gates"][0]["gate_note"]

    # 3) anchor far below the score: the gate FAILS and the exit code is 1
    rc = quality_gate.main([
        "--datapath", root, "--models", model, "--n-samples-fvd", "8",
        "--batch", "4", "--skip-backbones", "--allow-blocked-gates",
        "--published", json.dumps({model: score / 1000.0}),
        "--report", str(tmp_path / "r3.json"),
    ])
    rpt3 = json.load(open(str(tmp_path / "r3.json")))
    assert rc == 1 and rpt3["gates"][0]["gate"] == "fail"
    assert rpt3["status"] == "fail"
