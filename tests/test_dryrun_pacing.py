"""Dryrun pacing: on a slow host (simulated via a zero budget) every
correctness ok line must still land (VERDICT r4 next-step 1).

The r4 driver artifact went rc=124 because the full-flagship-graph compile ran
FIRST and ate the whole window; the evidence legs (toy train, toy FSDP,
seqpar, sharded sampling) are now unbudgeted and run before any budgeted
upgrade attempt, so a degraded host degrades only the upgrades.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_zero_budget_still_lands_all_ok_lines():
    env = dict(os.environ)
    # zero budget: every full-graph upgrade must be skipped instantly; the
    # evidence legs are unbudgeted and must all print their ok lines
    env["IPOKE_DRYRUN_BUDGET_S"] = "0"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        capture_output=True, text=True, cwd=REPO, timeout=2400, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "dryrun_multichip(2): ok," in out.stdout, out.stdout
    assert "fsdp ok" in out.stdout, out.stdout
    assert "seqpar ok" in out.stdout, out.stdout
    assert "sample ok" in out.stdout, out.stdout
    # and the budget guard actually fired (no silent full-graph attempt)
    assert "skipped (budget spent" in out.stderr, out.stderr[-3000:]


def test_cache_purge_on_host_change(tmp_path):
    from ipoke_tpu.utils import cache

    d = tmp_path / "jc"
    d.mkdir()
    (d / "some_entry").write_bytes(b"aot blob")
    # entries with no marker: provenance unknown -> purge
    assert cache.purge_if_host_changed(str(d)) is True
    assert not (d / "some_entry").exists()
    # marker now matches this host -> entries survive
    (d / "entry2").write_bytes(b"blob")
    assert cache.purge_if_host_changed(str(d)) is False
    assert (d / "entry2").exists()
    # foreign marker -> purge again
    (d / "HOST_KEY").write_text("deadbeefdeadbeef")
    assert cache.purge_if_host_changed(str(d)) is True
    assert not (d / "entry2").exists()
