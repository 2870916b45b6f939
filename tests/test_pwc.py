"""PWC-lite learned flow estimator (VERDICT r1 item 6): must beat the
Horn-Schunck fallback on synthetic displacement fixtures (HS's documented
failure mode is large displacements), and its weights must round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.ops import pwc
from ipoke_tpu.ops.flow_ops import estimate_flow, warp_bilinear


def _epe(flow, gt):
    return float(jnp.mean(jnp.sqrt(jnp.sum((flow - gt) ** 2, axis=-1) + 1e-12)))


@pytest.fixture(scope="module")
def trained_params():
    return pwc.train_synthetic(jax.random.PRNGKey(0))


def _fixtures(key, b=6, size=64, disp=7.0):
    """Held-out displacement fixtures: textured images, mostly-global flows of
    ~disp pixels — large relative to the HS linearization range."""
    return pwc.synthetic_pair(key, b, size, size, max_disp=disp)


def test_pwc_beats_horn_schunck(trained_params):
    img1, img2, gt = _fixtures(jax.random.PRNGKey(999))
    flow_pwc = pwc.pwc_flow(trained_params, img1, img2)
    flow_hs = estimate_flow(img1, img2)
    epe_pwc, epe_hs = _epe(flow_pwc, gt), _epe(flow_hs, gt)
    # the learned net must clearly improve on the weight-free solver
    assert epe_pwc < 0.7 * epe_hs, f"pwc EPE {epe_pwc:.3f} vs hs {epe_hs:.3f}"
    # and be genuinely useful in absolute terms (< 25% of the displacement)
    assert epe_pwc < 2.0, f"pwc EPE too high: {epe_pwc:.3f}"


def test_pwc_epe_large_displacement(trained_params):
    """Regression guard at FlowNet2's working regime (large displacements,
    VERDICT r2 item 9): ground-truth EPE must stay under a fixed ceiling at
    ~12px motion, where HS collapses (its linearization range is ~1-2px).
    This pins flow-estimator quality for data-prep poke simulation."""
    img1, img2, gt = _fixtures(jax.random.PRNGKey(77), disp=12.0)
    epe_pwc = _epe(pwc.pwc_flow(trained_params, img1, img2), gt)
    epe_hs = _epe(estimate_flow(img1, img2), gt)
    # absolute ceiling: <40% of the mean displacement magnitude
    mean_mag = float(jnp.mean(jnp.sqrt(jnp.sum(gt**2, -1))))
    assert epe_pwc < 0.4 * mean_mag, (
        f"pwc EPE {epe_pwc:.2f} vs mean displacement {mean_mag:.2f} "
        f"(hs: {epe_hs:.2f})")
    assert epe_pwc < epe_hs, f"pwc {epe_pwc:.2f} must beat hs {epe_hs:.2f}"


def test_pwc_rotation_regime(trained_params):
    """Rotation regime (VERDICT r4 next-step 8): spatially-varying flow with
    radius-proportional displacement.  PWC must beat HS and stay useful in
    absolute terms."""
    img1, img2, gt = pwc.synthetic_pair_rotation(
        jax.random.PRNGKey(31), 6, 64, 64, max_deg=12.0)
    epe_pwc = _epe(pwc.pwc_flow(trained_params, img1, img2), gt)
    epe_hs = _epe(estimate_flow(img1, img2), gt)
    mean_mag = float(jnp.mean(jnp.sqrt(jnp.sum(gt**2, -1))))
    assert epe_pwc < epe_hs, f"pwc {epe_pwc:.2f} vs hs {epe_hs:.2f}"
    assert epe_pwc < 0.5 * mean_mag, (
        f"rotation EPE {epe_pwc:.2f} vs mean displacement {mean_mag:.2f}")


def test_pwc_layered_occlusion_regime(trained_params):
    """Layered/occlusion regime: a foreground blob translating over an
    opposing background — sharp flow discontinuity plus genuine occlusions.
    PWC must beat HS overall AND on the clean (non-occluded) region; the
    occlusion band is photometrically ill-posed, so it is only *documented*
    (eval_table / docs) — we assert the clean region stays accurate."""
    img1, img2, gt, occ = pwc.synthetic_pair_layered(
        jax.random.PRNGKey(57), 6, 64, 64, max_disp=8.0)
    flow_pwc = pwc.pwc_flow(trained_params, img1, img2)
    flow_hs = estimate_flow(img1, img2)

    def epe_masked(flow, mask):
        e = jnp.sqrt(jnp.sum((flow - gt) ** 2, -1) + 1e-12)
        return float(jnp.sum(e * mask) / jnp.maximum(jnp.sum(mask), 1.0))

    clean = 1.0 - occ.astype(jnp.float32)
    epe_pwc, epe_hs = _epe(flow_pwc, gt), _epe(flow_hs, gt)
    assert epe_pwc < epe_hs, f"pwc {epe_pwc:.2f} vs hs {epe_hs:.2f}"
    epe_pwc_clean = epe_masked(flow_pwc, clean)
    mean_mag = float(jnp.mean(jnp.sqrt(jnp.sum(gt**2, -1))))
    assert epe_pwc_clean < 0.5 * mean_mag, (
        f"clean-region EPE {epe_pwc_clean:.2f} vs mean disp {mean_mag:.2f}")


def test_pwc_photometric_consistency(trained_params):
    """Warping img2 by the predicted flow must reconstruct img1 much better
    than the identity (no-flow) baseline."""
    img1, img2, _ = _fixtures(jax.random.PRNGKey(123), disp=6.0)
    flow = pwc.pwc_flow(trained_params, img1, img2)
    err_flow = float(jnp.mean(jnp.abs(warp_bilinear(img2, flow) - img1)))
    err_zero = float(jnp.mean(jnp.abs(img2 - img1)))
    # photometric error keeps border/resampling residue even for good flow —
    # EPE (test above) is the primary accuracy gate
    assert err_flow < 0.65 * err_zero, f"{err_flow:.4f} vs identity {err_zero:.4f}"


def test_pwc_weights_roundtrip(trained_params, tmp_path):
    path = str(tmp_path / "pwc_lite.npz")
    pwc.save_params(trained_params, path)
    loaded = pwc.load_params(path)
    img1, img2, _ = _fixtures(jax.random.PRNGKey(5), b=2)
    a = pwc.pwc_flow(trained_params, img1, img2)
    b = pwc.pwc_flow(loaded, img1, img2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
