"""Golden-trajectory regression gate (VERDICT r3 missing #9).

The reference ships demo trajectories as de-facto behaviour oracles
(/root/reference/f_dataset-Basler_mono_final_23.txt + kf_*.txt). The repo's
committed equivalents live in tests/golden/ (scripts/make_golden_fixtures.py,
frozen config). This module checks:

  * the OUTPUT FORMAT contract — TUM lines `stamp tx ty tz qx qy qz qw`
    with NANOSECOND stamps (what evaluate_ate_scale.py associates on,
    SURVEY Appendix A trajectory contract);
  * behaviour regression — a fresh run of the frozen config must stay
    within tolerance of the golden run's recorded metrics (floating-point
    nondeterminism across hosts rules out bitwise comparison; the golden
    ATE + structure counts are the contract).
"""

import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

pytestmark = pytest.mark.slow  # full-pipeline tier (deselected by default, see pyproject)


@pytest.fixture(scope="module")
def golden_meta():
    p = os.path.join(GOLDEN, "golden_mono.json")
    if not os.path.exists(p):
        pytest.skip("golden fixtures not generated "
                    "(scripts/make_golden_fixtures.py)")
    with open(p) as f:
        return json.load(f)


class TestGoldenFormat:
    """Format-contract checks run on the COMMITTED files (no SLAM run)."""

    def test_frame_file_format(self, golden_meta):
        data = np.loadtxt(os.path.join(GOLDEN, "f_golden_mono.txt"))
        assert data.shape[1] == 8                       # stamp + t + quat
        assert data.shape[0] == golden_meta["n_frames"]
        # Nanosecond stamps, strictly increasing.
        assert np.all(np.diff(data[:, 0]) > 0)
        assert data[-1, 0] >= 1e8                       # 4.4 s in ns
        # Unit quaternions.
        qn = np.linalg.norm(data[:, 4:8], axis=1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-4)

    def test_keyframe_file_format(self, golden_meta):
        data = np.loadtxt(os.path.join(GOLDEN, "kf_golden_mono.txt"))
        assert data.shape[1] == 8
        assert data.shape[0] == golden_meta["n_kf_live"]
        assert np.all(np.diff(data[:, 0]) > 0)

    def test_reference_eval_tool_can_score_it(self, golden_meta):
        """The golden file must be consumable by the repo's
        evaluate_ate_scale-compatible scorer (the reference's only
        correctness oracle, SURVEY §4)."""
        from orbslam3_byzyh_tpu.io import trajectory
        from orbslam3_byzyh_tpu.utils import evaluate
        from synth_world import SynthWorld
        stamps, centers, _ = trajectory.load_tum(
            os.path.join(GOLDEN, "f_golden_mono.txt"))
        world = SynthWorld(seed=3)
        gt_c = np.stack([
            -world.pose(s / 1e9)[0].T @ world.pose(s / 1e9)[1]
            for s in stamps])
        _, _, _, rmse = evaluate.horn_align(centers, gt_c, with_scale=True)
        assert rmse == pytest.approx(golden_meta["ate_scaled_rmse_m"],
                                     abs=2e-3)


class TestGoldenRegression:
    def test_frozen_config_stays_within_golden(self, golden_meta):
        """Re-run the frozen golden config; metrics must not regress."""
        from orbslam3_byzyh_tpu.pipeline.system import MonoSlam, SlamConfig
        from orbslam3_byzyh_tpu.utils import evaluate
        from synth_world import SynthWorld

        world = SynthWorld(seed=3)
        cfg = SlamConfig(
        kf_ref_min_obs=1,  # quantized world: dense-KF cadence
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                         width=world.w, height=world.h,
                         n_features=1536, max_kf=48, max_lm=4096, max_obs=8,
                         fps=10, min_init_matches=60)
        slam = MonoSlam(cfg)
        for t in np.arange(0, 4.5, 0.1):
            slam.track(world.render(t), float(t))
        traj = slam.trajectory
        assert len(traj) >= golden_meta["n_frames"] - 2
        stamps = [s for s, _, _ in traj]
        est_c = evaluate.camera_centers(
            np.stack([R for _, R, _ in traj]),
            np.stack([t for _, _, t in traj]))
        gt_c = np.stack([
            -world.pose(float(s))[0].T @ world.pose(float(s))[1]
            for s in stamps])
        _, _, _, rmse = evaluate.horn_align(est_c, gt_c, with_scale=True)
        # Gate: within 50% of the recorded golden ATE (+2 mm floor).
        gate = 1.5 * golden_meta["ate_scaled_rmse_m"] + 0.002
        assert rmse < gate, (rmse, golden_meta["ate_scaled_rmse_m"])
