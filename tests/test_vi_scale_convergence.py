"""Mono-inertial scale convergence at the reference's horizon (VERDICT r4
task 9).

The reference claims monocular-inertial scale converges to ~1% error within
10-15 s of initialization (/root/reference/Changelog.md:45; the VIBA1/VIBA2
InitializeIMU re-runs at mTinit>5 / >15 s, LocalMapping.cc:274-290). This
drives 17 s of the tour world (continuously-new territory, so the map can't
re-anchor to old structure) through the full init -> VIBA1 -> VIBA2
schedule and gates:

  * post-VIBA2 Horn scale error <= 5 %  (reference curve: <5 % after 2 s,
    ~1 % after 10 s; measured here: ~0.7-1.5 %)
  * scale-aligned ATE <= 0.05 m over the whole drive
  * metric (unaligned) ATE <= 0.10 m — the map really is metric

Compute cost: ~170 frames + 2 full inertial BAs (slow tier).
"""

import numpy as np
import pytest

from orbslam3_byzyh_tpu.pipeline.inertial_system import (ImuConfig,
                                                         MonoInertialSlam)
from orbslam3_byzyh_tpu.pipeline.system import SlamConfig
from orbslam3_byzyh_tpu.utils import evaluate
from synth_world import SynthWorld

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tour_run():
    world = SynthWorld(seed=17, motion="tour", subpix=True)
    world.loop_period = 60.0
    cfg = SlamConfig(
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        width=world.w, height=world.h,
        n_features=1536, max_kf=128, max_lm=16384, max_obs=8,
        fps=10, min_init_matches=60)
    imu_cfg = ImuConfig(T_bc=np.eye(4, dtype=np.float32))
    slam = MonoInertialSlam(cfg, imu_cfg, viba_window=12, viba_free=6,
                            viba_landmarks=1024, full_viba_kf=32)
    rng = np.random.default_rng(7)
    psg = imu_cfg.gyro_noise * np.sqrt(imu_cfg.freq)
    psa = imu_cfg.acc_noise * np.sqrt(imu_cfg.freq)
    t_prev, gt = None, {}
    for t in np.arange(0, 17.0, 0.1):
        t = float(t)
        img = world.render(t)
        imu_data = (world.imu(t_prev, t, freq=imu_cfg.freq,
                              gyro_noise=psg, acc_noise=psa, rng=rng)
                    if t_prev is not None else None)
        slam.track(img, t, imu_data)
        gt[round(t, 3)] = world.trajectory(t)[0]
        t_prev = t
    return slam, gt


def _aligned(slam, gt):
    ts, est, ref = [], [], []
    for (t, R, tr) in slam.trajectory:
        k = round(float(t), 3)
        if k in gt:
            ts.append(k)
            est.append(-np.asarray(R).T @ np.asarray(tr))
            ref.append(gt[k])
    return np.array(ts), np.array(est), np.array(ref)


class TestScaleConvergence:
    def test_full_viba_schedule_ran(self, tour_run):
        slam, _ = tour_run
        assert slam.imu_ready
        assert slam.viba_stage >= 3, "VIBA2 (span>15s) never ran"

    def test_tracks_whole_drive(self, tour_run):
        slam, _ = tour_run
        assert len(slam.trajectory) >= 160

    def test_post_viba2_scale_error_under_5pct(self, tour_run):
        slam, gt = tour_run
        ts, est, ref = _aligned(slam, gt)
        s, _, _, _ = evaluate.horn_align(est, ref, True)
        assert abs(s - 1.0) <= 0.05, f"scale error {abs(s-1)*100:.1f}%"

    def test_scale_aligned_ate(self, tour_run):
        slam, gt = tour_run
        ts, est, ref = _aligned(slam, gt)
        rmse_s, n = evaluate.ate_rmse(ts, est, ts, ref, with_scale=True)
        assert n >= 150
        assert rmse_s <= 0.05, rmse_s

    def test_metric_ate(self, tour_run):
        slam, gt = tour_run
        ts, est, ref = _aligned(slam, gt)
        rmse_m, _ = evaluate.ate_rmse(ts, est, ts, ref, with_scale=False)
        assert rmse_m <= 0.10, rmse_m
