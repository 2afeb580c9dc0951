"""End-to-end stereo-inertial SLAM on the rendered synthetic world
(the reference's flagship configuration, BASELINE config 3)."""

import copy

import numpy as np
import pytest

from orbslam3_byzyh_tpu.pipeline.inertial_system import ImuConfig
from orbslam3_byzyh_tpu.pipeline.stereo_inertial import StereoInertialSlam
from orbslam3_byzyh_tpu.pipeline.stereo_system import StereoConfig
from orbslam3_byzyh_tpu.utils import evaluate
from synth_world import SynthWorld

pytestmark = pytest.mark.slow  # full-pipeline tier (deselected by default, see pyproject)

BASELINE = 0.2


def render_stereo(world, t):
    R, tt = world.pose(t)
    img_l = world.render(t)
    wr = copy.copy(world)
    wr.pose = lambda _t, R=R, tt=tt: (R, tt - np.array(
        [BASELINE, 0, 0], np.float32))
    img_r = wr.render(t)
    return img_l, img_r


@pytest.fixture(scope="module")
def svi_run():
    world = SynthWorld(seed=11, motion="excited")
    cfg = StereoConfig(
        kf_ref_min_obs=1,  # quantized world: dense-KF cadence
        
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        width=world.w, height=world.h,
        n_features=1024, max_kf=48, max_lm=4096, max_obs=8, fps=10,
        bf=BASELINE * world.fx, th_depth=35.0)
    imu_cfg = ImuConfig(T_bc=np.eye(4, dtype=np.float32))
    slam = StereoInertialSlam(cfg, imu_cfg, viba_window=12, viba_free=6,
                              viba_landmarks=1024, full_viba_kf=32)
    rng = np.random.default_rng(5)
    gn = imu_cfg.gyro_noise * np.sqrt(imu_cfg.freq)
    an = imu_cfg.acc_noise * np.sqrt(imu_cfg.freq)
    t_prev = None
    for t in np.arange(0, 4.0, 0.1):
        t = float(t)
        img_l, img_r = render_stereo(world, t)
        imu_data = (world.imu(t_prev, t, freq=imu_cfg.freq, gyro_noise=gn,
                              acc_noise=an, rng=rng)
                    if t_prev is not None else None)
        slam.track(img_l, img_r, t, imu_data)
        t_prev = t
    return slam, world


class TestStereoInertial:
    def test_imu_initializes(self, svi_run):
        slam, _ = svi_run
        assert slam.imu_ready

    def test_tracks_and_stays_metric(self, svi_run):
        """Stereo depth + IMU: trajectory must match GT without any scale
        alignment, and the IMU init must not break the metric scale."""
        slam, world = svi_run
        assert len(slam.trajectory) >= 35
        stamps = np.array([s for s, _, _ in slam.trajectory])
        Rs = np.stack([R for _, R, _ in slam.trajectory])
        ts = np.stack([t for _, _, t in slam.trajectory])
        est_c = evaluate.camera_centers(Rs, ts)
        gt_c = np.stack([world.trajectory(float(t))[0] for t in stamps])
        s, _, _, rmse = evaluate.horn_align(est_c, gt_c, with_scale=False)
        assert rmse < 0.15, f"stereo-inertial ATE {rmse:.3f} m"

    def test_velocity_magnitude(self, svi_run):
        slam, world = svi_run
        assert slam._body is not None
        t_last = slam.trajectory[-1][0]
        _, v_gt, _, _ = world.trajectory(float(t_last))
        v_est = np.asarray(slam._body[2])
        assert abs(np.linalg.norm(v_est) - np.linalg.norm(v_gt)) < 0.3
