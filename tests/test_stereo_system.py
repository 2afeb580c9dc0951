"""End-to-end stereo SLAM on the rendered synthetic world."""

import copy

import numpy as np
import pytest

from orbslam3_byzyh_tpu.pipeline import system as base
from orbslam3_byzyh_tpu.pipeline.stereo_system import StereoConfig, StereoSlam
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
def stereo_run():
    world = SynthWorld(seed=11)
    cfg = StereoConfig(
        kf_ref_min_obs=1,  # quantized world: dense-KF cadence
        
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        width=world.w, height=world.h,
        n_features=1024, max_kf=32, max_lm=4096, max_obs=8, fps=10,
        bf=BASELINE * world.fx, th_depth=35.0)
    slam = StereoSlam(cfg)
    gt = {}
    for t in np.arange(0, 3.0, 0.1):
        img_l, img_r = render_stereo(world, t)
        slam.track(img_l, img_r, float(t))
        gt[round(float(t), 3)] = world.pose(t)
    return slam, world, gt


class TestStereoSlam:
    def test_initializes_first_frame(self, stereo_run):
        slam, _, _ = stereo_run
        assert slam.status == base.OK
        assert slam.n_kf >= 1
        assert slam.n_lm > 100

    def test_metric_scale(self, stereo_run):
        """Stereo depth fixes the scale: trajectory length must match GT
        WITHOUT scale alignment (the monocular path can't do this)."""
        slam, world, gt = stereo_run
        stamps = np.array([s for s, _, _ in slam.trajectory])
        Rs = np.stack([R for _, R, _ in slam.trajectory])
        ts = np.stack([t for _, _, t in slam.trajectory])
        est_c = evaluate.camera_centers(Rs, ts)
        gt_stamps = np.array(sorted(gt.keys()))
        gt_c = np.stack([-gt[s][0].T @ gt[s][1] for s in gt_stamps])
        rmse, n = evaluate.ate_rmse(stamps, est_c, gt_stamps, gt_c,
                                    with_scale=False)
        assert n > 20
        assert rmse < 0.12, rmse
        # Path length within 5% of GT (metric!).
        est_len = np.linalg.norm(np.diff(est_c, axis=0), axis=-1).sum()
        idx = np.searchsorted(gt_stamps, stamps).clip(0, len(gt_stamps) - 1)
        gt_len = np.linalg.norm(np.diff(gt_c[idx], axis=0), axis=-1).sum()
        assert abs(est_len - gt_len) / gt_len < 0.05, (est_len, gt_len)
