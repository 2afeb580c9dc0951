"""End-to-end NON-rectified (fisheye-path) stereo SLAM on the synthetic
world: the right camera is rotated relative to the left, so the rectified
row-search matcher cannot be used — the descriptor-match + triangulate path
(Frame::ComputeStereoFishEyeMatches / KannalaBrandt8::TriangulateMatches
parity) must carry the whole pipeline."""

import copy

import numpy as np
import pytest

from orbslam3_byzyh_tpu.ops import lie
from orbslam3_byzyh_tpu.pipeline import system as base
from orbslam3_byzyh_tpu.pipeline.stereo_system import (FisheyeStereoConfig,
                                                       FisheyeStereoSlam)
from orbslam3_byzyh_tpu.utils import evaluate
from synth_world import SynthWorld

pytestmark = pytest.mark.slow  # full-pipeline tier (deselected by default, see pyproject)

BASELINE = 0.2
YAW = np.deg2rad(3.0)


@pytest.fixture(scope="module")
def fisheye_run():
    import jax.numpy as jnp

    world = SynthWorld(seed=13)
    R_d = np.asarray(lie.so3_exp(jnp.asarray([0.0, YAW, 0.0])),
                     np.float32)

    def render_pair(t):
        R, tt = world.pose(t)
        img_l = world.render(t)
        wr = copy.copy(world)
        t_r = (R_d @ (tt - np.array([BASELINE, 0, 0], np.float32)))
        wr.pose = lambda _t, Rr=(R_d @ R), tr=t_r: (Rr, tr)
        img_r = wr.render(t)
        return img_l, img_r

    cfg = FisheyeStereoConfig(
        kf_ref_min_obs=1,  # quantized world: dense-KF cadence
        
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        width=world.w, height=world.h,
        n_features=1024, max_kf=32, max_lm=4096, max_obs=8, fps=10,
        cam2=np.array([world.fx, world.fy, world.cx, world.cy], np.float32),
        R_rl=R_d, t_rl=(R_d @ np.array([-BASELINE, 0, 0], np.float32)),
        bf=BASELINE * world.fx, th_depth=35.0,
        min_init_depth_points=60, min_init_landmarks=40)
    slam = FisheyeStereoSlam(cfg)
    gt = {}
    for t in np.arange(0, 3.0, 0.1):
        img_l, img_r = render_pair(t)
        slam.track(img_l, img_r, float(t))
        gt[round(float(t), 3)] = world.pose(t)
    return slam, world, gt


class TestFisheyeStereoSlam:
    def test_initializes_and_tracks(self, fisheye_run):
        slam, _, _ = fisheye_run
        assert slam.status == base.OK
        assert slam.n_kf >= 1
        assert slam.n_lm > 50

    def test_metric_scale(self, fisheye_run):
        """Triangulated stereo depth fixes the scale without alignment."""
        slam, world, gt = fisheye_run
        stamps = np.array([s for s, _, _ in slam.trajectory])
        Rs = np.stack([R for _, R, _ in slam.trajectory])
        ts = np.stack([t for _, _, t in slam.trajectory])
        est_c = evaluate.camera_centers(Rs, ts)
        gt_stamps = np.array(sorted(gt.keys()))
        gt_c = np.stack([-gt[s][0].T @ gt[s][1] for s in gt_stamps])
        rmse, n = evaluate.ate_rmse(stamps, est_c, gt_stamps, gt_c,
                                    with_scale=False)
        assert n > 20
        assert rmse < 0.15, rmse
        est_len = np.linalg.norm(np.diff(est_c, axis=0), axis=-1).sum()
        idx = np.searchsorted(gt_stamps, stamps).clip(0, len(gt_stamps) - 1)
        gt_len = np.linalg.norm(np.diff(gt_c[idx], axis=0), axis=-1).sum()
        assert abs(est_len - gt_len) / gt_len < 0.08, (est_len, gt_len)
