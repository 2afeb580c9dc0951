"""End-to-end monocular SLAM on a rendered synthetic sequence (milestone M1)."""

import numpy as np
import pytest

from orbslam3_byzyh_tpu.pipeline.system import MonoSlam, SlamConfig, OK
from orbslam3_byzyh_tpu.utils import evaluate
from synth_world import SynthWorld


@pytest.fixture(scope="module")
def slam_run():
    world = SynthWorld(seed=3)
    cfg = SlamConfig(fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                     width=world.w, height=world.h,
                     n_features=1536, max_kf=48, max_lm=4096, max_obs=8, fps=10,
                     min_init_matches=60)
    slam = MonoSlam(cfg)
    stamps = np.arange(0, 4.5, 0.1)  # 45 frames at 10 fps
    gt = {}
    for t in stamps:
        img = world.render(t)
        slam.track(img, float(t))
        gt[round(float(t), 3)] = world.pose(t)
    return slam, world, gt


class TestEndToEndMono:
    def test_initializes(self, slam_run):
        slam, _, _ = slam_run
        assert slam.status == OK
        assert slam.n_kf >= 2
        assert slam.n_lm > 100

    def test_tracks_most_frames(self, slam_run):
        slam, _, _ = slam_run
        assert len(slam.trajectory) > 32

    def test_ate_under_threshold(self, slam_run):
        slam, world, gt = slam_run
        stamps = np.array([s for s, _, _ in slam.trajectory])
        Rs = np.stack([R for _, R, _ in slam.trajectory])
        ts = np.stack([t for _, _, t in slam.trajectory])
        est_c = evaluate.camera_centers(Rs, ts)
        gt_stamps = np.array(sorted(gt.keys()))
        gt_c = np.stack([
            -gt[s][0].T @ gt[s][1] for s in gt_stamps])
        rmse, n = evaluate.ate_rmse(stamps, est_c, gt_stamps, gt_c,
                                    with_scale=True)
        # Trajectory spans ~3.6 m; ATE gate ~4% of span.
        assert n > 30
        assert rmse < 0.15, rmse

    def test_map_landmarks_near_gt_points(self, slam_run):
        """Triangulated landmarks should lie close to real scene points
        after aligning the map to GT."""
        slam, world, gt = slam_run
        stamps = np.array([s for s, _, _ in slam.trajectory])
        Rs = np.stack([R for _, R, _ in slam.trajectory])
        ts = np.stack([t for _, _, t in slam.trajectory])
        est_c = evaluate.camera_centers(Rs, ts)
        gt_stamps = np.array(sorted(gt.keys()))
        gt_c = np.stack([-gt[s][0].T @ gt[s][1] for s in gt_stamps])
        # Use matched subsets for the alignment transform.
        idx = np.searchsorted(gt_stamps, stamps).clip(0, len(gt_stamps) - 1)
        s, R, t, _ = evaluate.horn_align(est_c, gt_c[idx])
        lms = slam.state.lms
        valid = np.asarray(lms.valid)
        pos = np.asarray(lms.pos)[valid]
        pos_aligned = s * pos @ R.T + t
        d = np.linalg.norm(
            pos_aligned[:, None, :] - world.pts[None, :, :], axis=-1).min(-1)
        assert np.median(d) < 0.3, np.median(d)
