"""End-to-end monocular-inertial SLAM on a synthetic sequence.

Covers the inertial pipeline (SURVEY §7.2 step 5): per-frame preintegration,
IMU initialization (gravity + metric scale recovery), inertial tracking with
IMU pose prediction, and the local/full visual-inertial BA schedule —
the reference's Tracking+LocalMapping inertial paths
(/root/reference/src/Tracking.cc:1811,1964; src/LocalMapping.cc:1516).
"""

import numpy as np
import pytest

from orbslam3_byzyh_tpu.pipeline.inertial_system import (ImuConfig,
                                                         MonoInertialSlam)
from orbslam3_byzyh_tpu.pipeline.system import SlamConfig
from orbslam3_byzyh_tpu.utils import evaluate
from synth_world import SynthWorld

pytestmark = pytest.mark.slow  # full-pipeline tier (deselected by default, see pyproject)


@pytest.fixture(scope="module")
def vi_run():
    world = SynthWorld(seed=3, motion="excited")
    cfg = SlamConfig(
        kf_ref_min_obs=1,  # quantized world: dense-KF cadence
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                     width=world.w, height=world.h,
                     n_features=1536, max_kf=64, max_lm=4096, max_obs=8,
                     fps=10, min_init_matches=60)
    imu_cfg = ImuConfig(T_bc=np.eye(4, dtype=np.float32))
    slam = MonoInertialSlam(cfg, imu_cfg, viba_window=12, viba_free=6,
                            viba_landmarks=1024, full_viba_kf=32)
    rng = np.random.default_rng(7)
    per_sample_gyro = imu_cfg.gyro_noise * np.sqrt(imu_cfg.freq)
    per_sample_acc = imu_cfg.acc_noise * np.sqrt(imu_cfg.freq)

    stamps = np.arange(0, 6.5, 0.1)  # 65 frames at 10 fps
    t_prev = None
    gt = {}
    for t in stamps:
        t = float(t)
        img = world.render(t)
        imu_data = (world.imu(t_prev, t, freq=imu_cfg.freq,
                              gyro_noise=per_sample_gyro,
                              acc_noise=per_sample_acc, rng=rng)
                    if t_prev is not None else None)
        slam.track(img, t, imu_data)
        gt[round(t, 3)] = world.trajectory(t)
        t_prev = t
    return slam, world, gt


class TestMonoInertial:
    def test_imu_initializes(self, vi_run):
        slam, _, _ = vi_run
        assert slam.imu_ready, "IMU initialization never ran"
        assert slam.viba_stage >= 2, "VIBA1 refinement never ran"

    def test_tracks_most_frames(self, vi_run):
        slam, _, _ = vi_run
        assert len(slam.trajectory) >= 50

    def test_metric_scale_recovered(self, vi_run):
        """After IMU init the map is metric: Horn alignment scale ~ 1."""
        slam, world, _ = vi_run
        stamps = np.array([s for s, _, _ in slam.trajectory])
        Rs = np.stack([R for _, R, _ in slam.trajectory])
        ts = np.stack([t for _, _, t in slam.trajectory])
        centers = evaluate.camera_centers(Rs, ts)
        # Only frames after IMU init are metric.
        post = stamps >= 3.0
        assert post.sum() >= 20
        gt_centers = np.stack([world.trajectory(float(t))[0]
                               for t in stamps[post]])
        s, R, _, rmse = evaluate.horn_align(centers[post], gt_centers,
                                            with_scale=True)
        assert abs(s - 1.0) < 0.25, f"scale error {s:.3f}"
        # ~3% of the 8 m synthetic trajectory at 10 fps mono-inertial.
        assert rmse < 0.30, f"post-init ATE {rmse:.3f} m"

    def test_gravity_aligned(self, vi_run):
        """Estimated world gravity must be -z (gravity-consistent frame)."""
        slam, world, _ = vi_run
        stamps = np.array([s for s, _, _ in slam.trajectory])
        Rs = np.stack([R for _, R, _ in slam.trajectory])
        ts = np.stack([t for _, _, t in slam.trajectory])
        centers = evaluate.camera_centers(Rs, ts)
        post = stamps >= 3.0
        gt_centers = np.stack([world.trajectory(float(t))[0]
                               for t in stamps[post]])
        _, R, _, _ = evaluate.horn_align(centers[post], gt_centers,
                                         with_scale=True)
        # R maps est-world to GT-world; both should share the gravity axis.
        z_err = np.degrees(np.arccos(np.clip(R[2, 2], -1, 1)))
        assert z_err < 10.0, f"gravity direction off by {z_err:.1f} deg"

    def test_no_single_frame_outlier(self, vi_run):
        """The saved trajectory must be free of one-frame pose spikes.

        Regression: the frame hosting the IMU-init keyframe used to be
        logged with its pre-rebase pose against the post-rebase reference
        cache (gravity/scale rebase runs between the pose solve and the
        log), leaving one meter-scale bogus pose in an otherwise smooth
        trajectory. KF-host frames now log ref=their own KF + identity."""
        slam, world, _ = vi_run
        stamps = np.array([s for s, _, _ in slam.trajectory])
        Rs = np.stack([R for _, R, _ in slam.trajectory])
        ts = np.stack([t for _, _, t in slam.trajectory])
        centers = evaluate.camera_centers(Rs, ts)
        gt_centers = np.stack([world.trajectory(float(t))[0]
                               for t in stamps])
        s, R, t, _ = evaluate.horn_align(centers, gt_centers,
                                         with_scale=True)
        err = np.linalg.norm(s * centers @ R.T + t - gt_centers, axis=-1)
        p90 = np.quantile(err, 0.90)
        assert err.max() < max(4.0 * p90, 0.15), (
            f"single-frame outlier: max {err.max():.3f} vs p90 {p90:.3f}")

    def test_velocity_estimate(self, vi_run):
        slam, world, _ = vi_run
        assert slam._body is not None
        t_last = slam.trajectory[-1][0]
        _, v_gt, _, _ = world.trajectory(float(t_last))
        v_est = np.asarray(slam._body[2])
        # Velocity is in the estimated world frame; compare magnitudes.
        assert abs(np.linalg.norm(v_est) - np.linalg.norm(v_gt)) < 0.3


class TestScaleRefinement:
    """Monocular ScaleRefinement (LocalMapping.cc:1846): a deliberately
    mis-scaled map must be pulled back toward metric by the scheduled
    scale+gravity re-fit."""

    def test_corrects_injected_scale_error(self, vi_run):
        slam, world, _ = vi_run
        assert slam.imu_ready
        kf_id = slam.last_kf_id
        # Inject a 10% scale error into the (metric) map, exactly the
        # drift ScaleRefinement exists to fix.
        s_err = 1.10
        kfs, lms = slam.state.kfs, slam.state.lms
        slam.state = slam.state._replace(
            kfs=kfs._replace(t=s_err * kfs.t),
            lms=lms._replace(pos=s_err * lms.pos,
                             min_dist=s_err * lms.min_dist,
                             max_dist=s_err * lms.max_dist))
        slam.kf_vel = s_err * slam.kf_vel

        slam._scale_refinement(kf_id)

        # The refinement solves the residual scale (IMU is metric truth):
        # keyframe translations must shrink back by ~1/s_err.
        t_new = np.asarray(slam.state.kfs.t[:slam.n_kf])
        t_old = s_err * np.asarray(kfs.t[:slam.n_kf])
        norms_old = np.linalg.norm(t_old, axis=-1)
        sel = norms_old > 0.1
        ratios = np.linalg.norm(t_new[sel], axis=-1) / norms_old[sel]
        med = np.median(ratios)
        assert abs(med - 1.0 / s_err) < 0.05, med


class TestForceCullValve:
    """Inertial capacity-overflow valve (_force_cull_keyframes): when the
    keyframe array fills, the most redundant mid-chain keyframes are culled
    with their preintegration re-merged across the gap (reference analog:
    LocalMapping::KeyFrameCulling under mbInertial, LocalMapping.cc:1269).
    Runs LAST in this module: it mutates the shared vi_run map."""

    def test_force_cull_frees_slots_and_keeps_chain(self, vi_run):
        slam, _, _ = vi_run
        before = int(np.asarray(slam.state.kfs.valid).sum())
        freed = slam._force_cull_keyframes(2)
        assert freed == 2, freed
        after = int(np.asarray(slam.state.kfs.valid).sum())
        assert after == before - 2
        # The temporal chain stays connected: walking kf_prev from the
        # newest keyframe still reaches the map's first keyframe, and every
        # chain hop has a merged preintegration covering the gap.
        ids = slam._chain(slam.last_kf_id)
        assert ids[0] == slam.map_first_kf
        valid = np.asarray(slam.state.kfs.valid)
        for k in ids:
            assert valid[k], k
        for k in ids[1:]:
            pre = slam.kf_preint[k]
            assert pre is not None
            prev = int(slam.kf_prev[k])
            dt_chain = float(slam.kf_stamp[k]) - float(slam.kf_stamp[prev])
            assert abs(float(np.asarray(pre.dT)) - dt_chain) < 1e-3
