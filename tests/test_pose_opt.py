"""Motion-only pose optimization tests on synthetic PnP problems."""

import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.ops import lie
from orbslam3_byzyh_tpu.solver import pose_opt

K_PARAMS = np.array([458.0, 457.0, 376.0, 240.0], np.float32)


def synth_pnp(rng, n=150, noise=0.5, outlier_frac=0.0):
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                  rng.uniform(4, 10, n)], -1).astype(np.float32)
    rvec = rng.uniform(-0.2, 0.2, 3).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(rvec)))
    t = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
    pc = X @ R.T + t
    fx, fy, cx, cy = K_PARAMS
    uv = np.stack([fx * pc[:, 0] / pc[:, 2] + cx,
                   fy * pc[:, 1] / pc[:, 2] + cy], -1)
    uv += rng.normal(0, noise, uv.shape)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    uv[out_idx] += rng.uniform(20, 100, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return X, uv.astype(np.float32), R, t, out_idx


def rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


class TestPoseOptimization:
    def test_converges_from_perturbed_start(self, rng):
        X, uv, R, t, _ = synth_pnp(rng, noise=0.5)
        # Perturb initial pose.
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.uniform(-0.05, 0.05, 3).astype(np.float32))))
        R0 = dR @ R
        t0 = t + rng.uniform(-0.1, 0.1, 3).astype(np.float32)
        res = pose_opt.pose_optimization(
            jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(len(X)), jnp.ones(len(X), bool), jnp.asarray(K_PARAMS))
        assert rot_err_deg(np.asarray(res.R), R) < 0.1
        assert np.linalg.norm(np.asarray(res.t) - t) < 0.01
        assert int(res.n_inliers) > 140

    def test_rejects_outliers(self, rng):
        X, uv, R, t, out_idx = synth_pnp(rng, noise=0.5, outlier_frac=0.3)
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.uniform(-0.03, 0.03, 3).astype(np.float32))))
        R0, t0 = dR @ R, t + rng.uniform(-0.05, 0.05, 3).astype(np.float32)
        res = pose_opt.pose_optimization(
            jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(len(X)), jnp.ones(len(X), bool), jnp.asarray(K_PARAMS))
        assert rot_err_deg(np.asarray(res.R), R) < 0.15
        assert np.linalg.norm(np.asarray(res.t) - t) < 0.02
        inl = np.asarray(res.inlier)
        # All injected outliers must be flagged out.
        assert not inl[out_idx].any()
        assert inl.sum() > 0.65 * len(X)

    def test_handles_invalid_padding(self, rng):
        X, uv, R, t, _ = synth_pnp(rng, n=100, noise=0.3)
        pad = 50
        Xp = np.concatenate([X, np.zeros((pad, 3), np.float32)])
        uvp = np.concatenate([uv, np.zeros((pad, 2), np.float32)])
        valid = np.concatenate([np.ones(100, bool), np.zeros(pad, bool)])
        res = pose_opt.pose_optimization(
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(Xp), jnp.asarray(uvp),
            jnp.ones(150), jnp.asarray(valid), jnp.asarray(K_PARAMS))
        assert rot_err_deg(np.asarray(res.R), R) < 0.1
        assert not np.asarray(res.inlier)[100:].any()

    def test_identity_start_large_error(self, rng):
        """Start far away (as after relocalization RANSAC): must still converge."""
        X, uv, R, t, _ = synth_pnp(rng, noise=0.3)
        res = pose_opt.pose_optimization(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(len(X)), jnp.ones(len(X), bool), jnp.asarray(K_PARAMS),
            n_rounds=4, n_iters=20)
        assert rot_err_deg(np.asarray(res.R), R) < 0.5
        assert np.linalg.norm(np.asarray(res.t) - t) < 0.05


class TestStereoPoseOpt:
    """Mixed mono/stereo-residual motion-only BA
    (EdgeStereoSE3ProjectXYZOnlyPose parity, chi2 gates 5.991/7.815)."""

    def _problem(self, rng, n=500, bf=40.0):
        from orbslam3_byzyh_tpu.ops import lie
        pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                        rng.uniform(4, 12, n)], -1).astype(np.float32)
        R_gt = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, 0.05, 3).astype(np.float32))))
        t_gt = np.array([0.2, -0.1, 0.3], np.float32)
        cam = jnp.asarray([420.0, 420.0, 320.0, 240.0])
        pc = pts @ R_gt.T + t_gt
        uv = np.stack([420 * pc[:, 0] / pc[:, 2] + 320,
                       420 * pc[:, 1] / pc[:, 2] + 240], -1)
        uv += rng.normal(0, 0.4, uv.shape)
        ur = uv[:, 0] - bf / pc[:, 2] + rng.normal(0, 0.4, n)
        # Half the rows are stereo, half mono.
        has = rng.uniform(size=n) < 0.5
        ur = np.where(has, ur, -1.0).astype(np.float32)
        return (jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(pts),
                jnp.asarray(uv.astype(np.float32)), jnp.asarray(ur),
                bf, cam)

    def test_recovers_pose_mixed(self, rng):
        from orbslam3_byzyh_tpu.ops import lie
        R_gt, t_gt, pts, uv, ur, bf, cam = self._problem(rng)
        n = pts.shape[0]
        R0 = lie.so3_exp(jnp.asarray([0.02, -0.015, 0.01])) @ R_gt
        t0 = t_gt + jnp.asarray([0.05, -0.04, 0.08])
        res = pose_opt.pose_optimization_stereo(
            R0, t0, pts, uv, ur, bf, jnp.ones(n), jnp.ones(n, bool), cam)
        ang = np.degrees(np.linalg.norm(np.asarray(
            lie.so3_log(res.R @ R_gt.T))))
        assert ang < 0.15, ang
        assert np.linalg.norm(np.asarray(res.t) - np.asarray(t_gt)) < 0.02
        assert int(res.n_inliers) > 0.9 * n

    def test_all_mono_matches_mono_solver(self, rng):
        from orbslam3_byzyh_tpu.ops import lie
        R_gt, t_gt, pts, uv, _, bf, cam = self._problem(rng)
        n = pts.shape[0]
        ur_none = jnp.full((n,), -1.0)
        R0 = lie.so3_exp(jnp.asarray([0.015, 0.01, -0.02])) @ R_gt
        t0 = t_gt + jnp.asarray([-0.04, 0.05, 0.06])
        res_s = pose_opt.pose_optimization_stereo(
            R0, t0, pts, uv, ur_none, bf, jnp.ones(n), jnp.ones(n, bool),
            cam)
        res_m = pose_opt.pose_optimization(
            R0, t0, pts, uv, jnp.ones(n), jnp.ones(n, bool), cam)
        np.testing.assert_allclose(np.asarray(res_s.R), np.asarray(res_m.R),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(res_s.t), np.asarray(res_m.t),
                                   atol=2e-3)

    def test_stereo_tightens_depth_axis(self, rng):
        """With few, near-collinear points, the z-translation is weakly
        observable monocularly; the u_r residual must tighten it."""
        from orbslam3_byzyh_tpu.ops import lie
        n, bf = 60, 40.0
        pts = np.stack([rng.uniform(-0.5, 0.5, n), rng.uniform(-0.4, 0.4, n),
                        rng.uniform(6, 8, n)], -1).astype(np.float32)
        R_gt = np.eye(3, dtype=np.float32)
        t_gt = np.zeros(3, np.float32)
        cam = jnp.asarray([420.0, 420.0, 320.0, 240.0])
        uv = np.stack([420 * pts[:, 0] / pts[:, 2] + 320,
                       420 * pts[:, 1] / pts[:, 2] + 240], -1)
        uv += rng.normal(0, 0.5, uv.shape)
        ur = (uv[:, 0] - bf / pts[:, 2]).astype(np.float32)
        t0 = jnp.asarray([0.0, 0.0, 0.4])      # push along the weak axis
        res_m = pose_opt.pose_optimization(
            jnp.eye(3), t0, jnp.asarray(pts),
            jnp.asarray(uv.astype(np.float32)),
            jnp.ones(n), jnp.ones(n, bool), cam)
        res_s = pose_opt.pose_optimization_stereo(
            jnp.eye(3), t0, jnp.asarray(pts),
            jnp.asarray(uv.astype(np.float32)), jnp.asarray(ur), bf,
            jnp.ones(n), jnp.ones(n, bool), cam)
        z_m = abs(float(res_m.t[2]))
        z_s = abs(float(res_s.t[2]))
        assert z_s < 0.05, z_s
        assert z_s <= z_m + 1e-3
