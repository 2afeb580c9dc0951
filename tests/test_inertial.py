"""Inertial optimizer tests: residual correctness, scale/gravity/bias init."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.ops import imu, lie
from orbslam3_byzyh_tpu.solver import inertial
from test_imu import NOISE, WALK


def make_kf_chain(n_kf=11, seg_steps=100, rate=200.0, seed=1,
                  bg_true=None, ba_true=None, noise_cov=None, walk_cov=None):
    """Synthetic KF chain whose GT states are defined BY the integrator.

    Analytic acc/gyro signals are rolled through the same Euler scheme the
    preintegration uses (imu.predict_state chaining), so ground truth is
    exactly consistent with the measurement model — no discretization bias
    leaking into the (IMU-observable) scale direction.
    """
    rng = np.random.default_rng(seed)
    n_steps = (n_kf - 1) * seg_steps
    dt = 1.0 / rate
    ts = (np.arange(n_steps) + 0.5) * dt
    amp_a = rng.uniform(0.5, 2.0, 3)
    freq_a = rng.uniform(0.3, 1.0, 3)
    phase_a = rng.uniform(0, 2 * np.pi, 3)
    amp_w = rng.uniform(0.2, 0.6, 3)
    freq_w = rng.uniform(0.2, 0.8, 3)

    # True body-frame specific force (without gravity compensation yet) and
    # angular rate as smooth signals.
    gyr_true = (amp_w[None, :] *
                np.sin(2 * np.pi * freq_w[None, :] * ts[:, None])
                ).astype(np.float32)
    acc_lin = (amp_a[None, :] *
               np.sin(2 * np.pi * freq_a[None, :] * ts[:, None] + phase_a)
               ).astype(np.float32)

    # Roll rotations forward (Euler, like the integrator) to get R at each
    # step, then add the gravity reaction in body frame: f_b = a_b - R^T g.
    g = np.array([0.0, 0.0, -imu.GRAVITY], np.float32)
    R = np.eye(3, dtype=np.float32)
    acc_meas = np.empty_like(acc_lin)
    Rs_step = []
    for i in range(n_steps):
        Rs_step.append(R)
        acc_meas[i] = acc_lin[i] - R.T @ g
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(gyr_true[i] * dt)))
    acc = acc_meas.copy()
    gyr = gyr_true.copy()
    if bg_true is not None:
        gyr = gyr + bg_true
    if ba_true is not None:
        acc = acc + ba_true
    dts = np.full(n_steps, dt, np.float32)

    # Preintegrate segments (at zero bias) and chain predict_state from the
    # initial state to define GT keyframe states.
    ncov = NOISE if noise_cov is None else noise_cov
    wcov = WALK if walk_cov is None else walk_cov
    preints = []
    Rs = [np.eye(3, dtype=np.float32)]
    ps = [np.zeros(3, np.float32)]
    vs = [rng.uniform(-0.5, 0.5, 3).astype(np.float32)]
    for k in range(n_kf - 1):
        lo, hi = k * seg_steps, (k + 1) * seg_steps
        st = imu.integrate(jnp.asarray(acc_meas[lo:hi]),
                           jnp.asarray(gyr_true[lo:hi]),
                           jnp.asarray(dts[lo:hi]), jnp.zeros(6), ncov, wcov)
        preints.append(st)
        Rn, vn, pn = imu.predict_state(
            jnp.asarray(Rs[-1]), jnp.asarray(vs[-1]), jnp.asarray(ps[-1]),
            st, jnp.zeros(6))
        Rs.append(np.asarray(Rn))
        vs.append(np.asarray(vn))
        ps.append(np.asarray(pn))
    # Re-integrate with the biased measurements for the returned preints
    # (GT states stay those of the bias-free chain).
    if bg_true is not None or ba_true is not None:
        preints = []
        for k in range(n_kf - 1):
            lo, hi = k * seg_steps, (k + 1) * seg_steps
            st = imu.integrate(jnp.asarray(acc[lo:hi]), jnp.asarray(gyr[lo:hi]),
                               jnp.asarray(dts[lo:hi]), jnp.zeros(6), ncov, wcov)
            preints.append(st)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *preints)
    return (np.stack(Rs).astype(np.float32), np.stack(ps).astype(np.float32),
            np.stack(vs).astype(np.float32), stacked)


class TestInertialResidual:
    def test_zero_at_ground_truth(self):
        Rs, ps, vs, preints = make_kf_chain(n_kf=5)
        r = inertial.inertial_residual(
            jnp.asarray(Rs[:-1]), jnp.asarray(ps[:-1]), jnp.asarray(vs[:-1]),
            jnp.asarray(Rs[1:]), jnp.asarray(ps[1:]), jnp.asarray(vs[1:]),
            jnp.zeros((4, 3)), jnp.zeros((4, 3)), preints)
        # First-order integration error only.
        assert np.abs(np.asarray(r)).max() < 2e-2, np.abs(np.asarray(r)).max()

    def test_nonzero_with_wrong_velocity(self):
        Rs, ps, vs, preints = make_kf_chain(n_kf=5)
        vs_bad = vs + 0.5
        r = inertial.inertial_residual(
            jnp.asarray(Rs[:-1]), jnp.asarray(ps[:-1]), jnp.asarray(vs_bad[:-1]),
            jnp.asarray(Rs[1:]), jnp.asarray(ps[1:]), jnp.asarray(vs_bad[1:]),
            jnp.zeros((4, 3)), jnp.zeros((4, 3)), preints)
        assert np.abs(np.asarray(r)).max() > 0.05


class TestInertialInit:
    def test_recovers_scale_gravity_bias(self):
        bg_true = np.array([0.004, -0.003, 0.002], np.float32)
        Rs, ps, vs, preints = make_kf_chain(n_kf=11, bg_true=bg_true)

        # Build the "visual" world: rotated (gravity not aligned) + scaled.
        from scipy.spatial.transform import Rotation
        R_vw = Rotation.from_euler("xy", [8, -5], degrees=True).as_matrix() \
            .astype(np.float32)
        s_true = 2.0  # metric = s_true * visual
        R_vis = np.einsum("ij,kjl->kil", R_vw, Rs)
        p_vis = (ps @ R_vw.T) / s_true

        res = inertial.inertial_only_optimization(
            jnp.asarray(R_vis), jnp.asarray(p_vis), preints,
            prior_g=1e2, prior_a=1e10)
        # Scale within 2% (reference claims <5% after 2 s, Changelog.md:45).
        assert abs(float(res.scale) - s_true) / s_true < 0.02, float(res.scale)
        # Gravity direction: Rwg * (0,0,-G) should match the visual-frame
        # gravity R_vw @ (0,0,-G) within 1 degree.
        g_est = np.asarray(res.R_wg) @ np.array([0, 0, -1.0])
        g_true = R_vw @ np.array([0, 0, -1.0])
        ang = np.degrees(np.arccos(np.clip(g_est @ g_true, -1, 1)))
        assert ang < 1.0, ang
        # Gyro bias recovered.
        np.testing.assert_allclose(np.asarray(res.bg), bg_true, atol=2.5e-3)

    def test_fix_scale_mode(self):
        Rs, ps, vs, preints = make_kf_chain(n_kf=8)
        res = inertial.inertial_only_optimization(
            jnp.asarray(Rs), jnp.asarray(ps), preints,
            prior_g=1e2, prior_a=1e5, fix_scale=True)
        assert float(res.scale) == 1.0
        # Velocities should match GT closely (metric-consistent input).
        np.testing.assert_allclose(np.asarray(res.vel), vs, atol=0.05)


class TestPoseInertialPrior:
    """ConstraintPoseImu marginalization prior
    (Optimizer::Marginalize /root/reference/src/Optimizer.cc:1644, consumed
    by PoseInertialOptimizationLastFrame :983-1283)."""

    CAM = jnp.asarray(np.array([400.0, 400.0, 320.0, 240.0], np.float32))

    def _visual_obs(self, rng, R_wb, p, n_pts=48, noise=0.3):
        """World points in front of the body-frame camera + pixel obs."""
        pc = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                       rng.uniform(3, 6, n_pts)], -1).astype(np.float32)
        pw = pc @ R_wb.T + p
        uv = np.stack([400.0 * pc[:, 0] / pc[:, 2] + 320.0,
                       400.0 * pc[:, 1] / pc[:, 2] + 240.0], -1)
        uv = (uv + rng.normal(0, noise, uv.shape)).astype(np.float32)
        return jnp.asarray(pw), jnp.asarray(uv)

    def _solve(self, Rs, ps, vs, preints, idx, pts_w, uv, valid,
               prior_H=None, with_prior=False, perturb=0.1):
        pre = jax.tree.map(lambda x: x[idx - 1], preints)
        rng = np.random.default_rng(7)
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, 0.02, 3).astype(np.float32))))
        walk_info = jnp.full((6,), 1e6, jnp.float32)
        return inertial.pose_inertial_optimization(
            jnp.asarray(dR @ Rs[idx]), jnp.asarray(ps[idx] + perturb),
            jnp.asarray(vs[idx] + perturb), jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(Rs[idx - 1]), jnp.asarray(ps[idx - 1]),
            jnp.asarray(vs[idx - 1]), jnp.zeros(3), jnp.zeros(3),
            pre, pts_w, uv, jnp.ones(pts_w.shape[0]), valid,
            self.CAM, jnp.eye(3), jnp.zeros(3), walk_info,
            prior_H=prior_H, with_prior=with_prior)

    def test_prior_mode_converges_and_is_psd(self):
        rng = np.random.default_rng(2)
        Rs, ps, vs, preints = make_kf_chain(n_kf=3, seg_steps=40)
        pts1, uv1 = self._visual_obs(rng, Rs[1], ps[1])
        pr1 = self._solve(Rs, ps, vs, preints, 1, pts1, uv1,
                          jnp.ones(48, bool))
        assert np.linalg.norm(np.asarray(pr1.p) - ps[1]) < 0.03
        H1 = np.asarray(pr1.H_marg)
        eig = np.linalg.eigvalsh(0.5 * (H1 + H1.T))
        assert eig.min() > -1e-2, eig.min()

        pts2, uv2 = self._visual_obs(rng, Rs[2], ps[2])
        pr2 = self._solve(Rs, ps, vs, preints, 2, pts2, uv2,
                          jnp.ones(48, bool), prior_H=pr1.H_marg,
                          with_prior=True)
        assert np.linalg.norm(np.asarray(pr2.p) - ps[2]) < 0.03
        H2 = np.asarray(pr2.H_marg)
        eig2 = np.linalg.eigvalsh(0.5 * (H2 + H2.T))
        assert eig2.min() > -1e-2

    def test_prior_tightens_sparse_solve(self):
        """With only 4 visual points on the current frame, the carried
        marginalization prior must pin the (otherwise gauge-deficient)
        joint prev+cur solve — same solver with a ~zero prior drifts."""
        rng = np.random.default_rng(3)
        Rs, ps, vs, preints = make_kf_chain(n_kf=3, seg_steps=40)
        pts1, uv1 = self._visual_obs(rng, Rs[1], ps[1])
        pr1 = self._solve(Rs, ps, vs, preints, 1, pts1, uv1,
                          jnp.ones(48, bool))

        pts2, uv2 = self._visual_obs(rng, Rs[2], ps[2])
        sparse = jnp.zeros(48, bool).at[:4].set(True)
        pr_with = self._solve(Rs, ps, vs, preints, 2, pts2, uv2, sparse,
                              prior_H=pr1.H_marg, with_prior=True)
        pr_zero = self._solve(Rs, ps, vs, preints, 2, pts2, uv2, sparse,
                              prior_H=jnp.zeros((15, 15)), with_prior=True)
        err_with = np.linalg.norm(np.asarray(pr_with.p) - ps[2]) + \
            np.linalg.norm(np.asarray(pr_with.v) - vs[2])
        err_zero = np.linalg.norm(np.asarray(pr_zero.p) - ps[2]) + \
            np.linalg.norm(np.asarray(pr_zero.v) - vs[2])
        assert err_with < err_zero, (err_with, err_zero)
        assert err_with < 0.2, err_with


class TestPoseInertialStereoRows:
    """EdgeStereoOnlyPose rows in the tracking-time VI solve
    (/root/reference/src/Optimizer.cc:1280-1283: stereo chi2 anneal
    {15.6, 9.8, 7.815, 7.815})."""

    CAM = jnp.asarray(np.array([400.0, 400.0, 320.0, 240.0], np.float32))
    BF = 400.0 * 0.2     # fx * baseline

    def _stereo_obs(self, rng, R_wb, p, n_pts=48, noise=0.3):
        pc = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                       rng.uniform(3, 6, n_pts)], -1).astype(np.float32)
        pw = pc @ R_wb.T + p
        uv = np.stack([400.0 * pc[:, 0] / pc[:, 2] + 320.0,
                       400.0 * pc[:, 1] / pc[:, 2] + 240.0], -1)
        ur = uv[:, 0] - self.BF / pc[:, 2]
        uv = (uv + rng.normal(0, noise, uv.shape)).astype(np.float32)
        ur = (ur + rng.normal(0, noise, ur.shape)).astype(np.float32)
        return jnp.asarray(pw), jnp.asarray(uv), jnp.asarray(ur)

    def test_converges_with_stereo_rows(self):
        rng = np.random.default_rng(5)
        Rs, ps, vs, preints = make_kf_chain(n_kf=3, seg_steps=40)
        pts, uv, ur = self._stereo_obs(rng, Rs[1], ps[1])
        pre = jax.tree.map(lambda x: x[0], preints)
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, 0.02, 3).astype(np.float32))))
        pr = inertial.pose_inertial_optimization(
            jnp.asarray(dR @ Rs[1]), jnp.asarray(ps[1] + 0.1),
            jnp.asarray(vs[1] + 0.1), jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(Rs[0]), jnp.asarray(ps[0]),
            jnp.asarray(vs[0]), jnp.zeros(3), jnp.zeros(3),
            pre, pts, uv, jnp.ones(pts.shape[0]), jnp.ones(48, bool),
            self.CAM, jnp.eye(3), jnp.zeros(3),
            jnp.full((6,), 1e6, jnp.float32),
            obs_ur=ur, bf=jnp.asarray(self.BF))
        assert np.linalg.norm(np.asarray(pr.p) - ps[1]) < 0.03
        assert int(pr.n_inliers) >= 40, int(pr.n_inliers)

    def test_stereo_rows_pin_depth_scale(self):
        """Translation perturbed along the viewing axis with few points:
        the u_r rows (metric depth) recover it better than mono rows."""
        rng = np.random.default_rng(6)
        Rs, ps, vs, preints = make_kf_chain(n_kf=3, seg_steps=40)
        pts, uv, ur = self._stereo_obs(rng, Rs[1], ps[1], noise=0.1)
        pre = jax.tree.map(lambda x: x[0], preints)
        valid = jnp.zeros(48, bool).at[:6].set(True)
        # Perturb along camera z (depth direction).
        z_dir = Rs[1][:, 2]
        kw = dict(
            cam_params=self.CAM, R_cb=jnp.eye(3), t_cb=jnp.zeros(3),
            walk_info=jnp.full((6,), 1e6, jnp.float32))
        args = (jnp.asarray(Rs[1]), jnp.asarray(ps[1] + 0.3 * z_dir),
                jnp.asarray(vs[1]), jnp.zeros(3), jnp.zeros(3),
                jnp.asarray(Rs[0]), jnp.asarray(ps[0]),
                jnp.asarray(vs[0]), jnp.zeros(3), jnp.zeros(3),
                pre, pts, uv, jnp.ones(pts.shape[0]), valid)
        pr_st = inertial.pose_inertial_optimization(
            *args, obs_ur=ur, bf=jnp.asarray(self.BF), **kw)
        pr_mono = inertial.pose_inertial_optimization(*args, **kw)
        err_st = np.linalg.norm(np.asarray(pr_st.p) - ps[1])
        err_mono = np.linalg.norm(np.asarray(pr_mono.p) - ps[1])
        assert err_st <= err_mono + 1e-3, (err_st, err_mono)
        assert err_st < 0.05, err_st
