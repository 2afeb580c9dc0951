"""Sim3 RANSAC and pose-graph optimization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.ops import lie, sim3_solve
from orbslam3_byzyh_tpu.solver import pose_graph


class TestSim3Ransac:
    def test_recovers_transform_with_outliers(self, rng):
        n = 200
        pa = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        xi = rng.uniform(-0.5, 0.5, 7).astype(np.float32)
        xi[6] = 0.3  # scale e^0.3
        R, t, s = lie.sim3_exp(jnp.asarray(xi))
        pb = np.array(lie.sim3_apply(R, t, s, jnp.asarray(pa)))
        pb += rng.normal(0, 0.01, pb.shape)
        out = rng.choice(n, 50, replace=False)
        pb[out] += rng.uniform(1, 3, (50, 3))
        res = sim3_solve.sim3_ransac(
            jax.random.PRNGKey(0), jnp.asarray(pa), jnp.asarray(pb.astype(np.float32)),
            jnp.ones(n, bool))
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        assert not inl[out].any() or inl[out].mean() < 0.1
        assert abs(float(res.s) - float(s)) < 0.01
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R), atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t), atol=5e-2)

    def test_se3_mode(self, rng):
        n = 100
        pa = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        xi = np.zeros(7, np.float32)
        xi[:6] = rng.uniform(-0.5, 0.5, 6)
        R, t, s = lie.sim3_exp(jnp.asarray(xi))
        pb = np.asarray(lie.sim3_apply(R, t, s, jnp.asarray(pa))).astype(np.float32)
        res = sim3_solve.sim3_ransac(
            jax.random.PRNGKey(0), jnp.asarray(pa), jnp.asarray(pb),
            jnp.ones(n, bool), with_scale=False)
        assert bool(res.ok)
        assert abs(float(res.s) - 1.0) < 1e-6


def make_loop_problem(rng, n_kf=12, drift=0.02):
    """Circular trajectory with odometry drift + one loop edge."""
    Rs_gt, ts_gt = [], []
    for k in range(n_kf):
        ang = 2 * np.pi * k / n_kf
        Rwc = np.asarray(lie.so3_exp(jnp.asarray(
            np.array([0, ang, 0], np.float32))))
        c = np.array([np.sin(ang) * 3, 0, 3 - np.cos(ang) * 3], np.float32)
        R_cw = Rwc.T
        Rs_gt.append(R_cw)
        ts_gt.append(-R_cw @ c)
    Rs_gt, ts_gt = np.stack(Rs_gt), np.stack(ts_gt)

    # Odometry: true relative + drift noise; integrate to get drifted poses.
    Rs_o, ts_o = [Rs_gt[0]], [ts_gt[0]]
    rels = []
    for k in range(1, n_kf):
        Rrel, trel, srel = pose_graph.relative_sim3(
            jnp.asarray(Rs_gt[k]), jnp.asarray(ts_gt[k]), jnp.asarray(1.0),
            jnp.asarray(Rs_gt[k - 1]), jnp.asarray(ts_gt[k - 1]), jnp.asarray(1.0))
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, drift, 3).astype(np.float32))))
        Rrel_n = dR @ np.asarray(Rrel)
        trel_n = np.asarray(trel) + rng.normal(0, drift, 3)
        rels.append((Rrel_n, trel_n.astype(np.float32)))
        R_new, t_new, _ = lie.sim3_mul(
            jnp.asarray(Rrel_n), jnp.asarray(trel_n.astype(np.float32)),
            jnp.asarray(1.0),
            jnp.asarray(Rs_o[-1]), jnp.asarray(ts_o[-1]), jnp.asarray(1.0))
        Rs_o.append(np.asarray(R_new))
        ts_o.append(np.asarray(t_new))
    return Rs_gt, ts_gt, np.stack(Rs_o), np.stack(ts_o), rels


class TestPoseGraph:
    def test_loop_closure_reduces_drift(self, rng):
        n_kf = 12
        Rs_gt, ts_gt, Rs_o, ts_o, rels = make_loop_problem(rng, n_kf)

        # Edges: sequential odometry (drifted measurements, consistent with
        # the drifted poses) + one loop edge with the TRUE relative pose.
        ei, ej, mR, mt, ms_, w = [], [], [], [], [], []
        for k in range(1, n_kf):
            ei.append(k); ej.append(k - 1)
            mR.append(rels[k - 1][0]); mt.append(rels[k - 1][1]); ms_.append(1.0)
            w.append(1.0)
        # Loop edge last->first with GT relative.
        Rrel, trel, srel = pose_graph.relative_sim3(
            jnp.asarray(Rs_gt[-1]), jnp.asarray(ts_gt[-1]), jnp.asarray(1.0),
            jnp.asarray(Rs_gt[0]), jnp.asarray(ts_gt[0]), jnp.asarray(1.0))
        ei.append(n_kf - 1); ej.append(0)
        mR.append(np.asarray(Rrel)); mt.append(np.asarray(trel)); ms_.append(1.0)
        w.append(1.0)

        drift_before = np.linalg.norm(
            (-Rs_o[-1].T @ ts_o[-1]) - (-Rs_gt[-1].T @ ts_gt[-1]))

        res = pose_graph.optimize_pose_graph(
            jnp.asarray(Rs_o), jnp.asarray(ts_o), jnp.ones(n_kf),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)),
            jnp.asarray(ms_, jnp.float32), jnp.asarray(w, jnp.float32),
            jnp.zeros(n_kf, bool).at[0].set(True),
            pose_graph.DOF_SE3, n_iters=25)

        c_after = -np.einsum("nji,nj->ni", np.asarray(res.R), np.asarray(res.t))
        c_gt = -np.einsum("nji,nj->ni", Rs_gt, ts_gt)
        err_after = np.linalg.norm(c_after - c_gt, axis=-1)
        # End-of-loop drift must collapse and overall error shrink.
        drift_after = err_after[-1]
        assert drift_after < 0.5 * drift_before, (drift_before, drift_after)
        assert np.all(np.abs(np.asarray(res.s) - 1.0) < 1e-4)  # SE3 mode

    def test_scale_drift_correction_sim3(self, rng):
        """Mono loop closing: odometry with scale drift, Sim3 graph fixes it."""
        n_kf = 10
        Rs_gt, ts_gt, _, _, _ = make_loop_problem(rng, n_kf, drift=0.0)
        # Apply growing scale drift to the integrated poses.
        scales = np.cumprod(np.full(n_kf, 1.03))
        Rs_o = Rs_gt.copy()
        ts_o = (ts_gt * scales[:, None]).astype(np.float32)

        ei, ej, mR, mt, ms_, w = [], [], [], [], [], []
        for k in range(1, n_kf):
            # Odometry measurement consistent with drifted chain.
            Rrel, trel, srel = pose_graph.relative_sim3(
                jnp.asarray(Rs_o[k]), jnp.asarray(ts_o[k]), jnp.asarray(1.0),
                jnp.asarray(Rs_o[k - 1]), jnp.asarray(ts_o[k - 1]),
                jnp.asarray(1.0))
            ei.append(k); ej.append(k - 1)
            mR.append(np.asarray(Rrel)); mt.append(np.asarray(trel))
            ms_.append(1.0); w.append(1.0)
        # Loop edge with true (unit-scale) relative.
        Rrel, trel, _ = pose_graph.relative_sim3(
            jnp.asarray(Rs_gt[-1]), jnp.asarray(ts_gt[-1]), jnp.asarray(1.0),
            jnp.asarray(Rs_gt[0]), jnp.asarray(ts_gt[0]), jnp.asarray(1.0))
        ei.append(n_kf - 1); ej.append(0)
        mR.append(np.asarray(Rrel)); mt.append(np.asarray(trel))
        ms_.append(1.0); w.append(5.0)

        res = pose_graph.optimize_pose_graph(
            jnp.asarray(Rs_o), jnp.asarray(ts_o), jnp.ones(n_kf),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)),
            jnp.asarray(ms_, jnp.float32), jnp.asarray(w, jnp.float32),
            jnp.zeros(n_kf, bool).at[0].set(True),
            pose_graph.DOF_SIM3, n_iters=30)
        s_out = np.asarray(res.s)
        # Scales must spread to absorb the drift (non-trivial, smooth).
        assert s_out.std() > 1e-3
        # The last KF's center should move toward GT.
        c_after = -np.asarray(res.R[-1]).T @ (np.asarray(res.t[-1]) / s_out[-1])
        c_gt = -Rs_gt[-1].T @ ts_gt[-1]
        c_before = -Rs_o[-1].T @ (ts_o[-1])
        assert np.linalg.norm(c_after - c_gt) < np.linalg.norm(c_before - c_gt)

    def test_4dof_world_yaw_preserves_gravity(self, rng):
        """Inertial pose graph (OptimizeEssentialGraph4DoF): with cameras
        PITCHED away from the world axes, the 4-DoF graph must still correct
        a pure world-yaw drift, and its corrections must not tilt the
        gravity direction seen by any camera — this requires the tangent's
        free rotation axis to live in the WORLD frame (right perturbation);
        a camera-frame (left) z-rotation would instead roll about the
        optical axis and tilt the gravity-aligned map."""
        n_kf = 12
        pitch = np.asarray(lie.so3_exp(jnp.asarray(
            np.array([0.5, 0, 0], np.float32))))     # 28 deg camera pitch
        Rs_gt, ts_gt, cs_gt = [], [], []
        for k in range(n_kf):
            ang = 2 * np.pi * k / n_kf
            yaw = np.asarray(lie.so3_exp(jnp.asarray(
                np.array([0, 0, ang], np.float32))))  # yaw about world z
            R_wc = yaw @ pitch
            c = np.array([np.cos(ang) * 3, np.sin(ang) * 3, 1.0], np.float32)
            Rs_gt.append(R_wc.T)
            ts_gt.append(-R_wc.T @ c)
            cs_gt.append(c)
        Rs_gt, ts_gt = np.stack(Rs_gt), np.stack(ts_gt)

        # Drift: growing pure WORLD-yaw error composed onto each pose.
        Rs_o, ts_o = [], []
        for k in range(n_kf):
            dpsi = 0.04 * k
            E = np.asarray(lie.so3_exp(jnp.asarray(
                np.array([0, 0, dpsi], np.float32))))
            # Tcw_drift = Tcw_gt o E (world-side composition).
            Rs_o.append(Rs_gt[k] @ E)
            ts_o.append(ts_gt[k])
        Rs_o, ts_o = np.stack(Rs_o).astype(np.float32), np.stack(ts_o)

        ei, ej, mR, mt, ms_, w = [], [], [], [], [], []
        for k in range(1, n_kf):
            Rrel, trel, _ = pose_graph.relative_sim3(
                jnp.asarray(Rs_o[k]), jnp.asarray(ts_o[k]), jnp.asarray(1.0),
                jnp.asarray(Rs_o[k - 1]), jnp.asarray(ts_o[k - 1]),
                jnp.asarray(1.0))
            ei.append(k); ej.append(k - 1)
            mR.append(np.asarray(Rrel)); mt.append(np.asarray(trel))
            ms_.append(1.0); w.append(1.0)
        Rrel, trel, _ = pose_graph.relative_sim3(
            jnp.asarray(Rs_gt[-1]), jnp.asarray(ts_gt[-1]), jnp.asarray(1.0),
            jnp.asarray(Rs_gt[0]), jnp.asarray(ts_gt[0]), jnp.asarray(1.0))
        ei.append(n_kf - 1); ej.append(0)
        mR.append(np.asarray(Rrel)); mt.append(np.asarray(trel))
        ms_.append(1.0); w.append(5.0)

        res = pose_graph.optimize_pose_graph(
            jnp.asarray(Rs_o), jnp.asarray(ts_o), jnp.ones(n_kf),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)),
            jnp.asarray(ms_, jnp.float32), jnp.asarray(w, jnp.float32),
            jnp.zeros(n_kf, bool).at[0].set(True),
            pose_graph.DOF_4, n_iters=30, right_perturb=True)

        R_out = np.asarray(res.R)
        # Yaw drift corrected: rotation error vs GT shrinks at the loop end.
        def rot_err(Ra, Rb):
            c = (np.trace(Ra.T @ Rb) - 1) / 2
            return np.arccos(np.clip(c, -1, 1))
        assert rot_err(R_out[-1], Rs_gt[-1]) < 0.5 * rot_err(Rs_o[-1], Rs_gt[-1])
        # Gravity invariance: the world-z direction expressed in each camera
        # must be untouched by the correction (yaw about gravity only).
        ez = np.array([0, 0, 1.0], np.float32)
        g_before = Rs_o @ ez          # (K, 3)
        g_after = R_out @ ez
        tilt = np.arccos(np.clip((g_before * g_after).sum(-1), -1, 1))
        assert tilt.max() < 1e-3, tilt.max()
        assert np.all(np.abs(np.asarray(res.s) - 1.0) < 1e-4)
